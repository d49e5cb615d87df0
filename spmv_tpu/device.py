"""Device-resident plan containers and x/y shape helpers.

The measured Pallas fact that shapes this module (see docs/DESIGN.md): the
grid pipeline sustains only ~67 GB/s **per input array** on the bench TPU,
while distinct arrays stream concurrently (~530-620 GB/s at 12-14 arrays
in-engine).  Each plan stream is therefore interleaved into several
separate device arrays; one grid step fetches one **superchunk**
(``ns·chunk`` sublane rows) over the concurrent DMAs.

Both engines consume P-packed streams (see ``formats.base``): per value
plane ``kva`` f32 arrays (plane-major tuple), one u8 array per ``lo``
plane, a single shared u8 ``hi`` array, plus u8 ``gidx`` for the
segmented engine.

The containers are jax pytrees: the split arrays are leaves, the geometry
is static aux data, so ``jit(spmv)(dev, x2d)`` specializes per geometry.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import numpy as np

from spmv_tpu.formats.base import (
    LANES,
    SUBLANES,
    PanelPlan,
    SegPlan,
    cdiv,
    round_up,
    x_stripes,
)

__all__ = ["DevPanel", "DevSeg", "x_table_rows", "x_to_table", "y_from_padded"]

# (chunk, NS) choices, largest superchunk first.  SC = NS·chunk sublane rows.
# (128,16) measured marginally ahead of (256,8)/(512,4) in the interleaved
# geometry sweep (scripts/probe_geom.py) at identical VMEM footprint.
_GEOMETRIES = ((128, 16), (128, 4), (64, 2), (64, 1))

# Scoped VMEM is 16 MB/core; the double-buffered stream blocks plus the
# resident x table and y must fit with headroom for compute scratch.
_VMEM_LIMIT = 14 * 1024 * 1024
# Resident-vector cap = what the smallest geometry leaves free; beyond
# this the matrix must be sharded.
_VMEM_VECTOR_BUDGET = 12 * 1024 * 1024


def _vector_bytes(nrows: int, ncols: int) -> int:
    """VMEM-resident bytes of the padded x table + y."""
    return 4 * (x_stripes(ncols) * LANES + cdiv(max(nrows, 1), LANES) * LANES)


def _check_fits(nrows: int, ncols: int) -> None:
    if _vector_bytes(nrows, ncols) > _VMEM_VECTOR_BUDGET:
        raise ValueError(
            f"matrix ({nrows} x {ncols}) exceeds the single-chip VMEM budget "
            f"for the whole-y/whole-x resident design (~"
            f"{_VMEM_VECTOR_BUDGET // (4 * 1024 * 1024)}M rows+cols); "
            "partition it with spmv_tpu.dist.RowShardedSpmv or "
            "RingShardedSpmv")


def pick_geometry(tm_rows: int, pack: int = 4, seg: bool = True,
                  nrows: int = 0, ncols: int = 0) -> tuple[int, int]:
    """Largest (chunk, NS) whose superchunk keeps padding overhead small
    AND whose double-buffered stream blocks fit scoped VMEM next to the
    resident x/y vectors (a 786k-row matrix passed the old vector-only
    check, then OOMed compiling at 17 MB — the geometry must shrink as
    the vectors grow)."""
    vec = _vector_bytes(nrows, ncols)
    # per-step stream bytes across all arrays, double-buffered:
    # sc·128·(4P vals + P lo + hi + gidx) per superchunk of sc rows
    bpq = (5 * pack + 2) if seg else (5 * pack + 1)
    for chunk, ns in _GEOMETRIES:
        stream = 2 * chunk * ns * LANES * bpq
        if (chunk, ns) != _GEOMETRIES[-1] and tm_rows < 2 * chunk * ns:
            continue
        if stream + vec <= _VMEM_LIMIT or (chunk, ns) == _GEOMETRIES[-1]:
            return chunk, ns
    return _GEOMETRIES[-1]


def seg_kva(pack: int, ns: int) -> int:
    """vals arrays per plane: keep ~16 value arrays total for DMA
    concurrency (the per-array ~67 GB/s cap scales with distinct arrays;
    16 arrays measured ~+10-20% aggregate over 8 on the bench chip,
    scripts/probe_geom.py), bounded by the sub-chunks per step."""
    return max(min(16 // pack, ns), 1)


def split_stream(x: np.ndarray, sc: int, k: int) -> tuple[np.ndarray, ...]:
    """Interleave a row-padded (TM,128) stream into k equal device arrays."""
    tm = x.shape[0]
    assert tm % sc == 0
    x3 = x.reshape(tm // sc, k, sc // k, LANES)
    return tuple(np.ascontiguousarray(x3[:, j]).reshape(-1, LANES)
                 for j in range(k))


def _pad_rows(x: np.ndarray, rows: int) -> np.ndarray:
    if x.shape[0] == rows:
        return x
    return np.pad(x, [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1))


def split_packed_arrays(arrays: dict, chunk: int, ns: int, pack: int,
                        seg: bool) -> dict:
    """Packed-plan splitter: ``vals``/``lo`` are (TM, P, 128) plane stacks;
    plane pp of vals splits ``kva`` ways into ``vals{pp*kva+j}``, plane pp
    of lo becomes ``lo{pp}``, ``hi`` (and ``gidx`` for seg plans) stay
    whole."""
    sc = chunk * ns
    tm = round_up(max(arrays["vals"].shape[0], sc), sc)
    kva = seg_kva(pack, ns)
    out = {}
    v = _pad_rows(arrays["vals"], tm)
    lo = _pad_rows(arrays["lo"], tm)
    for pp in range(pack):
        for j, part in enumerate(split_stream(
                np.ascontiguousarray(v[:, pp, :]), sc, kva)):
            out[f"vals{pp * kva + j}"] = part
        out[f"lo{pp}"] = np.ascontiguousarray(lo[:, pp, :])
    out["hi"] = _pad_rows(arrays["hi"], tm)
    if seg:
        out["gidx"] = _pad_rows(arrays["gidx"], tm)
    nsub = tm // SUBLANES
    out["sub_block"] = _pad_rows(arrays["sub_block"], nsub)
    out["sub_base"] = _pad_rows(arrays["sub_base"], nsub)
    return out


@dataclass(frozen=True)
class DevPanel:
    vals: tuple  # P·kva × (TM/kva, 128) f32, plane-major
    lo: tuple  # P × (TM, 128) u8
    hi: object  # (TM, 128) u8
    sub_block: object  # (TM/8,) i32
    sub_base: object  # (TM/8,) i32
    chunk: int
    ns: int  # sub-chunks per superchunk step
    pack: int  # P — elements per quad slot
    nrows: int
    ncols: int
    nnz: int

    @classmethod
    def from_plan(cls, p: PanelPlan) -> "DevPanel":
        import jax.numpy as jnp

        _check_fits(p.nrows, p.ncols)
        chunk, ns = pick_geometry(p.vals.shape[0], p.pack, seg=False,
                                  nrows=p.nrows, ncols=p.ncols)
        d = split_packed_arrays(
            {"vals": p.vals, "lo": p.lo, "hi": p.hi,
             "sub_block": p.sub_block, "sub_base": p.sub_base},
            chunk, ns, p.pack, seg=False)
        kva = seg_kva(p.pack, ns)
        return cls(
            vals=tuple(jnp.asarray(d[f"vals{j}"])
                       for j in range(p.pack * kva)),
            lo=tuple(jnp.asarray(d[f"lo{j}"]) for j in range(p.pack)),
            hi=jnp.asarray(d["hi"]),
            sub_block=jnp.asarray(d["sub_block"]),
            sub_base=jnp.asarray(d["sub_base"]),
            chunk=chunk, ns=ns, pack=p.pack,
            nrows=p.nrows, ncols=p.ncols, nnz=p.nnz)

    @property
    def kva(self) -> int:
        return len(self.vals) // self.pack

    @property
    def out_blocks(self) -> int:
        return cdiv(max(self.nrows, 1), LANES)

    @property
    def element_slots(self) -> int:
        return self.vals[0].shape[0] * self.kva * LANES * self.pack

    @property
    def stream_bytes(self) -> int:
        arrs = list(self.vals) + list(self.lo) + [self.hi]
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in arrs)


@dataclass(frozen=True)
class DevSeg:
    vals: tuple  # P·kva × (TM/kva, 128) f32, plane-major
    lo: tuple  # P × (TM, 128) u8
    hi: object  # (TM, 128) u8
    gidx: object  # (TM, 128) u8 (filled running max)
    sub_block: object  # (TM/8,) i32
    sub_base: object  # (TM/8,) i32
    chunk: int
    ns: int  # sub-chunks per superchunk step
    pack: int  # P — elements per quad slot
    nrows: int
    ncols: int
    nnz: int

    @classmethod
    def from_plan(cls, p: SegPlan) -> "DevSeg":
        import jax.numpy as jnp

        _check_fits(p.nrows, p.ncols)
        chunk, ns = pick_geometry(p.vals.shape[0], p.pack, seg=True,
                                  nrows=p.nrows, ncols=p.ncols)
        d = split_packed_arrays(
            {"vals": p.vals, "lo": p.lo, "hi": p.hi, "gidx": p.gidx,
             "sub_block": p.sub_block, "sub_base": p.sub_base},
            chunk, ns, p.pack, seg=True)
        kva = seg_kva(p.pack, ns)
        return cls(
            vals=tuple(jnp.asarray(d[f"vals{j}"])
                       for j in range(p.pack * kva)),
            lo=tuple(jnp.asarray(d[f"lo{j}"]) for j in range(p.pack)),
            hi=jnp.asarray(d["hi"]),
            gidx=jnp.asarray(d["gidx"]),
            sub_block=jnp.asarray(d["sub_block"]),
            sub_base=jnp.asarray(d["sub_base"]),
            chunk=chunk, ns=ns, pack=p.pack,
            nrows=p.nrows, ncols=p.ncols, nnz=p.nnz)

    @property
    def kva(self) -> int:
        return len(self.vals) // self.pack

    @property
    def out_blocks(self) -> int:
        return cdiv(max(self.nrows, 1), LANES)

    @property
    def element_slots(self) -> int:
        return self.vals[0].shape[0] * self.kva * LANES * self.pack

    @property
    def stream_bytes(self) -> int:
        arrs = list(self.vals) + list(self.lo) + [self.hi, self.gidx]
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in arrs)


def _register(cls, statics):
    leaf_names = [f.name for f in fields(cls) if f.name not in statics]

    def flatten(d):
        return (tuple(getattr(d, n) for n in leaf_names),
                tuple(getattr(d, n) for n in statics))

    def unflatten(aux, children):
        kw = dict(zip(leaf_names, children))
        kw.update(zip(statics, aux))
        return cls(**kw)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)


_register(DevPanel, ("chunk", "ns", "pack", "nrows", "ncols", "nnz"))
_register(DevSeg, ("chunk", "ns", "pack", "nrows", "ncols", "nnz"))


def x_table_rows(ncols: int) -> int:
    """Rows of the (S,128) x table: at least 8 so every (8,128) window
    slice stays in bounds."""
    return x_stripes(ncols)


def x_to_table(x, ncols: int):
    """(ncols,) → zero-padded (S,128) VMEM table. jit-composable."""
    import jax.numpy as jnp

    S = x_table_rows(ncols)
    xf = jnp.asarray(x, jnp.float32).reshape(-1)
    if xf.shape[0] != ncols:
        raise ValueError(f"x has {xf.shape[0]} entries, matrix has {ncols} columns")
    pad = S * LANES - xf.shape[0]
    if pad:
        xf = jnp.pad(xf, (0, pad))
    return xf.reshape(S, LANES)


def y_from_padded(y2d, nrows: int):
    """(1, NB*128) → (nrows,). jit-composable."""
    return y2d.reshape(-1)[:nrows]
