"""Device-resident plan containers and x/y shape helpers.

The measured Pallas fact that shapes this module (see docs/DESIGN.md): the
grid pipeline sustains only ~67 GB/s **per input array** on the bench TPU,
while distinct arrays stream concurrently (~400 GB/s at 12 arrays).  Each
plan stream is therefore interleaved into several separate device arrays —
``vals`` into ``KV`` arrays, ``loc`` into ``KV/2``, ``gidx``/``pidx`` into
``KV/4`` — every array carrying the same byte volume, so one grid step
fetches one **superchunk** (``KV·chunk`` sublane rows) via 2·KV concurrent
DMAs.  Array ``k`` of a stream split ``K`` ways holds, for each step ``i``,
superchunk rows ``[k·SC/K, (k+1)·SC/K)`` — plain reshape interleaving.

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

# (chunk, KV) choices, largest superchunk first.  SC = KV·chunk sublane rows.
_GEOMETRIES = ((256, 8), (128, 4), (64, 2), (64, 1))

# The engines keep the whole x table and the whole y in VMEM (~16 MB/core);
# with the streamed double-buffered chunks (~4 MB) that bounds
# 4·(nrows + ncols) on one chip.  Larger matrices must be sharded.
_VMEM_VECTOR_BUDGET = 9 * 1024 * 1024


def _check_fits(nrows: int, ncols: int) -> None:
    if 4 * (nrows + ncols) > _VMEM_VECTOR_BUDGET:
        raise ValueError(
            f"matrix ({nrows} x {ncols}) exceeds the single-chip VMEM budget "
            f"for the whole-y/whole-x resident design (~"
            f"{_VMEM_VECTOR_BUDGET // (4 * 1024 * 1024)}M rows+cols); "
            "partition it with spmv_tpu.dist.RowShardedSpmv or "
            "RingShardedSpmv")


def pick_geometry(tm_rows: int) -> tuple[int, int]:
    """Largest (chunk, KV) whose superchunk keeps padding overhead small."""
    for chunk, kv in _GEOMETRIES:
        if tm_rows >= 2 * chunk * kv or (chunk, kv) == _GEOMETRIES[-1]:
            return chunk, kv
    return _GEOMETRIES[-1]


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


def split_plan_arrays(arrays: dict, chunk: int, kv: int) -> dict:
    """Pad a plan's np arrays to a whole number of superchunks and split
    each stream into its interleaved device arrays.  Returns a flat dict
    name->np array (``vals0..``, ``loc0..``, ``gidx0..``, ``pidx0..``,
    ``sub_block``, ``sub_base``)."""
    sc = chunk * kv
    tm = round_up(max(arrays["vals"].shape[0], sc), sc)
    out = {}
    for name, k in _stream_splits(kv, "gidx" in arrays):
        padded = _pad_rows(arrays[name], tm)
        for j, part in enumerate(split_stream(padded, sc, k)):
            out[f"{name}{j}"] = part
    nsub = tm // SUBLANES
    out["sub_block"] = _pad_rows(arrays["sub_block"], nsub)
    out["sub_base"] = _pad_rows(arrays["sub_base"], nsub)
    return out


def _stream_splits(kv: int, seg: bool):
    streams = [("vals", kv), ("loc", max(kv // 2, 1))]
    if seg:
        streams += [("gidx", max(kv // 4, 1)), ("pidx", max(kv // 4, 1))]
    return streams


def _gather_tuples(d: dict, kv: int, seg: bool):
    import jax.numpy as jnp

    t = {}
    for name, k in _stream_splits(kv, seg):
        t[name] = tuple(jnp.asarray(d[f"{name}{j}"]) for j in range(k))
    t["sub_block"] = jnp.asarray(d["sub_block"])
    t["sub_base"] = jnp.asarray(d["sub_base"])
    return t


@dataclass(frozen=True)
class DevPanel:
    vals: tuple  # KV × (TM/KV, 128) f32
    loc: tuple  # KV/2 × (TM·2/KV, 128) u16
    sub_block: object  # (TM/8,) i32
    sub_base: object  # (TM/8,) i32
    chunk: int
    kv: int
    nrows: int
    ncols: int
    nnz: int

    @classmethod
    def from_plan(cls, p: PanelPlan) -> "DevPanel":
        _check_fits(p.nrows, p.ncols)
        chunk, kv = pick_geometry(p.vals.shape[0])
        d = split_plan_arrays(
            {"vals": p.vals, "loc": p.loc,
             "sub_block": p.sub_block, "sub_base": p.sub_base}, chunk, kv)
        t = _gather_tuples(d, kv, seg=False)
        return cls(vals=t["vals"], loc=t["loc"], sub_block=t["sub_block"],
                   sub_base=t["sub_base"], chunk=chunk, kv=kv,
                   nrows=p.nrows, ncols=p.ncols, nnz=p.nnz)

    @property
    def out_blocks(self) -> int:
        return cdiv(max(self.nrows, 1), LANES)


@dataclass(frozen=True)
class DevSeg:
    vals: tuple
    loc: tuple
    gidx: tuple  # KV/4 × (TM·4/KV, 128) u8
    pidx: tuple
    sub_block: object
    sub_base: object
    chunk: int
    kv: int
    nrows: int
    ncols: int
    nnz: int

    @classmethod
    def from_plan(cls, p: SegPlan) -> "DevSeg":
        _check_fits(p.nrows, p.ncols)
        chunk, kv = pick_geometry(p.vals.shape[0])
        d = split_plan_arrays(
            {"vals": p.vals, "loc": p.loc, "gidx": p.gidx, "pidx": p.pidx,
             "sub_block": p.sub_block, "sub_base": p.sub_base}, chunk, kv)
        t = _gather_tuples(d, kv, seg=True)
        return cls(vals=t["vals"], loc=t["loc"], gidx=t["gidx"],
                   pidx=t["pidx"], sub_block=t["sub_block"],
                   sub_base=t["sub_base"], chunk=chunk, kv=kv,
                   nrows=p.nrows, ncols=p.ncols, nnz=p.nnz)

    @property
    def out_blocks(self) -> int:
        return cdiv(max(self.nrows, 1), LANES)


def _register(cls):
    leaf_names = [f.name for f in fields(cls)
                  if f.name not in ("chunk", "kv", "nrows", "ncols", "nnz")]

    def flatten(d):
        return tuple(getattr(d, n) for n in leaf_names), (
            d.chunk, d.kv, d.nrows, d.ncols, d.nnz)

    def unflatten(aux, children):
        kw = dict(zip(leaf_names, children))
        kw.update(chunk=aux[0], kv=aux[1], nrows=aux[2], ncols=aux[3],
                  nnz=aux[4])
        return cls(**kw)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)


_register(DevPanel)
_register(DevSeg)


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
