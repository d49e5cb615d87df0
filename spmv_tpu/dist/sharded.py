"""Multi-chip SpMV via shard_map over a device mesh.

The reference has no distribution at all (SURVEY.md §2.3); this layer is
the framework's scaling dimension, per BASELINE.json's north star:

* **Row partition** (``RowShardedSpmv``): each device owns a contiguous
  slab of matrix rows (its own single-chip format plan) and computes its
  y slab — y comes out sharded, no collective on y.  x is either
  replicated (``gather_x=False``) or row-sharded and **all-gathered over
  ICI** inside the shard (``gather_x=True`` — the BASELINE.json CMRS
  config).
* **Column partition** (``ColShardedSpmv``): each device owns a column
  slab of A and the matching x slab (for x beyond one chip's VMEM),
  computes a full-length partial y, and ``psum``s — the tensor-parallel
  analog for SpMV.

All shards share identical static shapes (plans are padded to the max
across shards), so one jitted shard_map serves every device.  Works on a
CPU mesh (``--xla_force_host_platform_device_count``) with the kernels in
interpret mode — that is how the tests and the driver's multi-chip dry
run execute.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from spmv_tpu.device import DevSeg, x_table_rows
from spmv_tpu.formats.base import LANES, cdiv, round_up
from spmv_tpu.kernels.engines import panel_spmv, segmented_spmv

__all__ = ["RowShardedSpmv", "ColShardedSpmv"]

_SEG_FORMATS = {"coo", "csr", "cmrs"}
_PANEL_FORMATS = {"ell", "sell", "sell_c_sigma"}


def _pad_rows(arr: np.ndarray, target: int) -> np.ndarray:
    if arr.shape[0] == target:
        return arr
    pad = [(0, target - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def _unify_plans(shards):
    """Pad per-shard device arrays to common shapes (pad rows are all-zero
    subtiles that accumulate 0 into block 0)."""
    arrays = {}
    names = ["vals", "loc", "sub_block", "sub_base"]
    if isinstance(shards[0].dev, DevSeg):
        names += ["gidx", "pidx"]
    for name in names:
        mats = [np.asarray(getattr(s.dev, name)) for s in shards]
        tr = max(m.shape[0] for m in mats)
        arrays[name] = np.stack([_pad_rows(m, tr) for m in mats])
    return arrays


@dataclass
class _ShardStatics:
    chunk: int
    out_blocks: int
    is_seg: bool
    nrows: int
    ncols: int
    rows_per_shard: int
    n_shards: int


class RowShardedSpmv:
    """y = A·x with A row-partitioned over ``mesh``'s single axis."""

    def __init__(self, format: str, nrows: int, ncols: int, rows, cols, vals,
                 mesh: Mesh, *, gather_x: bool = True, **fmt_kwargs):
        from spmv_tpu.api import FORMATS

        format = format.lower()
        if format in _PANEL_FORMATS and format != "ell":
            raise NotImplementedError(
                "row-sharded SELL: use ell/csr/coo/cmrs (sell epilogue is "
                "single-chip for now)")
        cls = FORMATS[format]
        self.format = format
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        D = mesh.shape[self.axis]
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols)
        vals = np.asarray(vals)

        rps = round_up(max(cdiv(nrows, D), LANES), LANES)
        shards = []
        for d in range(D):
            lo, hi = d * rps, (d + 1) * rps
            sel = (rows >= lo) & (rows < hi)
            shards.append(
                cls.from_coo(rps, ncols, rows[sel] - lo, cols[sel], vals[sel],
                             **fmt_kwargs)
            )
        self.arrays_np = _unify_plans(shards)
        self.is_seg = isinstance(shards[0].dev, DevSeg)
        self.st = _ShardStatics(
            chunk=shards[0].dev.chunk,
            out_blocks=rps // LANES,
            is_seg=self.is_seg,
            nrows=nrows,
            ncols=ncols,
            rows_per_shard=rps,
            n_shards=D,
        )
        self.gather_x = gather_x
        sharded = NamedSharding(mesh, P(self.axis))
        self.arrays = {
            k: jax.device_put(jnp.asarray(v), sharded)
            for k, v in self.arrays_np.items()
        }
        # x table rows, padded so the shard axis divides evenly when sharded.
        self.S = x_table_rows(ncols)
        if gather_x:
            self.S = round_up(self.S, D)
        self._fn = self._build()

    def _build(self):
        st, axis, mesh = self.st, self.axis, self.mesh
        gather_x = self.gather_x
        names = list(self.arrays)

        def shard_fn(x_local, *plan):
            a = dict(zip(names, (p[0] for p in plan)))
            if gather_x:
                x2d = jax.lax.all_gather(x_local, axis, axis=0, tiled=True)
            else:
                x2d = x_local
            if st.is_seg:
                y = segmented_spmv(
                    a["vals"], a["loc"], a["gidx"], a["pidx"],
                    a["sub_block"], a["sub_base"], x2d,
                    chunk=st.chunk, out_blocks=st.out_blocks)
            else:
                y = panel_spmv(
                    a["vals"], a["loc"], a["sub_block"], a["sub_base"], x2d,
                    chunk=st.chunk, out_blocks=st.out_blocks)
            return y

        xspec = P(axis, None) if gather_x else P()
        fn = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(xspec,) + (P(axis),) * len(names),
            out_specs=P(axis, None),
            check_vma=False,  # pallas_call out_shape carries no vma info
        )
        return jax.jit(fn)

    def matvec(self, x):
        xf = jnp.asarray(x, jnp.float32).reshape(-1)
        if xf.shape[0] != self.st.ncols:
            raise ValueError(
                f"x has {xf.shape[0]} entries, matrix has {self.st.ncols} columns")
        xf = jnp.pad(xf, (0, self.S * LANES - xf.shape[0]))
        x2d = xf.reshape(self.S, LANES)
        if self.gather_x:
            x2d = jax.device_put(
                x2d, NamedSharding(self.mesh, P(self.axis, None)))
        y = self._fn(x2d, *self.arrays.values())
        return y.reshape(-1)[: self.st.nrows]

    __matmul__ = matvec


class ColShardedSpmv:
    """y = A·x with A column-partitioned (x sharded, partial-y psum)."""

    def __init__(self, format: str, nrows: int, ncols: int, rows, cols, vals,
                 mesh: Mesh, **fmt_kwargs):
        from spmv_tpu.api import FORMATS

        format = format.lower()
        if format in _PANEL_FORMATS and format != "ell":
            raise NotImplementedError("column-sharded SELL not supported yet")
        cls = FORMATS[format]
        self.format = format
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        D = mesh.shape[self.axis]
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)

        cps = round_up(max(cdiv(ncols, D), LANES), LANES)
        shards = []
        for d in range(D):
            lo, hi = d * cps, (d + 1) * cps
            sel = (cols >= lo) & (cols < hi)
            shards.append(
                cls.from_coo(nrows, cps, rows[sel], cols[sel] - lo, vals[sel],
                             **fmt_kwargs)
            )
        self.arrays_np = _unify_plans(shards)
        self.is_seg = isinstance(shards[0].dev, DevSeg)
        self.st = _ShardStatics(
            chunk=shards[0].dev.chunk,
            out_blocks=cdiv(max(nrows, 1), LANES),
            is_seg=self.is_seg,
            nrows=nrows,
            ncols=ncols,
            rows_per_shard=cps,  # columns per shard, reusing the field
            n_shards=D,
        )
        sharded = NamedSharding(mesh, P(self.axis))
        self.arrays = {
            k: jax.device_put(jnp.asarray(v), sharded)
            for k, v in self.arrays_np.items()
        }
        self.S_local = x_table_rows(cps)
        self.cps = cps
        self._fn = self._build()

    def _build(self):
        st, axis, mesh = self.st, self.axis, self.mesh
        S_local = self.S_local
        names = list(self.arrays)

        def shard_fn(x_local, *plan):
            a = dict(zip(names, (p[0] for p in plan)))
            xf = x_local[0]  # (cps,)
            xf = jnp.pad(xf, (0, S_local * LANES - xf.shape[0]))
            x2d = xf.reshape(S_local, LANES)
            if st.is_seg:
                y = segmented_spmv(
                    a["vals"], a["loc"], a["gidx"], a["pidx"],
                    a["sub_block"], a["sub_base"], x2d,
                    chunk=st.chunk, out_blocks=st.out_blocks)
            else:
                y = panel_spmv(
                    a["vals"], a["loc"], a["sub_block"], a["sub_base"], x2d,
                    chunk=st.chunk, out_blocks=st.out_blocks)
            return jax.lax.psum(y, axis)

        fn = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis, None),) + (P(axis),) * len(names),
            out_specs=P(),
            check_vma=False,  # pallas_call out_shape carries no vma info
        )
        return jax.jit(fn)

    def matvec(self, x):
        xf = jnp.asarray(x, jnp.float32).reshape(-1)
        if xf.shape[0] != self.st.ncols:
            raise ValueError(
                f"x has {xf.shape[0]} entries, matrix has {self.st.ncols} columns")
        D = self.st.n_shards
        xf = jnp.pad(xf, (0, D * self.cps - xf.shape[0]))
        xs = jax.device_put(
            xf.reshape(D, self.cps),
            NamedSharding(self.mesh, P(self.axis, None)),
        )
        y = self._fn(xs, *self.arrays.values())
        return y.reshape(-1)[: self.st.nrows]

    __matmul__ = matvec
