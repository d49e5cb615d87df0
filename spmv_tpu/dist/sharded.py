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

All shards share identical static shapes and one device-stream geometry
(plans padded to the max across shards, then split into the concurrent-DMA
arrays of ``spmv_tpu.device``), so one jitted shard_map serves every
device.  Works on a CPU mesh (``--xla_force_host_platform_device_count``)
with the kernels in interpret mode — that is how the tests and the
driver's multi-chip dry run execute.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from spmv_tpu.device import (
    DevPanel,
    DevSeg,
    pick_geometry,
    seg_kva,
    split_packed_arrays,
    window_span,
    x_table_rows,
)
from spmv_tpu.formats.base import (
    LANES,
    cdiv,
    panel_pack_for,
    round_up,
    seg_pack_for,
)
from spmv_tpu.kernels.engines import (
    inverse_permute_blocks,
    panel_spmv,
    segmented_spmv,
)

__all__ = ["RowShardedSpmv", "ColShardedSpmv"]

_PANEL_FORMATS = {"ell", "sell", "sell_c_sigma"}
# BSR's plan-less block-dense container cannot ride the stream unifier; it
# stays single-chip (use spmm there).  HYB row-shards as a two-part plan.
_UNSUPPORTED = {"bsr"}


def put_sharded(v, sharding):
    """Place a host array as a (possibly multi-process) global jax.Array.

    ``jax.device_put`` cannot target non-addressable devices; with the
    callback form each process materializes only its own shards, so the
    same code path serves single-process meshes and true multi-host runs
    brought up via ``mesh.init_distributed`` (every process holds the same
    deterministic host copy, so slicing by index is consistent)."""
    v = jnp.asarray(v)
    return jax.make_array_from_callback(v.shape, sharding,
                                        lambda idx: v[idx])


def _pad_rows(arr: np.ndarray, target: int) -> np.ndarray:
    if arr.shape[0] == target:
        return arr
    pad = [(0, target - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def _unify_plans(plans):
    """Pad per-shard plan arrays to one shape, pick a common device-stream
    geometry, split, and stack shard-major.  Pad rows are inert all-zero
    rows (they accumulate 0 into their window base).  Seg plans must share
    one pack P — the Spmv constructors choose it globally via
    ``seg_pack_for`` and pass it to every shard build; the windowed
    y-reduction height ``w_rows`` is likewise the max over shards so one
    jitted kernel serves every device."""
    is_seg = hasattr(plans[0], "gidx")
    packs = {p.pack for p in plans}
    assert len(packs) == 1, f"shards disagree on pack: {packs}"
    pack = plans[0].pack
    names = ["vals", "lo", "hi"] + (["gidx"] if is_seg else [])
    tm = max(p.vals.shape[0] for p in plans)
    chunk, ns = pick_geometry(tm, pack, seg=is_seg,
                              nrows=plans[0].nrows, ncols=plans[0].ncols)
    tm_dev = round_up(max(tm, chunk * ns), chunk * ns)
    from spmv_tpu.formats.base import SUBLANES, W_ALIGN

    w_common = max(
        round_up(max(window_span(p.row_block, tm_dev, chunk)
                     for p in plans), W_ALIGN), SUBLANES)
    stacked: dict[str, list] = {}
    statics = {}
    for p in plans:
        arrays = {n: _pad_rows(getattr(p, n), tm) for n in names}
        arrays["row_block"] = p.row_block
        arrays["sub_base"] = p.sub_base
        split = split_packed_arrays(arrays, chunk, ns, pack, seg=is_seg,
                                    nrows=p.nrows, w_rows=w_common)
        statics["w_rows"] = split.pop("w_rows")
        statics["out_rows"] = split.pop("out_rows")
        for k, v in split.items():
            stacked.setdefault(k, []).append(v)
    return ({k: np.stack(v) for k, v in stacked.items()}, chunk, ns, is_seg,
            pack, statics["w_rows"], statics["out_rows"])


def _make_dev(arrays: dict, statics: "_ShardStatics"):
    """Rebuild a Dev container from per-shard array slices (jit-traceable)."""
    def tup(name, k):
        return tuple(arrays[f"{name}{j}"] for j in range(k))

    ns, pack = statics.ns, statics.pack
    kva = seg_kva(pack, ns)
    common = dict(vals=tup("vals", pack * kva), lo=tup("lo", pack),
                  hi=arrays["hi"], meta=arrays["meta"],
                  base_w=arrays["base_w"], sub_base=arrays["sub_base"],
                  chunk=statics.chunk, ns=ns, pack=pack,
                  w_rows=statics.w_rows, out_rows=statics.out_rows,
                  nrows=statics.rows_per_shard if statics.is_row else statics.nrows,
                  ncols=statics.ncols, nnz=0)
    if statics.is_seg:
        return DevSeg(gidx=arrays["gidx"], **common)
    return DevPanel(**common)


@dataclass
class _ShardStatics:
    chunk: int
    ns: int
    is_seg: bool
    is_row: bool
    nrows: int
    ncols: int
    rows_per_shard: int
    n_shards: int
    pack: int = 1
    w_rows: int = 8
    out_rows: int = 8


class RowShardedSpmv:
    """y = A·x with A row-partitioned over ``mesh``'s single axis.

    SELL-C-σ shards sort and unpermute their row slabs locally (the σ-sort
    never crosses a slab boundary because σ ≤ 1024 ≤ the slab size)."""

    def __init__(self, format: str, nrows: int, ncols: int, rows, cols, vals,
                 mesh: Mesh, *, gather_x: bool = True, **fmt_kwargs):
        from spmv_tpu.api import FORMATS

        format = format.lower()
        if format in _UNSUPPORTED:
            raise NotImplementedError(
                "sharded BSR not supported (block-dense container); "
                "shard csr/coo/cmrs/ell/sell/hyb instead")
        cls = FORMATS[format]
        self.is_sell = format in ("sell", "sell_c_sigma")
        self.is_hyb = format == "hyb"
        self.format = format
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        D = mesh.shape[self.axis]
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols)
        vals = np.asarray(vals)

        # Every shard must build with the same packed-engine P — choose it
        # once from the full matrix's segment/width histograms.
        if format in ("csr", "coo", "cmrs") and "pack" not in fmt_kwargs:
            fmt_kwargs = dict(fmt_kwargs,
                              pack=seg_pack_for(rows, cols, nrows, ncols))
        elif format in _PANEL_FORMATS and "pack" not in fmt_kwargs:
            fmt_kwargs = dict(fmt_kwargs,
                              pack=panel_pack_for(rows, cols, nrows, ncols))
        elif format == "hyb":
            fmt_kwargs = dict(fmt_kwargs)
            fmt_kwargs.setdefault("pack", seg_pack_for(rows, cols, nrows, ncols))
            fmt_kwargs.setdefault("panel_pack",
                                  panel_pack_for(rows, cols, nrows, ncols))

        rps = round_up(max(cdiv(nrows, D), LANES), LANES)
        shards = []
        for d in range(D):
            lo, hi = d * rps, (d + 1) * rps
            sel = (rows >= lo) & (rows < hi)
            shards.append(
                cls.from_coo(rps, ncols, rows[sel] - lo, cols[sel], vals[sel],
                             **fmt_kwargs)
            )
        arrays, chunk, ns, self.is_seg, pack, w_rows, out_rows = _unify_plans(
            [s.plan for s in shards])
        self.st_spill = None
        if self.is_hyb:
            # HYB is a two-part plan: the panel part unified above, the
            # segmented spill part unified separately (its own geometry).
            from spmv_tpu.formats.base import _empty_seg

            spill = [s.spill_plan if s.spill_plan is not None
                     else _empty_seg(rps, ncols, chunk, fmt_kwargs["pack"])
                     for s in shards]
            (sp_arrays, sp_chunk, sp_ns, _, sp_pack, sp_w,
             sp_out) = _unify_plans(spill)
            arrays.update({f"sp_{k}": v for k, v in sp_arrays.items()})
            self.st_spill = _ShardStatics(
                chunk=sp_chunk, ns=sp_ns, is_seg=True, is_row=True,
                nrows=nrows, ncols=ncols, rows_per_shard=rps, n_shards=D,
                pack=sp_pack, w_rows=sp_w, out_rows=sp_out,
            )
        if self.is_sell:
            # per-shard epilogue metadata: every shard has the same row
            # count, so the shapes already agree.
            arrays["perm_whi"] = np.stack(
                [np.asarray(s._perm_whi) for s in shards])
            arrays["perm_idx"] = np.stack(
                [np.asarray(s._perm_idx) for s in shards])
        self.st = _ShardStatics(
            chunk=chunk, ns=ns, is_seg=self.is_seg, is_row=True,
            nrows=nrows, ncols=ncols, rows_per_shard=rps, n_shards=D,
            pack=pack, w_rows=w_rows, out_rows=out_rows,
        )
        self.gather_x = gather_x
        sharded = NamedSharding(mesh, P(self.axis))
        self.arrays = {
            k: put_sharded(v, sharded) for k, v in arrays.items()
        }
        # x table rows, padded so the shard axis divides evenly when sharded.
        self.S = x_table_rows(ncols)
        if gather_x:
            self.S = round_up(self.S, D)
        self._fn = self._build()

    def _build(self):
        st, axis, mesh = self.st, self.axis, self.mesh
        st_spill = self.st_spill
        gather_x = self.gather_x
        is_sell = self.is_sell
        names = list(self.arrays)
        nb = st.rows_per_shard // LANES

        def shard_fn(x_local, *plan):
            a = dict(zip(names, (p[0] for p in plan)))
            if gather_x:
                x2d = jax.lax.all_gather(x_local, axis, axis=0, tiled=True)
            else:
                x2d = x_local
            dev = _make_dev(a, st)
            if st.is_seg:
                # slice to the shard's true blocks: out_rows ≥ nb and the
                # shards concatenate along rows in the global y
                return segmented_spmv(dev, x2d)[:nb]
            y = panel_spmv(dev, x2d)
            if st_spill is not None:  # HYB: add the segmented spill partial
                sp = {k[3:]: v for k, v in a.items() if k.startswith("sp_")}
                ys = segmented_spmv(_make_dev(sp, st_spill), x2d)
                n = max(y.shape[0], ys.shape[0])
                if y.shape[0] < n:
                    y = jnp.pad(y, ((0, n - y.shape[0]), (0, 0)))
                if ys.shape[0] < n:
                    ys = jnp.pad(ys, ((0, n - ys.shape[0]), (0, 0)))
                y = y + ys
            y = y[:nb]
            if is_sell:
                y2 = y
                if nb < 8:  # epilogue windows always slice 8 table rows
                    y2 = jnp.pad(y2, ((0, 8 - nb), (0, 0)))
                y = inverse_permute_blocks(a["perm_whi"], a["perm_idx"],
                                           y2)[:, : nb * LANES]
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
            x2d = put_sharded(
                x2d, NamedSharding(self.mesh, P(self.axis, None)))
        y = self._fn(x2d, *self.arrays.values())
        return y.reshape(-1)[: self.st.nrows]

    __matmul__ = matvec

    @property
    def nrows(self) -> int:
        return self.st.nrows

    @property
    def ncols(self) -> int:
        return self.st.ncols

    def spmm(self, X):
        """Row-sharded SpMM: Y = A @ X for X (ncols, R) — per-shard
        matmat, each column's y sharded over the mesh like ``matvec``
        (the R dispatches pipeline; see ``api.spmm`` for why a fused
        multi-RHS kernel measured slower than the column loop)."""
        from spmv_tpu.api import spmm as _spmm

        return _spmm(self, X)


class ColShardedSpmv:
    """y = A·x with A column-partitioned (x sharded, partial-y psum).

    SELL-C-σ needs ONE row permutation shared by every column shard (each
    shard sorting its own slab would psum incompatibly-permuted partials),
    so the σ-sort runs globally here (``sigma_sort_tables``), the shards
    build panel plans over the pre-permuted rows, and the unpermute
    epilogue runs once on the psum'd full y.  HYB shards as a two-part
    plan like ``RowShardedSpmv``."""

    def __init__(self, format: str, nrows: int, ncols: int, rows, cols, vals,
                 mesh: Mesh, **fmt_kwargs):
        from spmv_tpu.api import FORMATS

        format = format.lower()
        if format in _UNSUPPORTED:
            raise NotImplementedError(
                "column-sharded BSR not supported (block-dense container); "
                "shard csr/coo/cmrs/ell/sell/hyb instead")
        self.is_sell = format in ("sell", "sell_c_sigma")
        self.is_hyb = format == "hyb"
        cls = FORMATS[format]
        self.format = format
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        D = mesh.shape[self.axis]
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)

        if format in ("csr", "coo", "cmrs") and "pack" not in fmt_kwargs:
            fmt_kwargs = dict(fmt_kwargs,
                              pack=seg_pack_for(rows, cols, nrows, ncols))
        elif format in _PANEL_FORMATS and "pack" not in fmt_kwargs:
            fmt_kwargs = dict(fmt_kwargs,
                              pack=panel_pack_for(rows, cols, nrows, ncols))
        elif format == "hyb":
            fmt_kwargs = dict(fmt_kwargs)
            fmt_kwargs.setdefault("pack",
                                  seg_pack_for(rows, cols, nrows, ncols))
            fmt_kwargs.setdefault("panel_pack",
                                  panel_pack_for(rows, cols, nrows, ncols))

        self._perm_whi = self._perm_idx = None
        y_rows = nrows
        if self.is_sell:
            from spmv_tpu.formats.sell import DEFAULT_SIGMA, sigma_sort_tables

            sigma = fmt_kwargs.pop("sigma", None) or DEFAULT_SIGMA
            rows, sorted_, _perm, whi, idx, y_rows = sigma_sort_tables(
                rows, cols, nrows, ncols, sigma)
            if sorted_:
                self._perm_whi = jnp.asarray(whi)
                self._perm_idx = jnp.asarray(idx)
            cls = FORMATS["ell"]  # shards: plain panels over sorted rows
            fmt_kwargs.pop("pack", None)
            fmt_kwargs["pack"] = panel_pack_for(rows, cols, y_rows, ncols)
        cps = round_up(max(cdiv(ncols, D), LANES), LANES)
        shards = []
        for d in range(D):
            lo, hi = d * cps, (d + 1) * cps
            sel = (cols >= lo) & (cols < hi)
            shards.append(
                cls.from_coo(y_rows, cps, rows[sel], cols[sel] - lo,
                             vals[sel], **fmt_kwargs)
            )
        arrays, chunk, ns, self.is_seg, pack, w_rows, out_rows = _unify_plans(
            [s.plan for s in shards])
        self.st_spill = None
        if self.is_hyb:
            from spmv_tpu.formats.base import _empty_seg

            spill = [s.spill_plan if s.spill_plan is not None
                     else _empty_seg(nrows, cps, chunk, fmt_kwargs["pack"])
                     for s in shards]
            (sp_arrays, sp_chunk, sp_ns, _, sp_pack, sp_w,
             sp_out) = _unify_plans(spill)
            arrays.update({f"sp_{k}": v for k, v in sp_arrays.items()})
            self.st_spill = _ShardStatics(
                chunk=sp_chunk, ns=sp_ns, is_seg=True, is_row=False,
                nrows=nrows, ncols=ncols, rows_per_shard=cps, n_shards=D,
                pack=sp_pack, w_rows=sp_w, out_rows=sp_out,
            )
        self.st = _ShardStatics(
            chunk=chunk, ns=ns, is_seg=self.is_seg, is_row=False,
            nrows=y_rows, ncols=ncols, rows_per_shard=cps, n_shards=D,
            pack=pack, w_rows=w_rows, out_rows=out_rows,
        )
        self.true_nrows = nrows
        sharded = NamedSharding(mesh, P(self.axis))
        self.arrays = {
            k: put_sharded(v, sharded) for k, v in arrays.items()
        }
        self.S_local = x_table_rows(cps)
        self.cps = cps
        self._fn = self._build()

    def _build(self):
        st, axis, mesh = self.st, self.axis, self.mesh
        st_spill = self.st_spill
        S_local = self.S_local
        names = list(self.arrays)
        nb = cdiv(st.nrows, LANES)

        def shard_fn(x_local, *plan):
            a = dict(zip(names, (p[0] for p in plan)))
            xf = x_local[0]  # (cps,)
            xf = jnp.pad(xf, (0, S_local * LANES - xf.shape[0]))
            x2d = xf.reshape(S_local, LANES)
            dev = _make_dev(a, st)
            if st.is_seg:
                y = segmented_spmv(dev, x2d)[:nb]
            else:
                y = panel_spmv(dev, x2d)
                if st_spill is not None:  # HYB: add the segmented spill
                    sp = {k[3:]: v for k, v in a.items()
                          if k.startswith("sp_")}
                    ys = segmented_spmv(_make_dev(sp, st_spill), x2d)
                    n = max(y.shape[0], ys.shape[0])
                    if y.shape[0] < n:
                        y = jnp.pad(y, ((0, n - y.shape[0]), (0, 0)))
                    if ys.shape[0] < n:
                        ys = jnp.pad(ys, ((0, n - ys.shape[0]), (0, 0)))
                    y = y + ys
                y = y[:nb]
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
        xs = put_sharded(
            xf.reshape(D, self.cps),
            NamedSharding(self.mesh, P(self.axis, None)),
        )
        y = self._fn(xs, *self.arrays.values())
        if self._perm_whi is not None:
            # SELL: one unpermute epilogue on the full (replicated) y table
            if y.shape[0] < 8:  # epilogue windows always slice 8 rows
                y = jnp.pad(y, ((0, 8 - y.shape[0]), (0, 0)))
            y = inverse_permute_blocks(self._perm_whi, self._perm_idx, y)
        return y.reshape(-1)[: self.true_nrows]

    __matmul__ = matvec

    @property
    def nrows(self) -> int:
        return self.true_nrows

    @property
    def ncols(self) -> int:
        return self.st.ncols

    def spmm(self, X):
        """Column-sharded SpMM: one psum'd matvec per RHS column."""
        from spmv_tpu.api import spmm as _spmm

        return _spmm(self, X)
