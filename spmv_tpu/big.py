"""Beyond-VMEM single-chip SpMV: slab × panel tiling.

The resident-vector design (whole x table + whole y in VMEM,
``device._check_fits``) caps one kernel at ~1.5M rows+cols.  The
reference's only limit was device RAM (``coo.c:116-120`` just mallocs);
this module restores that capability on one chip: the matrix is tiled
into (row slab × column panel) sub-plans — the same decomposition the
ring-sharded layer distributes over a mesh (``dist/ring.py``), executed
here as a sequential jitted loop on one device.  Per slab, a
``lax.fori_loop`` walks the panels, dynamic-indexes the stacked plan
arrays and the HBM-resident x panels, and accumulates the slab's y; only
one panel's x table and one slab's y are VMEM-resident at a time.  Peak
VMEM = streams + O(cps + rps) instead of O(ncols + nrows).

Extra HBM traffic vs the resident design: the slab's x panels re-stream
once per slab (D× for a dense band = the unavoidable cost of not
fitting), plus one (rps,) y write per slab — both tiny next to the plan
streams for the matrices this targets.
"""

from __future__ import annotations

import numpy as np

from spmv_tpu.device import x_table_rows
from spmv_tpu.formats.base import LANES, cdiv, round_up

__all__ = ["TiledSpmv", "fits_single_kernel"]

# keep each sub-kernel's resident vectors comfortably inside the budget
_TILE_VEC_BYTES = 4 * 1024 * 1024


def fits_single_kernel(nrows: int, ncols: int) -> bool:
    from spmv_tpu.device import _VMEM_VECTOR_BUDGET, _vector_bytes

    return _vector_bytes(nrows, ncols) <= _VMEM_VECTOR_BUDGET


class TiledSpmv:
    """y = A·x for matrices beyond the whole-x/whole-y VMEM budget.

    Supports the plan-based formats (csr/coo/cmrs/ell/hyb; sell's σ-sort
    would need a per-slab epilogue — use csr/hyb at this scale)."""

    def __init__(self, format: str, nrows: int, ncols: int, rows, cols,
                 vals, *, slab_rows: int | None = None,
                 panel_cols: int | None = None, **fmt_kwargs):
        import jax.numpy as jnp

        from spmv_tpu.api import FORMATS
        from spmv_tpu.dist.sharded import _ShardStatics, _unify_plans
        from spmv_tpu.formats.base import panel_pack_for, seg_pack_for

        format = format.lower()
        if format in ("bsr", "sell", "sell_c_sigma"):
            raise NotImplementedError(
                "tiled BSR/SELL not supported; use csr/coo/cmrs/ell/hyb")
        self.format = format
        self.is_hyb = format == "hyb"
        cls = FORMATS[format]
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)

        cap = _TILE_VEC_BYTES // 4  # f32 slots for one slab + one panel
        rps = slab_rows or min(round_up(max(cdiv(nrows, 1), LANES), LANES),
                               round_up(cap // 2, LANES))
        cps = panel_cols or min(round_up(max(ncols, LANES), LANES),
                                round_up(cap // 2, LANES))
        rps = round_up(min(rps, round_up(nrows, LANES)), LANES)
        cps = round_up(min(cps, round_up(ncols, LANES)), LANES)
        DR = cdiv(nrows, rps)
        DC = cdiv(ncols, cps)
        self.rps, self.cps, self.DR, self.DC = rps, cps, DR, DC

        if format in ("csr", "coo", "cmrs") and "pack" not in fmt_kwargs:
            fmt_kwargs = dict(fmt_kwargs,
                              pack=seg_pack_for(rows, cols, nrows, ncols))
        elif format == "ell" and "pack" not in fmt_kwargs:
            fmt_kwargs = dict(fmt_kwargs,
                              pack=panel_pack_for(rows, cols, nrows, ncols))
        elif self.is_hyb:
            fmt_kwargs = dict(fmt_kwargs)
            fmt_kwargs.setdefault("pack",
                                  seg_pack_for(rows, cols, nrows, ncols))
            fmt_kwargs.setdefault("panel_pack",
                                  panel_pack_for(rows, cols, nrows, ncols))

        shards = []
        for d in range(DR):
            for j in range(DC):
                sel = ((rows >= d * rps) & (rows < (d + 1) * rps)
                       & (cols >= j * cps) & (cols < (j + 1) * cps))
                shards.append(cls.from_coo(
                    rps, cps, rows[sel] - d * rps, cols[sel] - j * cps,
                    vals[sel], **fmt_kwargs))
        arrays, chunk, ns, self.is_seg, pack, w_rows, out_rows = \
            _unify_plans([s.plan for s in shards])
        self.st_spill = None
        if self.is_hyb:
            from spmv_tpu.formats.base import _empty_seg

            spill = [s.spill_plan if s.spill_plan is not None
                     else _empty_seg(rps, cps, chunk, fmt_kwargs["pack"])
                     for s in shards]
            (sp_arrays, sp_chunk, sp_ns, _, sp_pack, sp_w,
             sp_out) = _unify_plans(spill)
            arrays.update({f"sp_{k}": v for k, v in sp_arrays.items()})
            self.st_spill = _ShardStatics(
                chunk=sp_chunk, ns=sp_ns, is_seg=True, is_row=True,
                nrows=nrows, ncols=ncols, rows_per_shard=rps, n_shards=DC,
                pack=sp_pack, w_rows=sp_w, out_rows=sp_out)
        # (DR·DC, ...) → (DR, DC, ...): slab-major stacking
        self.arrays = {k: jnp.asarray(v.reshape(DR, DC, *v.shape[1:]))
                       for k, v in arrays.items()}
        self.st = _ShardStatics(
            chunk=chunk, ns=ns, is_seg=self.is_seg, is_row=True,
            nrows=nrows, ncols=ncols, rows_per_shard=rps, n_shards=DC,
            pack=pack, w_rows=w_rows, out_rows=out_rows)
        self.nnz = rows.size
        self.S_local = x_table_rows(cps)
        self._slab_fn = self._build()

    def _build(self):
        import jax
        import jax.numpy as jnp

        from spmv_tpu.dist.sharded import _make_dev
        from spmv_tpu.kernels.engines import panel_spmv, segmented_spmv

        st, st_spill = self.st, self.st_spill
        DC, nb = self.DC, self.rps // LANES
        names = list(self.arrays)

        @jax.jit
        def slab_fn(x_panels, *slab_arrays):
            # x_panels (DC, S_local, 128) HBM-resident; slab arrays are
            # this slab's (DC, ...) plan stacks
            local = dict(zip(names, slab_arrays))

            def step(j, y):
                sub = {n: jax.lax.dynamic_index_in_dim(local[n], j, axis=0,
                                                       keepdims=False)
                       for n in names}
                x2d = jax.lax.dynamic_index_in_dim(x_panels, j, axis=0,
                                                   keepdims=False)
                dev = _make_dev(sub, st)
                part = (segmented_spmv(dev, x2d) if st.is_seg
                        else panel_spmv(dev, x2d))[:nb]
                if st_spill is not None:
                    sp = {n[3:]: v for n, v in sub.items()
                          if n.startswith("sp_")}
                    part = part + segmented_spmv(
                        _make_dev(sp, st_spill), x2d)[:nb]
                return y + part

            y0 = jnp.zeros((nb, LANES), jnp.float32)
            return jax.lax.fori_loop(0, DC, step, y0)

        return slab_fn

    def matvec(self, x) -> np.ndarray:
        import jax.numpy as jnp

        xf = np.asarray(x, dtype=np.float32).reshape(-1)
        if xf.shape[0] != self.st.ncols:
            raise ValueError(f"x has {xf.shape[0]} entries, matrix has "
                             f"{self.st.ncols} columns")
        DC, cps, S_local = self.DC, self.cps, self.S_local
        xp = np.zeros((DC, S_local * LANES), dtype=np.float32)
        pad = np.zeros(DC * cps, dtype=np.float32)
        pad[: xf.size] = xf
        xp[:, :cps] = pad.reshape(DC, cps)
        x_panels = jnp.asarray(xp.reshape(DC, S_local, LANES))
        outs = []
        for d in range(self.DR):  # one kernel loop per row slab
            slab = [self.arrays[n][d] for n in self.arrays]
            outs.append(np.asarray(self._slab_fn(x_panels, *slab)))
        y = np.concatenate(outs, axis=0).reshape(-1)
        return y[: self.st.nrows]

    __matmul__ = matvec

    @property
    def nrows(self) -> int:
        return self.st.nrows

    @property
    def ncols(self) -> int:
        return self.st.ncols
