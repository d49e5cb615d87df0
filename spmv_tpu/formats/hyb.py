"""HYB — hybrid ELL + spill format (framework extension, beyond the
reference's five formats).

The classic hybrid of ELLPACK-style dense padding with a coordinate
overflow list (cuSPARSE's HYB).  TPU-native version: per (128-row block,
128-col stripe) the mini-panel width is capped at the byte-cost-optimal
point and the overflow elements spill into engine 2's segmented stream;
the builder prices all three shapes (pure panel / hybrid / pure spill)
and keeps the cheapest — the cap model, pricing and rationale live in
``formats.split`` (round 4: the same lowering now also backs ELL and
SELL-C-σ by default; HYB remains the format whose *semantics* are the
split).

``matvec`` runs the chosen engines and adds the padded partial results —
both produce row-padded (out_rows, 128) y tables, so the combination is
one fused XLA add.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from spmv_tpu.device import DevPanel, DevSeg, x_to_table, y_from_padded
from spmv_tpu.formats.base import DEFAULT_CHUNK, build_panel_plan, build_seg_plan
from spmv_tpu.formats.split import priced_split
from spmv_tpu.kernels.engines import panel_spmv, segmented_spmv

__all__ = ["HybMatrix"]


@dataclass
class HybMatrix:
    nrows: int
    ncols: int
    nnz: int
    panel_nnz: int  # elements kept in the dense panels
    spill_nnz: int  # elements in the segmented overflow stream
    dev: DevPanel = field(repr=False)  # panel part (may be empty)
    dev_spill: DevSeg | None = field(repr=False, default=None)
    plan: object = field(repr=False, default=None)  # PanelPlan
    spill_plan: object = field(repr=False, default=None)  # SegPlan
    # triplets in (block, stripe, row, col) order — the shared to_coo
    # accessor surface (the split mask alone cannot reconstruct them)
    _rows: np.ndarray = field(repr=False, default=None)
    _cols: np.ndarray = field(repr=False, default=None)
    _vals: np.ndarray = field(repr=False, default=None)

    @classmethod
    def from_coo(
        cls,
        nrows: int,
        ncols: int,
        rows: np.ndarray,
        cols: np.ndarray,
        vals: np.ndarray,
        *,
        chunk: int = DEFAULT_CHUNK,
        pack: int | None = None,
        panel_pack: int | None = None,
        bank: bool | None = None,
    ) -> "HybMatrix":
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)
        nnz = rows.size
        if nnz == 0:
            plan = build_panel_plan(rows, cols, vals, nrows, ncols, chunk=chunk,
                                    pack=panel_pack)
            return cls(nrows=nrows, ncols=ncols, nnz=0, panel_nnz=0,
                       spill_nnz=0, dev=DevPanel.from_plan(plan), plan=plan)

        r, c, v, keep, _shape = priced_split(rows, cols, vals, nrows,
                                               ncols)

        plan = build_panel_plan(r[keep], c[keep], v[keep], nrows, ncols,
                                chunk=chunk, pack=panel_pack)
        dev_spill = None
        spill_plan = None
        if (~keep).any():
            # bank=None: the spill sub-matrix auto-prices the two-bank
            # layout (formats.bank) — on scattered matrices the spill IS
            # the matrix and the banked stream wins the modeled time
            spill_plan = build_seg_plan(r[~keep], c[~keep], v[~keep],
                                        nrows, ncols, chunk=chunk, pack=pack,
                                        bank=bank)
            dev_spill = DevSeg.from_plan(spill_plan)
        return cls(
            nrows=nrows, ncols=ncols, nnz=nnz,
            panel_nnz=int(keep.sum()), spill_nnz=int((~keep).sum()),
            dev=DevPanel.from_plan(plan), dev_spill=dev_spill,
            plan=plan, spill_plan=spill_plan,
            _rows=r, _cols=c.astype(np.int32), _vals=v,
        )

    def to_coo(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """``(rows, cols, vals)`` triplets in (block, stripe, row, col)
        order — fresh copies, part of every format's shared accessor
        surface (panel and spill elements interleave back together)."""
        if self._rows is None:
            z = np.zeros(0, np.int64)
            return z, z.copy(), np.zeros(0)
        return (np.array(self._rows, np.int64, copy=True),
                np.array(self._cols, np.int64, copy=True),
                np.array(self._vals, copy=True))

    def padded_matvec(self, x2d):
        if self.dev_spill is None:
            return panel_spmv(self.dev, x2d)
        if self.panel_nnz == 0:
            # pure-spill shape: don't pay a dispatch for an empty panel
            return segmented_spmv(self.dev_spill, x2d)
        yp = panel_spmv(self.dev, x2d)
        ys = segmented_spmv(self.dev_spill, x2d)
        # the two engines' padded y row counts may differ (independent
        # window heights); rows past the true blocks are zero either way
        import jax.numpy as jnp

        n = max(yp.shape[0], ys.shape[0])
        if yp.shape[0] < n:
            yp = jnp.pad(yp, ((0, n - yp.shape[0]), (0, 0)))
        if ys.shape[0] < n:
            ys = jnp.pad(ys, ((0, n - ys.shape[0]), (0, 0)))
        return yp + ys

    def matvec(self, x):
        x2d = x_to_table(x, self.ncols)
        return y_from_padded(self.padded_matvec(x2d), self.nrows)

    __matmul__ = matvec
