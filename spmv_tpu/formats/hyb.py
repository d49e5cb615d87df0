"""HYB — hybrid ELL + spill format (framework extension, beyond the
reference's five formats).

The classic hybrid of ELLPACK-style dense padding with a coordinate
overflow list (cuSPARSE's HYB).  TPU-native version: per (128-row block,
128-col stripe) the mini-panel width is capped at the **byte-cost-optimal**
point and the overflow elements spill into engine 2's segmented stream:

    cost(cap) = _PANEL_B · 128 · cap  +  _SPILL_B · Σ_r max(0, n_r − cap)

is minimized at the smallest cap where at most 128·_PANEL_B/_SPILL_B
of the block's 128 rows still exceed it — computed exactly per
(block, stripe) from the row-count histogram.

With both engines P-packed (round 2) the per-byte costs are nearly equal
(panel 5.25 B, spill ~6.3 B per element), so the hybrid's byte savings
are modest — and a second kernel dispatch costs ~_DISPATCH_S.  The
builder therefore prices all three shapes (pure panel / hybrid / pure
spill) with the byte model plus dispatch overhead and keeps the cheapest:
on small matrices HYB collapses to a single engine instead of paying a
dispatch it cannot amortize (round-1's tuned 16 B spill constant was an
artifact of the then-unpacked segmented engine running at 59 % of
roofline; re-swept in round 2 on the packed engines).

``matvec`` runs the chosen engines and adds the padded partial results —
both produce row-padded (out_rows, 128) y tables, so the combination is
one fused XLA add.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from spmv_tpu.device import DevPanel, DevSeg, x_to_table, y_from_padded
from spmv_tpu.formats.base import (
    DEFAULT_CHUNK,
    LANES,
    build_panel_plan,
    build_seg_plan,
    cdiv,
)
from spmv_tpu.kernels.engines import panel_spmv, segmented_spmv

__all__ = ["HybMatrix"]

_PANEL_B = 5.25  # bytes per P=4 packed panel slot ((4P+P+1)/P)
# bytes per spilled element: P=4 segmented slot (5P+2)/P = 5.5 plus ~15 %
# quad/fragment padding of the clipped tails
_SPILL_B = 6.3
_DISPATCH_S = 12e-6  # measured extra pallas_call dispatch+drain, one v5e
_BW = 600e9  # in-engine streaming rate both engines sustain (DESIGN.md)


def _optimal_caps(counts: np.ndarray, pair_id: np.ndarray,
                  npairs: int) -> np.ndarray:
    """Per-(block,stripe) width cap minimizing panel+spill bytes.

    ``counts[i]`` is the element count of (row, pair) group ``i`` belonging
    to pair ``pair_id[i]``.  cost(cap+1) − cost(cap) =
    128·_PANEL_B − _SPILL_B·H(cap) with H(c) = #groups of the pair whose
    count exceeds c, so the optimum is the smallest cap with
    H(cap) ≤ 128·_PANEL_B/_SPILL_B.
    """
    thresh = int(LANES * _PANEL_B / _SPILL_B)
    caps = np.zeros(npairs, dtype=np.int64)
    order = np.lexsort((-counts, pair_id))
    pid_s = pair_id[order]
    cnt_s = counts[order]
    starts = np.searchsorted(pid_s, np.arange(npairs))
    ends = np.searchsorted(pid_s, np.arange(npairs) + 1)
    for p in range(npairs):
        c = cnt_s[starts[p]:ends[p]]  # descending counts of pair p
        # H(cap) = #counts > cap; smallest cap with H(cap) ≤ thresh.  With
        # counts sorted descending that is c[thresh] (0 when fewer than
        # thresh rows are present at all — spill the whole pair).
        caps[p] = int(c[thresh]) if c.size > thresh else 0
    return caps


def _modeled_seconds(panel_slots: int, spill_elems: int,
                     n_engines: int) -> float:
    """Byte-model time of a candidate split: streamed bytes over the
    in-engine rate plus per-kernel dispatch overhead."""
    return ((panel_slots * _PANEL_B + spill_elems * _SPILL_B) / _BW
            + n_engines * _DISPATCH_S)


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

        nstripes = cdiv(max(ncols, 1), LANES)
        blk = rows >> 7
        stp = cols >> 7
        order = np.lexsort((cols, rows, stp, blk))
        r, c, v = rows[order], cols[order], vals[order]

        # rank k of each element within its (row, stripe) group
        gkey = (r >> 7) * (nstripes * LANES) + (c >> 7) * LANES + (r & (LANES - 1))
        head = np.ones(nnz, dtype=bool)
        head[1:] = gkey[1:] != gkey[:-1]
        grp = np.cumsum(head) - 1
        gsizes = np.bincount(grp)
        gstarts = np.zeros(gsizes.size + 1, dtype=np.int64)
        np.cumsum(gsizes, out=gstarts[1:])
        k = np.arange(nnz, dtype=np.int64) - gstarts[grp]

        pkey = (r >> 7) * nstripes + (c >> 7)  # (block, stripe) pair
        upairs, pair_inv = np.unique(pkey[head], return_inverse=True)
        caps = _optimal_caps(gsizes, pair_inv, upairs.size)
        elem_cap = caps[pair_inv[grp]]
        keep = k < elem_cap

        # Price the three shapes (byte model + dispatch overhead) and keep
        # the cheapest — HYB must never be slower than the engines it
        # combines just because the matrix is too small to amortize a
        # second kernel launch.
        pq = 4  # modeling granularity: the packed engines' quad width
        widths = np.zeros(upairs.size, dtype=np.int64)
        np.maximum.at(widths, pair_inv, gsizes)
        panel_pure = int(LANES * (-(-widths // pq) * pq).sum())
        panel_hyb = int(LANES * (-(-caps // pq) * pq).sum())
        spill_hyb = int((~keep).sum())
        t_panel = _modeled_seconds(panel_pure, 0, 1)
        t_spill = _modeled_seconds(0, nnz, 1)
        t_hyb = _modeled_seconds(panel_hyb, spill_hyb,
                                 2 if 0 < spill_hyb < nnz else 1)
        best = min((t_hyb, "hyb"), (t_panel, "panel"), (t_spill, "spill"))[1]
        if best == "panel":
            keep = np.ones(nnz, dtype=bool)
        elif best == "spill":
            keep = np.zeros(nnz, dtype=bool)

        plan = build_panel_plan(r[keep], c[keep], v[keep], nrows, ncols,
                                chunk=chunk, pack=panel_pack)
        dev_spill = None
        spill_plan = None
        if (~keep).any():
            spill_plan = build_seg_plan(r[~keep], c[~keep], v[~keep],
                                        nrows, ncols, chunk=chunk, pack=pack)
            dev_spill = DevSeg.from_plan(spill_plan)
        return cls(
            nrows=nrows, ncols=ncols, nnz=nnz,
            panel_nnz=int(keep.sum()), spill_nnz=int((~keep).sum()),
            dev=DevPanel.from_plan(plan), dev_spill=dev_spill,
            plan=plan, spill_plan=spill_plan,
        )

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
