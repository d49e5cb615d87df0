"""Byte-priced panel/spill splitting — shared lowering logic.

Every panel-engine format pays layout quantization: per (128-row block,
128-col stripe) all 128 lanes pad to the block's max per-row count in the
stripe, and on matrices with randomized column fill that max-statistic
costs 1.6-2.4× padding (the gap the round-3 verdict flagged on ELL/SELL).
A *structurally finer* cap (per 8/32-row group) cannot help: with the
two-step x-gather, ``hi`` is evaluated at the **target** lane ``lo``, so a
sublane row mixing stripes would demand conflicting ``hi`` values at shared
target lanes — see docs/DESIGN.md fact 14 (the recorded dead end).  The
freed slots of a narrower cap are only reusable across stripes, which that
exactness condition forbids.

What does work is *routing*: cap the mini-panel width at the
byte-cost-optimal point per (block, stripe) and spill the tail into engine
2's dense segmented stream —

    cost(cap) = _PANEL_B · 128 · cap  +  _SPILL_B · Σ_r max(0, n_r − cap)

is minimized at the smallest cap where at most 128·_PANEL_B/_SPILL_B of
the block's 128 rows still exceed it, computed exactly per (block, stripe)
from the row-count histogram.  The builder prices all three shapes
(pure panel / hybrid / pure spill) with the byte model plus per-kernel
dispatch overhead and keeps the cheapest, so a panel format's streamed
bytes can never exceed the panel/segmented break-even — on panel-friendly
matrices (FEM stencils, block fill) it keeps the cheaper pure panels, on
scattered ones it degrades gracefully to the dense stream.

Used by HYB (its defining behavior, ``formats.hyb``) and — round 4 — as
the default device lowering of ELL and SELL-C-σ (their *format* semantics,
classical arrays and stats are untouched; only the execution plan routes).
cuSPARSE's ELL→HYB auto-conversion is the precedent.
"""

from __future__ import annotations

import numpy as np

from spmv_tpu.formats.base import LANES, cdiv

__all__ = ["priced_split", "PANEL_B", "SPILL_B"]

PANEL_B = 5.25  # bytes per P=4 packed panel slot ((4P+P+1)/P)
# bytes per spilled element: P=4 segmented slot (5P+2)/P = 5.5 plus ~15 %
# quad/fragment padding of the clipped tails
SPILL_B = 6.3
_DISPATCH_S = 12e-6  # measured extra pallas_call dispatch+drain, one v5e
_BW = 600e9  # in-engine streaming rate both engines sustain (DESIGN.md)


def _optimal_caps(counts: np.ndarray, pair_id: np.ndarray,
                  npairs: int) -> np.ndarray:
    """Per-(block,stripe) width cap minimizing panel+spill bytes.

    ``counts[i]`` is the element count of (row, pair) group ``i`` belonging
    to pair ``pair_id[i]``.  cost(cap+1) − cost(cap) =
    128·PANEL_B − SPILL_B·H(cap) with H(c) = #rows of the pair whose
    count exceeds c, so the optimum is the smallest cap with
    H(cap) ≤ 128·PANEL_B/SPILL_B.
    """
    thresh = int(LANES * PANEL_B / SPILL_B)
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
    return ((panel_slots * PANEL_B + spill_elems * SPILL_B) / _BW
            + n_engines * _DISPATCH_S)


def priced_split(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                 nrows: int, ncols: int):
    """Choose the byte-optimal panel/spill split of a triplet set.

    Returns ``(r, c, v, keep, shape)``: the triplets sorted
    (block, stripe, row, col)-major, a boolean mask of the elements kept
    in the panel part, and the chosen shape (``"panel"``, ``"hyb"`` or
    ``"spill"``).  ``keep`` is all-True / all-False for the pure shapes —
    a matrix too small to amortize a second kernel dispatch collapses to
    a single engine.
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)
    nnz = rows.size
    if nnz == 0:
        return rows, cols, vals, np.ones(0, dtype=bool), "panel"

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

    # Price the three shapes (byte model + dispatch overhead) and keep the
    # cheapest — the split must never be slower than the engines it
    # combines just because the matrix is too small to amortize a second
    # kernel launch.
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
    shape = min((t_hyb, "hyb"), (t_panel, "panel"), (t_spill, "spill"))[1]
    if shape == "panel":
        keep = np.ones(nnz, dtype=bool)
    elif shape == "spill":
        keep = np.zeros(nnz, dtype=bool)
    return r, c, v, keep, shape
