"""Pooled (per-lane ``hi``) segmented-plan packing — round 5.

The classic ``build_seg_plan`` layout quantizes every (128-row block,
128-col stripe) run up to whole 127-quad sublane rows, which is the
dominant padding on band/FEM matrices whose blocks touch many stripes
with partially-filled runs (synthetic cant at P=4: 10.3k quantized rows
vs the 7.8k element bound — DESIGN.md fact 15 measured the per-run quad
share; the per-run ROW share is what this module removes).

The kernels' two-step x-gather reads ``hi`` per LANE —
``T[r,c] = win[hi[r,c], c]`` then a lane gather at ``lo``
(``kernels.engines._packed_products``) — so a sublane row may mix the
stripes of one aligned 8-stripe window as long as its lane→stripe map is
a *function* (every element with in-stripe column ℓ in the row agrees on
the stripe at lane ℓ).  The classic layout is the special case of a
constant map.

Pooled layout: pools = (block, aligned 8-stripe window), rows emitted in
(window, block) order (groups stay window-pure, and on banded matrices a
window's blocks span ≪ W_CAP).  Within a pool the walk places pieces
(lid × stripe element groups) in lid order — consecutive pieces of one
lid merge into a single gidx segment — defers lane-map conflicts to a
fresh pass, and follows ``_pack_run_slots``'s quad rules at segment
boundaries.  Measured (scripts/sim_pool.py): synthetic cant P=4 drops
1.58× → 1.32× padding (−17 % quads and bytes); the scattered power-law
class conflicts at 80-160 % and keeps the classic layout (the pricer
decides per matrix).

No kernel changes: the plan is a valid ``SegPlan`` stream.
"""

from __future__ import annotations

import numpy as np

from spmv_tpu.formats.base import (
    LANES,
    ROW_CAP,
    SUBLANES,
    SegPlan,
    _emit_rows,
    _run_heads,
    cdiv,
    x_stripes,
)

__all__ = ["pool_walk", "build_seg_plan_pooled", "price_layouts",
           "pick_pack_pooled", "WINDOW_STRIPES"]

WINDOW_STRIPES = SUBLANES  # stripes per pool window = x-window height


def _pool_walk_py(pool_id, lid, stp, lo, pack: int):
    """NumPy fallback of ``native/plan_group.cpp:spmv_pool_pack`` —
    identical semantics, piece-vectorized (tests pin native/fallback
    parity).  Elements sorted by (pool, lid, stripe, col)."""
    n = pool_id.size
    cap = pack * ROW_CAP
    erow = np.empty(n, dtype=np.int64)
    slot = np.empty(n, dtype=np.int64)
    msb = np.zeros(n, dtype=np.uint8)
    row_pool: list[int] = []

    # piece boundaries (maximal same-(pool, lid, stripe) runs)
    key_head = np.ones(n, dtype=bool)
    key_head[1:] = ((pool_id[1:] != pool_id[:-1])
                    | (lid[1:] != lid[:-1]) | (stp[1:] != stp[:-1]))
    piece_starts = np.flatnonzero(key_head)
    piece_ends = np.append(piece_starts[1:], n)

    pool_head = np.ones(piece_starts.size, dtype=bool)
    pool_head[1:] = (pool_id[piece_starts[1:]]
                     != pool_id[piece_starts[:-1]])
    pstart_of_pool = np.flatnonzero(pool_head)
    pend_of_pool = np.append(pstart_of_pool[1:], piece_starts.size)

    r = 0
    for pp0, pp1 in zip(pstart_of_pool, pend_of_pool):
        pool = int(pool_id[piece_starts[pp0]])
        # pending pieces as (lid, stripe, element-index array)
        pending = [(int(lid[piece_starts[q]]), int(stp[piece_starts[q]]),
                    np.arange(piece_starts[q], piece_ends[q]))
                   for q in range(pp0, pp1)]
        while pending:
            nxt = []
            mp = np.full(LANES, -1, dtype=np.int64)
            prev_end = -1
            prev_lid = -1
            row_open = False
            for l0, s0, eidx in pending:
                lov = lo[eidx]
                ok = (mp[lov] == -1) | (mp[lov] == s0)
                good = eidx[ok]
                bad = eidx[~ok]
                m = good.size
                if m:
                    f = prev_end + 1
                    if l0 != prev_lid:
                        if f % pack and (
                                (f + m - 1) // pack == prev_end // pack
                                or (f // pack) % ROW_CAP == ROW_CAP - 1):
                            f = (prev_end // pack + 1) * pack
                    shared_quad = (f // pack
                                   if l0 != prev_lid and f % pack else -1)
                    placed = 0
                    while placed < m:
                        if f >= cap:
                            if row_open:
                                row_pool.append(pool)
                                r += 1
                                row_open = False
                            mp[:] = -1
                            f = 0
                            prev_end = -1
                            shared_quad = -1
                        row_open = True
                        take = min(cap - f, m - placed)
                        part = good[placed:placed + take]
                        erow[part] = r
                        slot[part] = f + np.arange(take)
                        if shared_quad >= 0:
                            sl = slot[part]
                            msb[part] = (sl // pack == shared_quad
                                         ).astype(np.uint8)
                            if (f + take) // pack > shared_quad:
                                shared_quad = -1
                        mp[lo[part]] = s0
                        prev_end = f + take - 1
                        f = prev_end + 1
                        placed += take
                    prev_lid = l0
                if bad.size:
                    nxt.append((l0, s0, bad))
            if row_open:
                row_pool.append(pool)
                r += 1
            pending = nxt
    return erow, slot, msb, np.asarray(row_pool, dtype=np.int64)


def pool_walk(pool_id, lid, stp, lo, pack: int):
    """Pooled packing walk (native C++ when available, NumPy fallback).
    Returns ``(erow, slot, msb, row_pool)`` for elements sorted by
    (pool, lid, stripe, col)."""
    from spmv_tpu.formats import native_group

    nat = native_group.pool_pack(pool_id, lid, stp, lo, pack)
    if nat is not None:
        return nat
    return _pool_walk_py(pool_id, lid, stp, lo, pack)


def _sorted_pool_views(rows, cols, ncols: int):
    """Sort triplets by (window, block, lid, stripe, col) and derive the
    walk's key arrays.  (window, block) pool order keeps every aligned
    8-row group window-pure and, on banded matrices, every 128-row stream
    window's block span small."""
    blk = rows >> 7
    stp = cols >> 7
    win = stp // WINDOW_STRIPES
    lid = rows & (LANES - 1)
    order = np.lexsort((cols, stp, lid, blk, win))
    nblk = (int(blk.max()) + 1) if blk.size else 1
    pool_id = win[order] * nblk + blk[order]
    return order, pool_id, lid[order], stp[order], (cols & (LANES - 1))[order]


def pooled_row_count(rows, cols, ncols: int, pack: int) -> int:
    """Sublane rows the pooled walk would emit (pricing helper; excludes
    emission pads, like the classic per-run quantized count)."""
    order, pool_id, lidv, stpv, lov = _sorted_pool_views(rows, cols, ncols)
    _, _, _, row_pool = pool_walk(pool_id, lidv, stpv, lov, pack)
    return int(row_pool.size)


def build_seg_plan_pooled(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    nrows: int,
    ncols: int,
    *,
    chunk: int,
    dtype=np.float32,
    pack: int = 4,
) -> SegPlan:
    """Pack COO triplets into the pooled per-lane-hi segmented stream.
    Produces a standard ``SegPlan`` — same kernels, same dispatch."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)
    nnz = rows.size
    S = x_stripes(ncols)
    P = pack

    order, pool_id, lidv, stpv, lov = _sorted_pool_views(rows, cols, ncols)
    r_s, c_s, v_s = rows[order], cols[order], vals[order]
    erow, slot, msb, row_pool = pool_walk(pool_id, lidv, stpv, lov, P)

    # per emitted row: y block and window base stripe (the row's stp for
    # emission — the ≥8 span check then separates windows exactly, and
    # sub_base = clamp(window base) keeps every per-lane hi in [0, 8))
    nblk = (int((rows >> 7).max()) + 1) if nnz else 1
    row_blk_raw = row_pool % nblk
    row_base_raw = (row_pool // nblk) * WINDOW_STRIPES

    row_of, row_blk, row_stp, sub_base, TM = _emit_rows(
        row_blk_raw, row_base_raw, S, chunk)
    erow_f = row_of[erow]
    qpos = 1 + slot // P  # lane 0 is the guaranteed zero pad
    plane = slot % P

    v3d = np.zeros((TM, P, LANES), dtype=dtype)
    lo3d = np.zeros((TM, P, LANES), dtype=np.uint8)
    v3d[erow_f, plane, qpos] = v_s
    lo3d[erow_f, plane, qpos] = ((c_s & (LANES - 1))
                                 | (msb.astype(np.int64) << 7)
                                 ).astype(np.uint8)

    # per-lane hi: default = row's window base offset (pads and unused
    # lanes); element lanes carry their own stripe offset.  The map is
    # functional per row by construction of the walk.
    sb_of_row = sub_base[np.arange(TM) // SUBLANES].astype(np.int64)
    base_hi = row_stp.astype(np.int64) - sb_of_row
    assert base_hi.size == 0 or (0 <= base_hi.min()
                                 and base_hi.max() < SUBLANES)
    hi2d = np.ascontiguousarray(
        np.broadcast_to(base_hi.astype(np.uint8)[:, None], (TM, LANES))
    ).copy()
    hi_e = stpv - sb_of_row[erow_f]
    assert hi_e.size == 0 or (0 <= hi_e.min() and hi_e.max() < SUBLANES)
    hi2d[erow_f, c_s & (LANES - 1)] = hi_e.astype(np.uint8)

    # filled gidx: per (row, lid) the last element's quad position (= max
    # qpos — the walk packs each row's lids in nondecreasing slot order),
    # then a running max along lanes.
    gidx_raw = np.zeros((TM, LANES), dtype=np.uint8)
    np.maximum.at(gidx_raw, (erow_f, r_s & (LANES - 1)),
                  qpos.astype(np.uint8))
    gidx = np.maximum.accumulate(gidx_raw, axis=1)

    return SegPlan(
        vals=v3d, lo=lo3d, hi=hi2d, gidx=gidx,
        row_block=row_blk, sub_base=sub_base,
        nrows=nrows, ncols=ncols, nnz=nnz, chunk=chunk, pack=P,
    )


def pick_pack_pooled(rows, cols, nrows: int, ncols: int) -> int:
    """P minimizing the modeled engine time over the pooled walk's exact
    row counts (forced-pool analog of ``base._pick_pack``)."""
    from spmv_tpu.formats.base import _QUAD_RATE, _STREAM_BW, _pack_sample

    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    if rows.size == 0:
        return 1
    rows, cols = _pack_sample(rows, cols, nrows)
    best_p, best_t = 1, np.inf
    for P in (1, 2, 4):
        q = pooled_row_count(rows, cols, ncols, P) * ROW_CAP
        t = max(q * (5 * P + 2) / _STREAM_BW, q / _QUAD_RATE[P])
        if t < best_t:
            best_p, best_t = P, t
    return best_p


def price_layouts(rows, cols, nrows: int, ncols: int):
    """Choose (layout, P) by the modeled engine time over the EXACT row
    counts of both layouts: classic per-run quantization vs pooled.

    Returns ``(pooled: bool, P: int)``.  The model is the one behind
    ``_pick_pack`` (stream bound 600 GB/s vs the measured per-P quad
    rates); pooled must win by >3 % — the layouts are kernel-identical,
    so ties keep the classic plan (simpler, native-independent).
    """
    from spmv_tpu.formats.base import (_QUAD_RATE, _STREAM_BW, _pack_sample,
                                       _pick_pack)

    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    if rows.size == 0:
        return False, 1
    rows, cols = _pack_sample(rows, cols, nrows)

    # classic: per-run quantized rows at the chooser's P
    nstripes = cdiv(max(ncols, 1), LANES)
    segkey = ((rows >> 7) * nstripes + (cols >> 7)) * (nrows + 1) + rows
    useg, sizes = np.unique(segkey, return_counts=True)
    _, seg_run = np.unique(useg // (nrows + 1), return_inverse=True)
    P_c = _pick_pack(sizes, seg_run)
    nruns = int(seg_run.max()) + 1
    run_els = np.bincount(seg_run, weights=sizes.astype(np.float64),
                          minlength=nruns).astype(np.int64)
    run_nsegs = np.bincount(seg_run, minlength=nruns)
    quads_c = np.maximum(-(-run_els // P_c), run_nsegs)
    rows_c = int(np.sum(-(-quads_c // ROW_CAP)))

    def t_model(nrow, P):
        q = nrow * ROW_CAP
        return max(q * (5 * P + 2) / _STREAM_BW, q / _QUAD_RATE[P])

    t_c = t_model(rows_c, P_c)
    best = (False, P_c, t_c)
    for P in (1, 2, 4):
        # skip hopeless pools early: pooling can only help when the classic
        # rows exceed the element bound meaningfully
        rp = pooled_row_count(rows, cols, ncols, P)
        tp = t_model(rp, P)
        if tp < 0.97 * best[2]:
            best = (True, P, tp)
    return best[0], best[1]
