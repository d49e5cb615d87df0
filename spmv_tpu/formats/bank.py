"""Two-bank pooled segmented packing for the scattered class — round 5.

Fact 16 measured the single-map pooled walk conflict-dead on power-law
matrices: heavy (block, stripe) runs cover ~100 of 128 in-stripe columns,
so any two runs' lane→stripe maps collide and the walk defers 80-160 % of
elements, burning a partially-filled tail row per (pool, pass).  Two
structural changes lift the class off the classic layout's 2.15× padding
(`scripts/sim_bank2.py` / `sim_bank3.py` price every step):

1. **K=2 lane→stripe banks.**  Each sublane row carries TWO per-lane
   stripe maps; a per-element selector bit says which bank's two-step
   gather result feeds the product.  An element conflicts only when BOTH
   banks already map its lane to other stripes, which collapses the
   deferral rate from 80-160 % to a few percent.  The second map and the
   selector bits share ONE extra u8 stream (`b2`): bits 4-6 carry the
   bank-1 stripe offset at the lane's *table position*, bits 0..P-1 carry
   the selector of plane p's element at the lane's *slot position* — the
   two bit fields are read at independent positions, so one plane serves
   both (+1 B per quad slot; (5P+3)/P B per element).

2. **Drain-queue walk.**  Conflicting piece-parts go to a defer queue
   that splices back in front of the remaining work at every row close,
   so a row closes only when FULL (or at pool end) — sim_bank2 measured
   the naive multi-pass variant burning one partial row per (pool, pass),
   which swamped the element bound (35.6k vs 19.2k rows on pl_big).
   lid order within each sublane row is preserved (spliced queue lids ≤
   the in-flight piece's lid), so ``gidx`` stays a valid running max and
   adjacent same-lid parts merge into one segment.

The result is a standard ``SegPlan`` plus the ``b2`` plane; the kernels
(``kernels.engines``) read ``plan.b2``/``dev.b2`` and add one sublane
gather + P lane gathers + P selects per sub-chunk (measured tax ~12 % of
the quad rate, priced in ``price_layouts3``).  Reference parity: this
replaces the reference's only answer to scattered rows — an offline
row-length-sorted input file (``sigma_c.c:44``, ``cant-sorted.mtx``).
"""

from __future__ import annotations

from collections import deque

import numpy as np

from spmv_tpu.formats.base import (
    LANES,
    ROW_CAP,
    SUBLANES,
    SegPlan,
    _emit_rows,
    _run_heads,
    cdiv,
)
from spmv_tpu.formats.pool import WINDOW_STRIPES, _sorted_pool_views

__all__ = ["bank_walk", "build_seg_plan_banked", "banked_row_count",
           "price_layouts3", "BANK_RATE_TAX"]

# Measured-model derate of the per-P quad rate for the banked kernel's
# extra ops (one sublane gather per subtile + P lane gathers + P selects
# + bit extraction).  Calibrated ON CHIP (scripts/probe_bank.py,
# interleaved with classic on the power-law class): P=2 runs at 32.4
# Gquad/s vs the 35 G classic rate (~8 % tax — the per-subtile gather is
# nearly free, fact 13's ``nowin``); P=4 collapses to 17.6 Gquad/s
# (~37 % — the per-plane select chain scales with P and Mosaic
# serializes it against the gathers), which is why the pricer almost
# never picks banked P=4 despite its smaller row counts.
BANK_RATE_TAX = {1: 0.12, 2: 0.10, 4: 0.40}
NBANK = 2


def _bank_walk_py(pool_id, lid, stp, lo, pack: int):
    """Drain-queue two-bank packing walk (NumPy reference; native C++
    ``spmv_bank_pack`` has identical semantics — tests pin parity).

    Elements arrive sorted by (pool, lid, stripe, col); pieces are
    maximal same-(pool, lid, stripe) runs.  Returns per element
    ``(erow, slot, msb, bank)`` and per emitted row ``row_pool``.
    """
    n = pool_id.size
    cap = pack * ROW_CAP
    erow = np.empty(n, dtype=np.int64)
    slot = np.empty(n, dtype=np.int64)
    msb = np.zeros(n, dtype=np.uint8)
    bank = np.zeros(n, dtype=np.uint8)
    row_pool: list[int] = []

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

    for pp0, pp1 in zip(pstart_of_pool, pend_of_pool):
        pool = int(pool_id[piece_starts[pp0]])
        work = deque(
            (int(lid[piece_starts[q]]), int(stp[piece_starts[q]]),
             np.arange(piece_starts[q], piece_ends[q]))
            for q in range(pp0, pp1))
        queue: list = []
        mp = np.full((NBANK, LANES), -1, dtype=np.int64)
        prev_end = -1
        prev_lid = -1
        row_open = False

        def close_row():
            nonlocal prev_end, prev_lid, row_open
            if row_open:
                row_pool.append(pool)
                row_open = False
            mp[:] = -1
            prev_end = -1
            prev_lid = -1

        while work or queue:
            if not work:  # pool tail: retry the deferred parts
                close_row()
                work = deque(sorted(queue, key=lambda t: t[0]))
                queue = []
                continue
            l0, s0, eidx = work.popleft()
            lov = lo[eidx]
            okk = (mp[:, lov] == -1) | (mp[:, lov] == s0)
            ok = okk.any(axis=0)
            good = eidx[ok]
            bad = eidx[~ok]
            if bad.size:
                queue.append((l0, s0, bad))
            overflow_rest = None
            placed = 0
            while placed < good.size:
                f = prev_end + 1
                rem = good.size - placed
                if l0 != prev_lid and f % pack and (
                        (f + rem - 1) // pack == prev_end // pack
                        or (f // pack) % ROW_CAP == ROW_CAP - 1):
                    f = (prev_end // pack + 1) * pack
                if f >= cap:
                    overflow_rest = good[placed:]
                    break
                shared_quad = (f // pack
                               if l0 != prev_lid and f % pack else -1)
                row_open = True
                take = min(cap - f, good.size - placed)
                part = good[placed:placed + take]
                r = len(row_pool)
                erow[part] = r
                sl = f + np.arange(take)
                slot[part] = sl
                if shared_quad >= 0:
                    msb[part] = (sl // pack == shared_quad
                                 ).astype(np.uint8)
                # bank assignment: matched bank first, else first free
                plov = lo[part]
                in0 = mp[0, plov] == s0
                in1 = mp[1, plov] == s0
                free0 = mp[0, plov] == -1
                use1 = ~in0 & (in1 | ~free0)
                bank[part] = use1.astype(np.uint8)
                mp[0, plov[~use1]] = s0
                mp[1, plov[use1]] = s0
                prev_end = f + take - 1
                prev_lid = l0
                placed += take
            if overflow_rest is not None:
                close_row()
                work.appendleft((l0, s0, overflow_rest))
                for item in sorted(queue, key=lambda t: t[0],
                                   reverse=True):
                    work.appendleft(item)
                queue = []
        close_row()
    return erow, slot, msb, bank, np.asarray(row_pool, dtype=np.int64)


def bank_walk(pool_id, lid, stp, lo, pack: int):
    """Two-bank drain-queue packing walk (native C++ when available,
    NumPy fallback — identical semantics, tests pin parity)."""
    from spmv_tpu.formats import native_group

    nat = native_group.bank_pack(pool_id, lid, stp, lo, pack)
    if nat is not None:
        return nat
    return _bank_walk_py(pool_id, lid, stp, lo, pack)


def banked_row_count(rows, cols, ncols: int, pack: int) -> int:
    """Sublane rows the banked walk would emit (pricing helper)."""
    order, pool_id, lidv, stpv, lov = _sorted_pool_views(rows, cols, ncols)
    _, _, _, _, row_pool = bank_walk(pool_id, lidv, stpv, lov, pack)
    return int(row_pool.size)


def build_seg_plan_banked(
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
    """Pack COO triplets into the two-bank pooled segmented stream.
    Produces a ``SegPlan`` whose ``b2`` plane is set — the kernels
    dispatch on it (``DevSeg.banked``)."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)
    nnz = rows.size
    from spmv_tpu.formats.base import x_stripes

    S = x_stripes(ncols)
    P = pack

    order, pool_id, lidv, stpv, lov = _sorted_pool_views(rows, cols, ncols)
    r_s, c_s, v_s = rows[order], cols[order], vals[order]
    erow, slot, msb, bankv, row_pool = bank_walk(pool_id, lidv, stpv, lov, P)

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

    # per-lane hi for both banks: default = row's window base offset;
    # element lanes carry their own stripe offset in their bank's field.
    sb_of_row = sub_base[np.arange(TM) // SUBLANES].astype(np.int64)
    base_hi = row_stp.astype(np.int64) - sb_of_row
    assert base_hi.size == 0 or (0 <= base_hi.min()
                                 and base_hi.max() < SUBLANES)
    hi2d = np.ascontiguousarray(
        np.broadcast_to(base_hi.astype(np.uint8)[:, None], (TM, LANES))
    ).copy()
    hi2_2d = hi2d.copy()
    hi_e = stpv - sb_of_row[erow_f]
    assert hi_e.size == 0 or (0 <= hi_e.min() and hi_e.max() < SUBLANES)
    lane_e = c_s & (LANES - 1)
    b0 = bankv == 0
    hi2d[erow_f[b0], lane_e[b0]] = hi_e[b0].astype(np.uint8)
    hi2_2d[erow_f[~b0], lane_e[~b0]] = hi_e[~b0].astype(np.uint8)

    # b2 plane: bits 4-6 = bank-1 stripe offset (at the lane's table
    # position), bits 0..P-1 = per-plane bank selector (at the lane's
    # slot position) — independent positions, one shared u8 stream.
    sel2d = np.zeros((TM, LANES), dtype=np.uint8)
    np.bitwise_or.at(sel2d, (erow_f, qpos),
                     (bankv.astype(np.uint8) << plane.astype(np.uint8)))
    assert P <= 4  # selector bits 0..3; bits 4-6 are hi2's
    b2 = (hi2_2d << 4) | sel2d

    gidx_raw = np.zeros((TM, LANES), dtype=np.uint8)
    np.maximum.at(gidx_raw, (erow_f, r_s & (LANES - 1)),
                  qpos.astype(np.uint8))
    gidx = np.maximum.accumulate(gidx_raw, axis=1)

    return SegPlan(
        vals=v3d, lo=lo3d, hi=hi2d, gidx=gidx,
        row_block=row_blk, sub_base=sub_base,
        nrows=nrows, ncols=ncols, nnz=nnz, chunk=chunk, pack=P,
        b2=b2,
    )


def price_layouts3(rows, cols, nrows: int, ncols: int):
    """Three-way layout choice by modeled engine time over EXACT row
    counts: classic per-run quantization vs pooled (fact 16) vs banked.

    Returns ``(layout, P)`` with layout ∈ {"classic", "pool", "bank"}.
    The model extends ``pool.price_layouts``: banked streams carry one
    extra u8 plane per quad ((5P+3) B) and derate the measured per-P quad
    rate by ``BANK_RATE_TAX``; banked must win the modeled time by >5 %
    (larger margin than pooled's 3 % — it changes the kernel, not just
    the plan)."""
    from spmv_tpu.formats.base import (_QUAD_RATE, _STREAM_BW, _pack_sample)
    from spmv_tpu.formats.pool import price_layouts

    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    if rows.size == 0:
        return "classic", 1
    pooled, P_pc = price_layouts(rows, cols, nrows, ncols)
    layout = "pool" if pooled else "classic"

    srows, scols = _pack_sample(rows, cols, nrows)
    # classic/pooled reference time at the two-way pricer's pick
    if pooled:
        from spmv_tpu.formats.pool import pooled_row_count

        nrow_ref = pooled_row_count(srows, scols, ncols, P_pc)
    else:
        # recompute the classic row count the two-way pricer used
        from spmv_tpu.formats.base import _pick_pack

        nstripes = cdiv(max(ncols, 1), LANES)
        segkey = (((srows >> 7) * nstripes + (scols >> 7))
                  * (nrows + 1) + srows)
        useg, sizes = np.unique(segkey, return_counts=True)
        _, seg_run = np.unique(useg // (nrows + 1), return_inverse=True)
        nruns = int(seg_run.max()) + 1
        run_els = np.bincount(seg_run, weights=sizes.astype(np.float64),
                              minlength=nruns).astype(np.int64)
        run_nsegs = np.bincount(seg_run, minlength=nruns)
        quads = np.maximum(-(-run_els // P_pc), run_nsegs)
        nrow_ref = int(np.sum(-(-quads // ROW_CAP)))

    def t_ref(nrow, P):
        q = nrow * ROW_CAP
        return max(q * (5 * P + 2) / _STREAM_BW, q / _QUAD_RATE[P])

    def t_bank(nrow, P):
        q = nrow * ROW_CAP
        return max(q * (5 * P + 3) / _STREAM_BW,
                   q / (_QUAD_RATE[P] * (1.0 - BANK_RATE_TAX[P])))

    best_t = t_ref(nrow_ref, P_pc)
    best = (layout, P_pc)
    for P in (2, 4):
        rb = banked_row_count(srows, scols, ncols, P)
        tb = t_bank(rb, P)
        if tb < 0.95 * best_t:
            best_t = tb
            best = ("bank", P)
    return best
