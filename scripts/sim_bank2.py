"""Simulate K-bank pooled packing for the scattered class (round 5).

Fact 16 measured the single-map pooled walk conflict-dead on power-law:
heavy (block,stripe) runs cover ~100 of 128 in-stripe columns, so any two
runs' lane->stripe maps collide and 80-160% of elements defer to fresh
passes.  The banked idea: give each sublane row K lane->stripe maps
(K ``hi`` planes in the plan; a per-element selector picks which bank's
two-step gather result to use).  An element conflicts only when ALL K
banks already map its lane to other stripes, so K=2 should collapse the
pass count.

Kernel cost of bank k>0: one extra (8,128) sublane gather per sub-chunk
+ one lane gather + select per plane, plus streamed bytes 5P+2 ->
5P+2+(K-1)+1 (extra hi planes + the u8 selector plane).

This script measures exact emitted sublane rows (same quad rules as
``_pack_run_slots``) for K = 1..4 on the bench matrices, against the
classic per-run-quantized row count, and models engine time with the
measured per-P quad rates derated by the banked gather tax.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from spmv_tpu.formats.base import (LANES, ROW_CAP, _QUAD_RATE, _STREAM_BW,
                                   _pick_pack, _run_heads, cdiv)

CHUNK_SC = 128 * 16


def bank_pack_rows(rows, cols, nrows, ncols, P, K, window_stripes=8):
    """Exact sublane-row count of the K-bank pooled greedy packing."""
    blk = rows >> 7
    win = (cols >> 7) // window_stripes
    lid = rows & (LANES - 1)
    stp = cols >> 7
    lo = cols & (LANES - 1)
    order = np.lexsort((cols, stp, lid, win, blk))
    blk, win, lid, stp, lo = (a[order] for a in (blk, win, lid, stp, lo))

    poolkey = blk * (cdiv(ncols, LANES * window_stripes) + 1) + win
    piecekey = (poolkey * (nrows + 1) + lid) * (cdiv(ncols, LANES) + 1) + stp
    p_id, p_sizes, p_head = _run_heads(piecekey)
    pool_of_piece_all = poolkey[p_head]
    p_start = np.zeros(p_sizes.size + 1, dtype=np.int64)
    np.cumsum(p_sizes, out=p_start[1:])
    stp_of_piece = stp[p_head]

    pool_heads = np.ones(pool_of_piece_all.size, dtype=bool)
    pool_heads[1:] = pool_of_piece_all[1:] != pool_of_piece_all[:-1]
    pool_starts = np.flatnonzero(pool_heads)
    pool_ends = np.append(pool_starts[1:], pool_of_piece_all.size)

    cap = ROW_CAP * P
    total_rows = 0
    conflict_defer = 0
    passes_max = 0
    for ps, pe in zip(pool_starts, pool_ends):
        pending = [(int(stp_of_piece[j]), lo[p_start[j]:p_start[j + 1]])
                   for j in range(ps, pe)]
        npass = 0
        while pending:
            npass += 1
            nxt = []
            mp = np.full((K, LANES), -1, dtype=np.int64)
            prev_end = -1
            for stripe, elems in pending:
                # bank availability per element: any bank with lane free
                # or already mapped to this stripe
                okk = (mp[:, elems] == -1) | (mp[:, elems] == stripe)
                ok = okk.any(axis=0)
                good = elems[ok]
                bad = elems[~ok]
                placed = 0
                while placed < good.size:
                    f = prev_end + 1
                    rem = good.size - placed
                    if f % P and ((f + rem - 1) // P == prev_end // P
                                  or (f // P) % ROW_CAP == ROW_CAP - 1):
                        f = (prev_end // P + 1) * P
                    if f >= cap:
                        total_rows += 1
                        mp[:] = -1
                        prev_end = -1
                        f = 0
                    take = min(cap - f, good.size - placed)
                    part = good[placed:placed + take]
                    # claim banks greedily (vectorized; lanes within a
                    # piece are distinct): elements already matched by
                    # some bank need no claim; the rest claim the first
                    # free bank
                    rem = part[(mp[:, part] != stripe).all(axis=0)]
                    for k in range(K):
                        if rem.size == 0:
                            break
                        freek = mp[k, rem] == -1
                        mp[k, rem[freek]] = stripe
                        rem = rem[~freek]
                    prev_end = f + take - 1
                    placed += take
                if bad.size:
                    nxt.append((stripe, bad))
                    conflict_defer += bad.size
            total_rows += 1
            pending = nxt
        passes_max = max(passes_max, npass)
    return total_rows, conflict_defer, passes_max


def classic_rows(rows, cols, nrows, ncols):
    nstripes = cdiv(max(ncols, 1), LANES)
    segkey = ((rows >> 7) * nstripes + (cols >> 7)) * (nrows + 1) + rows
    useg, sizes = np.unique(segkey, return_counts=True)
    _, seg_run = np.unique(useg // (nrows + 1), return_inverse=True)
    P_c = _pick_pack(sizes, seg_run)
    nruns = int(seg_run.max()) + 1
    run_els = np.bincount(seg_run, weights=sizes.astype(np.float64),
                          minlength=nruns).astype(np.int64)
    run_nsegs = np.bincount(seg_run, minlength=nruns)
    quads = np.maximum(-(-run_els // P_c), run_nsegs)
    return int(np.sum(-(-quads // ROW_CAP))), P_c


# Gather tax per extra bank: per plane one lane gather + one select on
# top of ~? ops.  fact-13 ablation: the P=4 production kernel loses 110
# of 670 GB/s to the segment gidx gathers (one lane gather + shift per
# sub-chunk row set) => a lane gather pass is ~8% of kernel time at P=4.
# Assume each extra bank costs 10% quad-rate per P plane-pass plus the
# extra sublane gather (~free, fact 13 nowin +18/578).
BANK_RATE_TAX = 0.12


def report(name, rows, cols, nrows, ncols):
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    nnz = rows.size
    rc, P_c = classic_rows(rows, cols, nrows, ncols)
    tm_c = ((rc + CHUNK_SC - 1) // CHUNK_SC) * CHUNK_SC
    b_c = tm_c * LANES * (5 * P_c + 2)
    us_c = max(b_c / _STREAM_BW, tm_c * LANES / _QUAD_RATE[P_c]) * 1e6
    print(f"\n=== {name}: nnz={nnz} ===")
    print(f"  classic    P={P_c}: rows={rc} (TM={tm_c}) "
          f"pad {tm_c*LANES*P_c/nnz:.2f}x -> {us_c:.1f}us "
          f"[{nnz/us_c/1e3:.1f} Gnnz/s model]")
    for K in (1, 2, 3, 4):
        for P in (1, 2, 4):
            t0 = time.time()
            tr, defer, mpass = bank_pack_rows(rows, cols, nrows, ncols, P, K)
            tm = ((tr + CHUNK_SC - 1) // CHUNK_SC) * CHUNK_SC
            extra = (K - 1) + (1 if K > 1 else 0)  # hi planes + sel plane
            bts = tm * LANES * (5 * P + 2 + extra)
            rate = _QUAD_RATE[P] * (1.0 - BANK_RATE_TAX * (K - 1))
            us = max(bts / _STREAM_BW, tm * LANES / rate) * 1e6
            print(f"  K={K} P={P}: rows={tr} (TM={tm}) "
                  f"pad {tm*LANES*P/nnz:.2f}x deferred {defer} "
                  f"({100*defer/nnz:.1f}%) passes<={mpass} "
                  f"-> {us:.1f}us [{nnz/us/1e3:.1f} Gnnz/s model] "
                  f"({time.time()-t0:.1f}s sim)")


def main():
    from spmv_tpu import synth

    pinfo, pr, pc, pv = synth.power_law(n=32768, avg_nnz_per_row=24,
                                        bandwidth=512, seed=0)
    report("power_law 32k", pr, pc, pinfo.nrows, pinfo.ncols)

    binfo, br, bc, bv = synth.power_law(n=524288, avg_nnz_per_row=24,
                                        bandwidth=512, seed=0)
    report("power_law 524k (pl_big)", br, bc, binfo.nrows, binfo.ncols)

    cinfo, cr, cc, cv = synth.synthetic_cant(n=62464, avg_nnz_per_row=64,
                                             bandwidth=350, seed=0)
    report("synthetic cant 62k", cr, cc, cinfo.nrows, cinfo.ncols)


if __name__ == "__main__":
    main()
