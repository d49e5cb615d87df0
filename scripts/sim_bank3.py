"""Drain-queue K-bank pooled packing simulation (round 5, iteration 2).

sim_bank2 measured that pass-TAIL rows dominate the K-bank walk on the
scattered class: every (pool, pass) closes its last row partially full,
and with ~10k (block, window) pools x 2+ passes the tails swamp the
element bound.  This iteration restructures the walk so a row closes
ONLY when full (or at pool end): conflicting piece-parts go to a defer
queue that splices back in front of the remaining work at every row
close.  lid order inside each sublane row is preserved (queue lids <=
the in-flight piece's lid; the spliced queue is lid-sorted), so the
stream stays a valid SegPlan, and same-lid adjacent placements merge
into one gidx segment.

Rows are then bounded by sum-over-pools ceil(slots/cap) + rare
conflict-saturated closures (K=2 makes a row that rejects everything
pending effectively impossible: both banks must be claimed at every
pending lane).
"""

import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from spmv_tpu.formats.base import (LANES, ROW_CAP, _QUAD_RATE, _STREAM_BW,
                                   _run_heads, cdiv)

CHUNK_SC = 128 * 16


def drain_pack_rows(rows, cols, nrows, ncols, P, K, window_stripes=8):
    """Exact sublane-row count of the drain-queue K-bank packing.
    Returns (total_rows, n_pools)."""
    blk = rows >> 7
    win = (cols >> 7) // window_stripes
    lid = rows & (LANES - 1)
    stp = cols >> 7
    lo = cols & (LANES - 1)
    order = np.lexsort((cols, stp, lid, blk, win))
    blk, win, lid, stp, lo = (a[order] for a in (blk, win, lid, stp, lo))

    poolkey = win * (cdiv(nrows, LANES) + 1) + blk
    piecekey = (poolkey * (nrows + 1) + lid) * (cdiv(ncols, LANES) + 1) + stp
    p_id, p_sizes, p_head = _run_heads(piecekey)
    pool_of_piece_all = poolkey[p_head]
    p_start = np.zeros(p_sizes.size + 1, dtype=np.int64)
    np.cumsum(p_sizes, out=p_start[1:])
    stp_of_piece = stp[p_head]
    lid_of_piece = lid[p_head]

    pool_heads = np.ones(pool_of_piece_all.size, dtype=bool)
    pool_heads[1:] = pool_of_piece_all[1:] != pool_of_piece_all[:-1]
    pool_starts = np.flatnonzero(pool_heads)
    pool_ends = np.append(pool_starts[1:], pool_of_piece_all.size)

    cap = ROW_CAP * P
    total_rows = 0

    for ps, pe in zip(pool_starts, pool_ends):
        work = deque((int(lid_of_piece[j]), int(stp_of_piece[j]),
                      lo[p_start[j]:p_start[j + 1]])
                     for j in range(ps, pe))
        queue = []  # conflicting piece-parts awaiting a fresh row
        mp = np.full((K, LANES), -1, dtype=np.int64)
        f = 0
        prev_end = -1
        prev_lid = -1
        row_open = False

        while work or queue:
            if not work:  # pool tail: splice the queue as fresh work
                if row_open:
                    total_rows += 1
                    row_open = False
                mp[:] = -1
                f = 0
                prev_end = -1
                prev_lid = -1
                work = deque(sorted(queue, key=lambda t: t[0]))
                queue = []
                continue
            l0, s0, elems = work.popleft()
            okk = (mp[:, elems] == -1) | (mp[:, elems] == s0)
            ok = okk.any(axis=0)
            good = elems[ok]
            bad = elems[~ok]
            if bad.size:
                queue.append((l0, s0, bad))
            overflow_rest = None
            placed = 0
            while placed < good.size:
                ff = prev_end + 1
                rem = good.size - placed
                if l0 != prev_lid and ff % P and (
                        (ff + rem - 1) // P == prev_end // P
                        or (ff // P) % ROW_CAP == ROW_CAP - 1):
                    ff = (prev_end // P + 1) * P
                if ff >= cap:
                    overflow_rest = good[placed:]
                    break
                row_open = True
                take = min(cap - ff, good.size - placed)
                part = good[placed:placed + take]
                remv = part[(mp[:, part] != s0).all(axis=0)]
                for k in range(K):
                    if remv.size == 0:
                        break
                    freek = mp[k, remv] == -1
                    mp[k, remv[freek]] = s0
                    remv = remv[~freek]
                prev_end = ff + take - 1
                prev_lid = l0
                placed += take
            if overflow_rest is not None:
                # row full: close it; fresh row starts with the queue
                # (lid-sorted, lids <= l0), then the remainder, then
                # the rest of the work — lid order per row holds
                total_rows += 1
                row_open = False
                mp[:] = -1
                f = 0
                prev_end = -1
                prev_lid = -1
                work.appendleft((l0, s0, overflow_rest))
                for item in sorted(queue, key=lambda t: t[0],
                                   reverse=True):
                    work.appendleft(item)
                queue = []
        if row_open:
            total_rows += 1
    return total_rows, pool_starts.size


def main():
    from scripts.sim_bank2 import classic_rows
    from spmv_tpu import synth

    cases = [("power_law 32k",
              synth.power_law(n=32768, avg_nnz_per_row=24, bandwidth=512,
                              seed=0)),
             ("power_law 524k (pl_big)",
              synth.power_law(n=524288, avg_nnz_per_row=24, bandwidth=512,
                              seed=0))]
    for name, (info, r, c, v) in cases:
        r = np.asarray(r, np.int64)
        c = np.asarray(c, np.int64)
        nnz = r.size
        rc, P_c = classic_rows(r, c, info.nrows, info.ncols)
        tm_c = ((rc + CHUNK_SC - 1) // CHUNK_SC) * CHUNK_SC
        b_c = tm_c * LANES * (5 * P_c + 2)
        us_c = max(b_c / _STREAM_BW, tm_c * LANES / _QUAD_RATE[P_c]) * 1e6
        print(f"\n=== {name}: nnz={nnz} ===")
        print(f"  classic P={P_c}: rows={rc} TM={tm_c} "
              f"pad {tm_c*LANES*P_c/nnz:.2f}x -> {us_c:.1f}us "
              f"[{nnz/us_c/1e3:.1f} Gnnz/s]")
        for K in (1, 2, 3):
            for P in (2, 4):
                t0 = time.time()
                tr, npool = drain_pack_rows(
                    r, c, info.nrows, info.ncols, P, K)
                tm = ((tr + CHUNK_SC - 1) // CHUNK_SC) * CHUNK_SC
                extra = (K - 1) + (1 if K > 1 else 0)
                bts = tm * LANES * (5 * P + 2 + extra)
                rate = _QUAD_RATE[P] * (1.0 - 0.12 * (K - 1))
                us = max(bts / _STREAM_BW, tm * LANES / rate) * 1e6
                print(f"  K={K} P={P}: rows={tr} TM={tm} pools={npool} "
                      f"pad {tm*LANES*P/nnz:.2f}x "
                      f"-> {us:.1f}us [{nnz/us/1e3:.1f} Gnnz/s] "
                      f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
