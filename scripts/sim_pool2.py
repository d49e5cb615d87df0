"""Stage-A/B pooled packing sim: per (block, 8-stripe window) pool, pack
each stripe's pieces densely into stripe-pure rows FIRST (stage A, zero
conflicts), keep each stripe's final partial row's content aside, then
greedily merge those tails across the pool's stripes into shared rows
with the per-lane lo->stripe map (stage B, multi-pass on conflicts).

Compares against sim_pool.py's full greedy: stage A/B should keep the
cant win while rescuing the pl classes (heavy pieces never enter the
shared map; only low-coverage tails pool).
"""

import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from spmv_tpu.formats.base import (LANES, ROW_CAP, cdiv, _run_heads,
                                   _QUAD_RATE, _STREAM_BW)

CHUNK_SC = 128 * 16


def pack_pieces_rows(piece_sizes, P):
    """Slots walk for a lid-ordered sequence of pieces at pack P (same
    rules as _pack_run_slots).  Returns (full_rows, tail_pieces) where
    tail_pieces are the (piece_size) parts living in the final partial
    row, split out for stage B.  Simplified: pieces are cut at row
    boundaries; the final row's content is returned as pieces."""
    cap = ROW_CAP * P
    rows = 0
    prev_end = -1
    cur = []  # (size) pieces in current row
    for m in piece_sizes:
        while m > 0:
            f = prev_end + 1
            if f % P and ((f + m - 1) // P == prev_end // P
                          or (f // P) % ROW_CAP == ROW_CAP - 1):
                f = (prev_end // P + 1) * P
            if f >= cap:
                rows += 1
                cur = []
                prev_end = -1
                f = 0
            take = min(cap - f, m)
            cur.append(take)
            prev_end = f + take - 1
            m -= take
    return rows, cur, prev_end


def stage_ab(rows, cols, nrows, ncols, P, window_stripes=8,
             merge_thresh=1.0):
    """Returns total sublane rows under stage-A/B pooling."""
    blk = rows >> 7
    stp = cols >> 7
    win = stp // window_stripes
    lid = rows & (LANES - 1)
    lo = cols & (LANES - 1)
    order = np.lexsort((cols, lid, stp, win, blk))
    blk, win, lid, stp, lo = (a[order] for a in (blk, win, lid, stp, lo))

    nwin = cdiv(ncols, LANES * window_stripes) + 1
    poolkey = blk * nwin + win
    runkey = poolkey * (window_stripes + 1) + (stp % window_stripes)
    piecekey = runkey * (nrows + 1) + lid
    p_id, p_sizes, p_head = _run_heads(piecekey)
    run_of_piece = runkey[p_head]
    pool_of_piece = poolkey[p_head]
    stp_of_piece = stp[p_head]
    lid_of_piece = lid[p_head]
    p_start = np.zeros(p_sizes.size + 1, dtype=np.int64)
    np.cumsum(p_sizes, out=p_start[1:])

    cap = ROW_CAP * P
    total_rows = 0

    # iterate pools
    pool_heads = np.ones(pool_of_piece.size, dtype=bool)
    pool_heads[1:] = pool_of_piece[1:] != pool_of_piece[:-1]
    pool_starts = np.flatnonzero(pool_heads)
    pool_ends = np.append(pool_starts[1:], pool_of_piece.size)

    deferred_total = 0
    for ps, pe in zip(pool_starts, pool_ends):
        # stage A per stripe(run)
        tails = []  # (stripe, lid, lo-array) pieces in final partial rows
        j = ps
        while j < pe:
            k = j
            while k < pe and run_of_piece[k] == run_of_piece[j]:
                k += 1
            # pieces j..k of one stripe, already lid-ordered
            sizes = p_sizes[j:k]
            full, tail_sizes, _ = pack_pieces_rows(sizes, P)
            total_rows += full
            # final-partial-row content: take the LAST pieces covering
            # tail_sizes (piece splits approximated: tail pieces come from
            # the end of the sequence)
            need = sum(tail_sizes)
            jj = k
            got = 0
            while got < need and jj > j:
                jj -= 1
                s0 = p_start[jj]
                s1 = p_start[jj + 1]
                take = min(int(p_sizes[jj]), need - got)
                tails.append((int(stp_of_piece[jj]), int(lid_of_piece[jj]),
                              lo[s1 - take:s1]))
                got += take
            j = k
        # stage B: merge tails across stripes, lid-ordered, multi-pass
        tails.sort(key=lambda t: t[1])
        pending = tails
        while pending:
            nxt = []
            mp = np.full(LANES, -1, dtype=np.int64)
            prev_end = -1
            for stripe, lidv, elems in pending:
                ok = (mp[elems] == -1) | (mp[elems] == stripe)
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
                    mp[good[placed:placed + take]] = stripe
                    prev_end = f + take - 1
                    placed += take
                if bad.size:
                    nxt.append((stripe, lidv, bad))
                    deferred_total += bad.size
            total_rows += 1
            pending = nxt
    return total_rows, deferred_total


def report(name, rows, cols, nrows, ncols):
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    nnz = rows.size
    print(f"\n=== {name}: nnz={nnz} ===")
    for P in (1, 2, 4):
        t0 = time.time()
        tr, defer = stage_ab(rows, cols, nrows, ncols, P)
        tm = ((tr + CHUNK_SC - 1) // CHUNK_SC) * CHUNK_SC
        slots = tm * LANES * P
        bts = tm * LANES * (5 * P + 2)
        us = max(bts / _STREAM_BW, tm * LANES / _QUAD_RATE[P]) * 1e6
        print(f"  A/B P={P}: rows={tr} (TM={tm}) pad {slots/nnz:.2f}x "
              f"defer {100*defer/nnz:.1f}% bytes {bts/1e6:.1f}MB "
              f"-> {us:.1f}us [{nnz/us/1e3:.1f} Gnnz/s]  "
              f"({time.time()-t0:.1f}s)")


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
