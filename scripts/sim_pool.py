"""Simulate the pooled (per-lane hi) seg packing for the scattered class.

The quantization being attacked: build_seg_plan gives every (block,stripe)
run its own whole 127-quad sublane rows (pl_big: 36.8k runs x ~133 el/run
-> pad 2.15x at P=2, engine-quad-bound ~32 Gnnz/s).  The kernel's two-step
x-gather is per-LANE in hi (T[r,c] = win[hi[r,c], c], then lane-gather at
lo), so a sublane row may mix stripes of one aligned 8-stripe window as
long as the lo->stripe map is functional per row.  This script measures
the exact sublane-row count of a lid-ordered multi-pass greedy pooled
packing, per P, on the bench matrices.
"""

import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from spmv_tpu.formats.base import (LANES, ROW_CAP, cdiv, _run_heads,
                                   _QUAD_RATE, _STREAM_BW)

CHUNK_SC = 128 * 16


def pool_pack_rows(rows, cols, nrows, ncols, P, window_stripes=8):
    """Exact sublane-row count of the pooled greedy packing at pack P.

    Pools = (128-row block, aligned window of `window_stripes` stripes).
    Per pool, multi-pass greedy: iterate (lid, stripe) pieces in lid order;
    place each element into the current open row when its lo is unmapped or
    mapped to the same stripe; defer conflicts/overflow to the next pass.
    Quad rules match _pack_run_slots: a piece whose head would share its
    predecessor's end quad mid-quad-ends there, or in the row's last quad,
    re-aligns to the next quad.
    """
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

    cap = ROW_CAP * P  # element slots per sublane row
    total_rows = 0
    conflict_defer = 0
    for ps, pe in zip(pool_starts, pool_ends):
        # pieces of this pool: indices [ps, pe)
        pending = []  # (stripe, np.array of lo values) per piece remainder
        for j in range(ps, pe):
            pending.append((int(stp_of_piece[j]),
                            lo[p_start[j]:p_start[j + 1]]))
        while pending:
            nxt = []
            # one pass = a sequence of rows in lid order
            mp = np.full(LANES, -1, dtype=np.int64)  # lo -> stripe map
            slot = 0  # next free element slot in current row
            rows_this = 1
            prev_end = -1  # last used slot (for quad-sharing rule)
            for stripe, elems in pending:
                ok = (mp[elems] == -1) | (mp[elems] == stripe)
                good = elems[ok]
                bad = elems[~ok]
                placed = 0
                while placed < good.size:
                    # piece head alignment rule (one boundary per quad;
                    # no boundary in the row-local last quad)
                    f = prev_end + 1
                    rem = good.size - placed
                    if f % P and ((f + rem - 1) // P == prev_end // P
                                  or (f // P) % ROW_CAP == ROW_CAP - 1):
                        f = (prev_end // P + 1) * P
                    if f >= cap:
                        # close row, open fresh one (same pass, lid order ok)
                        total_rows += 1  # account closed row
                        rows_this += 1
                        mp[:] = -1
                        slot = 0
                        prev_end = -1
                        # re-check conflicts under the fresh map
                        rest = good[placed:]
                        okr = np.ones(rest.size, dtype=bool)
                        # fresh map: no conflicts
                        f = 0
                    take = min(cap - f, good.size - placed)
                    part = good[placed:placed + take]
                    # claim the map for these lanes
                    mp[part] = stripe
                    prev_end = f + take - 1
                    placed += take
                if bad.size:
                    nxt.append((stripe, bad))
                    conflict_defer += bad.size
            total_rows += 1  # close the pass's final row
            pending = nxt
    return total_rows, conflict_defer


def report(name, rows, cols, nrows, ncols):
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    nnz = rows.size
    print(f"\n=== {name}: nnz={nnz} ===")
    for P in (1, 2, 4):
        t0 = time.time()
        tr, defer = pool_pack_rows(rows, cols, nrows, ncols, P)
        tm = ((tr + CHUNK_SC - 1) // CHUNK_SC) * CHUNK_SC
        slots = tm * LANES * P
        bts = tm * LANES * (5 * P + 2)
        us = max(bts / _STREAM_BW, tm * LANES / _QUAD_RATE[P]) * 1e6
        print(f"  pooled P={P}: rows={tr} (TM={tm}) pad {slots/nnz:.2f}x "
              f"deferred {defer} ({100*defer/nnz:.1f}%) "
              f"bytes {bts/1e6:.1f}MB -> {us:.1f}us "
              f"[{nnz/us/1e3:.1f} Gnnz/s model]   ({time.time()-t0:.1f}s sim)")


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
