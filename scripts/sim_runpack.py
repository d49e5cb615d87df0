"""Price the scattered-class padding fixes BEFORE building them (round-5
verdict item 1).

Reproduces build_seg_plan's exact slot accounting (quad packing walk +
run→sublane-row quantization + _emit_rows group/window pads + chunk
rounding) without materializing arrays, then prices four variants on the
bench matrices:

  A. current: one global P picked by _pick_pack;
  B. per-run P-split: each (block,stripe) run is assigned the P that
     minimizes ITS quantized bytes; runs partition into ≤3 sub-plans
     (one per P), each an independent engine dispatch;
  C. VERDICT's row clustering: within 1024-row windows reorder rows by
     column-support centroid (then length), recompute runs, global P;
  D. B after C (do both).

Model time = max(stream_bytes / 600 GB/s, quads / quad_rate[P]) summed
over dispatches + 12 us per extra pallas_call pair (DESIGN.md fact 7).
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from spmv_tpu.formats.base import (
    LANES, ROW_CAP, SUBLANES, _emit_rows, _pack_run_slots, _run_heads,
    _QUAD_RATE, _STREAM_BW, cdiv, round_up, x_stripes)

DISPATCH_US = 12.0  # extra pallas_call pair cost (fact 7)
CHUNK_SC = 128 * 16  # production superchunk rows (pick_geometry tier 1)


def run_stats(rows, cols, nrows, ncols):
    """Sorted triplet -> (seg_sizes, seg_run, run stats, per-run row sets)."""
    blk = rows >> 7
    stp = cols >> 7
    order = np.lexsort((cols, rows, stp, blk))
    r, c = rows[order], cols[order]
    blk, stp = blk[order], stp[order]
    nstripes = cdiv(max(ncols, 1), LANES)
    runkey = blk * nstripes + stp
    run_id, run_sizes, _ = _run_heads(runkey)
    seg_id, seg_sizes, seg_head = _run_heads(runkey * (nrows + 1) + r)
    seg_run = run_id[seg_head]
    nruns = run_sizes.size
    run_els = np.bincount(seg_run, weights=seg_sizes.astype(np.float64),
                          minlength=nruns).astype(np.int64)
    run_head_elem = np.zeros(r.size, dtype=bool)
    run_head_elem[np.searchsorted(run_id, np.arange(nruns))] = True
    run_blk = blk[run_head_elem]
    run_stp = stp[run_head_elem]
    return seg_sizes, seg_run, run_els, run_blk, run_stp


def exact_rows_for(seg_sizes, seg_run, P):
    """Per-run sublane rows under the real quad-packing walk."""
    f = _pack_run_slots(seg_sizes, seg_run, P)
    seg_end = f + seg_sizes - 1
    nruns = int(seg_run.max()) + 1 if seg_run.size else 1
    run_last = np.searchsorted(seg_run, np.arange(nruns), side="right") - 1
    run_quads = -(-(seg_end[run_last] + 1) // P)
    run_nsub = -(-run_quads // ROW_CAP)
    return run_nsub, run_quads


def plan_cost(seg_sizes, seg_run, run_blk, run_stp, S, P,
              label=""):
    """Exact TM (incl. emission pads + superchunk rounding), slots, bytes,
    modeled us for ONE sub-plan at pack P."""
    if seg_sizes.size == 0:
        return dict(tm=0, slots=0, bytes=0.0, us=0.0)
    run_nsub, run_quads = exact_rows_for(seg_sizes, seg_run, P)
    subrow_blk = np.repeat(run_blk, run_nsub)
    subrow_stp = np.repeat(run_stp, run_nsub)
    _, row_blk, _, _, TM = _emit_rows(subrow_blk, subrow_stp, S, 64)
    TM = round_up(TM, CHUNK_SC)
    slots = TM * LANES * P
    bts = TM * LANES * (5 * P + 2)
    quads = TM * LANES
    us = max(bts / _STREAM_BW, quads / _QUAD_RATE[P]) * 1e6
    return dict(tm=int(TM), rows_runquant=int(run_nsub.sum()),
                slots=int(slots), bytes=float(bts), us=float(us))


def price_global(seg_sizes, seg_run, run_blk, run_stp, S, nnz):
    out = {}
    for P in (1, 2, 4):
        c = plan_cost(seg_sizes, seg_run, run_blk, run_stp, S, P)
        c["pad"] = c["slots"] / nnz
        out[P] = c
    return out


def per_run_best_p(seg_sizes, seg_run, nruns):
    """Per-run byte-optimal P using the per-run quantized cost (row
    quantization included; emission pads excluded — second order)."""
    best_bytes = np.full(nruns, np.inf)
    best_p = np.ones(nruns, dtype=np.int64)
    for P in (1, 2, 4):
        run_nsub, _ = exact_rows_for(seg_sizes, seg_run, P)
        b = run_nsub * ROW_CAP * 1.0 * LANES / ROW_CAP * (5 * P + 2)
        # bytes per run = rows * 128 lanes * (5P+2) B/quad
        b = run_nsub.astype(np.float64) * LANES * (5 * P + 2)
        upd = b < best_bytes
        best_bytes[upd] = b[upd]
        best_p[upd] = P
    return best_p


def price_split(seg_sizes, seg_run, run_els, run_blk, run_stp, S, nnz):
    nruns = run_els.size
    bp = per_run_best_p(seg_sizes, seg_run, nruns)
    parts = {}
    total_us, total_slots, total_bytes = 0.0, 0, 0.0
    used = [int(P) for P in (1, 2, 4) if (bp == P).any()]
    for P in used:
        rmask = bp == P
        smask = rmask[seg_run]
        # re-index runs compactly
        new_run = np.cumsum(rmask) - 1
        c = plan_cost(seg_sizes[smask],
                      new_run[seg_run[smask]].astype(np.int64),
                      run_blk[rmask], run_stp[rmask], S, P)
        c["nnz_part"] = int(run_els[rmask].sum())
        c["nruns"] = int(rmask.sum())
        parts[P] = c
        total_us += c["us"]
        total_slots += c["slots"]
        total_bytes += c["bytes"]
    total_us += DISPATCH_US * (len(used) - 1)
    return dict(parts=parts, us=total_us, slots=total_slots,
                bytes=total_bytes, pad=total_slots / nnz,
                nparts=len(used))


def cluster_rows(rows, cols, nrows, window=1024):
    """VERDICT item-1 experiment: within `window`-row windows order rows by
    column-support centroid (then length); returns the relabeled rows."""
    order = np.lexsort((cols, rows))
    r, c = rows[order], cols[order]
    # per-row centroid + length
    cnt = np.bincount(r, minlength=nrows).astype(np.float64)
    csum = np.bincount(r, weights=c.astype(np.float64), minlength=nrows)
    cent = np.where(cnt > 0, csum / np.maximum(cnt, 1), 0.0)
    perm = np.arange(nrows, dtype=np.int64)
    for w0 in range(0, nrows, window):
        w1 = min(w0 + window, nrows)
        idx = np.lexsort((-cnt[w0:w1], cent[w0:w1])) + w0
        perm[w0:w1] = idx
    inv = np.empty(nrows, dtype=np.int64)
    inv[perm] = np.arange(nrows, dtype=np.int64)
    return inv[rows]


def report(name, rows, cols, nrows, ncols):
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    nnz = rows.size
    S = x_stripes(ncols)
    print(f"\n=== {name}: {nrows}x{ncols} nnz={nnz} ===")
    min_rows = cdiv(cdiv(nnz, 4), ROW_CAP)
    print(f"  element bound (P=4): {min_rows} sublane rows")

    seg_sizes, seg_run, run_els, run_blk, run_stp = run_stats(
        rows, cols, nrows, ncols)
    print(f"  runs={run_els.size} (avg {run_els.mean():.1f} el/run, "
          f"median {np.median(run_els):.0f}); segs={seg_sizes.size} "
          f"(avg {seg_sizes.mean():.2f})")

    g = price_global(seg_sizes, seg_run, run_blk, run_stp, S, nnz)
    for P, c in g.items():
        print(f"  A global P={P}: TM={c['tm']} (runquant {c['rows_runquant']}) "
              f"pad {c['pad']:.2f}x bytes {c['bytes']/1e6:.2f}MB "
              f"-> {c['us']:.1f}us")
    best_a = min(c["us"] for c in g.values())

    sp = price_split(seg_sizes, seg_run, run_els, run_blk, run_stp, S, nnz)
    print(f"  B per-run split ({sp['nparts']} parts): pad {sp['pad']:.2f}x "
          f"bytes {sp['bytes']/1e6:.2f}MB -> {sp['us']:.1f}us "
          f"({best_a/sp['us']:.2f}x vs best global)")
    for P, c in sp["parts"].items():
        print(f"     P={P}: nruns={c['nruns']} nnz={c['nnz_part']} "
              f"TM={c['tm']} bytes {c['bytes']/1e6:.2f}MB us={c['us']:.1f}")

    # C: VERDICT row clustering
    rc = cluster_rows(rows, cols, nrows)
    s2, sr2, re2, rb2, rs2 = run_stats(rc, cols, nrows, ncols)
    g2 = price_global(s2, sr2, rb2, rs2, S, nnz)
    bg2 = min(g2.values(), key=lambda c: c["us"])
    print(f"  C clustered global: runs={re2.size} (was {run_els.size}) "
          f"best pad {bg2['pad']:.2f}x -> {bg2['us']:.1f}us")
    sp2 = price_split(s2, sr2, re2, rb2, rs2, S, nnz)
    print(f"  D clustered split: pad {sp2['pad']:.2f}x -> {sp2['us']:.1f}us")


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
