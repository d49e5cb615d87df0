#!/usr/bin/env python
"""On-chip probe: single-dispatch fused-RMW kernel vs the two-dispatch
streamed-partials pair, across stream sizes (round 3).

Question being calibrated: ``device.FUSED_STREAM_BYTES_MAX`` — below
which streamed-plan size does the epilogue dispatch's fixed ramp cost
more than the fused path's RMW serialization (DESIGN.md fact 9 measured
the RMW at ~130 GB/s of the DMA ceiling AT SCALE, but a small grid pays
the second ``pallas_call``'s pipeline ramp on every SpMV)?

Method: for each matrix size, bench BOTH variants with the interleaved
chained-loop slope protocol (the only valid timing on this tunnel,
DESIGN.md fact 6), forced via ``segmented_spmv_fused`` /
``segmented_spmv_partials`` wrappers so ``dev.fused`` cannot re-decide.

Usage: python scripts/probe_small.py [--sizes 8192,32768,131072,524288]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Force:
    """Container wrapper pinning the engine variant (fused or partials)."""

    def __init__(self, a, fn):
        self.a, self.fn = a, fn
        self.dev = a.dev
        self.nrows, self.ncols, self.nnz = a.nrows, a.ncols, a.nnz

    def padded_matvec(self, x2d):
        return self.fn(self.dev, x2d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="8192,32768,131072,524288")
    ap.add_argument("--avg-nnz", type=int, default=24)
    ap.add_argument("--repeats", type=int, default=12)
    args = ap.parse_args()

    import spmv_tpu
    from spmv_tpu import synth
    from spmv_tpu.bench.runner import bench_formats_interleaved
    from spmv_tpu.kernels.engines import (segmented_spmv_fused,
                                          segmented_spmv_partials)

    rows_out = []
    for n in [int(s) for s in args.sizes.split(",")]:
        info, r, c, v = synth.power_law(
            n=n, avg_nnz_per_row=args.avg_nnz, bandwidth=512, seed=0)
        a = spmv_tpu.from_coo("csr", info.nrows, info.ncols, r, c, v)
        objs = {
            "fused": _Force(a, segmented_spmv_fused),
            "partials": _Force(a, segmented_spmv_partials),
        }
        res, bw = bench_formats_interleaved(
            objs, probe=True, iters_a=200, iters_b=1000,
            repeats=args.repeats)
        row = {
            "n": n,
            "nnz": int(a.nnz),
            "stream_mb": round(a.dev.stream_bytes / 1e6, 3),
            "grid_steps": int(a.dev.vals[0].shape[0] * a.dev.kva
                              // (a.dev.chunk * a.dev.ns)),
            "probe_gbps": round(bw / 1e9, 1),
            "fused_us": round(res["fused"].ms_per_spmv * 1e3, 2),
            "partials_us": round(res["partials"].ms_per_spmv * 1e3, 2),
            "fused_gnnz": round(res["fused"].gnnz_per_s, 2),
            "partials_gnnz": round(res["partials"].gnnz_per_s, 2),
        }
        rows_out.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"probe": "small", "rows": rows_out}))


if __name__ == "__main__":
    main()
