"""On-chip A/B of the two-bank segmented layout on the scattered class.

Interleaved (rotation + co-sampled ceiling, the only valid protocol on
this tunnel — DESIGN.md fact 6): classic vs banked csr on the power-law
suite matrix and on pl_big.  The sims (scripts/sim_bank2/3.py) model
banked P=4 at +17-21 % fewer quads on pl_big with a ~12 % kernel tax;
this probe measures the real balance.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import spmv_tpu
    from spmv_tpu import synth
    from spmv_tpu.bench.runner import bench_formats_interleaved

    for name, n, iters in (("pl32k", 32768, (400, 2000)),
                           ("pl_big", 524288, (100, 500))):
        info, r, c, v = synth.power_law(n=n, avg_nnz_per_row=24,
                                        bandwidth=512, seed=0)
        objs = {}
        objs["classic"] = spmv_tpu.from_coo("csr", info.nrows, info.ncols,
                                            r, c, v, bank=False, pool=False)
        for P in (2, 4):
            objs[f"bank_p{P}"] = spmv_tpu.from_coo(
                "csr", info.nrows, info.ncols, r, c, v, bank=True, pack=P)
        for k, o in objs.items():
            print(f"{name} {k}: pad {o.plan.padding_ratio:.2f}x "
                  f"P={o.plan.pack} stream {o.dev.stream_bytes/1e6:.1f} MB",
                  file=sys.stderr)
        res, bw = bench_formats_interleaved(objs, probe=True,
                                            iters_a=iters[0],
                                            iters_b=iters[1], repeats=10)
        print(f"--- {name} (ceiling {bw/1e9:.0f} GB/s) ---")
        for k, rr in res.items():
            print(f"{name} {k}: {rr.ms_per_spmv:7.4f} ms "
                  f"{rr.gnnz_per_s:6.2f} Gnnz/s "
                  f"({rr.roofline_pct:4.1f}% roofline, "
                  f"{rr.true_eff_pct:4.1f}% true SoL)")


if __name__ == "__main__":
    main()
