"""Geometry sweep for the packed segmented engine on the real bench
matrix: (chunk, ns, kva) → measured streaming rate.  Drives the
production plan/splitter/kernel end-to-end, so numbers transfer directly
to `pick_geometry`/`seg_kva` defaults."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


class _W:
    def __init__(self, dev):
        self.dev = dev
        self.nrows, self.ncols, self.nnz = dev.nrows, dev.ncols, dev.nnz

    def padded_matvec(self, x2d):
        from spmv_tpu.kernels.engines import segmented_spmv

        return segmented_spmv(self.dev, x2d)


def main():
    import jax.numpy as jnp

    from spmv_tpu import synth
    from spmv_tpu.bench.runner import bench_formats_interleaved
    from spmv_tpu.device import DevSeg, split_packed_arrays
    from spmv_tpu.formats.base import build_seg_plan

    info, r, c, v = synth.synthetic_cant(n=62464, avg_nnz_per_row=64,
                                         bandwidth=350, seed=0)
    plan = build_seg_plan(r, c, v, info.nrows, info.ncols)
    print(f"plan: pack={plan.pack} TM={plan.vals.shape[0]} "
          f"pad={plan.padding_ratio:.2f}", file=sys.stderr)

    # chunk ≤ 128: the windowed y-reduction meta plane stores one u8
    # window target per row in a (TM/chunk, 128) stream — one meta row
    # per sub-chunk (window_meta), so larger chunks no longer exist.
    geoms = [(128, 16, 2), (128, 16, 4), (128, 8, 2), (128, 8, 4),
             (128, 4, 4), (64, 2, 2)]
    if len(sys.argv) > 1:
        geoms = [tuple(map(int, g.split(","))) for g in sys.argv[1:]]
    objs = {}
    for chunk, ns, kva in geoms:
        try:
            import spmv_tpu.device as dm
            orig = dm.seg_kva
            dm.seg_kva = lambda p, n: kva
            try:
                d = split_packed_arrays(
                    {"vals": plan.vals, "lo": plan.lo, "hi": plan.hi,
                     "gidx": plan.gidx, "row_block": plan.row_block,
                     "sub_base": plan.sub_base}, chunk, ns, plan.pack,
                    seg=True, nrows=plan.nrows)
            finally:
                dm.seg_kva = orig
            dev = DevSeg(
                vals=tuple(jnp.asarray(d[f"vals{j}"])
                           for j in range(plan.pack * kva)),
                lo=tuple(jnp.asarray(d[f"lo{j}"])
                         for j in range(plan.pack)),
                hi=jnp.asarray(d["hi"]), gidx=jnp.asarray(d["gidx"]),
                meta=jnp.asarray(d["meta"]),
                base_w=jnp.asarray(d["base_w"]),
                sub_base=jnp.asarray(d["sub_base"]),
                chunk=chunk, ns=ns, pack=plan.pack,
                w_rows=d["w_rows"], out_rows=d["out_rows"],
                nrows=plan.nrows, ncols=plan.ncols, nnz=plan.nnz)
            objs[f"c{chunk}n{ns}k{kva}"] = _W(dev)
        except Exception as e:
            print(f"chunk={chunk} ns={ns} kva={kva}: BUILD FAILED "
                  f"{type(e).__name__}: {e}")
    # interleaved so every geometry samples the same contention windows
    results, bw = bench_formats_interleaved(objs, probe=True,
                                            iters_a=200, iters_b=1000)
    print(f"bw={bw/1e9:.0f} GB/s")
    for name, res in results.items():
        print(f"{name:14s}: {res.ms_per_spmv:7.3f} ms "
              f"{res.gnnz_per_s:6.2f} Gnnz/s "
              f"{res.effective_gbps:5.0f} GB/s ({res.roofline_pct:.1f}%)")


if __name__ == "__main__":
    main()
