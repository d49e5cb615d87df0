"""On-chip compiled-kernel validation artifact (round-1 verdict item 7).

Runs every format's COMPILED Mosaic kernels (not interpret mode) on the
real TPU against the fp64 oracle across several matrix classes + packs and
writes TPUCHECK_r{N}.json.  Interpret-mode CPU tests can mask Mosaic-only
bugs (docs/DESIGN.md records a relayout bug found only on-chip); this is
the recorded proof that the compiled path ran green this round.

Usage: python scripts/tpucheck.py [round_number]
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    import jax

    backend = jax.default_backend()
    out = {"backend": backend, "devices": [str(d) for d in jax.devices()],
           "compiled": backend == "tpu", "checks": []}
    if backend != "tpu":
        print("WARNING: not on TPU — artifact will say compiled=false",
              file=sys.stderr)

    import spmv_tpu
    from spmv_tpu import synth
    from spmv_tpu.oracle import (check_result, engine_rel_tol, golden_spmv,
                                 seg_engine_scale)

    cases = {
        "band": synth.synthetic_cant(n=4096, avg_nnz_per_row=24,
                                     bandwidth=200, seed=1),
        "power_law": synth.power_law(n=4096, avg_nnz_per_row=16,
                                     bandwidth=256, seed=2),
        "random": synth.random_coo(2000, 2000, 30000, seed=3),
    }
    formats = ["coo", "csr", "ell", "sell", "cmrs", "hyb", "bsr"]
    ok_all = True
    for cname, (info, r, c, v) in cases.items():
        x = np.random.default_rng(0).standard_normal(
            info.ncols).astype(np.float32)
        expected = golden_spmv(info.nrows, r, c, v, x)
        row_abs = golden_spmv(info.nrows, r, c, np.abs(v), np.abs(x))
        lengths = np.bincount(r, minlength=info.nrows)
        tol = engine_rel_tol(int(lengths.max()))
        for fmt in formats:
            try:
                a = spmv_tpu.from_coo(fmt, info.nrows, info.ncols, r, c, v)
                y = np.asarray(a.matvec(x))
                scale = row_abs
                plan = getattr(a, "plan", None)
                if plan is not None and hasattr(plan, "gidx"):
                    scale = seg_engine_scale(plan, x, row_abs)
                rep = check_result(expected, y, tol_abs=1e-5, scale=scale,
                                   tol_rel=tol)
                out["checks"].append({
                    "matrix": cname, "format": fmt, "ok": bool(rep.ok),
                    "max_abs_err": rep.max_abs_err,
                    "pack": getattr(getattr(a, "plan", None), "pack", None),
                })
                ok_all &= rep.ok
                print(f"{cname:10s} {fmt:5s}: {rep}", file=sys.stderr)
            except Exception as e:  # noqa: BLE001 — artifact must record it
                out["checks"].append({"matrix": cname, "format": fmt,
                                      "ok": False, "error": str(e)})
                ok_all = False
                print(f"{cname:10s} {fmt:5s}: FAILED {e}", file=sys.stderr)

    out["ok"] = ok_all
    path = f"TPUCHECK_r{rnd:02d}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}: ok={ok_all}")
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
