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
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    backend = jax.default_backend()
    out = {"backend": backend, "devices": [str(d) for d in jax.devices()],
           "compiled": backend == "tpu", "checks": []}
    if backend != "tpu":
        print("WARNING: not on TPU — artifact will say compiled=false",
              file=sys.stderr)

    import spmv_tpu
    from spmv_tpu import synth
    from spmv_tpu.oracle import (check_result, container_scale,
                                 engine_rel_tol, golden_spmv)

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
                # every SegPlan the container actually runs (main plan or
                # the priced spill part of hyb/ell/sell; SELL's maps back
                # through its σ-permutation)
                scale = container_scale(a, x, row_abs)
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

    # round-5 pooled per-lane-hi layout, forced on every class × pack
    # (the pricer would keep pooling to the band class; forcing it proves
    # the compiled gather handles mixed-stripe rows on all classes)
    from spmv_tpu.formats.base import build_seg_plan
    from spmv_tpu.device import DevSeg, x_to_table, y_from_padded
    from spmv_tpu.kernels.engines import segmented_spmv
    from spmv_tpu.oracle import seg_engine_scale

    for cname, (info, r, c, v) in cases.items():
        x = np.random.default_rng(4).standard_normal(
            info.ncols).astype(np.float32)
        expected = golden_spmv(info.nrows, r, c, v, x)
        row_abs = golden_spmv(info.nrows, r, c, np.abs(v), np.abs(x))
        lengths = np.bincount(r, minlength=info.nrows)
        tol = engine_rel_tol(int(lengths.max()))
        for pack in (1, 2, 4):
            try:
                plan = build_seg_plan(r, c, v, info.nrows, info.ncols,
                                      pack=pack, pool=True)
                dev = DevSeg.from_plan(plan)
                y = np.asarray(y_from_padded(
                    segmented_spmv(dev, x_to_table(x, info.ncols)),
                    info.nrows))
                rep = check_result(expected, y, tol_abs=1e-5,
                                   scale=seg_engine_scale(plan, x, row_abs),
                                   tol_rel=tol)
                out["checks"].append({
                    "matrix": cname, "format": f"pooled-P{pack}",
                    "ok": bool(rep.ok), "max_abs_err": rep.max_abs_err,
                    "pad": round(plan.padding_ratio, 3)})
                ok_all &= rep.ok
                print(f"{cname:10s} pooled-P{pack}: {rep}", file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                out["checks"].append({"matrix": cname,
                                      "format": f"pooled-P{pack}",
                                      "ok": False, "error": str(e)})
                ok_all = False
                print(f"{cname:10s} pooled-P{pack}: FAILED {e}",
                      file=sys.stderr)

    # round-5 two-bank layout, forced on every class × pack (the pricer
    # keeps it to large scattered matrices; forcing proves the compiled
    # second sublane gather + per-plane selects on all classes)
    for cname, (info, r, c, v) in cases.items():
        x = np.random.default_rng(4).standard_normal(
            info.ncols).astype(np.float32)
        expected = golden_spmv(info.nrows, r, c, v, x)
        row_abs = golden_spmv(info.nrows, r, c, np.abs(v), np.abs(x))
        lengths = np.bincount(r, minlength=info.nrows)
        tol = engine_rel_tol(int(lengths.max()))
        for pack in (1, 2, 4):
            try:
                plan = build_seg_plan(r, c, v, info.nrows, info.ncols,
                                      pack=pack, bank=True)
                dev = DevSeg.from_plan(plan)
                y = np.asarray(y_from_padded(
                    segmented_spmv(dev, x_to_table(x, info.ncols)),
                    info.nrows))
                rep = check_result(expected, y, tol_abs=1e-5,
                                   scale=seg_engine_scale(plan, x, row_abs),
                                   tol_rel=tol)
                out["checks"].append({
                    "matrix": cname, "format": f"banked-P{pack}",
                    "ok": bool(rep.ok), "max_abs_err": rep.max_abs_err,
                    "pad": round(plan.padding_ratio, 3)})
                ok_all &= rep.ok
                print(f"{cname:10s} banked-P{pack}: {rep}", file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                out["checks"].append({"matrix": cname,
                                      "format": f"banked-P{pack}",
                                      "ok": False, "error": str(e)})
                ok_all = False
                print(f"{cname:10s} banked-P{pack}: FAILED {e}",
                      file=sys.stderr)

    # round-5 symmetric triangle storage vs the expanded oracle
    try:
        info, r, c, v = cases["band"]
        keep = r >= c
        tr, tc, tv = r[keep], c[keep], v[keep]
        s = tr > tc
        er = np.concatenate([tr, tc[s]])
        ec = np.concatenate([tc, tr[s]])
        ev = np.concatenate([tv, tv[s]])
        x = np.random.default_rng(5).standard_normal(
            info.ncols).astype(np.float32)
        a = spmv_tpu.from_coo("sym", info.nrows, info.ncols, tr, tc, tv)
        rep = check_result(
            golden_spmv(info.nrows, er, ec, ev, x),
            np.asarray(a.matvec(x)), tol_abs=1e-5,
            scale=golden_spmv(info.nrows, er, ec, np.abs(ev), np.abs(x)),
            tol_rel=engine_rel_tol(
                int(np.bincount(er, minlength=info.nrows).max())))
        out["checks"].append({"matrix": "band", "format": "sym",
                              "ok": bool(rep.ok),
                              "max_abs_err": rep.max_abs_err})
        ok_all &= rep.ok
        print(f"band       sym  : {rep}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        out["checks"].append({"matrix": "band", "format": "sym",
                              "ok": False, "error": str(e)})
        ok_all = False
        print(f"band       sym  : FAILED {e}", file=sys.stderr)

    # f32x2 extended precision at the reference's abs 1e-6 EPSILON
    # (helper_functions.h:11) — the fp64-parity capability rows.
    from spmv_tpu.x2 import X2Matrix

    info, r, c, v = cases["band"]
    v64 = np.asarray(v, np.float64) * (1 + 1e-9 * np.arange(v.size))
    x64 = np.random.default_rng(7).standard_normal(info.ncols)
    A_x = golden_spmv(info.nrows, r, c, v64, x64)
    for fmt in ("csr", "ell", "sell"):
        try:
            a = X2Matrix.from_coo(fmt, info.nrows, info.ncols, r, c, v64)
            err = float(np.abs(a.matvec(x64) - A_x).max())
            ok = err < 1e-6
            out["checks"].append({"matrix": "band", "format": f"{fmt}/x2",
                                  "ok": ok, "max_abs_err": err,
                                  "tol_abs": 1e-6})
            ok_all &= ok
            print(f"band       {fmt}/x2: abs err {err:.3e} (tol 1e-6)",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            out["checks"].append({"matrix": "band", "format": f"{fmt}/x2",
                                  "ok": False, "error": str(e)})
            ok_all = False
            print(f"band       {fmt}/x2: FAILED {e}", file=sys.stderr)

    # beyond-VMEM tiled path, compiled on chip
    try:
        from spmv_tpu.big import TiledSpmv

        info, r, c, v = cases["band"]
        x = np.random.default_rng(8).standard_normal(
            info.ncols).astype(np.float32)
        t = TiledSpmv("csr", info.nrows, info.ncols, r, c, v,
                      slab_rows=2048, panel_cols=2048)
        rep = check_result(golden_spmv(info.nrows, r, c, v, x), t.matvec(x),
                           tol_abs=1e-4, tol_rel=1e-4,
                           scale=golden_spmv(info.nrows, r, c, np.abs(v),
                                             np.abs(x)))
        out["checks"].append({"matrix": "band", "format": "csr/tiled",
                              "ok": bool(rep.ok),
                              "max_abs_err": rep.max_abs_err,
                              "tiles": [t.DR, t.DC]})
        ok_all &= rep.ok
        print(f"band       csr/tiled ({t.DR}x{t.DC}): {rep}",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        out["checks"].append({"matrix": "band", "format": "csr/tiled",
                              "ok": False, "error": str(e)})
        ok_all = False
        print(f"band       csr/tiled: FAILED {e}", file=sys.stderr)

    # fused multi-RHS engine pass (api.spmm, 2 <= R <= MULTI_RHS_MAX)
    try:
        info, r, c, v = cases["power_law"]
        A = np.zeros((info.nrows, info.ncols))
        A[r, c] = v
        X = np.random.default_rng(9).standard_normal(
            (info.ncols, 4)).astype(np.float32)
        ref = A @ X
        for fmt in ("csr", "hyb"):
            a = spmv_tpu.from_coo(fmt, info.nrows, info.ncols, r, c, v)
            Y = np.asarray(spmv_tpu.spmm(a, X))
            err = float(np.abs(Y - ref).max() / max(np.abs(ref).max(), 1.0))
            ok = err < 2e-3
            out["checks"].append({"matrix": "power_law",
                                  "format": f"{fmt}/spmm-R4",
                                  "ok": ok, "max_rel_err": err})
            ok_all &= ok
            print(f"power_law  {fmt}/spmm-R4: rel err {err:.3e}",
                  file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        out["checks"].append({"matrix": "power_law", "format": "spmm-R4",
                              "ok": False, "error": str(e)})
        ok_all = False
        print(f"power_law  spmm-R4: FAILED {e}", file=sys.stderr)

    out["ok"] = ok_all
    path = f"TPUCHECK_r{rnd:02d}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}: ok={ok_all}")
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
