"""Two-bank pooled segmented layout (formats/bank.py) vs the golden
oracle, the classic/pooled layouts, and the native C++ walk.

The banked layout attacks the scattered class's conflict wall (DESIGN.md
fact 16): each sublane row carries TWO lane→stripe maps (``b2`` bits
4-6) plus per-plane bank selector bits (``b2`` bits 0..P-1), so an
element conflicts only when BOTH banks claim its lane for other stripes.
Unlike the pooled layout this is NOT kernel-identical — the segmented
kernels add a second sublane gather and per-plane selects when
``dev.b2`` is set — so these tests cover all three kernel dispatch
variants (streamed-partials, fused-RMW, multi-RHS).
"""

import numpy as np
import pytest

import spmv_tpu
from spmv_tpu import synth
from spmv_tpu.device import DevSeg, x_to_table, y_from_padded
from spmv_tpu.formats.base import build_seg_plan
from spmv_tpu.formats.bank import (_bank_walk_py, bank_walk,
                                   banked_row_count, price_layouts3)
from spmv_tpu.formats.pool import _sorted_pool_views
from spmv_tpu.kernels.engines import segmented_spmv
from spmv_tpu.oracle import (check_result, engine_rel_tol, golden_spmv,
                             seg_engine_scale)

EDGES = sorted(synth.EDGE_CASES)


def _scattered(n=2048, seed=0):
    return synth.power_law(n=n, avg_nnz_per_row=24, bandwidth=512,
                           seed=seed)


def _run_banked(info, r, c, v, pack, x=None):
    rng = np.random.default_rng(7)
    if x is None:
        x = rng.standard_normal(info.ncols).astype(np.float32)
    plan = build_seg_plan(r, c, v, info.nrows, info.ncols, pack=pack,
                          bank=True)
    if plan.nnz == 0:
        return plan
    assert plan.b2 is not None
    dev = DevSeg.from_plan(plan)
    y = np.asarray(y_from_padded(segmented_spmv(
        dev, x_to_table(x, info.ncols)), info.nrows))
    expected = golden_spmv(info.nrows, r, c, v, x)
    scale = golden_spmv(info.nrows, r, c, np.abs(v), np.abs(x))
    scale = seg_engine_scale(plan, x, scale)
    lengths = np.bincount(np.asarray(r, np.int64),
                          minlength=info.nrows) if r.size else np.zeros(1)
    rep = check_result(expected, y, tol_abs=1e-5, scale=scale,
                       tol_rel=engine_rel_tol(int(lengths.max() or 1)))
    assert rep.ok, f"banked P={pack}: {rep}"
    return plan


@pytest.mark.parametrize("pack", [1, 2, 4])
def test_banked_matches_oracle_scattered(pack):
    info, r, c, v = _scattered()
    _run_banked(info, r, c, v, pack)


@pytest.mark.parametrize("pack", [2, 4])
def test_banked_matches_oracle_banded(pack):
    info, r, c, v = synth.synthetic_cant(n=1200, avg_nnz_per_row=16,
                                         bandwidth=96, seed=1)
    _run_banked(info, r, c, v, pack)


@pytest.mark.parametrize("edge", EDGES)
def test_banked_edge_cases(edge):
    info, r, c, v = synth.edge_case(edge)
    for pack in (1, 2, 4):
        _run_banked(info, r, c, v, pack)


def test_banked_duplicates_sum():
    info, r, c, v = synth.random_coo(500, 700, 4000, seed=3,
                                     allow_duplicates=True)
    for pack in (1, 2, 4):
        _run_banked(info, r, c, v, pack)


def test_banked_fewer_rows_on_scattered():
    """The point of the layout: on a scattered power-law matrix the
    two-bank walk emits fewer sublane rows than the classic per-run
    quantization (the single-bank pooled walk LOSES on this class —
    DESIGN.md fact 16)."""
    from spmv_tpu.formats.base import ROW_CAP, cdiv
    from spmv_tpu.formats.pool import pooled_row_count

    info, r, c, v = synth.power_law(n=16384, avg_nnz_per_row=24,
                                    bandwidth=512, seed=0)
    rows = np.asarray(r, np.int64)
    cols = np.asarray(c, np.int64)
    nstripes = cdiv(info.ncols, 128)
    segkey = ((rows >> 7) * nstripes + (cols >> 7)) * (info.nrows + 1) + rows
    useg, sizes = np.unique(segkey, return_counts=True)
    _, seg_run = np.unique(useg // (info.nrows + 1), return_inverse=True)
    nruns = int(seg_run.max()) + 1
    run_els = np.bincount(seg_run, weights=sizes.astype(np.float64),
                          minlength=nruns).astype(np.int64)
    run_nsegs = np.bincount(seg_run, minlength=nruns)
    for P in (2, 4):
        quads = np.maximum(-(-run_els // P), run_nsegs)
        classic_rows = int(np.sum(-(-quads // ROW_CAP)))
        banked_rows = banked_row_count(rows, cols, info.ncols, P)
        pooled_rows = pooled_row_count(rows, cols, info.ncols, P)
        # strictly fewer rows than both the classic quantization and the
        # single-bank pooled walk at the same P (the full-scale margins —
        # 36 % fewer quads on the 32k suite matrix, 21 % on pl_big — are
        # recorded by scripts/sim_bank3.py; this pins the ordering)
        assert banked_rows < classic_rows, (P, banked_rows, classic_rows)
        assert banked_rows < pooled_rows, (P, banked_rows, pooled_rows)


def test_pricer3_routes_by_class():
    """Scattered → banked; band/FEM keeps the pooled layout (banked's
    extra plane + gather tax must not pay where conflicts are rare and
    the pooled walk already reaches the element bound)."""
    pi, pr, pc_, pv = synth.power_law(n=131072, avg_nnz_per_row=24,
                                      bandwidth=512, seed=0)
    layout, P = price_layouts3(np.asarray(pr, np.int64),
                               np.asarray(pc_, np.int64), pi.nrows,
                               pi.ncols)
    assert layout == "bank" and P == 2, (layout, P)
    # the 32k suite matrix is dispatch-bound and stays classic (measured:
    # banked P=2 27.5 vs classic 31.5 Gnnz/s at 0.014 ms/SpMV —
    # scripts/probe_bank.py)
    si, sr, sc_, sv = synth.power_law(n=32768, avg_nnz_per_row=24,
                                      bandwidth=512, seed=0)
    layout, _ = price_layouts3(np.asarray(sr, np.int64),
                               np.asarray(sc_, np.int64), si.nrows,
                               si.ncols)
    assert layout == "classic", layout
    ci, cr, cc, cv = synth.synthetic_cant(n=16384, avg_nnz_per_row=64,
                                          bandwidth=350, seed=0)
    layout, P = price_layouts3(np.asarray(cr, np.int64),
                               np.asarray(cc, np.int64), ci.nrows,
                               ci.ncols)
    assert layout == "pool" and P == 4, (layout, P)


def test_native_matches_fallback():
    from spmv_tpu.formats import native_group

    if not native_group.available():
        pytest.skip("native plan_group unavailable")
    info, r, c, v = _scattered(seed=5)
    order, pid, lidv, stpv, lov = _sorted_pool_views(
        np.asarray(r, np.int64), np.asarray(c, np.int64), info.ncols)
    for pack in (1, 2, 4):
        nat = native_group.bank_pack(pid, lidv, stpv, lov, pack)
        ref = _bank_walk_py(pid, lidv, stpv, lov, pack)
        for a, b, nm in zip(nat, ref,
                            ("erow", "slot", "msb", "bank", "row_pool")):
            assert np.array_equal(a, b), (pack, nm)


def test_banked_plan_invariants():
    """Structural checks on the plan arrays: both banks' lane maps are
    functional (every element's stripe offset matches its bank's hi at
    its lane), selector bits land at element slots, and gidx stays a
    lane-monotone running max."""
    info, r, c, v = _scattered(seed=2)
    plan = build_seg_plan(r, c, v, info.nrows, info.ncols, pack=2,
                          bank=True)
    TM, P, _ = plan.vals.shape
    sb = plan.sub_base[np.arange(TM) // 8].astype(np.int64)
    hi2 = (plan.b2.astype(np.int64) >> 4) & 7
    # every nonzero element: its bank's hi plane at lane (col & 127)
    # equals its stripe offset
    rows_l, planes_l, qpos_l = np.nonzero(plan.vals)
    lo_v = plan.lo[rows_l, planes_l, qpos_l].astype(np.int64) & 127
    sel = (plan.b2[rows_l, qpos_l].astype(np.int64) >> planes_l) & 1
    hi0_at = plan.hi[rows_l, lo_v].astype(np.int64)
    hi1_at = hi2[rows_l, lo_v]
    hi_used = np.where(sel == 1, hi1_at, hi0_at)
    assert (hi_used >= 0).all() and (hi_used < 8).all()
    # gidx is a running max along lanes
    g = plan.gidx.astype(np.int64)
    assert (np.diff(g, axis=1) >= 0).all()


def test_banked_rejects_x2():
    info, r, c, v = _scattered(seed=4)
    plan = build_seg_plan(r, c, v, info.nrows, info.ncols, pack=2,
                          bank=True)
    plan_lo = build_seg_plan(r, c, v * 1e-8, info.nrows, info.ncols,
                             pack=2, bank=True)
    with pytest.raises(ValueError, match="f32x2"):
        DevSeg.from_plan(plan, plan_lo)


def test_formats_accept_bank_kwarg():
    info, r, c, v = _scattered(seed=6)
    x = np.random.default_rng(0).standard_normal(info.ncols)
    ref = golden_spmv(info.nrows, r, c, v, x)
    for fmt in ("csr", "coo", "cmrs"):
        a = spmv_tpu.from_coo(fmt, info.nrows, info.ncols, r, c, v,
                              bank=True)
        assert a.plan.b2 is not None, fmt
        y = np.asarray(a.matvec(x.astype(np.float32)))
        scale = golden_spmv(info.nrows, r, c, np.abs(v), np.abs(x))
        lengths = np.bincount(np.asarray(r, np.int64),
                              minlength=info.nrows)
        rep = check_result(ref, y, tol_abs=1e-5,
                           scale=seg_engine_scale(a.plan, x, scale),
                           tol_rel=engine_rel_tol(int(lengths.max() or 1)))
        assert rep.ok, f"{fmt}: {rep}"


def test_banked_spmm_multi_rhs():
    """The fused multi-RHS kernel takes the banked path too."""
    info, r, c, v = _scattered(seed=8)
    a = spmv_tpu.from_coo("csr", info.nrows, info.ncols, r, c, v,
                          bank=True)
    rng = np.random.default_rng(5)
    X = rng.standard_normal((info.ncols, 2)).astype(np.float32)
    Y = np.asarray(spmv_tpu.spmm(a, X))
    for j in range(2):
        ref = golden_spmv(info.nrows, r, c, v, X[:, j].astype(np.float64))
        scale = golden_spmv(info.nrows, r, c, np.abs(v),
                            np.abs(X[:, j].astype(np.float64)))
        lengths = np.bincount(np.asarray(r, np.int64),
                              minlength=info.nrows)
        rep = check_result(ref, Y[:, j], tol_abs=1e-5,
                           scale=seg_engine_scale(a.plan, X[:, j], scale),
                           tol_rel=engine_rel_tol(int(lengths.max() or 1)))
        assert rep.ok, f"rhs {j}: {rep}"


def test_banked_fused_small_stream():
    """A tiny banked stream auto-takes the fused-RMW dispatch variant."""
    info, r, c, v = _scattered(n=512, seed=9)
    plan = build_seg_plan(r, c, v, info.nrows, info.ncols, pack=2,
                          bank=True)
    dev = DevSeg.from_plan(plan)
    assert dev.fused, "expected the fused dispatch below 4 MB"
    x = np.random.default_rng(3).standard_normal(info.ncols)
    y = np.asarray(y_from_padded(segmented_spmv(
        dev, x_to_table(x.astype(np.float32), info.ncols)), info.nrows))
    ref = golden_spmv(info.nrows, r, c, v, x)
    scale = golden_spmv(info.nrows, r, c, np.abs(v), np.abs(x))
    lengths = np.bincount(np.asarray(r, np.int64), minlength=info.nrows)
    rep = check_result(ref, y, tol_abs=1e-5,
                       scale=seg_engine_scale(plan, x, scale),
                       tol_rel=engine_rel_tol(int(lengths.max() or 1)))
    assert rep.ok, str(rep)
