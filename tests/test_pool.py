"""Pooled per-lane-hi segmented layout (formats/pool.py) vs the golden
oracle, the classic layout, and the native C++ walk.

The pooled layout removes the per-(block,stripe)-run sublane-row
quantization on band/FEM matrices by letting rows of one (block,
8-stripe window) pool share sublane rows — valid because the kernels'
two-step x-gather reads ``hi`` per lane (``engines._packed_products``).
No kernel changes: these tests run the standard ``segmented_spmv`` on
the pooled ``SegPlan``.
"""

import numpy as np
import pytest

import spmv_tpu
from spmv_tpu import synth
from spmv_tpu.device import DevSeg, x_to_table, y_from_padded
from spmv_tpu.formats.base import build_seg_plan
from spmv_tpu.formats.pool import (_pool_walk_py, _sorted_pool_views,
                                   pick_pack_pooled, pool_walk,
                                   pooled_row_count, price_layouts)
from spmv_tpu.kernels.engines import segmented_spmv
from spmv_tpu.oracle import (check_result, engine_rel_tol, golden_spmv,
                             seg_engine_scale)

EDGES = sorted(synth.EDGE_CASES)


def _banded(n=1200, seed=1):
    return synth.synthetic_cant(n=n, avg_nnz_per_row=16, bandwidth=96,
                                seed=seed)


def _run_pooled(info, r, c, v, pack, x=None):
    rng = np.random.default_rng(7)
    if x is None:
        x = rng.standard_normal(info.ncols).astype(np.float32)
    plan = build_seg_plan(r, c, v, info.nrows, info.ncols, pack=pack,
                          pool=True)
    if plan.nnz == 0:
        return plan
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
    assert rep.ok, f"pooled P={pack}: {rep}"
    return plan


@pytest.mark.parametrize("pack", [1, 2, 4])
def test_pooled_matches_oracle_banded(pack):
    info, r, c, v = _banded()
    _run_pooled(info, r, c, v, pack)


@pytest.mark.parametrize("edge", EDGES)
def test_pooled_edge_cases(edge):
    info, r, c, v = synth.edge_case(edge)
    for pack in (1, 2, 4):
        _run_pooled(info, r, c, v, pack)


def test_pooled_duplicates_sum():
    info, r, c, v = synth.random_coo(500, 700, 4000, seed=3,
                                     allow_duplicates=True)
    for pack in (1, 2, 4):
        _run_pooled(info, r, c, v, pack)


def test_pooled_fewer_rows_on_band():
    """The point of the layout: on a band/FEM matrix the pooled walk
    emits fewer sublane rows than the classic per-run quantization."""
    from spmv_tpu.formats.base import ROW_CAP, _run_heads, cdiv

    info, r, c, v = synth.synthetic_cant(n=16384, avg_nnz_per_row=64,
                                         bandwidth=350, seed=0)
    rows = np.asarray(r, np.int64)
    cols = np.asarray(c, np.int64)
    nstripes = cdiv(info.ncols, 128)
    segkey = ((rows >> 7) * nstripes + (cols >> 7)) * (info.nrows + 1) + rows
    useg, sizes = np.unique(segkey, return_counts=True)
    _, seg_run = np.unique(useg // (info.nrows + 1), return_inverse=True)
    P = 4
    nruns = int(seg_run.max()) + 1
    run_els = np.bincount(seg_run, weights=sizes.astype(np.float64),
                          minlength=nruns).astype(np.int64)
    run_nsegs = np.bincount(seg_run, minlength=nruns)
    quads = np.maximum(-(-run_els // P), run_nsegs)
    classic_rows = int(np.sum(-(-quads // ROW_CAP)))
    pooled_rows = pooled_row_count(rows, cols, info.ncols, P)
    # raw-row win before emission pads; the (window, block) emission order
    # adds the other half of the measured −17 % TM on the full-size cant
    assert pooled_rows < 0.95 * classic_rows, (pooled_rows, classic_rows)


def test_pricer_routes_by_class():
    """Band/FEM pools; the scattered power-law class keeps the classic
    layout (its lane-map conflicts defer 80-160% of elements — the
    round-5 measured dead end, docs/DESIGN.md)."""
    ci, cr, cc, cv = synth.synthetic_cant(n=16384, avg_nnz_per_row=64,
                                          bandwidth=350, seed=0)
    pooled, pk = price_layouts(np.asarray(cr, np.int64),
                               np.asarray(cc, np.int64), ci.nrows, ci.ncols)
    assert pooled and pk == 4
    pi, pr, pc_, pv = synth.power_law(n=8192, avg_nnz_per_row=24,
                                      bandwidth=512, seed=0)
    pooled, _ = price_layouts(np.asarray(pr, np.int64),
                              np.asarray(pc_, np.int64), pi.nrows, pi.ncols)
    assert not pooled


def test_native_matches_fallback():
    from spmv_tpu.formats import native_group

    if not native_group.available():
        pytest.skip("native plan_group unavailable")
    info, r, c, v = _banded(seed=5)
    order, pid, lidv, stpv, lov = _sorted_pool_views(
        np.asarray(r, np.int64), np.asarray(c, np.int64), info.ncols)
    for pack in (1, 2, 4):
        nat = native_group.pool_pack(pid, lidv, stpv, lov, pack)
        ref = _pool_walk_py(pid, lidv, stpv, lov, pack)
        for a, b, nm in zip(nat, ref, ("erow", "slot", "msb", "row_pool")):
            assert np.array_equal(a, b), (pack, nm)


def test_pooled_hi_is_functional():
    """Every element's per-lane hi agrees with its stripe — the two-step
    gather's exactness condition, checked directly on the plan arrays."""
    info, r, c, v = _banded(seed=9)
    plan = build_seg_plan(r, c, v, info.nrows, info.ncols, pack=4,
                          pool=True)
    # reconstruct: for every element slot, hi at lane (col & 127) must be
    # stripe - sub_base of its row's group
    TM = plan.hi.shape[0]
    sb = plan.sub_base[np.arange(TM) // 8].astype(np.int64)
    nz = np.nonzero(plan.vals)  # (row, plane, qpos) of real elements
    lo_v = plan.lo[nz].astype(np.int64) & 127
    hi_at_lo = plan.hi[nz[0], lo_v].astype(np.int64)
    assert (hi_at_lo >= 0).all() and (hi_at_lo < 8).all()


def test_pick_pack_pooled_runs():
    info, r, c, v = _banded(seed=3)
    P = pick_pack_pooled(np.asarray(r, np.int64), np.asarray(c, np.int64),
                         info.nrows, info.ncols)
    assert P in (1, 2, 4)


def test_formats_accept_pool_kwarg():
    info, r, c, v = _banded(seed=2)
    x = np.random.default_rng(0).standard_normal(info.ncols)
    ref = golden_spmv(info.nrows, r, c, v, x)
    for fmt in ("csr", "coo", "cmrs"):
        a = spmv_tpu.from_coo(fmt, info.nrows, info.ncols, r, c, v,
                              pool=True)
        y = np.asarray(a.matvec(x))
        assert np.abs(y - ref).max() < 1e-2
