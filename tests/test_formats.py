"""Every format kernel vs the golden oracle — the reference's
check_result discipline (helper_functions.h:184-236) plus the edge cases
where the reference harbors latent bugs (SURVEY.md §2.2)."""

import numpy as np
import pytest

import spmv_tpu
from spmv_tpu import synth
from spmv_tpu.oracle import check_result, engine_rel_tol, golden_spmv

FORMATS = ["coo", "csr", "ell", "sell", "cmrs", "hyb"]
EDGES = sorted(synth.EDGE_CASES)


def run_format(fmt, info, r, c, v, x=None):
    rng = np.random.default_rng(99)
    if x is None:
        x = rng.standard_normal(info.ncols)
    a = spmv_tpu.from_coo(fmt, info.nrows, info.ncols, r, c, v)
    y = np.asarray(a.matvec(x.astype(np.float32)))
    assert y.shape == (info.nrows,)
    expected = golden_spmv(info.nrows, r, c, v, x.astype(np.float32))
    scale = golden_spmv(info.nrows, r, c, np.abs(v), np.abs(x.astype(np.float32)))
    # Mirror the production validator (cli._validate): segmented-engine
    # plans bound by the sublane-window magnitude — the engine's
    # documented rounding model (oracle.seg_engine_scale), needed since
    # dense packing mixes rows of different magnitude into shared windows.
    # container_scale walks every SegPlan the container runs (main plan
    # or the priced spill part of hyb/ell/sell).
    from spmv_tpu.oracle import container_scale

    scale = container_scale(a, x.astype(np.float32), scale)
    lengths = np.bincount(r, minlength=info.nrows) if r.size else np.zeros(1)
    rep = check_result(
        expected, y, tol_abs=1e-5, scale=scale,
        tol_rel=engine_rel_tol(int(lengths.max() or 1)),
    )
    assert rep.ok, f"{fmt}: {rep}"
    return a


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("edge", EDGES)
def test_edge_cases(fmt, edge):
    info, r, c, v = synth.edge_case(edge)
    run_format(fmt, info, r, c, v)


@pytest.mark.parametrize("fmt", FORMATS)
def test_random_medium(fmt):
    info, r, c, v = synth.random_coo(500, 300, 4000, seed=3)
    run_format(fmt, info, r, c, v)


@pytest.mark.parametrize("fmt", FORMATS)
def test_band_matrix(fmt):
    info, r, c, v = synth.synthetic_cant(n=1024, avg_nnz_per_row=16,
                                         bandwidth=60, seed=5)
    run_format(fmt, info, r, c, v)


@pytest.mark.parametrize("fmt", FORMATS)
def test_reference_x_vector(fmt):
    # The reference uses x[i] = i (coo.c:88-92).
    info, r, c, v = synth.random_coo(200, 200, 1500, seed=11)
    x = spmv_tpu.default_x(info.ncols)
    run_format(fmt, info, r, c, v, x=x)


def test_coo_duplicates_sum():
    r = np.array([1, 1, 0])
    c = np.array([2, 2, 0])
    v = np.array([3.0, 4.0, 1.0])
    a = spmv_tpu.from_coo("coo", 3, 3, r, c, v)
    y = np.asarray(a.matvec(np.array([1.0, 1.0, 2.0], np.float32)))
    np.testing.assert_allclose(y, [1.0, 14.0, 0.0], atol=1e-5)


def test_coo_unsorted_input():
    rng = np.random.default_rng(0)
    n, nnz = 100, 600
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.standard_normal(nnz)
    x = rng.standard_normal(n).astype(np.float32)
    a = spmv_tpu.from_coo("coo", n, n, r, c, v)
    rep = check_result(golden_spmv(n, r, c, v, x), np.asarray(a.matvec(x)),
                       tol_abs=1e-4, tol_rel=1e-4)
    assert rep.ok, str(rep)


def test_csr_from_csr_roundtrip():
    info, r, c, v = synth.edge_case("empty_rows")
    a = spmv_tpu.CSRMatrix.from_coo(info.nrows, info.ncols, r, c, v)
    # ptr correct also for empty rows (reference bug: csr.c:72-91)
    lengths = np.bincount(r, minlength=info.nrows)
    np.testing.assert_array_equal(np.diff(a.ptr), lengths)
    b = spmv_tpu.CSRMatrix.from_csr(info.nrows, info.ncols, a.ptr, a.cols, a.vals)
    x = np.arange(info.ncols, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(a.matvec(x)), np.asarray(b.matvec(x)))


def test_ell_stats_include_last_row():
    # Reference bug: final row's length never flushed (ell.c:89-100).
    info, r, c, v = synth.edge_case("empty_rows")  # row 9 (last) is longest
    a = spmv_tpu.EllMatrix.from_coo(info.nrows, info.ncols, r, c, v)
    assert a.K == 5
    assert a.row_length_stats["longest"] == 5
    assert a.row_length_stats["shortest"] == 0


def test_cmrs_format_arrays():
    info, r, c, v = synth.edge_case("ragged")  # nrows=13, 13 % 8 != 0
    a = spmv_tpu.CMRSMatrix.from_coo(info.nrows, info.ncols, r, c, v)
    assert a.nstrips == 2
    assert a.strip_ptr[-1] == info.nnz
    assert (a.row_in_strip < a.height).all()
    # from_cmrs path gives the same result
    b = spmv_tpu.CMRSMatrix.from_cmrs(
        info.nrows, info.ncols, a.strip_ptr, a.row_in_strip, a.cols, a.vals
    )
    x = np.random.default_rng(1).standard_normal(info.ncols).astype(np.float32)
    np.testing.assert_allclose(np.asarray(a.matvec(x)), np.asarray(b.matvec(x)),
                               atol=1e-5)


def test_sell_sigma_variants():
    info, r, c, v = synth.synthetic_cant(n=700, avg_nnz_per_row=12,
                                         bandwidth=40, seed=9)
    x = np.random.default_rng(2).standard_normal(info.ncols).astype(np.float32)
    expected = golden_spmv(info.nrows, r, c, v, x)
    scale = golden_spmv(info.nrows, r, c, np.abs(v), np.abs(x))
    for sigma in (128, 256, 1024):
        a = spmv_tpu.SellMatrix.from_coo(info.nrows, info.ncols, r, c, v,
                                         sigma=sigma)
        rep = check_result(expected, np.asarray(a.matvec(x)),
                           tol_abs=1e-5, tol_rel=engine_rel_tol(12),
                           scale=scale)
        assert rep.ok, f"sigma={sigma}: {rep}"


def test_sell_padding_beats_ell_on_skewed():
    info, r, c, v = synth.edge_case("ragged")
    ell = spmv_tpu.EllMatrix.from_coo(info.nrows, info.ncols, r, c, v)
    sell = spmv_tpu.SellMatrix.from_coo(info.nrows, info.ncols, r, c, v,
                                        sigma=128)
    assert sell.plan.padded_slots <= ell.plan.padded_slots


@pytest.mark.parametrize("fmt", FORMATS)
def test_wide_rectangular(fmt):
    # ncols >> nrows: many x stripes per block, exercises window clamping
    info, r, c, v = synth.random_coo(100, 5000, 2500, seed=13)
    run_format(fmt, info, r, c, v)


@pytest.mark.parametrize("fmt", FORMATS)
def test_tall_rectangular(fmt):
    # nrows >> ncols: S floors at 8 table rows
    info, r, c, v = synth.random_coo(5000, 100, 2500, seed=14)
    run_format(fmt, info, r, c, v)


def test_vmem_budget_guard():
    # whole-y/whole-x residency bounds single-chip matrix size; the error
    # must point at the distributed layer.
    with pytest.raises(ValueError, match="RowShardedSpmv"):
        spmv_tpu.from_coo("csr", 8_000_000, 8_000_000, [0], [0], [1.0])


@pytest.mark.parametrize("fmt", ["csr", "coo", "cmrs"])
def test_heterogeneous_row_magnitudes(fmt):
    """Rows whose magnitudes differ by 1e4 share sublane windows in the
    segmented stream; the window-magnitude scale (oracle.seg_engine_scale)
    must bound the prefix-difference rounding where the per-row scale
    under-bounds it (ADVICE round-1, oracle.py:119)."""
    from spmv_tpu.oracle import seg_engine_scale

    info, r, c, v = synth.synthetic_cant(n=600, avg_nnz_per_row=12,
                                         bandwidth=60, seed=21)
    # scale each row by 10^(±2) alternating in short runs so tiny rows sit
    # in the same 127-element window as rows 1e4× larger
    row_scale = 10.0 ** (2.0 * np.where((r // 3) % 2 == 0, 1.0, -1.0))
    v = (v * row_scale).astype(np.float64)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(info.ncols)

    a = spmv_tpu.from_coo(fmt, info.nrows, info.ncols, r, c, v)
    y = np.asarray(a.matvec(x.astype(np.float32)))
    expected = golden_spmv(info.nrows, r, c, v, x.astype(np.float32))
    row_abs = golden_spmv(info.nrows, r, c, np.abs(v), np.abs(x.astype(np.float32)))
    scale = seg_engine_scale(a.plan, x.astype(np.float32), row_abs)
    assert (scale >= row_abs).all()  # window term only ever adds headroom
    lengths = np.bincount(r, minlength=info.nrows)
    rep = check_result(expected, y, tol_abs=1e-5, scale=scale,
                       tol_rel=engine_rel_tol(int(lengths.max())))
    assert rep.ok, f"{fmt}: {rep}"


def test_ell_format_arrays_roundtrip_and_cpu():
    """ELL's classical row-major (rows, K) arrays (ell.c:121-158): the
    format-native ingest round-trips, and an independent host recompute
    from those arrays matches the oracle — the cross-implementation
    redundancy the reference runs as compute_using_cpu (ell.c:357-383)."""
    info, r, c, v = synth.synthetic_cant(n=700, avg_nnz_per_row=9,
                                         bandwidth=70, seed=31)
    a = spmv_tpu.from_coo("ell", info.nrows, info.ncols, r, c, v)
    data, cols = a.ell_arrays()
    assert data.shape == (info.nrows, a.K) == cols.shape
    assert np.count_nonzero(data) == a.nnz

    rng = np.random.default_rng(8)
    x = rng.standard_normal(info.ncols)
    y_cpu = spmv_tpu.EllMatrix.cpu_spmv(data, cols, x)
    np.testing.assert_allclose(y_cpu, golden_spmv(info.nrows, r, c, v, x),
                               rtol=1e-12, atol=1e-12)

    b = spmv_tpu.EllMatrix.from_ell(info.nrows, info.ncols, data, cols)
    assert b.nnz == a.nnz and b.K == a.K
    np.testing.assert_allclose(np.asarray(b.matvec(x.astype(np.float32))),
                               np.asarray(a.matvec(x.astype(np.float32))),
                               rtol=1e-6, atol=1e-6)


def test_sell_format_arrays_roundtrip_and_cpu():
    """SELL-C-σ's classical sliced column-major arrays (sigma_c.c:156-202)
    + the independent host recompute the reference LACKS for this format
    (sigma_c.c has no compute_using_cpu, SURVEY.md §2.2)."""
    # skewed row lengths so the σ-sort actually applies (perm != identity)
    info, r, c, v = synth.synthetic_cant(n=700, avg_nnz_per_row=6,
                                         bandwidth=700, seed=33)
    heavy = (r % 97) == 0
    r = np.concatenate([r, np.repeat(r[heavy], 5)])
    c = np.concatenate([c, (np.arange(heavy.sum() * 5) * 13) % info.ncols])
    v = np.concatenate([v, np.full(heavy.sum() * 5, 0.5)])
    # dedupe (duplicates would sum in-kernel but break nnz accounting here)
    u = np.unique(r * info.ncols + c, return_index=True)[1]
    r, c, v = r[u], c[u], v[u]

    a = spmv_tpu.from_coo("sell", info.nrows, info.ncols, r, c, v)
    slice_ptr, data, cols = a.sell_arrays()
    assert slice_ptr[-1] == data.size == cols.size
    assert np.count_nonzero(data) == a.nnz

    rng = np.random.default_rng(9)
    x = rng.standard_normal(info.ncols)
    y_cpu = spmv_tpu.SellMatrix.cpu_spmv(slice_ptr, data, cols, a.perm, x,
                                         info.nrows)
    np.testing.assert_allclose(y_cpu, golden_spmv(info.nrows, r, c, v, x),
                               rtol=1e-12, atol=1e-12)

    b = spmv_tpu.SellMatrix.from_sell(info.nrows, info.ncols, slice_ptr,
                                      data, cols, a.perm)
    assert b.nnz == a.nnz
    np.testing.assert_allclose(np.asarray(b.matvec(x.astype(np.float32))),
                               np.asarray(a.matvec(x.astype(np.float32))),
                               rtol=1e-5, atol=1e-5)


def test_sell_wins_on_banded_power_law():
    """The matrix class where the σ-sort earns its place (round-1 verdict
    item 3): scale-free row lengths + column locality.  In the pure-panel
    execution SELL must sort, stream strictly fewer bytes than ELL, and
    stay correct."""
    info, r, c, v = synth.power_law(n=4096, avg_nnz_per_row=16,
                                    bandwidth=256, seed=2)
    ell = spmv_tpu.EllMatrix.from_coo(info.nrows, info.ncols, r, c, v,
                                      split=False)
    sell = spmv_tpu.SellMatrix.from_coo(info.nrows, info.ncols, r, c, v,
                                        split=False)
    assert sell.sorted_rows
    assert (sell.plan.stream_bytes + sell.epilogue_bytes
            < 0.75 * ell.plan.stream_bytes)
    run_format("sell", info, r, c, v)
    run_format("ell", info, r, c, v)


def test_panel_formats_auto_split_on_hostile_classes():
    """Round-4 lowering (formats.split): on panel-hostile matrices the
    ELL/SELL device plans route the mini-panel tails into the segmented
    stream, so their streamed bytes can never exceed the panel/segmented
    break-even — the round-3 verdict's 2.39× padding gap.  The classical
    format surface (K, stats, arrays) must be untouched by the routing."""
    from spmv_tpu.bench.runner import traffic_model

    info, r, c, v = synth.power_law(n=4096, avg_nnz_per_row=16,
                                    bandwidth=256, seed=2)
    ell = spmv_tpu.EllMatrix.from_coo(info.nrows, info.ncols, r, c, v)
    pure = spmv_tpu.EllMatrix.from_coo(info.nrows, info.ncols, r, c, v,
                                       split=False)
    assert ell.panel_nnz + ell.spill_nnz == ell.nnz
    assert ell.spill_nnz > 0  # this class must not stay pure panel
    assert traffic_model(ell)[1] < traffic_model(pure)[1]
    # format semantics identical either way
    assert ell.K == pure.K and ell.row_length_stats == pure.row_length_stats
    da, ca = ell.ell_arrays()
    db, cb = pure.ell_arrays()
    np.testing.assert_array_equal(da, db)
    np.testing.assert_array_equal(ca, cb)

    sell = spmv_tpu.SellMatrix.from_coo(info.nrows, info.ncols, r, c, v)
    assert sell.panel_nnz + sell.spill_nnz == sell.nnz
    sp, d_, c_ = sell.sell_arrays()
    sp2, d2, c2 = spmv_tpu.SellMatrix.from_coo(
        info.nrows, info.ncols, r, c, v, split=False).sell_arrays()
    np.testing.assert_array_equal(sp, sp2)
    np.testing.assert_array_equal(d_, d2)


def test_hyb_shape_choice_depends_on_matrix_class():
    """HYB prices pure-panel / hybrid / pure-spill with the packed-engine
    byte model + dispatch overhead and keeps the cheapest (round-1 verdict
    item 9: the old single constant was tuned on one band matrix).  The
    choice must change across structurally different classes, and stay
    correct either way."""
    from spmv_tpu.formats.hyb import HybMatrix

    # band: segmented stream is strictly cheaper -> pure spill
    info, r, c, v = synth.synthetic_cant(n=2048, avg_nnz_per_row=16,
                                         bandwidth=100, seed=0)
    a = HybMatrix.from_coo(info.nrows, info.ncols, r, c, v)
    assert a.panel_nnz == 0 and a.spill_nnz == a.nnz
    run_format("hyb", info, r, c, v)

    # block-dense stripes: panels pad 1.0x and cost less per byte -> panel
    n = 1024
    rows = np.repeat(np.arange(n), 128)
    cols = (rows // 128) * 128 + np.tile(np.arange(128), n)
    vals = np.ones(rows.size)
    b = HybMatrix.from_coo(n, n, rows, cols, vals)
    assert b.spill_nnz == 0 and b.panel_nnz == b.nnz
    x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    rep = check_result(golden_spmv(n, rows, cols, vals, x),
                       np.asarray(b.matvec(x)), tol_abs=1e-4,
                       tol_rel=engine_rel_tol(128),
                       scale=golden_spmv(n, rows, cols, vals, np.abs(x)))
    assert rep.ok, str(rep)


@pytest.mark.parametrize("fmt", ["csr", "ell"])
def test_fused_and_partials_paths_agree(fmt):
    """Both engine dispatch variants — the single-dispatch fused-RMW
    kernel (small streams, ``dev.fused``) and the two-dispatch
    streamed-partials pair (production scale, DESIGN.md fact 9) — must
    produce identical results on the same device plan."""
    from spmv_tpu.device import y_from_padded
    from spmv_tpu.kernels.engines import (panel_spmv_fused,
                                          panel_spmv_partials,
                                          segmented_spmv_fused,
                                          segmented_spmv_partials)

    info, r, c, v = synth.random_coo(700, 500, 6000, seed=21)
    # split=False: this test drives the PANEL engine variants directly on
    # a.dev, so ELL must keep everything in the pure panel plan
    kw = {} if fmt == "csr" else {"split": False}
    a = spmv_tpu.from_coo(fmt, info.nrows, info.ncols, r, c, v, **kw)
    assert a.dev.fused  # test matrices are far below the threshold
    x = np.random.default_rng(7).standard_normal(info.ncols).astype(np.float32)
    from spmv_tpu.device import x_to_table

    x2d = x_to_table(x, info.ncols)
    fns = ((segmented_spmv_fused, segmented_spmv_partials)
           if fmt == "csr" else (panel_spmv_fused, panel_spmv_partials))
    yf = np.asarray(y_from_padded(fns[0](a.dev, x2d), info.nrows))
    yp = np.asarray(y_from_padded(fns[1](a.dev, x2d), info.nrows))
    np.testing.assert_allclose(yf, yp, rtol=1e-6, atol=1e-6)
    expected = golden_spmv(info.nrows, r, c, v, x)
    scale = golden_spmv(info.nrows, r, c, np.abs(v), np.abs(x))
    rep = check_result(expected, yf, tol_abs=1e-4,
                       tol_rel=engine_rel_tol(64), scale=scale)
    assert rep.ok, str(rep)


def test_fused_declined_when_vectors_fill_vmem():
    """A huge-but-hypersparse matrix has a tiny stream (fused-eligible by
    bytes) but x+y cannot be co-resident — the fused predicate must
    decline so the two-dispatch path (x in the main kernel, y in the
    epilogue) keeps it compilable."""
    n = 3_000_000
    a = spmv_tpu.from_coo("csr", n, n, np.array([0, n - 1]),
                          np.array([0, n - 1]), np.array([1.0, 2.0]))
    assert not a.dev.fused
    small = spmv_tpu.from_coo("csr", 1000, 1000, np.array([0, 999]),
                              np.array([0, 999]), np.array([1.0, 2.0]))
    assert small.dev.fused


# ---------------------------------------------------------------- to_coo

ALL_FORMATS = FORMATS + ["bsr"]


def _dense_from_triplets(nrows, ncols, r, c, v):
    d = np.zeros((nrows, ncols), np.float64)
    np.add.at(d, (r, c), v)
    return d


@pytest.mark.parametrize("fmt", ALL_FORMATS)
def test_to_coo_roundtrip(fmt):
    """from_coo -> to_coo -> dense equals the input dense operator, for
    every format (the shared accessor surface — round-4 advisor item).
    BSR stores f32 tiles, so its values round-trip at f32 precision."""
    info, r, c, v = synth.random_coo(300, 260, 2500, seed=17)
    a = spmv_tpu.from_coo(fmt, info.nrows, info.ncols, r, c, v)
    r2, c2, v2 = a.to_coo()
    atol = 1e-6 if fmt == "bsr" else 1e-12
    np.testing.assert_allclose(
        _dense_from_triplets(info.nrows, info.ncols, r2, c2, v2),
        _dense_from_triplets(info.nrows, info.ncols, r, c, v),
        rtol=0, atol=atol)


@pytest.mark.parametrize("fmt", ALL_FORMATS)
def test_to_coo_roundtrip_duplicates(fmt):
    """Duplicate COO input entries: the reconstructed operator must match
    the duplicate-summed dense (BSR/intermediate plans sum them)."""
    info, r, c, v = synth.random_coo(64, 64, 500, seed=23,
                                     allow_duplicates=True)
    a = spmv_tpu.from_coo(fmt, info.nrows, info.ncols, r, c, v)
    r2, c2, v2 = a.to_coo()
    atol = 1e-6 if fmt == "bsr" else 1e-12
    np.testing.assert_allclose(
        _dense_from_triplets(info.nrows, info.ncols, r2, c2, v2),
        _dense_from_triplets(info.nrows, info.ncols, r, c, v),
        rtol=0, atol=atol)


def test_to_coo_from_cmrs_ingest():
    """to_coo round-trips through the classical CMRS ingest path too."""
    from spmv_tpu.formats.cmrs import CMRSMatrix

    info, r, c, v = synth.random_coo(40, 40, 300, seed=5)
    a = spmv_tpu.from_coo("cmrs", info.nrows, info.ncols, r, c, v)
    b = CMRSMatrix.from_cmrs(info.nrows, info.ncols, a.strip_ptr,
                             a.row_in_strip, a.cols, a.vals,
                             height=a.height)
    r2, c2, v2 = b.to_coo()
    np.testing.assert_allclose(
        _dense_from_triplets(info.nrows, info.ncols, r2, c2, v2),
        _dense_from_triplets(info.nrows, info.ncols, r, c, v),
        rtol=0, atol=1e-12)


def test_to_coo_returns_copies():
    """Mutating the returned triplets must not desync the container's
    host state from the device plan (round-4 advisor item)."""
    info, r, c, v = synth.random_coo(50, 50, 200, seed=2)
    for fmt in ALL_FORMATS:
        a = spmv_tpu.from_coo(fmt, info.nrows, info.ncols, r, c, v)
        r2, c2, v2 = a.to_coo()
        before = (r2.copy(), c2.copy(), v2.copy())
        r2[:] = 0
        c2[:] = 0
        v2[:] = 0.0
        r3, c3, v3 = a.to_coo()
        assert np.array_equal(r3, before[0]), fmt
        assert np.array_equal(c3, before[1]), fmt
        assert np.array_equal(v3, before[2]), fmt
