import numpy as np

from spmv_tpu import synth
from spmv_tpu.oracle import CheckReport, check_result, default_x, golden_spmv


def test_golden_matches_dense(rng):
    info, r, c, v = synth.random_coo(40, 30, 200, seed=7)
    x = rng.standard_normal(30)
    dense = np.zeros((40, 30))
    dense[r, c] = v
    np.testing.assert_allclose(golden_spmv(40, r, c, v, x), dense @ x, rtol=1e-12)


def test_golden_sums_duplicates():
    r = np.array([1, 1])
    c = np.array([2, 2])
    v = np.array([3.0, 4.0])
    x = np.array([0.0, 0.0, 2.0])
    y = golden_spmv(3, r, c, v, x)
    np.testing.assert_allclose(y, [0.0, 14.0, 0.0])


def test_default_x():
    np.testing.assert_array_equal(default_x(4), [0.0, 1.0, 2.0, 3.0])


def test_check_result_pass_fail():
    a = np.array([1.0, 2.0])
    assert check_result(a, a + 5e-7)
    rep = check_result(a, a + 5e-6)
    assert not rep.ok and rep.first_bad == 0
    assert "wrong" in str(rep)
    rep2 = check_result(a, a * (1 + 1e-7), tol_abs=0.0, tol_rel=1e-6)
    assert rep2.ok


def test_edge_case_generators_consistent():
    for name in synth.EDGE_CASES:
        info, r, c, v = synth.edge_case(name)
        assert info.nnz == r.size == c.size == v.size
        if r.size:
            assert r.max() < info.nrows and c.max() < info.ncols
        # sorted by (row, col)
        key = r.astype(np.int64) * info.ncols + c
        assert (np.diff(key) > 0).all() if r.size > 1 else True
