"""Iterative solvers over the device formats (CPU mesh, interpret mode)."""

import numpy as np
import pytest

import spmv_tpu
from spmv_tpu.solve import cg, power_iteration


def _spd(n=260, seed=5, density=0.02):
    """Small sparse SPD matrix: B^T B + n·I (diagonally dominant)."""
    rng = np.random.default_rng(seed)
    nnz = int(n * n * density)
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.standard_normal(nnz)
    B = np.zeros((n, n))
    B[r, c] += v
    A = B.T @ B + n * np.eye(n)
    rr, cc = np.nonzero(A)
    return n, rr, cc, A[rr, cc], A


@pytest.mark.parametrize("fmt", ["csr", "hyb"])
def test_cg_converges(fmt):
    n, r, c, v, A = _spd()
    a = spmv_tpu.from_coo(fmt, n, n, r, c, v)
    rng = np.random.default_rng(0)
    xtrue = rng.standard_normal(n)
    b = A @ xtrue
    x, iters, res = cg(a, b, tol=1e-6, maxiter=500)
    assert 0 < iters < 500
    # fp32 device solve vs fp64 ground truth
    rel = np.linalg.norm(np.asarray(x) - xtrue) / np.linalg.norm(xtrue)
    assert rel < 1e-3, (rel, iters, res)


def test_cg_requires_square():
    a = spmv_tpu.from_coo("csr", 4, 6, [0], [1], [1.0])
    with pytest.raises(ValueError):
        cg(a, np.ones(4))


def test_power_iteration():
    n, r, c, v, A = _spd(n=200, seed=7)
    # add a dominant rank-1 spike so power iteration converges quickly
    u = np.random.default_rng(3).standard_normal(n)
    u /= np.linalg.norm(u)
    A = A + 5 * n * np.outer(u, u)
    rr, cc = np.nonzero(A)
    a = spmv_tpu.from_coo("csr", n, n, rr, cc, A[rr, cc])
    lam, vec = power_iteration(a, iters=200)
    lam_true = np.linalg.eigvalsh(A)[-1]
    assert abs(lam - lam_true) / lam_true < 1e-3, (lam, lam_true)
    assert np.asarray(vec).shape == (n,)
