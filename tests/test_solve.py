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


def test_bicgstab_nonsymmetric():
    """BiCGSTAB handles the general (nonsymmetric) systems CG cannot."""
    from spmv_tpu.solve import bicgstab

    n = 160
    rng = np.random.default_rng(4)
    i = np.arange(n)
    # diagonally dominant, deliberately NONsymmetric band
    rows = np.concatenate([i, i[:-1], i[1:], i[:-2]])
    cols = np.concatenate([i, i[1:], i[:-1], i[2:]])
    vals = np.concatenate([np.full(n, 5.0), np.full(n - 1, -1.3),
                           np.full(n - 1, 0.7), np.full(n - 2, 0.4)])
    a = spmv_tpu.from_coo("csr", n, n, rows, cols, vals)
    b = rng.standard_normal(n).astype(np.float32)
    x, k, res = bicgstab(a, b, tol=1e-6, maxiter=400)
    A = np.zeros((n, n)); A[rows, cols] = vals
    assert np.linalg.norm(A @ np.asarray(x, np.float64) - b) < 1e-3
    assert 0 < k < 400


def test_bicgstab_rejects_rectangular():
    from spmv_tpu.solve import bicgstab

    a = spmv_tpu.from_coo("csr", 4, 6, [0], [0], [1.0])
    with pytest.raises(ValueError, match="square"):
        bicgstab(a, np.ones(4))


# ---------------------------------------------------------------- dist


@pytest.fixture(scope="module")
def mesh():
    from spmv_tpu.dist.mesh import make_mesh

    return make_mesh(8)


@pytest.mark.parametrize("fmt,gather_x", [("csr", True), ("cmrs", False)])
def test_cg_over_row_sharded(mesh, fmt, gather_x):
    """Round-3 verdict item 7: the Krylov loop composes with the dist
    layer — cg(RowShardedSpmv(...)) compiles as ONE SPMD program over
    the mesh (matvec all-gather + GSPMD-partitioned dot products)."""
    from spmv_tpu.dist.sharded import RowShardedSpmv

    n, r, c, v, A = _spd(n=2 * 8 * 128 + 60, seed=11, density=0.002)
    a = RowShardedSpmv(fmt, n, n, r, c, v, mesh, gather_x=gather_x)
    rng = np.random.default_rng(0)
    xtrue = rng.standard_normal(n)
    b = A @ xtrue
    x, iters, res = cg(a, b, tol=1e-6, maxiter=500)
    assert 0 < iters < 500
    rel = np.linalg.norm(np.asarray(x) - xtrue) / np.linalg.norm(xtrue)
    assert rel < 1e-3, (rel, iters, res)


def test_cg_over_col_sharded(mesh):
    from spmv_tpu.dist.sharded import ColShardedSpmv

    n, r, c, v, A = _spd(n=8 * 130, seed=13, density=0.003)
    a = ColShardedSpmv("csr", n, n, r, c, v, mesh)
    rng = np.random.default_rng(1)
    xtrue = rng.standard_normal(n)
    b = A @ xtrue
    x, iters, res = cg(a, b, tol=1e-6, maxiter=500)
    assert 0 < iters < 500
    rel = np.linalg.norm(np.asarray(x) - xtrue) / np.linalg.norm(xtrue)
    assert rel < 1e-3, (rel, iters, res)


def test_power_iteration_over_row_sharded(mesh):
    from spmv_tpu.dist.sharded import RowShardedSpmv

    n, r, c, v, A = _spd(n=1100, seed=7, density=0.003)
    u = np.random.default_rng(3).standard_normal(n)
    u /= np.linalg.norm(u)
    A = A + 5 * n * np.outer(u, u)
    rr, cc = np.nonzero(A)
    a = RowShardedSpmv("csr", n, n, rr, cc, A[rr, cc], mesh)
    lam, vec = power_iteration(a, iters=200)
    lam_true = np.linalg.eigvalsh(A)[-1]
    assert abs(lam - lam_true) / lam_true < 1e-3, (lam, lam_true)
