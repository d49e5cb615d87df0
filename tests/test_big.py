"""Beyond-VMEM single-chip path: slab x panel tiling (the reference's
only size limit was device RAM, coo.c:116-120)."""

import numpy as np
import pytest

import spmv_tpu
from spmv_tpu import synth
from spmv_tpu.big import TiledSpmv
from spmv_tpu.oracle import check_result, golden_spmv


def _data(n=3000, seed=2):
    info, r, c, v = synth.synthetic_cant(n=n, avg_nnz_per_row=9,
                                         bandwidth=50, seed=seed)
    x = np.random.default_rng(seed + 1).standard_normal(
        info.ncols).astype(np.float32)
    return info, r, c, v, x


@pytest.mark.parametrize("fmt", ["csr", "coo", "cmrs", "ell", "hyb"])
def test_tiled_matches_oracle(fmt):
    info, r, c, v, x = _data()
    a = TiledSpmv(fmt, info.nrows, info.ncols, r, c, v,
                  slab_rows=1024, panel_cols=1024)
    assert a.DR == 3 and a.DC == 3
    rep = check_result(golden_spmv(info.nrows, r, c, v, x),
                       a.matvec(x), tol_abs=1e-4, tol_rel=1e-4,
                       scale=golden_spmv(info.nrows, r, c, np.abs(v),
                                         np.abs(x)))
    assert rep.ok, f"{fmt}: {rep}"


def test_tiled_matches_single_kernel():
    info, r, c, v, x = _data(n=1500, seed=7)
    single = spmv_tpu.from_coo("csr", info.nrows, info.ncols, r, c, v)
    tiled = TiledSpmv("csr", info.nrows, info.ncols, r, c, v,
                      slab_rows=512, panel_cols=512)
    np.testing.assert_allclose(np.asarray(single.matvec(x)),
                               tiled.matvec(x), atol=1e-4, rtol=1e-4)


def test_load_routes_over_budget(monkeypatch, tmp_path):
    """Over the VMEM vector budget, spmv_tpu.load must return the tiled
    container instead of raising (round-2 verdict: the hard ValueError
    was a wall, not a redirect)."""
    import spmv_tpu.big as big
    import spmv_tpu.device as device

    # full 3000x3000 needs ~12.3KB resident (max of x table / y);
    # 2048-row tiles ~8.2KB
    monkeypatch.setattr(device, "_VMEM_VECTOR_BUDGET", 4 * 2500)
    monkeypatch.setattr(big, "_TILE_VEC_BYTES", 4 * 4096)
    a = spmv_tpu.load(str(tmp_path / "missing.mtx"), "csr",
                      synth=dict(n=3000, avg_nnz_per_row=5, bandwidth=30,
                                 seed=3))
    assert isinstance(a, TiledSpmv) and a.DR > 1
    x = np.random.default_rng(0).standard_normal(a.ncols).astype(np.float32)
    y = a.matvec(x)
    assert y.shape == (a.nrows,)
