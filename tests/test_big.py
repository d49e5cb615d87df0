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


@pytest.mark.parametrize("fmt", ["csr", "coo", "cmrs", "ell", "sell", "hyb"])
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


def test_tiled_skips_empty_tiles():
    """Block-diagonal matrix: off-diagonal tiles must not exist (no plan
    arrays, no dispatches) — a 4Mx4M band matrix would otherwise spend
    most of its time on empty off-band tiles."""
    info, r, c, v, x = _data(n=3072, seed=5)
    # band 50 around the diagonal: with 1024-square tiles, only the
    # diagonal (and corner-adjacent) tiles are occupied
    a = TiledSpmv("csr", info.nrows, info.ncols, r, c, v,
                  slab_rows=1024, panel_cols=1024)
    assert a.DR == 3 and a.DC == 3
    # the band only touches tiles adjacent to the diagonal (7 of 9);
    # the 2 far corners must not exist
    assert a.n_tiles <= 7 < a.DR * a.DC
    assert int(a.nvalid.sum()) == a.n_tiles
    rep = check_result(golden_spmv(info.nrows, r, c, v, x),
                       a.matvec(x), tol_abs=1e-4, tol_rel=1e-4,
                       scale=golden_spmv(info.nrows, r, c, np.abs(v),
                                         np.abs(x)))
    assert rep.ok, str(rep)


def test_tiled_chained_loop_and_traffic():
    """The bench hook: chained_loop must preserve x outside the probe row
    and the traffic model must count every nonempty tile exactly once."""
    info, r, c, v, x = _data(n=2048, seed=8)
    a = TiledSpmv("csr", info.nrows, info.ncols, r, c, v,
                  slab_rows=1024, panel_cols=1024)
    xp = a.x_table(x)
    out, y_loop = a.chained_loop(2)(xp)
    out = np.asarray(out)
    assert out.shape == xp.shape
    # rows 1.. of panel 0 and all other panels untouched by the probe
    np.testing.assert_array_equal(out[0, 1:], np.asarray(xp)[0, 1:])
    np.testing.assert_array_equal(out[1:], np.asarray(xp)[1:])
    assert out[0, 0, :].shape == (128,)
    # the FULL y rides as a loop carry — the billed per-tile part reads
    # and per-slab y writes are real in the timed loop (round-3 verdict:
    # narrowing the add chain to y[0:1] let XLA skip ~11% of the billed
    # traffic and print a 102.6% roofline)
    assert np.asarray(y_loop).shape == (a.DR * (a.rps // 128), 128)
    # probe perturbations are O(1e-38), so the carried y equals A·x
    ref = np.asarray(a.matvec(x))
    np.testing.assert_allclose(
        np.asarray(y_loop).reshape(-1)[: a.nrows], ref, rtol=2e-5,
        atol=1e-5)
    from spmv_tpu.bench.runner import traffic_model
    slots, total = traffic_model(a)
    assert slots >= a.nnz
    assert total > slots * 5  # >=5B/slot for the P-packed seg stream
