"""Extended-precision (f32x2) engines vs the fp64 oracle at the
reference's abs 1e-6 EPSILON (``inc/helper_functions.h:11``) — the
precision class the all-fp64 reference computes in (``coo.c:39-42``),
which plain fp32 device compute misses by ~2 orders (window-magnitude
rounding, docs/DESIGN.md)."""

import numpy as np
import pytest

from spmv_tpu import synth
from spmv_tpu.x2 import X2_FORMATS, X2Matrix


def _case(n=1024, seed=5):
    info, r, c, v = synth.synthetic_cant(n=n, avg_nnz_per_row=16,
                                         bandwidth=60, seed=seed)
    # values with fp64-only mantissa content — f32 casting must not win
    v = np.asarray(v, np.float64) * (1 + 1e-9 * np.arange(v.size))
    x = np.random.default_rng(seed + 1).standard_normal(info.ncols)
    A = np.zeros((info.nrows, info.ncols))
    A[r, c] = v
    return info, r, c, v, x, A @ x


@pytest.mark.parametrize("fmt", sorted(set(X2_FORMATS) - {"sell_c_sigma"}))
def test_x2_matvec_epsilon(fmt):
    info, r, c, v, x, yref = _case()
    a = X2Matrix.from_coo(fmt, info.nrows, info.ncols, r, c, v)
    y = a.matvec(x)
    err = np.abs(y - yref).max()
    assert err < 1e-6, f"{fmt}: abs err {err:.3e} over the reference EPSILON"
    # and genuinely beyond fp32: the fp32 engines land ~1e-4 here
    assert err < 1e-8, f"{fmt}: abs err {err:.3e} not double-single grade"


def test_x2_beats_f32():
    import spmv_tpu

    info, r, c, v, x, yref = _case(seed=9)
    a32 = spmv_tpu.from_coo("csr", info.nrows, info.ncols, r, c, v)
    ax2 = X2Matrix.from_coo("csr", info.nrows, info.ncols, r, c, v)
    e32 = np.abs(np.asarray(a32.matvec(x.astype(np.float32)),
                            np.float64) - yref).max()
    ex2 = np.abs(ax2.matvec(x) - yref).max()
    assert ex2 < e32 / 100, (ex2, e32)


def test_x2_scattered_and_sell_epilogue():
    info, r, c, v = synth.power_law(n=2048, avg_nnz_per_row=10,
                                    bandwidth=600, seed=3)
    v = np.asarray(v, np.float64) * (1 + 1e-10 * np.arange(v.size))
    x = np.random.default_rng(4).standard_normal(info.ncols)
    A = np.zeros((info.nrows, info.ncols))
    A[r, c] = v
    yref = A @ x
    for fmt in ("csr", "sell"):
        a = X2Matrix.from_coo(fmt, info.nrows, info.ncols, r, c, v)
        err = np.abs(a.matvec(x) - yref).max()
        assert err < 1e-6, f"{fmt}: {err:.3e}"


def test_x2_rejects_bsr():
    # BSR stays fp32-only (a double-single tile product would need three
    # extra full MXU matmuls — rationale in the x2 module docstring)
    with pytest.raises(ValueError):
        X2Matrix.from_coo("bsr", 8, 8, [0], [0], [1.0])


def test_x2_hyb_two_part(monkeypatch):
    """f32x2 HYB runs BOTH x2 engines when the priced split keeps a
    genuine panel + spill partition (round-3 verdict item 6: extend x2 to
    HYB's two-part plan).  At test scale the second dispatch never
    amortizes, so the dispatch term is zeroed to expose the byte-priced
    hybrid shape."""
    from spmv_tpu.formats import split

    monkeypatch.setattr(split, "_DISPATCH_S", 0.0)

    # block-dense stripes (panel-friendly) + a few HUB rows carrying the
    # scatter (cap 0 for their off-stripe pairs -> genuine spill part;
    # scatter spread over ALL rows would quad-pad the capped panel and
    # the byte model would rightly collapse to pure spill)
    n = 512
    rows_d = np.repeat(np.arange(n), 32)
    cols_d = (rows_d // 128) * 128 + np.tile(np.arange(32), n)
    rng = np.random.default_rng(11)
    hubs = rng.choice(n, 16, replace=False)
    rows_s = np.repeat(hubs, 250)
    cols_s = rng.integers(0, n, rows_s.size)
    rows = np.concatenate([rows_d, rows_s])
    cols = np.concatenate([cols_d, cols_s])
    key = rows * n + cols
    _, first = np.unique(key, return_index=True)
    rows, cols = rows[first], cols[first]
    v = (rng.standard_normal(rows.size)
         * (1 + 1e-9 * np.arange(rows.size)))

    a = X2Matrix.from_coo("hyb", n, n, rows, cols, v)
    assert a.dev_spill is not None, "pricing collapsed to a single engine"
    x = rng.standard_normal(n)
    A = np.zeros((n, n))
    A[rows, cols] = v
    err = np.abs(a.matvec(x) - A @ x).max()
    assert err < 1e-8, f"two-part x2 hyb abs err {err:.3e}"
