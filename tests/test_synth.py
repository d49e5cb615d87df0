"""The synthetic stand-ins must be defensible, not just convenient.

The bundled cant.mtx is a git-LFS pointer (no network in this
environment), so every recorded bench number runs on
``synth.synthetic_cant``.  Round-3 verdict item 1: validate the stand-in's
row-length histogram against the real Boeing/cant's published shape
(SuiteSparse: 62,451 rows, 4,007,383 nonzeros, ~64.17 nnz/row, row
lengths spread roughly 19–78 by mesh-boundary truncation) so the
substitution is structurally honest.
"""

import numpy as np

from spmv_tpu import synth

# Published SuiteSparse Boeing/cant stats (the matrix the reference
# benchmarks, /root/reference/databases/cant.mtx — LFS pointer locally).
CANT_ROWS = 62_451
CANT_NNZ = 4_007_383
CANT_AVG = CANT_NNZ / CANT_ROWS  # ≈ 64.17


def test_default_matches_published_cant_shape():
    info, r, c, v = synth.synthetic_cant()
    assert info.nrows == info.ncols == CANT_ROWS
    # total nnz within 2% of the published count
    assert abs(r.size - CANT_NNZ) / CANT_NNZ < 0.02
    L = np.bincount(r, minlength=info.nrows)
    assert abs(L.mean() - CANT_AVG) < 2.0
    # boundary-truncated FEM spread, not a uniform or unbounded tail
    assert 10 <= L.min() <= 30
    assert 60 <= L.max() <= 85
    # FEM structure: 3-dof vertex blocks — columns come in runs of 3
    row0 = np.sort(c[r == r[0]].astype(np.int64))
    d = np.diff(row0)
    assert (d == 1).sum() >= row0.size * 0.6


def test_structure_is_deterministic_and_banded():
    i1, r1, c1, v1 = synth.synthetic_cant(n=4096, avg_nnz_per_row=32,
                                          bandwidth=200, seed=0)
    i2, r2, c2, v2 = synth.synthetic_cant(n=4096, avg_nnz_per_row=32,
                                          bandwidth=200, seed=7)
    # the mesh (structure) is deterministic; only the values depend on seed
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(c1, c2)
    assert not np.allclose(v1, v2)
    # band stays within ~1.5x the requested bandwidth
    assert np.abs(c1.astype(np.int64) - r1).max() <= 1.5 * 200 + 10


def test_avg_nnz_target_tracks_argument():
    for avg in (8, 24, 64):
        info, r, c, v = synth.synthetic_cant(n=8192, avg_nnz_per_row=avg,
                                             bandwidth=350)
        measured = r.size / info.nrows
        assert abs(measured - avg) / avg < 0.25, (avg, measured)


def test_sorted_by_row_length():
    info, r, c, v = synth.synthetic_cant(n=2048, avg_nnz_per_row=16,
                                         bandwidth=100,
                                         sorted_by_row_length=True)
    L = np.bincount(r, minlength=info.nrows)
    assert np.all(np.diff(L) <= 0)
