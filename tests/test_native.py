"""Native C++ helpers vs their pure-NumPy fallbacks."""

import numpy as np

from spmv_tpu import synth
from spmv_tpu.formats import native_group
from spmv_tpu.formats.base import build_panel_plan, build_seg_plan


def _plans(rows, cols, vals, nrows, ncols):
    p = build_seg_plan(rows, cols, vals, nrows, ncols)
    q = build_panel_plan(rows, cols, vals, nrows, ncols)
    return p, q


def test_grouping_fallback_parity(monkeypatch):
    info, r, c, v = synth.synthetic_cant(n=1500, avg_nnz_per_row=11,
                                         bandwidth=90, seed=21)
    p_nat, q_nat = _plans(r, c, v, info.nrows, info.ncols)

    monkeypatch.setattr(native_group, "emit_rows",
                        lambda *a, **k: None)  # force the Python loop
    p_py, q_py = _plans(r, c, v, info.nrows, info.ncols)

    for name in ("vals", "lo", "hi", "gidx", "row_block", "sub_base"):
        np.testing.assert_array_equal(getattr(p_nat, name),
                                      getattr(p_py, name), err_msg=name)
    for name in ("vals", "lo", "hi", "row_block", "sub_base"):
        np.testing.assert_array_equal(getattr(q_nat, name),
                                      getattr(q_py, name), err_msg=name)


def test_native_parser_and_grouper_report_availability():
    # On this box both native helpers build; elsewhere the import must
    # still succeed and report False gracefully.
    from spmv_tpu.io import native as native_io

    assert isinstance(native_io.available(), bool)
    assert isinstance(native_group.available(), bool)
