"""Bench-harness plumbing on the CPU backend (timings are meaningless in
interpret mode; these tests pin the protocol's structure: adaptive iter
ladder, interleaved rounds, probe clamping, traffic accounting)."""

import numpy as np
import pytest

import spmv_tpu
from spmv_tpu import synth
from spmv_tpu.bench.runner import (
    V5E_HBM_BW,
    bench_format,
    bench_formats_interleaved,
    bench_spmm,
    bytes_per_slot,
    traffic_model,
)


@pytest.fixture(scope="module")
def small():
    info, r, c, v = synth.synthetic_cant(n=600, avg_nnz_per_row=8,
                                         bandwidth=40, seed=7)
    return info, r, c, v


def test_bench_format_structure(small):
    info, r, c, v = small
    a = spmv_tpu.from_coo("csr", info.nrows, info.ncols, r, c, v)
    res = bench_format(a, "csr", repeats=2, iters_a=2, iters_b=4)
    d = res.to_dict()
    assert d["format"] == "csr" and d["nnz"] == r.size
    assert d["ms_per_spmv"] > 0 and d["gnnz_per_s"] > 0
    assert d["padded_slots"] >= d["nnz"]
    # reference-compat formulas (helper_functions.h:167-182) hold exactly
    ms = d["ms_per_spmv"]
    assert d["gflops"] == pytest.approx(2 * d["nnz"] / ms * 1e-6)
    assert d["gbps_lower"] == pytest.approx(d["nnz"] * 8 / ms * 1e-6)
    assert d["gbps_upper"] == pytest.approx(2 * d["nnz"] * 8 / ms * 1e-6)


def _expected_total(a) -> float:
    """The documented split-aware billing: the panel container unless the
    shape is pure-spill (never dispatched), plus the spill stream, plus
    SELL's unpermute epilogue."""
    spill = getattr(a, "dev_spill", None)
    if spill is not None and getattr(a, "panel_nnz", 1) == 0:
        expected = float(spill.stream_bytes + spill.aux_traffic_bytes)
    else:
        expected = float(a.dev.stream_bytes + a.dev.aux_traffic_bytes)
        if spill is not None:
            expected += float(spill.stream_bytes + spill.aux_traffic_bytes)
    return expected + float(getattr(a, "epilogue_bytes", 0))


def test_traffic_model_exact_bytes(small):
    info, r, c, v = small
    # split=False pins the pure-panel stream constants for ELL; the
    # auto-split routing is covered by the sell/hyb test below
    for fmt, streams, kw in [("csr", "seg", {}),
                             ("ell", "panel", {"split": False})]:
        a = spmv_tpu.from_coo(fmt, info.nrows, info.ncols, r, c, v, **kw)
        slots, total = traffic_model(a)
        assert slots == a.dev.element_slots
        assert total == a.dev.stream_bytes + a.dev.aux_traffic_bytes
        bps = bytes_per_slot(a)
        p = a.dev.pack
        expected = (5 * p + 2) / p if streams == "seg" else (5 * p + 1) / p
        # plus the windowed-reduction meta row (1 u8 per quad slot per
        # chunk) and the streamed-partials epilogue pass
        expected += int(np.prod(a.dev.meta.shape)) / a.dev.element_slots
        expected += a.dev.aux_traffic_bytes / a.dev.element_slots
        assert bps == pytest.approx(expected)


def test_traffic_model_counts_split_spill_and_sell_epilogue():
    info, r, c, v = synth.power_law(n=2048, avg_nnz_per_row=16,
                                    bandwidth=128, seed=3)
    sell = spmv_tpu.from_coo("sell", info.nrows, info.ncols, r, c, v)
    assert sell.sorted_rows
    _, total = traffic_model(sell)
    assert total == _expected_total(sell)

    for fmt in ("hyb", "ell"):
        a = spmv_tpu.from_coo(fmt, info.nrows, info.ncols, r, c, v)
        _, total_h = traffic_model(a)
        assert total_h == _expected_total(a)


def test_interleaved_with_probe_returns_ceiling(small):
    info, r, c, v = small
    objs = {f: spmv_tpu.from_coo(f, info.nrows, info.ncols, r, c, v)
            for f in ("csr", "ell")}
    results, bw = bench_formats_interleaved(objs, repeats=2, iters_a=2,
                                            iters_b=4, probe=True,
                                            probe_mb=4, adapt=False)
    assert set(results) == {"csr", "ell"}
    assert 0 < bw <= V5E_HBM_BW  # clamped at the part's spec
    for res in results.values():
        assert res.ms_per_spmv > 0
        assert res.hbm_bw_gbps == pytest.approx(bw / 1e9)


def test_bench_spmm_structure(small):
    info, r, c, v = small
    a = spmv_tpu.from_coo("bsr", info.nrows, info.ncols, r, c, v)
    d = bench_spmm(a, "bsr", 4, repeats=2, iters_a=2, iters_b=4)
    assert d["rhs"] == 4 and d["gnnzvec_per_s"] > 0
    assert d["gflops"] == pytest.approx(
        2 * d["nnz"] * 4 / d["ms_per_spmm"] * 1e-6)


def test_pick_geometry_scales_with_resident_vectors():
    """A 786k-row matrix passed the old vector-only VMEM check and then
    OOMed Mosaic's 16MB scoped VMEM at compile time — the superchunk
    geometry must shrink as the resident x/y vectors grow."""
    from spmv_tpu.device import _VMEM_LIMIT, _vector_bytes, pick_geometry

    small = pick_geometry(100_000, 4, seg=True, nrows=62464, ncols=62464)
    # with streamed partials only the x table is main-kernel-resident, so
    # the squeeze point moved out to ~1.6M columns
    big = pick_geometry(100_000, 4, seg=True, nrows=1_600_000,
                        ncols=1_600_000)
    assert small == (128, 16)
    assert big[0] * big[1] < small[0] * small[1]
    stream = 2 * big[0] * big[1] * 128 * 22
    assert stream + _vector_bytes(1, 1_600_000) <= _VMEM_LIMIT
