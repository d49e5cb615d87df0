"""Golden SpMV oracle + result checker.

The TPU-native analog of the reference's ``check_result``
(``/root/reference/inc/helper_functions.h:184-236``): recompute
``y[r] += v * x[c]`` from raw COO triplets with a trivially-correct scalar
algorithm (here: fp64 ``np.add.at``, which is bit-identical to the
reference's sequential file-order accumulation only up to reassociation —
hence the tolerance model below) and compare elementwise.

Unlike the reference — which re-parses the 60 MB .mtx text file once per
check, three full parses per run (SURVEY.md §3.5) — the oracle takes the
already-loaded triplets.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["golden_spmv", "check_result", "CheckReport", "default_x",
           "EPSILON", "seg_engine_scale", "container_scale"]

# Reference absolute tolerance (helper_functions.h:11) — valid for its fp64
# path.  Our TPU compute path is fp32 (BASELINE.md: "single precision"), so
# ``check_result`` also supports a mixed abs+rel criterion scaled by the
# accumulation length.
EPSILON = 1e-6


def golden_spmv(
    nrows: int,
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    x: np.ndarray,
) -> np.ndarray:
    """fp64 scatter-accumulate SpMV from COO triplets (duplicates sum)."""
    y = np.zeros(nrows, dtype=np.float64)
    np.add.at(
        y,
        np.asarray(rows, dtype=np.int64),
        np.asarray(vals, dtype=np.float64) * np.asarray(x, dtype=np.float64)[cols],
    )
    return y


def default_x(ncols: int, dtype=np.float64) -> np.ndarray:
    """The reference's input vector: ``x[i] = i`` (``coo.c:88-92``)."""
    return np.arange(ncols, dtype=dtype)


@dataclass
class CheckReport:
    ok: bool
    max_abs_err: float
    max_rel_err: float
    first_bad: int | None
    tol_abs: float
    tol_rel: float

    def __bool__(self) -> bool:  # truthy like the reference's bool return
        return self.ok

    def __str__(self) -> str:
        verdict = "result is ok" if self.ok else "result is wrong"
        return (
            f"{verdict} (max_abs_err={self.max_abs_err:.3e}, "
            f"max_rel_err={self.max_rel_err:.3e}, "
            f"tol_abs={self.tol_abs:.1e}, tol_rel={self.tol_rel:.1e})"
        )


def check_result(
    expected: np.ndarray,
    actual: np.ndarray,
    *,
    tol_abs: float = EPSILON,
    tol_rel: float = 0.0,
    scale: np.ndarray | None = None,
) -> CheckReport:
    """Elementwise ``|expected - actual| <= tol_abs + tol_rel * scale``.

    ``scale`` defaults to ``|expected|``.  For a numerically honest fp32
    check pass ``scale = golden_spmv(|vals|, |x|)`` (the per-row Σ|v·x|):
    an ill-conditioned row (large Σ|v·x|, tiny Σv·x) cannot beat κ·eps in
    any summation order.  With defaults this is exactly the reference
    criterion (``helper_functions.h:221-230``); fp32 kernel outputs should
    pass ``tol_rel=fp32_rel_tol(max_row_nnz)``.
    """
    expected = np.asarray(expected, dtype=np.float64)
    actual = np.asarray(actual, dtype=np.float64)
    if expected.shape != actual.shape:
        raise ValueError(f"shape mismatch: {expected.shape} vs {actual.shape}")
    err = np.abs(expected - actual)
    s = np.abs(expected) if scale is None else np.asarray(scale, dtype=np.float64)
    bound = tol_abs + tol_rel * s
    bad = err > bound
    denom = np.maximum(np.abs(expected), 1e-300)
    rel = err / denom
    first_bad = int(np.argmax(bad)) if bad.any() else None
    return CheckReport(
        ok=not bad.any(),
        max_abs_err=float(err.max()) if err.size else 0.0,
        max_rel_err=float(rel.max()) if rel.size else 0.0,
        first_bad=first_bad,
        tol_abs=tol_abs,
        tol_rel=tol_rel,
    )


def fp32_rel_tol(max_row_nnz: int) -> float:
    """Relative tolerance model for an fp32 kernel vs the fp64 oracle:
    accumulated rounding grows ~sqrt(k)·eps for k-term sums (random signs);
    use a conservative linear-in-k bound with headroom."""
    k = max(int(max_row_nnz), 1)
    return 32.0 * np.finfo(np.float32).eps * np.sqrt(k)


def engine_rel_tol(max_row_nnz: int) -> float:
    """Tolerance for the device engines.  The segmented engine reduces each
    row's pieces as differences of 127-element sublane-window prefix sums
    (MXU prefix, see kernels.engines), so its rounding scales with the
    window, not the row — use k = max(row length, 127).

    Caveat: with the default per-row ``scale = Σ|A_r||x|`` this model still
    under-bounds rows that share a sublane window with much larger rows
    (window/row magnitude ratio > ~11 breaches 32·eps·sqrt(127)).  For
    matrices with wildly heterogeneous row scales pass
    ``scale = seg_engine_scale(plan, x, row_abs)`` instead (``row_abs`` =
    per-row Σ|v||x|), which bounds by the actual window magnitudes."""
    return fp32_rel_tol(max(int(max_row_nnz), 127))


def seg_engine_scale(plan, x: np.ndarray, row_abs: np.ndarray) -> np.ndarray:
    """Per-row tolerance scale for the segmented engine that is honest for
    heterogeneous row magnitudes: ``row Σ|v·x|  +  max window Σ|v·x|`` over
    the 127-element sublane windows holding any of the row's elements.

    The MXU prefix sum rounds at the magnitude of the whole sublane window,
    so a small row packed next to a 100× larger one inherits the larger
    row's rounding floor; the default per-row scale misses that.  Computed
    exactly from the device plan's layout (``plan`` is a ``SegPlan``; the
    panel engine needs no such correction — its lanes are row-pure).
    ``row_abs`` is the per-row Σ|v||x| (``golden_spmv`` of the absolute
    triplets).
    """
    return (np.asarray(row_abs, dtype=np.float64)
            + _seg_window_scale(plan, x))


def _seg_window_scale(plan, x: np.ndarray) -> np.ndarray:
    """Per-row max sublane-window Σ|v·x| of a ``SegPlan`` (length
    ``plan.nrows``) — the window-magnitude half of ``seg_engine_scale``."""
    absx = np.abs(np.asarray(x, dtype=np.float64)).reshape(-1)
    tm = plan.vals.shape[0]
    base = plan.sub_base[np.arange(tm) // 8].astype(np.int64)
    hi = plan.hi.astype(np.int64)
    w_mag = np.zeros(tm, dtype=np.float64)
    for pp in range(plan.pack):
        # lo's MSB is the mid-quad boundary flag, not part of the column
        col = (base[:, None] + hi) * 128 + (
            plan.lo[:, pp, :].astype(np.int64) & 127)
        # pad slots carry v == 0; their col may land in the zero-padded
        # x-table tail — clamp so the |x| lookup stays in bounds.
        col = np.minimum(col, absx.size - 1)
        w_mag += (np.abs(plan.vals[:, pp, :].astype(np.float64))
                  * absx[col]).sum(axis=1)

    blocks = np.asarray(plan.row_block, dtype=np.int64)[:tm]
    # present lids: the filled gidx strictly increases at each segment head
    gprev = np.concatenate(
        [np.zeros((tm, 1), plan.gidx.dtype), plan.gidx[:, :-1]], axis=1)
    srow, lid = np.nonzero(plan.gidx > gprev)
    rowid = blocks[srow] * 128 + lid
    win_scale = np.zeros(plan.nrows, dtype=np.float64)
    valid = rowid < plan.nrows
    np.maximum.at(win_scale, rowid[valid], w_mag[srow[valid]])
    return win_scale


def container_scale(a, x: np.ndarray, row_abs: np.ndarray) -> np.ndarray:
    """Tolerance scale for a format container's device execution:
    ``row_abs`` plus the segmented engine's window magnitudes for every
    ``SegPlan`` the container actually runs — the main plan for
    CSR/COO/CMRS, the spill part of the priced panel/spill split for
    HYB/ELL/SELL (``formats.split``).  SELL's plans live in the σ-sorted
    (padded) row space; their window scale maps back through ``perm``."""
    row_abs = np.asarray(row_abs, dtype=np.float64)
    out = row_abs.copy()
    nrows = out.size
    plans = []
    p = getattr(a, "plan", None)
    if p is not None and hasattr(p, "gidx"):
        plans.append(p)
    sp = getattr(a, "spill_plan", None)
    if sp is not None:
        plans.append(sp)
    perm = getattr(a, "perm", None)  # SELL: sorted position → original row
    for p in plans:
        w = _seg_window_scale(p, x)
        if perm is not None and p.nrows == np.asarray(perm).size:
            w_orig = np.zeros(w.size, dtype=np.float64)
            w_orig[np.asarray(perm, dtype=np.int64)] = w
            w = w_orig
        out += w[:nrows] if w.size >= nrows else np.pad(
            w, (0, nrows - w.size))
    return out
