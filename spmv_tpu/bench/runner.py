"""Benchmark harness.

Replaces the reference's per-driver timing block (single run, no warm-up,
``clock_gettime`` around one kernel enqueue, ``coo.c:193-199``) with a
protocol hardened against the tunnel's dispatch caching AND the chip
being time-shared (docs/DESIGN.md §measured-facts):

* chained SpMV iterations inside ONE jitted ``lax.fori_loop`` with a
  ~1 KB slice-update data dependency (x row 0 ← f(y)); execution forced
  by fetching a scalar;
* per-iteration time = slope between two iteration counts (subtracts the
  dispatch round-trip), counts scaled adaptively to ≥ ~40 ms of device
  work so jitter cannot swamp small matrices;
* every dispatch made byte-unique (the tunnel caches identical ones), so
  remaining noise is strictly additive and the slope of per-count MINIMA
  over repeats is the robust estimator;
* multi-format runs interleave all formats' timing rounds round-robin
  (rotated order) WITH the HBM ceiling probe in the rotation, so the
  roofline's numerator and denominator sample the same contention
  windows.

Reports both the reference-compatible metrics (GFLOP/s = 2·nnz/ms·1e-6 and
the GB/s bounds of ``helper_functions.h:167-182``) and honest ones
(effective GB/s from exact device-array bytes, % of measured HBM
speed-of-light, true-nnz speed-of-light %).
"""

from __future__ import annotations

import functools
import time
from dataclasses import asdict, dataclass

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.device import x_to_table
from spmv_tpu.formats.base import LANES

__all__ = ["BenchResult", "bench_format", "bench_formats_interleaved",
           "bench_spmm", "measure_hbm_bw", "bytes_per_slot"]

V5E_HBM_BW = 819e9  # spec fallback when the probe can't run


@dataclass
class BenchResult:
    format: str
    nrows: int
    ncols: int
    nnz: int
    padded_slots: int
    ms_per_spmv: float
    gnnz_per_s: float  # true nnz / time
    gflops: float  # reference formula: 2·nnz/ms·1e-6 (helper_functions.h:167)
    gbps_lower: float  # nnz·8B/ms·1e-6 (helper_functions.h:175-181 exactly)
    gbps_upper: float  # 2·nnz·8B/ms·1e-6 (helper_functions.h:182)
    effective_gbps: float  # actual bytes moved (padding + index traffic)
    roofline_pct: float  # effective_gbps / measured HBM bw (streamed bytes)
    true_eff_pct: float  # gnnz_per_s / (HBM bw / min bytes-per-nnz):
    #   speed-of-light efficiency on TRUE nonzeros — padding cannot buy score
    hbm_bw_gbps: float
    bytes_per_nnz: float
    # per-round running-min slope estimates (ms/SpMV) — the convergence
    # trace of the min-estimator, so recorded results are auditable
    min_history_ms: list | None = None

    def to_dict(self):
        return asdict(self)


def _fetch(o) -> float:
    if isinstance(o, tuple):  # TiledSpmv's loop returns (x_panels, y)
        return float(sum(jnp.sum(t) for t in o))
    return float(jnp.sum(o))


def _chained_loop(a, iters: int):
    """One jitted function running `iters` chained SpMVs.

    The inter-iteration data dependency (required: the tunnel caches
    dispatches and reorders independent work) is a ~1 KB dynamic-slice
    update of x's first table row from y — round 1 fed the full
    normalized y back as x, an extra ~1.25 MB/iteration of elementwise
    traffic that was billed to the kernel (~12 % of the segmented
    engine's stream).  The reference times the bare kernel
    (``coo.c:193-199``); so does this.
    """
    import copy

    if hasattr(a, "chained_loop"):  # TiledSpmv brings its own loop
        return a.chained_loop(iters)

    # The device arrays must ride as jit ARGUMENTS: a closure would embed
    # them as compile-payload constants, and the tunnel rejects payloads
    # over ~100 MB (HTTP 413 — hit at 437 MB device arrays on a 50M-nnz
    # matrix; DESIGN.md fact 6).
    leaf_attrs = [n for n in ("dev", "dev_spill", "_perm_whi", "_perm_idx")
                  if getattr(a, n, None) is not None]
    leaves = [getattr(a, n) for n in leaf_attrs]

    @jax.jit
    def loop(x2d, *leaves):
        b = copy.copy(a)
        for n, v in zip(leaf_attrs, leaves):
            object.__setattr__(b, n, v)

        def body(i, x2d):
            y = b.padded_matvec(x2d)  # (1, NB*128)
            probe_row = x2d[0:1, :] + y[0:1, :LANES] * 1e-38
            return jax.lax.dynamic_update_slice(x2d, probe_row, (0, 0))

        return jax.lax.fori_loop(0, iters, body, x2d)

    return lambda x2d: loop(x2d, *leaves)


class _Prepared:
    """A format readied for timing: compiled chained loops at adaptive
    iteration counts, plus running min times per count.

    Adaptive counts: the slope is meaningless when the loop's device time
    is small against the tunnel's ~ms dispatch jitter (a 16 µs/SpMV matrix
    at 250 iters is 4 ms of work — one small-matrix reading once printed an
    impossible 4e5 Gnnz/s).  The long loop scales to ≥ ~40 ms of device
    work on a fixed ×4 ladder so jit caching holds.
    """

    def __init__(self, a, format_name, iters_a, iters_b, x0=None,
                 adapt=True):
        self.a, self.format = a, format_name
        if x0 is None:
            x0 = np.random.default_rng(0).standard_normal(
                a.ncols).astype(np.float32)
        xt = getattr(a, "x_table", None)  # f32x2 containers build (2S,128)
        self.x2d = xt(x0) if xt is not None else x_to_table(x0, a.ncols)
        fa = _chained_loop(a, iters_a)
        _fetch(fa(self.x2d))  # compile
        # the calibration dispatch must be byte-unique: repeating the
        # compile dispatch verbatim hits the tunnel's dispatch cache and
        # returns instantly, which would inflate iters to the 16000 cap
        t0 = time.perf_counter()
        _fetch(fa(self.x2d + jnp.float32(1e-9)))
        t_iter = max((time.perf_counter() - t0 - 0.010) / iters_a, 1e-7)
        while adapt and iters_b * t_iter < 0.040 and iters_b < 16000:
            iters_a *= 4
            iters_b *= 4
            fa = _chained_loop(a, iters_a)
        self.fa, self.fb = fa, _chained_loop(a, iters_b)
        self.iters_a, self.iters_b = iters_a, iters_b
        _fetch(self.fa(self.x2d))
        _fetch(self.fb(self.x2d))  # compile + warm both
        self.ta = self.tb = float("inf")
        self.history: list[float] = []

    def time_round(self, rep: int) -> None:
        """One timing pair.  The x perturbation makes every dispatch
        byte-unique — the axon tunnel caches identical dispatches
        (DESIGN.md fact 6) and a cache hit would return instantly,
        poisoning the slope.  With caching defeated, remaining noise
        (dispatch jitter, chip time-sharing contention) is strictly
        ADDITIVE, so the running min converges to the clean time at each
        iteration count and the slope of the mins is robust."""
        xr = self.x2d + jnp.float32((rep + 1) * 1e-7)
        t0 = time.perf_counter()
        _fetch(self.fa(xr))
        self.ta = min(self.ta, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _fetch(self.fb(xr))
        self.tb = min(self.tb, time.perf_counter() - t0)
        self.history.append(round(max(
            (self.tb - self.ta) / (self.iters_b - self.iters_a), 1e-9) * 1e3,
            6))

    def result(self, hbm_bw: float | None) -> BenchResult:
        a = self.a
        t = max((self.tb - self.ta) / (self.iters_b - self.iters_a), 1e-9)
        ms = t * 1e3
        nnz = a.nnz
        padded, total_bytes = traffic_model(a)
        bpn = total_bytes / max(nnz, 1)
        eff_gbps = bpn * nnz / t / 1e9
        bw = hbm_bw if hbm_bw else V5E_HBM_BW
        return BenchResult(
            format=self.format,
            nrows=a.nrows,
            ncols=a.ncols,
            nnz=nnz,
            padded_slots=padded,
            ms_per_spmv=ms,
            gnnz_per_s=nnz / t / 1e9,
            gflops=2 * nnz / ms * 1e-6,
            gbps_lower=nnz * 8 / ms * 1e-6,
            gbps_upper=2 * nnz * 8 / ms * 1e-6,
            effective_gbps=eff_gbps,
            roofline_pct=100.0 * eff_gbps * 1e9 / bw,
            true_eff_pct=100.0 * (nnz / t) / (bw / bytes_per_slot(a)),
            hbm_bw_gbps=bw / 1e9,
            bytes_per_nnz=bpn,
            min_history_ms=list(self.history),
        )


def bench_format(
    a,
    format_name: str,
    *,
    iters_a: int = 50,
    iters_b: int = 250,
    repeats: int = 9,
    hbm_bw: float | None = None,
    x0: np.ndarray | None = None,
) -> BenchResult:
    prep = _Prepared(a, format_name, iters_a, iters_b, x0)
    for rep in range(repeats):
        prep.time_round(rep)
    return prep.result(hbm_bw)


class _ProbePrepared:
    """The HBM ceiling probe as an interleavable timing member, so the
    roofline's numerator (kernels) and denominator (probe) sample the SAME
    chip-contention windows of the time-shared tunnel."""

    def __init__(self, mb: int = 128, iters: int = 100):
        n = mb * 1024 * 1024 // 4
        self.n, self.iters = n, iters
        self.a = jnp.ones((n // LANES, LANES), jnp.float32)
        self.loops = (*_bw_loops(iters), *_bw_loops(2 * iters))
        rw1, rd1, rw2, rd2 = self.loops
        s = jnp.float32(1.0)
        _fetch(rw1(self.a)); _fetch(rw2(self.a))
        _fetch(rd1(self.a, s)); _fetch(rd2(self.a, s))
        self.t = [float("inf")] * 4

    def time_round(self, rep: int) -> None:
        ar = self.a + jnp.float32((rep + 1) * 1e-9)
        s = jnp.float32(1.0 + rep * 1e-9)
        rw1, rd1, rw2, rd2 = self.loops
        for j, call in enumerate((lambda: rw1(ar), lambda: rd1(ar, s),
                                  lambda: rw2(ar), lambda: rd2(ar, s))):
            t0 = time.perf_counter()
            _fetch(call())
            self.t[j] = min(self.t[j], time.perf_counter() - t0)

    def bandwidth(self) -> float:
        rw = 2 * self.n * 4 / max(self.t[2] - self.t[0], 1e-9) * self.iters
        rd = self.n * 4 / max(self.t[3] - self.t[1], 1e-9) * self.iters
        return min(max(rw, rd), V5E_HBM_BW)


def bench_formats_interleaved(
    objs: dict,
    *,
    iters_a: int = 50,
    iters_b: int = 250,
    repeats: int = 9,
    hbm_bw: float | None = None,
    probe: bool = False,
    probe_mb: int = 128,
    adapt: bool = True,
):
    """Bench several formats with their timing rounds interleaved
    round-robin, so every format samples the same chip-contention windows
    — sequential benching on the time-shared tunnel showed ±30 % spreads
    between formats running the *identical* kernel.

    With ``probe=True`` the HBM ceiling probe joins the rotation and the
    return value is ``(results, bw)`` with every result denominated
    against that co-sampled ceiling.  A caller-supplied ``hbm_bw`` then
    acts as a FLOOR on the denominator: every probe window measures a
    lower bound of the chip's speed of light (contention only lowers
    readings), so the max over sampled windows is the best available
    ceiling estimate and keeps the roofline conservative — a low-drawing
    co-sample must never manufacture a >100% reading (round-3 verdict:
    the big-tiled row printed 102.6%)."""
    preps = {name: _Prepared(a, name, iters_a, iters_b, adapt=adapt)
             for name, a in objs.items()}
    pp = _ProbePrepared(mb=probe_mb) if probe else None
    members = list(preps.values()) + ([pp] if pp is not None else [])
    for rep in range(repeats):
        # rotate the order every round: a fixed position in the round
        # showed a systematic ±10 % bias between identical kernels
        for j in range(len(members)):
            members[(j + rep) % len(members)].time_round(rep)
    if pp is not None:
        bw = max(pp.bandwidth(), hbm_bw or 0.0)
        return {n: p.result(bw) for n, p in preps.items()}, bw
    return {name: prep.result(hbm_bw) for name, prep in preps.items()}


def bytes_per_slot(a) -> float:
    """HBM bytes streamed per padded element slot: panel = vals f32 + loc
    u16 (6 B); segmented = (5P+2)/P for the P-packed stream (5.5 at P=4).
    Computed exactly from the device arrays."""
    slots, total = traffic_model(a)
    return total / max(slots, 1)


def traffic_model(a) -> tuple[int, float]:
    """(padded element slots, HBM bytes) streamed per SpMV, including a
    HYB container's segmented spill stream.  Bytes are the exact device
    array sizes — no modeling."""
    if not hasattr(a, "dev"):  # TiledSpmv carries its own exact accounting
        return a.element_slots, (float(a.stream_bytes)
                                 + float(a.aux_traffic_bytes))
    spill = getattr(a, "dev_spill", None)
    if spill is not None and getattr(a, "panel_nnz", 1) == 0:
        # pure-spill HYB never dispatches its (empty) panel container —
        # billing its minimum-geometry arrays overstated the stream
        slots = spill.element_slots
        total = float(spill.stream_bytes)
        total += float(getattr(spill, "aux_traffic_bytes", 0))
        total += float(getattr(a, "epilogue_bytes", 0))
        return slots, total
    slots = a.dev.element_slots
    total = float(a.dev.stream_bytes)
    total += float(getattr(a.dev, "aux_traffic_bytes", 0))  # partials pass
    if spill is not None:
        slots += spill.element_slots
        total += float(spill.stream_bytes)
        total += float(getattr(spill, "aux_traffic_bytes", 0))
    total += float(getattr(a, "epilogue_bytes", 0))  # SELL unpermute pass
    return slots, total


def bench_spmm(
    a,
    format_name: str,
    rhs: int,
    *,
    iters_a: int = 20,
    iters_b: int = 100,
    repeats: int = 5,
    hbm_bw: float | None = None,
) -> dict:
    """Multi-RHS benchmark: Y = A @ X with X (ncols, R), same chained-loop
    slope protocol as ``bench_format``.  The natural citizen is BSR (one
    batched MXU matmul); other formats time R chained SpMVs."""
    import copy

    import jax

    from spmv_tpu.api import spmm

    rng = np.random.default_rng(0)
    X0 = jnp.asarray(rng.standard_normal((a.ncols, rhs)).astype(np.float32))

    # As in _chained_loop: the container's device arrays must ride as jit
    # ARGUMENTS — a closure would embed them as compile-payload constants,
    # which the tunnel rejects above ~100 MB (DESIGN.md fact 6).
    leaf_attrs = [n for n in ("dev", "dev_spill", "_perm_whi", "_perm_idx",
                              "tiles", "tile_blk", "tile_stp")
                  if getattr(a, n, None) is not None]
    leaves = [getattr(a, n) for n in leaf_attrs]

    def chain(iters):
        @jax.jit
        def loop(X, *leaves):
            b = copy.copy(a)
            for n, v in zip(leaf_attrs, leaves):
                object.__setattr__(b, n, v)

            def body(i, X):
                Y = spmm(b, X)
                # ~R-element dependency instead of feeding back the whole
                # normalized Y (see _chained_loop)
                probe = X[0:1, :] + Y[0:1, :] * 1e-38
                return jax.lax.dynamic_update_slice(X, probe, (0, 0))
            return jax.lax.fori_loop(0, iters, body, X)
        return lambda X: loop(X, *leaves)

    fa, fb = chain(iters_a), chain(iters_b)
    _fetch(fa(X0)); _fetch(fb(X0))
    slopes = []
    for rep in range(repeats):
        Xr = X0 + jnp.float32((rep + 1) * 1e-7)  # unique dispatch per repeat
        t0 = time.perf_counter(); _fetch(fa(Xr)); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); _fetch(fb(Xr)); tb = time.perf_counter() - t0
        slopes.append((tb - ta) / (iters_b - iters_a))
    t = max(float(np.median(slopes)), 1e-9)
    gnv = a.nnz * rhs / t / 1e9
    out = {
        "format": format_name,
        "rhs": rhs,
        "nnz": a.nnz,
        "ms_per_spmm": t * 1e3,
        "gnnzvec_per_s": gnv,
        "gflops": 2 * a.nnz * rhs / (t * 1e3) * 1e-6,  # reference formula × R
    }
    if hasattr(a, "fill"):
        out["fill"] = a.fill
    return out


@functools.lru_cache(maxsize=None)
def _bw_loops(k: int):
    """Compiled probe loops, cached so repeated probes (one per benched
    format) pay compilation once."""
    @jax.jit
    def rw(a):
        return jax.lax.fori_loop(0, k, lambda i, a: a * 1.0000001, a)

    @jax.jit  # a rides as an argument — closures become compile payload
    def rd(a, s):
        # |a - s| is NOT factorable over the carried scalar — sum(a*s)
        # rewrites to s*sum(a) and XLA hoists the whole read out of the
        # loop (observed: a "read bandwidth" above the HBM spec).
        def body(i, s):
            return jnp.sum(jnp.abs(a - s)) * 1e-38 + 1.0
        return jax.lax.fori_loop(0, k, body, s)

    return rw, rd


def measure_hbm_bw(mb: int = 128, iters: int = 100) -> float:
    """HBM speed-of-light probe → bytes/s: max of a serialized elementwise
    read+write pass and a pure-read reduction pass.  The SpMV streams are
    read-dominated, and pure reads measurably exceed the read+write rate
    on this chip (round-2 ELL read >100% of the old read+write-only
    ceiling), so the roofline denominator takes the larger of the two."""
    n = mb * 1024 * 1024 // 4
    a = jnp.ones((n // LANES, LANES), jnp.float32)

    def make_rw(k):
        return _bw_loops(k)[0]

    def make_rd(k):
        return _bw_loops(k)[1]

    def slope(l1, l2, a0, *rest):
        _fetch(l1(a0, *rest)); _fetch(l2(a0, *rest))
        t1 = t2 = float("inf")
        for rep in range(3):
            ar = a0 + jnp.float32((rep + 1) * 1e-9)  # unique dispatches
            t0 = time.perf_counter(); _fetch(l1(ar, *rest)); t1 = min(t1, time.perf_counter() - t0)
            t0 = time.perf_counter(); _fetch(l2(ar, *rest)); t2 = min(t2, time.perf_counter() - t0)
        return max((t2 - t1) / iters, 1e-9)

    rw = 2 * n * 4 / slope(make_rw(iters), make_rw(2 * iters), a)
    rd = n * 4 / slope(make_rd(iters), make_rd(2 * iters), a,
                       jnp.float32(1.0))
    # No measurement can beat physics: slope noise on the time-shared
    # tunnel occasionally reads above the part's spec — clamp there.
    return min(max(rw, rd), V5E_HBM_BW)
