"""Weak-scaling benchmark for the distributed SpMV layer.

BASELINE.json's multi-host target: ≥ 80 % weak-scaling efficiency from one
host to N ≥ 2 hosts on the row-partitioned CMRS config with x all-gathered
over ICI.  The reference has no distributed code at all (SURVEY.md §2.3).

Weak scaling here means per-device work is constant: every device owns
``rows_per_device`` matrix rows at fixed nnz/row, so a D-device run works a
D× larger matrix; ideal scaling keeps the wall time flat and efficiency is
``t(1)/t(D)``.

The harness runs on whatever mesh is available:

* a real multi-chip TPU slice — honest numbers (this is the pod path);
* one real chip — D = 1 only (the bench box);
* a CPU mesh via ``--xla_force_host_platform_device_count`` — the full
  sweep executes (kernels in interpret mode) and the report is labelled
  ``simulated: true``; use it to validate the sharding program, not the
  numbers.

Timing uses the same axon-proof protocol as the single-chip runner: chained
iterations inside one jitted ``fori_loop`` with a data dependency, slope
between two iteration counts.
"""

from __future__ import annotations

import time
from dataclasses import asdict, dataclass

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.formats.base import LANES

__all__ = ["ScalePoint", "analytic_weak_scaling", "weak_scaling",
           "weak_scaling_report"]


@dataclass
class ScalePoint:
    devices: int
    nrows: int
    nnz: int
    ms_per_spmv: float
    gnnz_per_s: float
    efficiency: float  # t(1)/t(D); 1.0 = ideal weak scaling

    def to_dict(self):
        return asdict(self)


def _chained(sh, iters: int):
    """iters chained distributed SpMVs in one jitted loop (x ← y norm)."""
    arrays = tuple(sh.arrays.values())
    S = sh.S
    need = S * LANES

    @jax.jit
    def loop(x2d):
        def body(i, x):
            y = sh._fn(x, *arrays)  # (1, rows) padded
            nrm = jax.lax.rsqrt(jnp.sum(y * y) + 1e-9)
            yv = (y * nrm).reshape(-1)
            yv = yv[:need] if yv.shape[0] >= need else jnp.pad(
                yv, (0, need - yv.shape[0]))
            return yv.reshape(S, LANES)
        return jax.lax.fori_loop(0, iters, body, x2d)

    return loop


def _time_sharded(sh, x: np.ndarray, *, iters_a=20, iters_b=60,
                  repeats=3) -> float:
    from jax.sharding import NamedSharding, PartitionSpec as P

    xf = jnp.asarray(x, jnp.float32)
    xf = jnp.pad(xf, (0, sh.S * LANES - xf.shape[0])).reshape(sh.S, LANES)
    if sh.gather_x:
        xf = jax.device_put(xf, NamedSharding(sh.mesh, P(sh.axis, None)))
    fa, fb = _chained(sh, iters_a), _chained(sh, iters_b)
    float(jnp.sum(fa(xf)))
    float(jnp.sum(fb(xf)))
    ta = tb = float("inf")
    for rep in range(repeats):
        xr = xf + jnp.float32((rep + 1) * 1e-7)  # unique dispatch per repeat
        t0 = time.perf_counter()
        float(jnp.sum(fa(xr)))
        ta = min(ta, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(jnp.sum(fb(xr)))
        tb = min(tb, time.perf_counter() - t0)
    return max((tb - ta) / (iters_b - iters_a), 1e-9)


def weak_scaling(
    format: str = "cmrs",
    *,
    rows_per_device: int = 16384,
    avg_nnz_per_row: int = 32,
    bandwidth: int = 256,
    device_counts=None,
    gather_x: bool = True,
    seed: int = 0,
    iters_a: int = 20,
    iters_b: int = 60,
    repeats: int = 3,
) -> list[ScalePoint]:
    """Run the weak-scaling sweep; returns one point per device count."""
    from spmv_tpu.dist.mesh import make_mesh
    from spmv_tpu.dist.sharded import RowShardedSpmv
    from spmv_tpu.synth import synthetic_cant

    ndev = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]

    points: list[ScalePoint] = []
    t1 = None
    for d in device_counts:
        n = rows_per_device * d
        info, rows, cols, vals = synthetic_cant(
            n=n, avg_nnz_per_row=avg_nnz_per_row, bandwidth=bandwidth,
            seed=seed)
        mesh = make_mesh(d)
        sh = RowShardedSpmv(format, info.nrows, info.ncols, rows, cols, vals,
                            mesh, gather_x=gather_x)
        x = np.random.default_rng(seed).standard_normal(
            info.ncols).astype(np.float32)
        t = _time_sharded(sh, x, iters_a=iters_a, iters_b=iters_b,
                          repeats=repeats)
        if t1 is None:
            t1 = t
        points.append(ScalePoint(
            devices=d, nrows=info.nrows, nnz=rows.size,
            ms_per_spmv=t * 1e3,
            gnnz_per_s=rows.size / t / 1e9,
            efficiency=t1 / t,
        ))
    return points


V5E_ICI_GBPS = 90e9  # per-direction ICI link bandwidth, v5e (2 links/axis)


def analytic_weak_scaling(
    t1_s: float,
    *,
    rows_per_device: int,
    avg_nnz_per_row: int = 32,
    device_counts=(2, 4, 8, 16),
    ici_bw: float = V5E_ICI_GBPS,
) -> list[dict]:
    """Expected weak-scaling efficiency from a measured single-chip time
    plus an ICI cost model — the bound the one-chip bench box can produce
    for the ≥80 % multi-host target (BASELINE.json) without a pod.

    The D-device step all-gathers x (4 B/row, ring algorithm: each device
    receives (D−1)/D of the D·rows_per_device-row vector over its ICI
    links).  ``eff_no_overlap`` serializes comm after compute (lower
    bound); ``eff_overlap`` is the perfect-overlap bound (compute-bound,
    1.0 until comm exceeds compute).  The overlap STRUCTURE is implemented
    — ``dist.overlap.ChunkedRowSpmv`` interleaves per-chunk all-gathers
    with per-chunk compute and ``dist.ring`` double-buffers the ppermute
    ahead of each step's kernel (round-5 verdict item 3) — but on this
    one-chip box its ICI effect can only be modeled, not measured; a pod
    run of ``weak_scaling(…)`` over those classes gives the honest number.
    Compute time is t1 by construction of weak scaling (per-device bytes
    constant).
    """
    out = []
    for d in device_counts:
        recv_bytes = 4.0 * rows_per_device * (d - 1)
        t_comm = recv_bytes / ici_bw
        out.append({
            "devices": int(d),
            "t_comm_us": t_comm * 1e6,
            "eff_no_overlap": t1_s / (t1_s + t_comm),
            "eff_overlap": min(1.0, t1_s / max(t1_s, t_comm)),
        })
    return out


def weak_scaling_report(**kwargs) -> dict:
    """Full JSON-able report (adds backend/simulation labelling).  On a
    single real TPU chip the sweep has one measured point; the report then
    carries the analytic ICI model's efficiency bounds for D ≥ 2."""
    backend = jax.default_backend()
    force_model = kwargs.pop("force_model", False)
    points = weak_scaling(**kwargs)
    rep = {
        "config": {"format": kwargs.get("format", "cmrs"),
                   "gather_x": kwargs.get("gather_x", True)},
        "backend": backend,
        "simulated": backend != "tpu",
        "points": [p.to_dict() for p in points],
        "max_devices_efficiency": points[-1].efficiency if points else None,
    }
    if points and (backend == "tpu" or force_model):
        rep["modeled_efficiency"] = analytic_weak_scaling(
            points[0].ms_per_spmv * 1e-3,
            rows_per_device=kwargs.get("rows_per_device", 16384),
            avg_nnz_per_row=kwargs.get("avg_nnz_per_row", 32),
        )
        rep["modeled"] = (
            "ICI ring all-gather cost model on the measured D=1 time; "
            "eff_no_overlap is the lower bound; eff_overlap is the "
            "perfect-overlap bound — overlap structure implemented "
            "(dist.overlap.ChunkedRowSpmv chunked gather, dist.ring "
            "double-buffered ppermute), ICI-modeled on this 1-chip box")
    return rep
