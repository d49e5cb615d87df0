"""Round-2 perf probe: P-packed segmented engines vs the current one.

Timing-only (streams carry synthetic but shape/index-valid data); uses the
chained-loop slope protocol from bench/runner.py (the axon tunnel caches
identical dispatches — see docs/DESIGN.md fact 6).

Variants, all on ~4.46M padded slots (the CSR bench stream size):
  seg1      — current engine 2 layout (8 B/slot, 16 arrays)
  seg2      — pair-packed: 2 value planes, hi u8 + lo u8 planes, filled
              gidx with lane-shift-derived pidx (6 B/elem, 12 arrays)
  seg4      — quad-packed (5.25 B/elem, 18 arrays)
  panel16   — panel engine with kv=16 (DMA-ceiling check at 24 arrays)
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES, SUB = 128, 8
N_ELEM = 4_456_448  # ~ CSR slots on the cant-scale bench
NCOLS = 62464
S = NCOLS // LANES  # x-table rows
NB = NCOLS // LANES  # y blocks


def _triu():
    rk = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    ck = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    return (rk <= ck).astype(jnp.bfloat16)


def _rowsum(chunk):
    nsub = chunk // SUB
    rt = jax.lax.broadcasted_iota(jnp.int32, (nsub, chunk), 0)
    rc = jax.lax.broadcasted_iota(jnp.int32, (nsub, chunk), 1)
    return jnp.logical_and(rc >= rt * SUB, rc < (rt + 1) * SUB).astype(jnp.bfloat16)


def _split_dot(p, m):
    ph = p.astype(jnp.bfloat16)
    plo = (p - ph.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(ph, m, preferred_element_type=jnp.float32)
            + jnp.dot(plo, m, preferred_element_type=jnp.float32))


def _slice(refs, k, ns, chunk):
    per = ns // len(refs)
    r = refs[k // per]
    off = (k % per) * chunk
    return r[off:off + chunk, :]


def _windows(x_ref, sub_base_ref, hi_c, g0, chunk):
    ts = []
    for s in range(chunk // SUB):
        w = x_ref[pl.ds(sub_base_ref[g0 + s], SUB), :]
        ts.append(jnp.take_along_axis(w, hi_c[s * SUB:(s + 1) * SUB, :], axis=0))
    return jnp.concatenate(ts, axis=0)


def _acc(o_ref, parts, sub_block_ref, g0, nsub):
    for s in range(nsub):
        b = sub_block_ref[g0 + s]
        off = pl.multiple_of(b * LANES, LANES)
        o_ref[0:1, pl.ds(off, LANES)] += parts[s:s + 1, :]


def make_packed(P, chunk, ns, kva, rows):
    """P-packed segmented kernel: kva vals arrays PER PLANE, 1 hi array,
    1 lo array per plane, 1 gidx array (filled; pidx = lane shift)."""
    nsub = chunk // SUB
    n_vals = P * kva

    def kernel(sub_block_ref, sub_base_ref, *refs):
        vals = refs[:n_vals]  # plane-major: plane p occupies [p*kva,(p+1)*kva)
        hi_r = refs[n_vals:n_vals + 1]
        lo_r = refs[n_vals + 1:n_vals + 1 + P]
        gi_r = refs[n_vals + 1 + P:n_vals + 2 + P]
        x_ref, o_ref = refs[-2], refs[-1]
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        U, R = _triu(), _rowsum(chunk)
        for k in range(ns):
            g0 = step * (ns * nsub) + k * nsub
            hi_c = _slice(hi_r, k, ns, chunk).astype(jnp.int32)
            T = _windows(x_ref, sub_base_ref, hi_c, g0, chunk)
            p = jnp.zeros((chunk, LANES), jnp.float32)
            for pp in range(P):
                lo = _slice((lo_r[pp],), k, ns, chunk).astype(jnp.int32)
                v = _slice(vals[pp * kva:(pp + 1) * kva], k, ns, chunk)
                p = p + v * jnp.take_along_axis(T, lo, axis=1)
            cs = _split_dot(p, U)
            gi = _slice(gi_r, k, ns, chunk).astype(jnp.int32)
            pi = jnp.concatenate(
                [jnp.zeros((chunk, 1), jnp.int32), gi[:, :LANES - 1]], axis=1)
            pieces = (jnp.take_along_axis(cs, gi, axis=1)
                      - jnp.take_along_axis(cs, pi, axis=1))
            ph = pieces.astype(jnp.bfloat16)
            plo = (pieces - ph.astype(jnp.float32)).astype(jnp.bfloat16)
            parts = (jnp.dot(R, ph, preferred_element_type=jnp.float32)
                     + jnp.dot(R, plo, preferred_element_type=jnp.float32))
            _acc(o_ref, parts, sub_block_ref, g0, nsub)

    sc = chunk * ns
    tm = ((rows + sc - 1) // sc) * sc
    rng = np.random.default_rng(0)
    nsub_t = tm // SUB
    sub_block = jnp.asarray(rng.integers(0, NB, nsub_t, dtype=np.int32))
    sub_base = jnp.asarray(rng.integers(0, S - SUB, nsub_t, dtype=np.int32))

    def split(a, m):
        x3 = a.reshape(tm // sc, m, sc // m, LANES)
        return tuple(jnp.asarray(np.ascontiguousarray(x3[:, j]).reshape(-1, LANES))
                     for j in range(m))

    vals_np = rng.standard_normal((tm, LANES)).astype(np.float32)
    arrs = []
    for pp in range(P):
        arrs += list(split(vals_np * (pp + 1), kva))
    hi = rng.integers(0, SUB, (tm, LANES)).astype(np.uint8)
    hi[:] = hi[:, :1]  # uniform per sublane row (gather exactness analog)
    arrs += list(split(hi, 1))
    for pp in range(P):
        arrs += list(split(rng.integers(0, LANES, (tm, LANES)).astype(np.uint8), 1))
    gi = np.sort(rng.integers(0, LANES, (tm, LANES)).astype(np.uint8), axis=1)
    arrs += list(split(gi, 1))

    in_specs = (
        [pl.BlockSpec((chunk * ns // kva, LANES), lambda i, *_: (i, 0),
                      memory_space=pltpu.VMEM)] * n_vals
        + [pl.BlockSpec((chunk * ns, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)] * (2 + P)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(tm // sc,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, NB * LANES), jnp.float32),
    )
    bytes_per_step = sc * LANES * (P * 4 + 1 + P + 1) / P  # per ELEMENT row count = sc*P
    elems = tm * LANES * P
    total_bytes = tm * LANES * (P * 4 + 2 + P)  # vals + hi+gidx + lo planes
    return (lambda x2d: fn(sub_block, sub_base, *arrs, x2d)), elems, total_bytes


def run_timed(fn, label, elems, total_bytes, iters_a=30, iters_b=150):
    def chain(iters):
        @jax.jit
        def loop(x2d):
            def body(i, x2d):
                y = fn(x2d)
                nrm = jax.lax.rsqrt(jnp.sum(y * y) + 1e-9)
                return (y * nrm).reshape(S, LANES)
            return jax.lax.fori_loop(0, iters, body, x2d)
        return loop

    x2d = jnp.asarray(np.random.default_rng(1)
                      .standard_normal((S, LANES)).astype(np.float32))
    fa, fb = chain(iters_a), chain(iters_b)
    float(jnp.sum(fa(x2d))); float(jnp.sum(fb(x2d)))
    slopes = []
    for _ in range(5):
        t0 = time.perf_counter(); float(jnp.sum(fa(x2d))); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(jnp.sum(fb(x2d))); tb = time.perf_counter() - t0
        slopes.append((tb - ta) / (iters_b - iters_a))
    t = float(np.median(slopes))
    print(f"{label:28s}: {t*1e3:7.3f} ms  {elems/t/1e9:6.1f} Gelem/s  "
          f"{total_bytes/t/1e9:6.1f} GB/s streamed")
    return t


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "seg2"):
        fn, e, b = make_packed(P=2, chunk=256, ns=8, kva=4, rows=N_ELEM // LANES // 2)
        run_timed(fn, "seg2 pair-packed 12-arr", e, b)
    if which in ("all", "seg4"):
        fn, e, b = make_packed(P=4, chunk=256, ns=8, kva=2, rows=N_ELEM // LANES // 4)
        run_timed(fn, "seg4 quad-packed 14-arr", e, b)
    if which in ("all", "seg1"):
        fn, e, b = make_packed(P=1, chunk=256, ns=8, kva=8, rows=N_ELEM // LANES)
        run_timed(fn, "seg1 unpacked 11-arr", e, b)
