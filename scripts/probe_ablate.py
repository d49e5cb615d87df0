"""Ablation probe for the P=4 segmented kernel: which stage gates the
quad rate?  Timing-only variants (correctness-invalid by design):

  full      — the production kernel shape
  noU       — skip the 2-pass MXU prefix (cs := p)
  noseg     — skip the gidx takes + shift (pieces := cs)
  nowin     — skip the per-subtile window slice + sublane gather
              (T := broadcast of one slice)
  noacc     — skip the per-subtile y accumulate (one store)
  dma       — no compute at all: reduce the raw streams
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES, SUB = 128, 8
NCOLS = 62464
S = NCOLS // LANES
NB = NCOLS // LANES
P, CHUNK, NS, KVA = 4, 256, 8, 2
ROWS = 11776  # ~ the real bench plan's TM


def _triu():
    rk = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    ck = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    return (rk <= ck).astype(jnp.bfloat16)


def _rowsum(chunk):
    nsub = chunk // SUB
    rt = jax.lax.broadcasted_iota(jnp.int32, (nsub, chunk), 0)
    rc = jax.lax.broadcasted_iota(jnp.int32, (nsub, chunk), 1)
    return jnp.logical_and(rc >= rt * SUB, rc < (rt + 1) * SUB).astype(jnp.bfloat16)


def _slice(refs, k, ns, chunk):
    per = ns // len(refs)
    r = refs[k // per]
    off = (k % per) * chunk
    return r[off:off + chunk, :]


def build(variant):
    nv = P * KVA

    def kernel(sub_block_ref, sub_base_ref, *refs):
        vals = refs[:nv]
        lo_r = refs[nv:nv + P]
        hi_r = refs[nv + P:nv + P + 1]
        gi_r = refs[nv + P + 1:nv + P + 2]
        x_ref, o_ref = refs[-2], refs[-1]
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        U, R = _triu(), _rowsum(CHUNK)
        nsub = CHUNK // SUB
        for k in range(NS):
            g0 = step * (NS * nsub) + k * nsub
            hi_c = _slice(hi_r, k, NS, CHUNK).astype(jnp.int32)
            if variant == "dma":
                acc = hi_c.astype(jnp.float32)
                for pp in range(P):
                    acc += (_slice((lo_r[pp],), k, NS, CHUNK).astype(jnp.float32)
                            + _slice(vals[pp * KVA:(pp + 1) * KVA], k, NS, CHUNK))
                acc += _slice(gi_r, k, NS, CHUNK).astype(jnp.float32)
                o_ref[0:1, 0:LANES] += jnp.sum(acc, axis=0, keepdims=True)[:, :LANES]
                continue
            if variant == "nowin":
                w = x_ref[pl.ds(sub_base_ref[g0], SUB), :]
                T = jnp.broadcast_to(w[0:1, :], (CHUNK, LANES))
            else:
                ts = []
                for s in range(nsub):
                    w = x_ref[pl.ds(sub_base_ref[g0 + s], SUB), :]
                    ts.append(jnp.take_along_axis(
                        w, hi_c[s * SUB:(s + 1) * SUB, :], axis=0))
                T = jnp.concatenate(ts, axis=0)
            p = jnp.zeros((CHUNK, LANES), jnp.float32)
            for pp in range(P):
                lo = _slice((lo_r[pp],), k, NS, CHUNK).astype(jnp.int32)
                v = _slice(vals[pp * KVA:(pp + 1) * KVA], k, NS, CHUNK)
                p = p + v * jnp.take_along_axis(T, lo, axis=1)
            if variant == "noU":
                cs = p
            else:
                ph = p.astype(jnp.bfloat16)
                plo = (p - ph.astype(jnp.float32)).astype(jnp.bfloat16)
                cs = (jnp.dot(ph, U, preferred_element_type=jnp.float32)
                      + jnp.dot(plo, U, preferred_element_type=jnp.float32))
            if variant == "noseg":
                pieces = cs
            else:
                gi = _slice(gi_r, k, NS, CHUNK).astype(jnp.int32)
                pi = jnp.concatenate(
                    [jnp.zeros((CHUNK, 1), jnp.int32), gi[:, :LANES - 1]], axis=1)
                pieces = (jnp.take_along_axis(cs, gi, axis=1)
                          - jnp.take_along_axis(cs, pi, axis=1))
            ph = pieces.astype(jnp.bfloat16)
            plo = (pieces - ph.astype(jnp.float32)).astype(jnp.bfloat16)
            parts = (jnp.dot(R, ph, preferred_element_type=jnp.float32)
                     + jnp.dot(R, plo, preferred_element_type=jnp.float32))
            if variant == "noacc":
                o_ref[0:1, 0:LANES] += jnp.sum(parts, axis=0, keepdims=True)
            else:
                for s in range(nsub):
                    b = sub_block_ref[g0 + s]
                    off = pl.multiple_of(b * LANES, LANES)
                    o_ref[0:1, pl.ds(off, LANES)] += parts[s:s + 1, :]

    sc = CHUNK * NS
    tm = ((ROWS + sc - 1) // sc) * sc
    rng = np.random.default_rng(0)
    nsub_t = tm // SUB
    sub_block = jnp.asarray(rng.integers(0, NB, nsub_t, dtype=np.int32))
    sub_base = jnp.asarray(rng.integers(0, S - SUB, nsub_t, dtype=np.int32))

    def split(a, m):
        x3 = a.reshape(tm // sc, m, sc // m, LANES)
        return [jnp.asarray(np.ascontiguousarray(x3[:, j]).reshape(-1, LANES))
                for j in range(m)]

    arrs = []
    for pp in range(P):
        arrs += split(rng.standard_normal((tm, LANES)).astype(np.float32), KVA)
    for pp in range(P):
        arrs += split(rng.integers(0, LANES, (tm, LANES)).astype(np.uint8), 1)
    hi = rng.integers(0, SUB, (tm, LANES)).astype(np.uint8)
    hi[:] = hi[:, :1]
    arrs += split(hi, 1)
    arrs += split(np.sort(rng.integers(0, LANES, (tm, LANES)).astype(np.uint8),
                          axis=1), 1)

    in_specs = (
        [pl.BlockSpec((sc // KVA, LANES), lambda i, *_: (i, 0),
                      memory_space=pltpu.VMEM)] * nv
        + [pl.BlockSpec((sc, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)] * (P + 2)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(tm // sc,), in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((1, NB * LANES), jnp.float32),
    )
    elems = tm * LANES * P
    bytes_ = tm * LANES * (5 * P + 2)
    return (lambda x2d: fn(sub_block, sub_base, *arrs, x2d)), elems, bytes_


def timed(fn, label, elems, bytes_, ia=30, ib=150):
    def chain(it):
        @jax.jit
        def loop(x2d):
            def body(i, x2d):
                y = fn(x2d)
                nrm = jax.lax.rsqrt(jnp.sum(y * y) + 1e-9)
                return (y * nrm).reshape(S, LANES)
            return jax.lax.fori_loop(0, it, body, x2d)
        return loop
    x2d = jnp.asarray(np.random.default_rng(1).standard_normal(
        (S, LANES)).astype(np.float32))
    fa, fb = chain(ia), chain(ib)
    float(jnp.sum(fa(x2d))); float(jnp.sum(fb(x2d)))
    sl = []
    for _ in range(5):
        t0 = time.perf_counter(); float(jnp.sum(fa(x2d))); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(jnp.sum(fb(x2d))); tb = time.perf_counter() - t0
        sl.append((tb - ta) / (ib - ia))
    t = float(np.median(sl))
    print(f"{label:7s}: {t*1e3:7.3f} ms  {elems/t/1e9:6.1f} Gelem/s  "
          f"{bytes_/t/1e9:6.1f} GB/s")


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["full", "noU", "noseg", "nowin", "noacc", "dma"]):
        fn, e, b = build(v)
        timed(fn, v, e, b)
