"""Multi-RHS probe: is a FUSED R-vector segmented kernel faster per
vector than R chained single-vector dispatches (api.spmm's loop)?

The fused variant streams the matrix ONCE for R vectors (index/value
DMA amortized R×) but its VPU work (gathers, combines, window matmuls)
scales with R; the single-vector kernel already runs ~84% of the DMA
ceiling (DESIGN.md fact 9), so the model predicts
t_fused(R) ≈ max(t_dma, R·t_compute) vs t_loop(R) = R·t_single — a
bounded ~1.2× ceiling.  This probe measures it (timing-only kernels,
production geometry, interleaved with the ceiling probe per the tunnel
protocol).
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
P, CHUNK, NS, KVA = 4, 128, 4, 4
W = 16
ROWS = 8704
NV = P * KVA


def _triu():
    rk = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    ck = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    return (rk <= ck).astype(jnp.bfloat16)


def _slice(refs, k, ns, chunk):
    per = ns // len(refs)
    r = refs[k // per]
    off = (k % per) * chunk
    return r[off:off + chunk, :]


def _split_dot(p, m):
    ph = p.astype(jnp.bfloat16)
    plo = (p - ph.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(ph, m, preferred_element_type=jnp.float32)
            + jnp.dot(plo, m, preferred_element_type=jnp.float32))


def build(rhs: int):
    """One kernel processing `rhs` x tables per matrix pass (rhs=1 = the
    production shape)."""

    def kernel(sub_base_ref, *refs):
        vals = refs[:NV]
        lo_r = refs[NV:NV + P]
        hi_r = refs[NV + P:NV + P + 1]
        gi_r = refs[NV + P + 1:NV + P + 2]
        meta_ref = refs[NV + P + 2]
        x_ref = refs[-2]  # (rhs*S, 128) — r-th table at rows [r*S,(r+1)*S)
        op_ref = refs[-1]  # (NS*W*rhs, 128) partials per step
        step = pl.program_id(0)
        U = _triu()
        nsub = CHUNK // SUB
        for k in range(NS):
            g0 = step * (NS * nsub) + k * nsub
            hi_c = _slice(hi_r, k, NS, CHUNK).astype(jnp.int32)
            gi = _slice(gi_r, k, NS, CHUNK).astype(jnp.int32)
            pi = jnp.concatenate(
                [jnp.zeros((CHUNK, 1), jnp.int32), gi[:, :LANES - 1]],
                axis=1)
            wv = meta_ref[k:k + 1, 0:CHUNK].astype(jnp.int32)
            tt = jax.lax.broadcasted_iota(jnp.int32, (W, CHUNK), 0)
            Rw = (jnp.broadcast_to(wv, (W, CHUNK)) == tt).astype(
                jnp.bfloat16)
            los = [_slice((lo_r[pp],), k, NS, CHUNK).astype(jnp.int32)
                   for pp in range(P)]
            vs = [_slice(vals[pp * KVA:(pp + 1) * KVA], k, NS, CHUNK)
                  for pp in range(P)]
            for r in range(rhs):
                ts = []
                for s in range(nsub):
                    w = x_ref[pl.ds(r * S + sub_base_ref[g0 + s], SUB), :]
                    ts.append(jnp.take_along_axis(
                        w, hi_c[s * SUB:(s + 1) * SUB, :], axis=0))
                T = jnp.concatenate(ts, axis=0)
                p = jnp.zeros((CHUNK, LANES), jnp.float32)
                for pp in range(P):
                    p = p + vs[pp] * jnp.take_along_axis(
                        T, los[pp] & (LANES - 1), axis=1)
                cs = _split_dot(p, U)
                pieces = (jnp.take_along_axis(cs, gi, axis=1)
                          - jnp.take_along_axis(cs, pi, axis=1))
                ph = pieces.astype(jnp.bfloat16)
                plo = (pieces - ph.astype(jnp.float32)).astype(jnp.bfloat16)
                parts = (jnp.dot(Rw, ph, preferred_element_type=jnp.float32)
                         + jnp.dot(Rw, plo,
                                   preferred_element_type=jnp.float32))
                op_ref[(k * rhs + r) * W:(k * rhs + r + 1) * W, :] = parts

    sc = CHUNK * NS
    tm = ((ROWS + sc - 1) // sc) * sc
    nsteps = tm // sc
    rng = np.random.default_rng(0)
    sub_base = jnp.asarray(rng.integers(0, S - SUB, tm // SUB,
                                        dtype=np.int32))

    def split(a, m):
        x3 = a.reshape(tm // sc, m, sc // m, LANES)
        return [jnp.asarray(np.ascontiguousarray(x3[:, j]).reshape(-1, LANES))
                for j in range(m)]

    arrs = []
    for _ in range(P):
        arrs += split(rng.standard_normal((tm, LANES)).astype(np.float32),
                      KVA)
    for _ in range(P):
        arrs += split(rng.integers(0, LANES, (tm, LANES)).astype(np.uint8), 1)
    hi = rng.integers(0, SUB, (tm, LANES)).astype(np.uint8)
    hi[:] = hi[:, :1]
    arrs += split(hi, 1)
    arrs += split(np.sort(rng.integers(0, LANES, (tm, LANES)).astype(
        np.uint8), axis=1), 1)
    meta = rng.integers(0, W, (nsteps * 8, LANES)).astype(np.uint8)
    arrs.append(jnp.asarray(meta))

    in_specs = (
        [pl.BlockSpec((sc // KVA, LANES), lambda i, *_: (i, 0),
                      memory_space=pltpu.VMEM)] * NV
        + [pl.BlockSpec((sc, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)] * (P + 2)
        + [pl.BlockSpec((8, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nsteps,), in_specs=in_specs,
            out_specs=pl.BlockSpec((NS * W * rhs, LANES),
                                   lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((nsteps * NS * W * rhs, LANES),
                                       jnp.float32),
    )
    elems = tm * LANES * P * rhs  # element·vector products per pass
    return (lambda x2d: fn(sub_base, *arrs, x2d)), elems, rhs


class Member:
    def __init__(self, label, fn, elems, rhs, ia=60, ib=300):
        self.label, self.elems, self.rhs = label, elems, rhs
        self.ia, self.ib = ia, ib

        def chain(it):
            @jax.jit
            def loop(x2d):
                def body(i, x2d):
                    y = fn(x2d)
                    probe = x2d[0:1, :] + y[0:1, :] * 1e-38
                    return jax.lax.dynamic_update_slice(x2d, probe, (0, 0))
                return jax.lax.fori_loop(0, it, body, x2d)
            return loop

        self.x2d = jnp.asarray(np.random.default_rng(1).standard_normal(
            (self.rhs * S, LANES)).astype(np.float32))
        self.fa, self.fb = chain(ia), chain(ib)
        float(jnp.sum(self.fa(self.x2d)))
        float(jnp.sum(self.fb(self.x2d)))
        self.ta = self.tb = float("inf")

    def time_round(self, rep):
        xr = self.x2d + jnp.float32((rep + 1) * 1e-7)
        t0 = time.perf_counter(); float(jnp.sum(self.fa(xr)))
        self.ta = min(self.ta, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(jnp.sum(self.fb(xr)))
        self.tb = min(self.tb, time.perf_counter() - t0)

    def t(self):
        return max((self.tb - self.ta) / (self.ib - self.ia), 1e-9)


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from spmv_tpu.bench.runner import _ProbePrepared

    members = []
    for rhs in (1, 2, 4):
        fn, e, r = build(rhs)
        members.append(Member(f"fused-R{rhs}", fn, e, r))
    ceil = _ProbePrepared()
    rot = members + [ceil]
    for rep in range(12):
        for j in range(len(rot)):
            rot[(j + rep) % len(rot)].time_round(rep)
    bw = ceil.bandwidth()
    print(f"co-sampled ceiling: {bw/1e9:6.1f} GB/s")
    base = members[0].t()
    for m in members:
        t = m.t()
        per_vec = t / m.rhs
        print(f"{m.label:9s}: {t*1e3:7.3f} ms/pass  "
              f"{m.elems/t/1e9:6.1f} Gelem·vec/s  "
              f"per-vector {per_vec*1e3:7.3f} ms "
              f"({base/per_vec:4.2f}x vs R separate passes)")
