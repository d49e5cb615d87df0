"""Ablation probe for the PRODUCTION round-3 kernel shape — streamed
window partials + scatter-add epilogue (probe_ablate2 measured the
older in-kernel-RMW shape).  Which op stream costs the gap between the
recorded ~615-625 GB/s effective and the ~738 GB/s DMA ceiling?

Timing-only variants (correctness-invalid by design):

  full    — production: main kernel emits (NS·W,128) partials per step,
            epilogue kernel scatter-adds them into y
  noscat  — main kernel only (partials never folded): the epilogue's cost
  noshift — pieces := t (the gidx gather, no lane-shift difference)
  nogidx  — pieces := d (no segment extraction at all)
  noc2    — no mid-quad boundary correction (unmasked lo gather)
  noU     — no MXU prefix (cs := p)
  noRw    — no windowed reduce (store pieces' first W rows)
  nowin   — no per-subtile x-window slicing (one broadcast row)
  dma     — no compute at all: reduce the raw streams

Geometry matches the cant bench plan: (chunk, ns) = (128, 4), P = 4,
kva = 4, W = 16, TM = 8704.  Interleaved round-robin with the co-sampled
ceiling probe (the tunnel protocol of bench/runner.py).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

LANES, SUB = 128, 8
NCOLS = 62464
S = NCOLS // LANES
P = 4
CHUNK = int(os.environ.get("AB_CHUNK", 128))
NS = int(os.environ.get("AB_NS", 4))
KVA = int(os.environ.get("AB_KVA", 4))
W = 16
ROWS = 8704
NV = P * KVA
OUT_ROWS = NCOLS // LANES  # y table rows


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


def _split_rowsum(R, p):
    ph = p.astype(jnp.bfloat16)
    plo = (p - ph.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(R, ph, preferred_element_type=jnp.float32)
            + jnp.dot(R, plo, preferred_element_type=jnp.float32))


def _scatter_kernel(base_ref, p_ref, o_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for k in range(NS):
        base = base_ref[step * NS + k]
        o_ref[pl.ds(base, W), :] += p_ref[k * W:(k + 1) * W, :]


def build(variant):
    def kernel(sub_base_ref, *refs):
        vals = refs[:NV]
        lo_r = refs[NV:NV + P]
        hi_r = refs[NV + P:NV + P + 1]
        gi_r = refs[NV + P + 1:NV + P + 2]
        meta_ref = refs[NV + P + 2]
        x_ref, op_ref = refs[-2], refs[-1]
        step = pl.program_id(0)

        if variant == "dma":
            acc = jnp.zeros((1, LANES), jnp.float32)
            for a in refs[:-1]:
                v = a[...]
                if v.dtype == jnp.uint8:
                    v = v.astype(jnp.int32)
                acc = acc + jnp.sum(v.astype(jnp.float32), axis=0,
                                    keepdims=True)
            op_ref[0:1, :] = acc
            return

        U = _triu()
        nsub = CHUNK // SUB
        for k in range(NS):
            g0 = step * (NS * nsub) + k * nsub
            hi_c = _slice(hi_r, k, NS, CHUNK).astype(jnp.int32)
            if variant == "nowin":
                w0 = x_ref[pl.ds(sub_base_ref[g0], SUB), :]
                T = jnp.broadcast_to(w0[0:1, :], (CHUNK, LANES))
            else:
                ts = []
                for s in range(nsub):
                    w = x_ref[pl.ds(sub_base_ref[g0 + s], SUB), :]
                    ts.append(jnp.take_along_axis(
                        w, hi_c[s * SUB:(s + 1) * SUB, :], axis=0))
                T = jnp.concatenate(ts, axis=0)
            p = jnp.zeros((CHUNK, LANES), jnp.float32)
            c2 = jnp.zeros((CHUNK, LANES), jnp.float32)
            for pp in range(P):
                lo = _slice((lo_r[pp],), k, NS, CHUNK).astype(jnp.int32)
                v = _slice(vals[pp * KVA:(pp + 1) * KVA], k, NS, CHUNK)
                if variant == "noc2":
                    p = p + v * jnp.take_along_axis(T, lo, axis=1)
                else:
                    t = v * jnp.take_along_axis(T, lo & (LANES - 1), axis=1)
                    p = p + t
                    c2 = c2 + jnp.where(lo >= LANES, t, 0.0)
            cs = p if variant == "noU" else _split_dot(p, U)
            d = cs if variant == "noc2" else cs - c2
            if variant == "nogidx":
                pieces = d
            else:
                gi = _slice(gi_r, k, NS, CHUNK).astype(jnp.int32)
                t = jnp.take_along_axis(d, gi, axis=1)
                if variant == "noshift":
                    pieces = t
                elif variant == "rollshift":
                    # hardware lane rotate + lane-0 mask instead of the
                    # concat materialization
                    rolled = pltpu.roll(t, 1, 1)
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (CHUNK, LANES), 1)
                    pieces = t - jnp.where(lane == 0, 0.0, rolled)
                else:
                    tsh = jnp.concatenate(
                        [jnp.zeros((CHUNK, 1), jnp.float32),
                         t[:, :LANES - 1]], axis=1)
                    pieces = t - tsh
            if variant == "noRw":
                op_ref[k * W:(k + 1) * W, :] = pieces[0:W, :]
            else:
                wv = meta_ref[k:k + 1, 0:CHUNK].astype(jnp.int32)
                tt = jax.lax.broadcasted_iota(jnp.int32, (W, CHUNK), 0)
                Rw = (jnp.broadcast_to(wv, (W, CHUNK)) == tt).astype(
                    jnp.bfloat16)
                op_ref[k * W:(k + 1) * W, :] = _split_rowsum(Rw, pieces)

    sc = CHUNK * NS
    tm = ((ROWS + sc - 1) // sc) * sc
    nsteps = tm // sc
    rng = np.random.default_rng(0)
    nsc = tm // CHUNK
    base = jnp.asarray(rng.integers(0, OUT_ROWS - W, nsc, dtype=np.int32))
    sub_base = jnp.asarray(rng.integers(0, S - SUB, tm // SUB,
                                        dtype=np.int32))

    def split(a, m):
        x3 = a.reshape(tm // sc, m, sc // m, LANES)
        return [jnp.asarray(np.ascontiguousarray(x3[:, j]).reshape(-1, LANES))
                for j in range(m)]

    arrs = []
    for _ in range(P):
        arrs += split(rng.standard_normal((tm, LANES)).astype(np.float32), KVA)
    for _ in range(P):
        arrs += split(rng.integers(0, LANES, (tm, LANES)).astype(np.uint8), 1)
    hi = rng.integers(0, SUB, (tm, LANES)).astype(np.uint8)
    hi[:] = hi[:, :1]
    arrs += split(hi, 1)
    arrs += split(np.sort(rng.integers(0, LANES, (tm, LANES)).astype(np.uint8),
                          axis=1), 1)
    rps = 8  # round_up(NS, 8) meta rows per grid step
    meta = rng.integers(0, W, (nsteps * rps, LANES)).astype(np.uint8)
    arrs.append(jnp.asarray(meta))

    in_specs = (
        [pl.BlockSpec((sc // KVA, LANES), lambda i, *_: (i, 0),
                      memory_space=pltpu.VMEM)] * NV
        + [pl.BlockSpec((sc, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)] * (P + 2)
        + [pl.BlockSpec((rps, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]
    )
    if variant == "dma":
        out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((SUB, LANES), jnp.float32)
    else:
        out_specs = pl.BlockSpec((NS * W, LANES), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nsteps * NS * W, LANES),
                                         jnp.float32)
    main = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nsteps,), in_specs=in_specs,
            out_specs=out_specs),
        out_shape=out_shape,
    )
    scat = pl.pallas_call(
        _scatter_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nsteps,),
            in_specs=[pl.BlockSpec((NS * W, LANES), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, LANES), jnp.float32),
    )

    def fn(x2d):
        parts = main(sub_base, *arrs, x2d)
        if variant in ("dma", "noscat"):
            return parts
        return scat(base, parts)

    elems = tm * LANES * P
    bytes_ = tm * LANES * (5 * P + 2) + nsteps * rps * LANES
    return fn, elems, bytes_


class Member:
    def __init__(self, label, fn, elems, bytes_, ia=100, ib=500):
        self.label, self.elems, self.bytes = label, elems, bytes_
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
            (S, LANES)).astype(np.float32))
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

    names = sys.argv[1:] or ["full", "noscat", "noshift", "nogidx", "noc2",
                             "noU", "noRw", "nowin", "dma"]
    members = []
    for label in names:
        fn, e, b = build(label)
        members.append(Member(label, fn, e, b))
    ceil = _ProbePrepared()
    rot = members + [ceil]
    for rep in range(12):
        for j in range(len(rot)):
            rot[(j + rep) % len(rot)].time_round(rep)
    bw = ceil.bandwidth()
    print(f"co-sampled ceiling: {bw/1e9:6.1f} GB/s")
    for m in members:
        t = m.t()
        print(f"{m.label:7s}: {t*1e3:7.3f} ms  {m.elems/t/1e9:6.1f} Gelem/s"
              f"  {m.bytes/t/1e9:6.1f} GB/s  ({m.bytes/t/bw*100:5.1f}% "
              "roofline)")
