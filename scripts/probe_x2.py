"""Ablation probe for the f32x2 (double-single) segmented kernel —
round-5 verdict item 4: the recorded __x2_csr__ row runs ~2.9x slower
than fp32 csr for ~1.7x the stream bytes; which stage owns the missing
~1x?

Timing-only variants (correctness-invalid by design), production
geometry of the cant-scale x2 csr plan ((chunk, ns) = (128, 8), P = 4,
kva = 4, W = 16; both (y_hi, y_lo) VMEM-resident with the in-kernel DS
RMW — the x2 engine has no streamed-partials form):

  full     — production _seg_kernel_x2 body
  norw     — windowed quantized reduce kept, but PURE-STORED per
             sub-chunk instead of the dynamic double-single RMW
             (isolates DESIGN.md fact 9's RMW serialization)
  noqwin   — window reduce via the fp32 2-pass split matmul (2 MXU ops
             instead of 4+2 integer planes + quantization VPU chain)
  noqpref  — prefix via the fp32 split matmul (2 instead of 5+2 planes)
  nodekker — products as plain fp32 v·x (drops the Dekker splits, the
             4-multiply exact head and the TwoSum chains)
  nods     — noqwin + noqpref + nodekker: fp32 math over the x2 stream
             (pure byte cost of the second value-plane set + lo table)
  dma      — no compute: reduce the raw streams

Interleaved round-robin with the co-sampled ceiling probe
(bench/runner.py protocol).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.kernels.engines import _triu_ones
from spmv_tpu.kernels.engines_x2 import (_dekker, _ds_products,
                                         _quantized_reduce, _two_sum_acc)

LANES, SUB = 128, 8
NCOLS = 62464
S = ((NCOLS + LANES - 1) // LANES)
P = 4
CHUNK = int(os.environ.get("X2_CHUNK", 128))
NS = int(os.environ.get("X2_NS", 8))
KVA = int(os.environ.get("X2_KVA", 4))
W = 16
ROWS = 10240  # ~the pooled cant seg plan
NV = P * KVA
OUT_ROWS = S


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


def build(variant):
    ds_prod = variant not in ("nodekker", "nods")
    q_pref = variant not in ("noqpref", "nods")
    q_win = variant not in ("noqwin", "nods")
    rmw = variant not in ("norw",)

    def kernel(base_ref, sub_base_ref, *refs):
        vals = refs[:NV]
        vlo = refs[NV:2 * NV]
        lo_r = refs[2 * NV:2 * NV + P]
        hi_r = refs[2 * NV + P:2 * NV + P + 1]
        gi_r = refs[2 * NV + P + 1:2 * NV + P + 2]
        meta_ref = refs[2 * NV + P + 2]
        x_ref = refs[-3] if rmw else refs[-2]
        step = pl.program_id(0)

        if variant == "dma":
            op_ref = refs[-1]
            acc = jnp.zeros((1, LANES), jnp.float32)
            for a in refs[:-2]:
                v = a[...]
                if v.dtype == jnp.uint8:
                    v = v.astype(jnp.int32)
                acc = acc + jnp.sum(v.astype(jnp.float32), axis=0,
                                    keepdims=True)
            op_ref[0:1, :] = acc
            return

        if rmw:
            oh_ref, ol_ref = refs[-2], refs[-1]

            @pl.when(step == 0)
            def _():
                oh_ref[:] = jnp.zeros_like(oh_ref)
                ol_ref[:] = jnp.zeros_like(ol_ref)
        else:
            op_ref = refs[-1]

        U = _triu_ones().astype(jnp.bfloat16)
        nsub = CHUNK // SUB
        for k in range(NS):
            g0 = step * (NS * nsub) + k * nsub
            if ds_prod:
                ph, pe, c2h, c2e = _ds_products(
                    k, NS, CHUNK, P, KVA, vals, vlo, lo_r, hi_r, x_ref,
                    sub_base_ref, g0, S, seg=True)
            else:
                # plain fp32 products over the SAME streams (vlo read too)
                hi_c = _slice(hi_r, k, NS, CHUNK).astype(jnp.int32)
                ts = []
                for s in range(nsub):
                    wz = x_ref[pl.ds(sub_base_ref[g0 + s], SUB), :]
                    ts.append(jnp.take_along_axis(
                        wz, hi_c[s * SUB:(s + 1) * SUB, :], axis=0))
                T = jnp.concatenate(ts, axis=0)
                ph = jnp.zeros((CHUNK, LANES), jnp.float32)
                c2h = jnp.zeros((CHUNK, LANES), jnp.float32)
                for pp in range(P):
                    lo = _slice((lo_r[pp],), k, NS, CHUNK).astype(jnp.int32)
                    v = _slice(vals[pp * KVA:(pp + 1) * KVA], k, NS, CHUNK)
                    vl = _slice(vlo[pp * KVA:(pp + 1) * KVA], k, NS, CHUNK)
                    t = (v + vl) * jnp.take_along_axis(
                        T, lo & (LANES - 1), axis=1)
                    ph = ph + t
                    c2h = c2h + jnp.where(lo >= LANES, t, 0.0)
                pe = ph * jnp.float32(1e-30)  # keep the pair alive
                c2e = c2h * jnp.float32(1e-30)

            if q_pref:
                def pref(i_k):
                    return jnp.dot(i_k, U, preferred_element_type=jnp.float32)

                cs_h, cs_e = _quantized_reduce(ph, pe, pref, LANES, axis=1)
            else:
                cs_h = _split_dot(ph, U)
                cs_e = _split_dot(pe, U)
            dh, de = _two_sum_acc(cs_h, cs_e - c2e, -c2h)
            gi = _slice(gi_r, k, NS, CHUNK).astype(jnp.int32)
            th = jnp.take_along_axis(dh, gi, axis=1)
            te = jnp.take_along_axis(de, gi, axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, LANES), 1)
            ths = jnp.where(lane == 0, 0.0, pltpu.roll(th, 1, 1))
            tes = jnp.where(lane == 0, 0.0, pltpu.roll(te, 1, 1))
            ph2, pe2 = _two_sum_acc(th, te - tes, -ths)

            wv = meta_ref[k:k + 1, 0:CHUNK].astype(jnp.int32)
            tt = jax.lax.broadcasted_iota(jnp.int32, (W, CHUNK), 0)
            Rw = (jnp.broadcast_to(wv, (W, CHUNK)) == tt).astype(jnp.bfloat16)

            if q_win:
                def red(i_k):
                    return jnp.dot(Rw, i_k, preferred_element_type=jnp.float32)

                parts_h, parts_e = _quantized_reduce(ph2, pe2, red, W, axis=0)
            else:
                parts_h = _split_rowsum(Rw, ph2)
                parts_e = _split_rowsum(Rw, pe2)

            if rmw:
                base = base_ref[step * NS + k]
                oh = oh_ref[pl.ds(base, W), :]
                ol = ol_ref[pl.ds(base, W), :]
                nh, ne = _two_sum_acc(oh, ol + parts_e, parts_h)
                oh_ref[pl.ds(base, W), :] = nh
                ol_ref[pl.ds(base, W), :] = ne
            else:
                op_ref[(2 * k) * W:(2 * k + 1) * W, :] = parts_h
                op_ref[(2 * k + 1) * W:(2 * k + 2) * W, :] = parts_e

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
    for _ in range(2 * P):  # vals then vlo plane sets
        arrs += split(rng.standard_normal((tm, LANES)).astype(np.float32),
                      KVA)
    for _ in range(P):
        arrs += split(rng.integers(0, LANES, (tm, LANES)).astype(np.uint8), 1)
    hi = rng.integers(0, SUB, (tm, LANES)).astype(np.uint8)
    hi[:] = hi[:, :1]
    arrs += split(hi, 1)
    arrs += split(np.sort(rng.integers(0, LANES, (tm, LANES)).astype(np.uint8),
                          axis=1), 1)
    rps = 8
    meta = rng.integers(0, W, (nsteps * rps, LANES)).astype(np.uint8)
    arrs.append(jnp.asarray(meta))

    in_specs = (
        [pl.BlockSpec((sc // KVA, LANES), lambda i, *_: (i, 0),
                      memory_space=pltpu.VMEM)] * (2 * NV)
        + [pl.BlockSpec((sc, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)] * (P + 2)
        + [pl.BlockSpec((rps, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]  # x table (hi ∥ lo)
    )
    shape = jax.ShapeDtypeStruct((OUT_ROWS, LANES), jnp.float32)
    if variant == "dma":
        out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((SUB, LANES), jnp.float32)
        nsp = 2
    elif variant == "norw":
        out_specs = pl.BlockSpec((2 * NS * W, LANES), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nsteps * 2 * NS * W, LANES),
                                         jnp.float32)
        nsp = 2
    else:
        out_specs = (pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM))
        out_shape = (shape, shape)
        nsp = 2
    main = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp, grid=(nsteps,), in_specs=in_specs,
            out_specs=out_specs),
        out_shape=out_shape,
    )

    def fn(x2d):
        out = main(base, sub_base, *arrs, x2d)
        return out[0] if isinstance(out, tuple) else out

    elems = tm * LANES * P
    bytes_ = tm * LANES * (9 * P + 2) + nsteps * rps * LANES
    return fn, elems, bytes_


class Member:
    def __init__(self, label, fn, elems, bytes_, ia=60, ib=300):
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
            (2 * S, LANES)).astype(np.float32))
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

    names = sys.argv[1:] or ["full", "norw", "noqwin", "noqpref",
                             "nodekker", "nods", "dma"]
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
        print(f"{m.label:9s}: {t*1e3:7.3f} ms  {m.elems/t/1e9:6.1f} Gelem/s"
              f"  {m.bytes/t/1e9:6.1f} GB/s  ({m.bytes/t/bw*100:5.1f}% "
              "roofline)")
