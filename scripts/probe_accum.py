"""Probe: windowed-Rw y-accumulate vs the per-subtile accumulate loop.

Round-2 ablation (scripts/probe_ablate.py) showed the per-subtile dynamic
RMW accumulate costs the segmented engine ~80 GB/s (587 -> 669 noacc) and
the gidx takes ~48.  This probe times the candidate replacement: a
data-dependent (W, chunk) 0/1 matrix Rw built from a streamed per-row
window-target vector, reducing every sublane row straight into a W-row
y window with ONE dynamic RMW per sub-chunk (no block-pure subtiles, no
static 8-row R).  Timing-only kernels (synthetic data, correctness
irrelevant); variants interleaved round-robin with rotated order (the
tunnel protocol of bench/runner.py).

Variants: {old,win}(P=4) x plus P=8, at the production (128,16) geometry.
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
W = 16  # y window rows for the Rw variant


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


def build(acc, P, chunk=128, ns=16, rows=None):
    kva = max(min(16 // P, ns), 1)
    nv = P * kva
    if rows is None:
        # scale stream rows so TRUE element count matches the bench matrix
        rows = (3943168 * 16 // (10 * LANES * P) + chunk * ns)

    def kernel(base_ref, sub_base_ref, *refs):
        vals = refs[:nv]
        lo_r = refs[nv:nv + P]
        hi_r = refs[nv + P:nv + P + 1]
        gi_r = refs[nv + P + 1:nv + P + 2]
        meta_ref = refs[nv + P + 2]
        x_ref, o_ref = refs[-2], refs[-1]
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        U = _triu()
        R = _rowsum(chunk)
        nsub = chunk // SUB
        for k in range(ns):
            g0 = step * (ns * nsub) + k * nsub
            hi_c = _slice(hi_r, k, ns, chunk).astype(jnp.int32)
            ts = []
            for s in range(nsub):
                w = x_ref[pl.ds(sub_base_ref[g0 + s], SUB), :]
                ts.append(jnp.take_along_axis(
                    w, hi_c[s * SUB:(s + 1) * SUB, :], axis=0))
            T = jnp.concatenate(ts, axis=0)
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
            if acc == "old":
                # exactly the production accumulate: (1, NB*128) output,
                # one lane-dynamic RMW per subtile
                parts = _split_rowsum(R, pieces)
                for s in range(nsub):
                    b = base_ref[g0 + s]
                    off = pl.multiple_of(b * LANES, LANES)
                    o_ref[0:1, pl.ds(off, LANES)] += parts[s:s + 1, :]
            else:
                wrow = meta_ref[k:k + 1, :]
                wv = wrow.astype(jnp.int32)  # (1,128) per-row window target
                wt = jnp.broadcast_to(wv, (W, chunk))
                tt = jax.lax.broadcasted_iota(jnp.int32, (W, chunk), 0)
                Rw = (wt == tt).astype(jnp.bfloat16)
                parts = _split_rowsum(Rw, pieces)  # (W,128)
                base = base_ref[step * ns + k]
                o_ref[pl.ds(base, W), :] += parts

    sc = chunk * ns
    tm = ((rows + sc - 1) // sc) * sc
    rng = np.random.default_rng(0)
    nsub_t = tm // SUB
    base = (jnp.asarray(rng.integers(0, NB - W, nsub_t, dtype=np.int32))
            if acc == "old"
            else jnp.asarray(rng.integers(0, NB - W, nsub_t, dtype=np.int32)))
    sub_base = jnp.asarray(rng.integers(0, S - SUB, nsub_t, dtype=np.int32))

    def split(a, m):
        x3 = a.reshape(tm // sc, m, sc // m, LANES)
        return [jnp.asarray(np.ascontiguousarray(x3[:, j]).reshape(-1, LANES))
                for j in range(m)]

    arrs = []
    for pp in range(P):
        arrs += split(rng.standard_normal((tm, LANES)).astype(np.float32), kva)
    for pp in range(P):
        arrs += split(rng.integers(0, LANES, (tm, LANES)).astype(np.uint8), 1)
    hi = rng.integers(0, SUB, (tm, LANES)).astype(np.uint8)
    hi[:] = hi[:, :1]
    arrs += split(hi, 1)
    arrs += split(np.sort(rng.integers(0, LANES, (tm, LANES)).astype(np.uint8),
                          axis=1), 1)
    meta = rng.integers(0, W, (tm // chunk, LANES)).astype(np.uint8)
    arrs.append(jnp.asarray(meta))

    in_specs = (
        [pl.BlockSpec((sc // kva, LANES), lambda i, *_: (i, 0),
                      memory_space=pltpu.VMEM)] * nv
        + [pl.BlockSpec((sc, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)] * (P + 2)
        + [pl.BlockSpec((ns, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]
    )
    out_shape = (jax.ShapeDtypeStruct((1, NB * LANES), jnp.float32)
                 if acc == "old"
                 else jax.ShapeDtypeStruct((NB, LANES), jnp.float32))
    fn = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(tm // sc,), in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=out_shape,
    )
    elems = tm * LANES * P
    bytes_ = tm * LANES * (5 * P + 2) + tm // chunk * LANES
    return (lambda x2d: fn(base, sub_base, *arrs, x2d)), elems, bytes_


class Member:
    def __init__(self, label, fn, elems, bytes_, ia=40, ib=200):
        self.label, self.elems, self.bytes = label, elems, bytes_
        self.ia, self.ib = ia, ib

        def chain(it):
            @jax.jit
            def loop(x2d):
                def body(i, x2d):
                    y = fn(x2d).reshape(1, -1)
                    probe = x2d[0:1, :] + y[0:1, :LANES] * 1e-38
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

    def report(self):
        t = max((self.tb - self.ta) / (self.ib - self.ia), 1e-9)
        print(f"{self.label:12s}: {t*1e3:7.3f} ms  "
              f"{self.elems/t/1e9:6.1f} Gelem/s  {self.bytes/t/1e9:6.1f} GB/s")


if __name__ == "__main__":
    from spmv_tpu.bench.runner import _ProbePrepared

    cfgs = [("old-P4", "old", 4), ("win-P4", "win", 4),
            ("old-P8", "old", 8), ("win-P8", "win", 8)]
    if len(sys.argv) > 1:
        names = set(sys.argv[1:])
        cfgs = [c for c in cfgs if c[0] in names]
    members = []
    for label, acc, P in cfgs:
        # P=8 streams 42 B/quad-slot: double-buffered (128,16) superchunks
        # blow scoped VMEM (measured 21.04M > 16M) — halve the superchunk
        fn, e, b = build(acc, P, ns=16 if P <= 4 else 8)
        members.append(Member(label, fn, e, b))
    ceil = _ProbePrepared()
    rot = members + [ceil]
    for rep in range(12):
        for j in range(len(rot)):
            rot[(j + rep) % len(rot)].time_round(rep)
    bw = ceil.bandwidth()
    print(f"co-sampled ceiling: {bw/1e9:6.1f} GB/s")
    for m in members:
        t = max((m.tb - m.ta) / (m.ib - m.ia), 1e-9)
        print(f"{m.label:12s}: {t*1e3:7.3f} ms  {m.elems/t/1e9:6.1f} Gelem/s"
              f"  {m.bytes/t/1e9:6.1f} GB/s  ({m.bytes/t/bw*100:5.1f}% "
              "roofline)")
