"""The two Pallas SpMV kernel engines + the σ-unpermute epilogue.

These are the TPU-native replacements of the reference's five hand-written
OpenCL kernels (``/root/reference/kernels/*.cl``).  Design and measured
cost model in ``docs/DESIGN.md``.

Engine 1 ``panel_spmv``     — ELL / SELL-C-σ   (vs ``Ell.cl``, ``Sigma_C.cl``)
Engine 2 ``segmented_spmv`` — CSR / COO / CMRS (vs ``Csr.cl``, ``Coo.cl``,
                                                 ``Cmrs.cl``)

Memory system (the measured constraint that shapes everything): the Pallas
grid pipeline streams ~67 GB/s per input array but scales with distinct
arrays (in-engine aggregate ~530-690 GB/s at 12-14 arrays), so each plan
stream arrives pre-split into several interleaved device arrays (see
``spmv_tpu.device``); one grid step consumes a **superchunk** of
``ns·chunk`` sublane rows over 13-14 concurrent DMAs.

Compute per chunk, fused at chunk width (per-subtile (8,128) op streams
measured ~4-7 cycles/op; chunk-wide ops pipeline properly):

* x-gather: per subtile one (8,128) window slice of the VMEM-resident
  x table + depth-8 sublane gather by the per-row stripe offset ``hi``;
  then one chunk-wide lane gather by the in-stripe column ``lo`` — exact
  because ``hi`` is constant within each sublane row.  Both ride in one
  uint16 ``loc = hi·128 + lo`` stream.
* Engine 2 reduction: inclusive lane prefix sums as one chunk-wide matmul
  against upper-triangular ones on the MXU (``jnp.cumsum`` does not lower
  in Mosaic and a VPU scan costs ~40 vector ops).  The triangular matmul
  dominates the engine's cycle budget, so (a) it runs as a **2-pass
  split-f32 product** — the 0/1 stationary operand is exact in bf16, so
  only the streaming operand needs a hi+lo bf16 decomposition, ~2⁻¹⁸-
  relative products at ⅓ of ``Precision.HIGHEST``'s passes (measured
  31.7 → 51.5 Gnnz/s) — and (b) the stream is **P-packed**: each lane
  slot carries P ∈ {1,2,4} elements in separate value/column planes that
  the VPU combines (``p = Σ v_p·x[lo_p]``) *before* the prefix, amortizing
  the MXU passes and the segment-bound bytes over P elements (measured
  42 → 113 Gelem/s at P=4, scripts/probe_pack.py).  Per-row segment sums
  are ``cs[gidx] − cs[shift(gidx)]``: ``gidx`` arrives *filled* (running
  max over lids), so the old pidx stream is a one-lane shift — one fewer
  index stream (lane 0 of every sublane row is a guaranteed zero pad, so
  no masking).
* Per-subtile 8-row sums via a block-diagonal 0/1 matmul (MXU) instead of
  a 3-D reshape-reduce, then one dynamic 128-lane accumulate into the
  whole-y-in-VMEM output per subtile.

The kernels run compiled on TPU and in interpreter mode elsewhere (CPU
tests, multi-host simulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.formats.base import LANES, SUBLANES

__all__ = ["panel_spmv", "segmented_spmv", "inverse_permute_blocks"]

def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _split_dot(p, m_bf16):
    """p(f32) @ M for a 0/1 matrix M (exact in bf16): two native bf16 MXU
    passes with a hi+lo decomposition of p — ~2⁻¹⁸-relative product error,
    3× cheaper than Precision.HIGHEST's f32 emulation."""
    p_hi = p.astype(jnp.bfloat16)
    p_lo = (p - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(p_hi, m_bf16, preferred_element_type=jnp.float32)
            + jnp.dot(p_lo, m_bf16, preferred_element_type=jnp.float32))


def _triu_ones():
    rk = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    ck = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    return (rk <= ck).astype(jnp.float32)


def _rowsum_matrix(chunk: int):
    """Block-diagonal 0/1 (chunk/8, chunk): parts = R @ pieces sums each
    subtile's 8 sublane rows on the MXU."""
    nsub = chunk // SUBLANES
    rt = jax.lax.broadcasted_iota(jnp.int32, (nsub, chunk), 0)
    rc = jax.lax.broadcasted_iota(jnp.int32, (nsub, chunk), 1)
    return jnp.logical_and(rc >= rt * SUBLANES,
                           rc < (rt + 1) * SUBLANES).astype(jnp.float32)


def _chunk_slice(refs, k: int, ns: int, chunk: int):
    """Sub-chunk k's rows from a stream split into len(refs) arrays
    (ns = sub-chunks per superchunk step)."""
    per = ns // len(refs)
    r = refs[k // per]
    off = (k % per) * chunk
    return r[off : off + chunk, :]


def _accumulate(o_ref, parts, sub_block_ref, g0: int, nsub: int):
    for s in range(nsub):
        b = sub_block_ref[g0 + s]
        off = pl.multiple_of(b * LANES, LANES)
        o_ref[0:1, pl.ds(off, LANES)] += parts[s : s + 1, :]


def _packed_products(k: int, ns: int, chunk: int, pack: int, kva: int,
                     vals_refs, lo_refs, hi_refs, x_ref, sub_base_ref, g0):
    """p = Σ_planes vals_p · x[col_p] for one (chunk,128) sub-chunk: one
    shared x-window gather (hi uniform per sublane row) + P lane gathers
    combined on the VPU."""
    hi_c = _chunk_slice(hi_refs, k, ns, chunk).astype(jnp.int32)
    ts = []
    for s in range(chunk // SUBLANES):
        w = x_ref[pl.ds(sub_base_ref[g0 + s], SUBLANES), :]
        ts.append(jnp.take_along_axis(
            w, hi_c[s * SUBLANES:(s + 1) * SUBLANES, :], axis=0))
    T = jnp.concatenate(ts, axis=0)  # (chunk,128) per-row x windows
    p = jnp.zeros((chunk, LANES), jnp.float32)
    for pp in range(pack):
        lo_c = _chunk_slice((lo_refs[pp],), k, ns, chunk).astype(jnp.int32)
        v_c = _chunk_slice(vals_refs[pp * kva:(pp + 1) * kva], k, ns, chunk)
        p = p + v_c * jnp.take_along_axis(T, lo_c, axis=1)
    return p


def _split_rowsum(R, p):
    """2-pass bf16 8-row sums on the MXU (R is 0/1, exact in bf16)."""
    ph = p.astype(jnp.bfloat16)
    plo = (p - ph.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(R, ph, preferred_element_type=jnp.float32)
            + jnp.dot(R, plo, preferred_element_type=jnp.float32))


# ---------------------------------------------------------------- engine 1


def _panel_kernel(chunk: int, ns: int, kva: int, pack: int,
                  sub_block_ref, sub_base_ref, *refs):
    nv = pack * kva
    vals_refs = refs[:nv]
    lo_refs = refs[nv : nv + pack]
    hi_refs = refs[nv + pack : nv + pack + 1]
    x_ref, o_ref = refs[-2], refs[-1]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    R = _rowsum_matrix(chunk).astype(jnp.bfloat16)
    nsub = chunk // SUBLANES
    for k in range(ns):
        g0 = step * (ns * nsub) + k * nsub
        p = _packed_products(k, ns, chunk, pack, kva, vals_refs, lo_refs,
                             hi_refs, x_ref, sub_base_ref, g0)
        parts = _split_rowsum(R, p)
        _accumulate(o_ref, parts, sub_block_ref, g0, nsub)


@jax.jit
def panel_spmv(dev, x2d):
    """Engine 1: y(1, 128·out_blocks) = A·x over P-packed stripe-pure
    mini-panels (vs ``Ell.cl``'s workgroup-per-row tree reduction and
    ``Sigma_C.cl``'s slice kernel)."""
    chunk, ns, kva, pack = dev.chunk, dev.ns, dev.kva, dev.pack
    TM = dev.vals[0].shape[0] * kva
    kernel = functools.partial(_panel_kernel, chunk, ns, kva, pack)
    in_specs = (
        [pl.BlockSpec((chunk * ns // kva, LANES), lambda i, *_: (i, 0),
                      memory_space=pltpu.VMEM)] * (pack * kva)
        + [pl.BlockSpec((chunk * ns, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)] * (pack + 1)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(TM // (chunk * ns),),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, dev.out_blocks * LANES),
                                       jnp.float32),
        interpret=_interpret(),
    )(dev.sub_block, dev.sub_base, *dev.vals, *dev.lo, dev.hi, x2d)


# ---------------------------------------------------------------- engine 2


def _seg_kernel(chunk: int, ns: int, kva: int, pack: int,
                sub_block_ref, sub_base_ref, *refs):
    nv = pack * kva
    vals_refs = refs[:nv]  # plane-major: plane pp is [pp*kva, (pp+1)*kva)
    lo_refs = refs[nv : nv + pack]
    hi_refs = refs[nv + pack : nv + pack + 1]
    gidx_refs = refs[nv + pack + 1 : nv + pack + 2]
    x_ref, o_ref = refs[-2], refs[-1]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    U = _triu_ones().astype(jnp.bfloat16)
    R = _rowsum_matrix(chunk).astype(jnp.bfloat16)
    nsub = chunk // SUBLANES
    for k in range(ns):
        g0 = step * (ns * nsub) + k * nsub
        # P-packed pre-reduction (shared with engine 1): the VPU combine
        # amortizes the MXU prefix and the index bytes over P elements.
        p = _packed_products(k, ns, chunk, pack, kva, vals_refs, lo_refs,
                             hi_refs, x_ref, sub_base_ref, g0)
        cs = _split_dot(p, U)  # inclusive lane prefix on the MXU
        gi = _chunk_slice(gidx_refs, k, ns, chunk).astype(jnp.int32)
        # pidx = previous lid's filled gidx — a one-lane shift (gidx is a
        # running max, so absent lids vanish as cs[g]-cs[g]).
        pi = jnp.concatenate(
            [jnp.zeros((chunk, 1), jnp.int32), gi[:, : LANES - 1]], axis=1)
        pieces = (jnp.take_along_axis(cs, gi, axis=1)
                  - jnp.take_along_axis(cs, pi, axis=1))
        # R is (nsub, chunk): split the streaming operand (pieces).
        parts = _split_rowsum(R, pieces)
        _accumulate(o_ref, parts, sub_block_ref, g0, nsub)


@jax.jit
def segmented_spmv(dev, x2d):
    """Engine 2: P-packed MXU-prefix segmented-reduction SpMV.

    Replaces the reference's CAS-atomic scatter (``Coo.cl:4-22``), scalar
    row loop (``Csr.cl:5-16``) and strip reduction (``Cmrs.cl:5-44``) with
    one deterministic engine; the P-packing (measured 42 → 113 Gelem/s at
    P=4, scripts/probe_pack.py) amortizes the triangular-prefix matmul
    over P elements per lane slot."""
    chunk, ns, kva, pack = dev.chunk, dev.ns, dev.kva, dev.pack
    TM = dev.vals[0].shape[0] * kva
    kernel = functools.partial(_seg_kernel, chunk, ns, kva, pack)
    in_specs = (
        [pl.BlockSpec((chunk * ns // kva, LANES), lambda i, *_: (i, 0),
                      memory_space=pltpu.VMEM)] * (pack * kva)
        + [pl.BlockSpec((chunk * ns, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)] * (pack + 2)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(TM // (chunk * ns),),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, dev.out_blocks * LANES),
                                       jnp.float32),
        interpret=_interpret(),
    )(dev.sub_block, dev.sub_base, *dev.vals, *dev.lo, dev.hi, dev.gidx,
      x2d)


# ------------------------------------------------------- permute epilogue


def _perm_kernel(blocks_per_step: int, whi_ref, idx_ref, y_ref, o_ref):
    step = pl.program_id(0)
    for j in range(blocks_per_step):
        g = step * blocks_per_step + j
        wr = whi_ref[g]
        window = y_ref[pl.ds(wr, SUBLANES), :]  # (8,128) of y'
        p = idx_ref[j, :] - wr * LANES  # (128,) positions within window
        p2 = jnp.broadcast_to(p.reshape(1, LANES), (SUBLANES, LANES))
        hi = p2 >> 7
        lo = p2 & (LANES - 1)
        h = jnp.take_along_axis(window, lo, axis=1)
        a = jnp.take_along_axis(h, hi, axis=0)
        o_ref[0:1, j * LANES : (j + 1) * LANES] = a[0:1, :]


@functools.partial(jax.jit, static_argnames=("blocks_per_step",))
def inverse_permute_blocks(whi, idx, y2d, *, blocks_per_step: int = 8):
    """y[i] = y'[perm[i]] where the permutation is local: all sources for
    output block g lie in y'-table rows [whi[g], whi[g]+8) — an 8×128-entry
    window, so σ ≤ 1024.  y2d must have ≥ 8 rows (callers pad).  Used to
    undo the SELL-C-σ row sort (the reference instead relies on a
    pre-sorted *file* and never unpermutes, ``sigma_c.c:44``)."""
    nblocks = idx.shape[0]
    grid = (nblocks // blocks_per_step,)
    kernel = functools.partial(_perm_kernel, blocks_per_step)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((blocks_per_step, LANES), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blocks_per_step * LANES),
                                   lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, nblocks * LANES), jnp.float32),
        interpret=_interpret(),
    )(whi, idx, y2d)
