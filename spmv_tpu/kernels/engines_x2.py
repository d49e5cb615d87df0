"""Extended-precision (f32x2, double-single) engine variants.

The capability the all-fp64 reference holds over the fp32 framework
(``coo.c:39-42`` computes in double and validates at abs 1e-6,
``inc/helper_functions.h:11``): here values and x carry a double-single
(hi + lo f32 pair) representation and every accumulation that the fp32
engines round at *window magnitude* is replaced by an EXACT path:

* **Products** — Dekker 12-bit splits make the head product ``vh·xh``
  exact in 4 f32 multiplies (no FMA on the VPU); the cross terms
  ``vh·xl + vl·xh`` are ≤ 2⁻²⁴-relative and land in a compensation
  accumulator via branch-free TwoSum.
* **MXU prefix / window reduction** — a f32 matmul accumulates partial
  sums at window magnitude (error ~window·2⁻²⁴, the fp32 engines' error
  floor, docs/DESIGN.md).  Here the streaming operand is quantized into
  K **integer planes** of 8 bits each at a power-of-two row (or lane)
  scale: every plane is exact in bf16, every dot accumulates integers
  < 2¹⁵ exactly in f32, and the recombination multiplies by powers of
  two (exact) into a TwoSum chain.  K = 5 → 40 bits below the window
  max; the fp32 path keeps ~18.
* **Output** — y accumulates as an (y_hi, y_lo) double-single pair.

End-to-end error ~window·2⁻³⁸ — abs 1e-6 at cant scale with random x
(the reference's EPSILON) with two orders of margin.  Cost: ~2× stream
bytes (second value plane set + lo x table) and ~2-3× kernel time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.formats.base import LANES, SUBLANES, round_up
from spmv_tpu.kernels.engines import (_chunk_slice, _interpret, _triu_ones)

__all__ = ["panel_spmv_x2", "segmented_spmv_x2"]

_KPREF = 5  # 8-bit integer planes for the prefix operand (40 bits)
_KWIN = 4  # planes for the window-reduce operand
_KLO = 2  # planes for the compensation operands (their own scale)
_SPLITTER = 4097.0  # 2^12 + 1 — Dekker split constant


def _dekker(a):
    """a = hi + lo with hi carrying ≤ 12 mantissa bits (products of two
    hi parts are exact in f32)."""
    c = jnp.float32(_SPLITTER) * a
    hi = c - (c - a)
    return hi, a - hi


def _two_sum_acc(s, e, t):
    """(s, e) ← (s, e) + t with the rounding error of the add captured
    in e (Knuth TwoSum, branch-free)."""
    z = s + t
    zv = z - s
    err = (s - (z - zv)) + (t - zv)
    return z, e + err


def _pow2_scales(m, k_planes: int):
    """Power-of-two scale decomposition of max-magnitude m: returns
    (minv, scales) with minv = 2^-e (u = p·minv·0.5 ∈ (−1,1)) and
    scales[k] the exact recombination factor of integer plane k."""
    m = jnp.maximum(m, jnp.float32(2.0 ** -80))
    ebits = jax.lax.bitcast_convert_type(m, jnp.int32) & 0x7F800000
    minv = jax.lax.bitcast_convert_type((254 << 23) - ebits, jnp.float32)
    two_m = jax.lax.bitcast_convert_type(ebits + (1 << 23), jnp.float32)
    scales = []
    s = two_m
    for _ in range(k_planes):
        s = s * jnp.float32(2.0 ** -8)
        scales.append(s)
    return minv, scales


def _rint(t):
    """Round-half-away-from-zero via a truncating int cast.  The classic
    magic-constant trick ``(t + 1.5·2²³) − 1.5·2²³`` is ALGEBRAICALLY
    SIMPLIFIED AWAY by XLA inside the pallas jaxpr (measured: it returns
    t unchanged in interpret mode), so the rounding must go through an
    integer type."""
    half = jnp.where(t >= 0, jnp.float32(0.5), jnp.float32(-0.5))
    return (t + half).astype(jnp.int32).astype(jnp.float32)


def _int_planes(u, k_planes: int):
    """u ∈ (−1,1) → K integer planes i_k ∈ [−256, 256] (exact in bf16)
    with u = Σ i_k·256^−k + r, |r| ≤ ~0.5·256^−K."""
    planes = []
    r = u
    for _ in range(k_planes):
        t = r * jnp.float32(256.0)
        i = _rint(t)
        planes.append(i.astype(jnp.bfloat16))
        r = t - i
    return planes


def _exact_reduce(planes, scales, reducer):
    """Σ_k reducer(plane_k)·scale_k recombined smallest-first through a
    TwoSum chain → a double-single (hi, lo) pair.  Every term is exact:
    integer dots in f32, power-of-two scale multiplies."""
    h = e = None
    for i_k, s_k in zip(reversed(planes), reversed(scales)):
        term = reducer(i_k) * s_k
        if h is None:
            h, e = term, jnp.zeros_like(term)
        else:
            h, e = _two_sum_acc(h, e, term)
    return h, e


def _quantized_reduce(p_h, p_e, reducer, out_rows: int, axis: int):
    """Exact reduction of a double-single (chunk,128) operand through an
    integer-plane quantization: head at K planes, compensation at K_LO
    planes of its own scale.  ``axis`` picks the scale granularity —
    0: per lane (reduction contracts rows), 1: per row (the prefix
    contracts lanes)."""
    m = jnp.max(jnp.abs(p_h), axis=axis, keepdims=True)
    minv, scales = _pow2_scales(m, _KPREF if axis == 1 else _KWIN)
    planes = _int_planes(p_h * minv * jnp.float32(0.5),
                         len(scales))
    h, e = _exact_reduce(planes, scales, reducer)
    me = jnp.max(jnp.abs(p_e), axis=axis, keepdims=True)
    minve, scales_e = _pow2_scales(me, _KLO)
    planes_e = _int_planes(p_e * minve * jnp.float32(0.5), _KLO)
    he, ee = _exact_reduce(planes_e, scales_e, reducer)
    h, e = _two_sum_acc(h, e, he)
    return h, e + ee


def _ds_products(k: int, ns: int, chunk: int, pack: int, kva: int,
                 vals_refs, vlo_refs, lo_refs, hi_refs, x_ref,
                 sub_base_ref, g0, S: int, seg: bool):
    """Double-single P-packed products: p = Σ_p (vh+vl)_p · (xh+xl)[lo_p]
    as an exact head + compensation pair (p_h, p_e); for the segmented
    engine also the mid-quad boundary corrections (c2_h, c2_e)."""
    hi_c = _chunk_slice(hi_refs, k, ns, chunk).astype(jnp.int32)
    ts_h, ts_l = [], []
    for s in range(chunk // SUBLANES):
        wh = x_ref[pl.ds(sub_base_ref[g0 + s], SUBLANES), :]
        wl = x_ref[pl.ds(S + sub_base_ref[g0 + s], SUBLANES), :]
        sel = hi_c[s * SUBLANES:(s + 1) * SUBLANES, :]
        ts_h.append(jnp.take_along_axis(wh, sel, axis=0))
        ts_l.append(jnp.take_along_axis(wl, sel, axis=0))
    Th = jnp.concatenate(ts_h, axis=0)
    Tl = jnp.concatenate(ts_l, axis=0)
    zero = jnp.zeros((chunk, LANES), jnp.float32)
    p_h, p_e = zero, zero
    c2_h, c2_e = (zero, zero) if seg else (None, None)
    for pp in range(pack):
        lo_raw = _chunk_slice((lo_refs[pp],), k, ns, chunk).astype(jnp.int32)
        lo = lo_raw & (LANES - 1) if seg else lo_raw
        vh = _chunk_slice(vals_refs[pp * kva:(pp + 1) * kva], k, ns, chunk)
        vl = _chunk_slice(vlo_refs[pp * kva:(pp + 1) * kva], k, ns, chunk)
        gh = jnp.take_along_axis(Th, lo, axis=1)
        gl = jnp.take_along_axis(Tl, lo, axis=1)
        vh1, vh2 = _dekker(vh)
        gh1, gh2 = _dekker(gh)
        # the four exact head partials + the ≤2⁻²⁴-relative cross terms
        exact = (vh1 * gh1, vh1 * gh2, vh2 * gh1, vh2 * gh2)
        small = vh * gl + vl * gh
        if seg:
            mask = (lo_raw >= LANES).astype(jnp.float32)
        th, te = exact[0], small
        for t in exact[1:]:
            th, te = _two_sum_acc(th, te, t)
        p_h, p_e = _two_sum_acc(p_h, p_e, th)
        p_e = p_e + te
        if seg:
            c2_h, c2_e = _two_sum_acc(c2_h, c2_e, mask * th)
            c2_e = c2_e + mask * te
    return p_h, p_e, c2_h, c2_e


def _ds_window_accumulate(oh_ref, ol_ref, ph, pe, meta_ref, base_ref,
                          k: int, ns: int, chunk: int, W: int):
    """Windowed y-reduction of a double-single operand: exact integer-
    plane Rw matmuls (per-lane scales — the contraction keeps lanes),
    double-single RMW into (y_hi, y_lo)."""
    wv = meta_ref[k: k + 1, 0:chunk].astype(jnp.int32)
    tt = jax.lax.broadcasted_iota(jnp.int32, (W, chunk), 0)
    Rw = (jnp.broadcast_to(wv, (W, chunk)) == tt).astype(jnp.bfloat16)

    def red(i_k):
        return jnp.dot(Rw, i_k, preferred_element_type=jnp.float32)

    parts_h, parts_e = _quantized_reduce(ph, pe, red, W, axis=0)
    base = base_ref[pl.program_id(0) * ns + k]
    oh = oh_ref[pl.ds(base, W), :]
    ol = ol_ref[pl.ds(base, W), :]
    nh, ne = _two_sum_acc(oh, ol + parts_e, parts_h)
    oh_ref[pl.ds(base, W), :] = nh
    ol_ref[pl.ds(base, W), :] = ne


# ---------------------------------------------------------------- engine 1


def _panel_kernel_x2(chunk: int, ns: int, kva: int, pack: int, W: int,
                     S: int, base_ref, sub_base_ref, *refs):
    nv = pack * kva
    vals_refs = refs[:nv]
    vlo_refs = refs[nv: 2 * nv]
    lo_refs = refs[2 * nv: 2 * nv + pack]
    hi_refs = refs[2 * nv + pack: 2 * nv + pack + 1]
    meta_ref = refs[2 * nv + pack + 1]
    x_ref = refs[-3]
    oh_ref, ol_ref = refs[-2], refs[-1]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        oh_ref[:] = jnp.zeros_like(oh_ref)
        ol_ref[:] = jnp.zeros_like(ol_ref)

    for k in range(ns):
        g0 = step * (ns * (chunk // SUBLANES)) + k * (chunk // SUBLANES)
        ph, pe, _, _ = _ds_products(k, ns, chunk, pack, kva, vals_refs,
                                    vlo_refs, lo_refs, hi_refs, x_ref,
                                    sub_base_ref, g0, S, seg=False)
        _ds_window_accumulate(oh_ref, ol_ref, ph, pe, meta_ref, base_ref,
                              k, ns, chunk, W)


@jax.jit
def panel_spmv_x2(dev, x2d):
    """Engine 1, double-single: returns (y_hi, y_lo) of (out_rows, 128)."""
    chunk, ns, kva, pack = dev.chunk, dev.ns, dev.kva, dev.pack
    TM = dev.vals[0].shape[0] * kva
    S = x2d.shape[0] // 2
    kernel = functools.partial(_panel_kernel_x2, chunk, ns, kva, pack,
                               dev.w_rows, S)
    in_specs = (
        [pl.BlockSpec((chunk * ns // kva, LANES), lambda i, *_: (i, 0),
                      memory_space=pltpu.VMEM)] * (2 * pack * kva)
        + [pl.BlockSpec((chunk * ns, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)] * (pack + 1)
        + [pl.BlockSpec((round_up(ns, SUBLANES), LANES),
                        lambda i, *_: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]  # x table (hi ∥ lo)
    )
    shape = jax.ShapeDtypeStruct((dev.out_rows, LANES), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(TM // (chunk * ns),),
            in_specs=in_specs,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
        ),
        out_shape=(shape, shape),
        interpret=_interpret(),
    )(dev.base_w, dev.sub_base, *dev.vals, *dev.vals_lo, *dev.lo, dev.hi,
      dev.meta, x2d)


# ---------------------------------------------------------------- engine 2


def _seg_kernel_x2(chunk: int, ns: int, kva: int, pack: int, W: int,
                   S: int, base_ref, sub_base_ref, *refs):
    nv = pack * kva
    vals_refs = refs[:nv]
    vlo_refs = refs[nv: 2 * nv]
    lo_refs = refs[2 * nv: 2 * nv + pack]
    hi_refs = refs[2 * nv + pack: 2 * nv + pack + 1]
    gidx_refs = refs[2 * nv + pack + 1: 2 * nv + pack + 2]
    meta_ref = refs[2 * nv + pack + 2]
    x_ref = refs[-3]
    oh_ref, ol_ref = refs[-2], refs[-1]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        oh_ref[:] = jnp.zeros_like(oh_ref)
        ol_ref[:] = jnp.zeros_like(ol_ref)

    U = _triu_ones().astype(jnp.bfloat16)
    for k in range(ns):
        g0 = step * (ns * (chunk // SUBLANES)) + k * (chunk // SUBLANES)
        ph, pe, c2h, c2e = _ds_products(
            k, ns, chunk, pack, kva, vals_refs, vlo_refs, lo_refs, hi_refs,
            x_ref, sub_base_ref, g0, S, seg=True)

        def pref(i_k):
            return jnp.dot(i_k, U, preferred_element_type=jnp.float32)

        cs_h, cs_e = _quantized_reduce(ph, pe, pref, LANES, axis=1)
        # d = cs − c2 in double-single
        dh, de = _two_sum_acc(cs_h, cs_e - c2e, -c2h)
        gi = _chunk_slice(gidx_refs, k, ns, chunk).astype(jnp.int32)
        # one gather per half: gathering at the shifted index equals
        # shifting the gathered values (see engines._seg_kernel)
        th = jnp.take_along_axis(dh, gi, axis=1)
        te = jnp.take_along_axis(de, gi, axis=1)
        # hardware lane rotate + lane-0 mask — the concat shift measured
        # +72 GB/s slower on the f32 engine (engines._lane_shift_diff)
        lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, LANES), 1)
        ths = jnp.where(lane == 0, 0.0, pltpu.roll(th, 1, 1))
        tes = jnp.where(lane == 0, 0.0, pltpu.roll(te, 1, 1))
        ph2, pe2 = _two_sum_acc(th, te - tes, -ths)
        _ds_window_accumulate(oh_ref, ol_ref, ph2, pe2, meta_ref, base_ref,
                              k, ns, chunk, W)


@jax.jit
def segmented_spmv_x2(dev, x2d):
    """Engine 2, double-single: returns (y_hi, y_lo) of (out_rows, 128)."""
    chunk, ns, kva, pack = dev.chunk, dev.ns, dev.kva, dev.pack
    TM = dev.vals[0].shape[0] * kva
    S = x2d.shape[0] // 2
    kernel = functools.partial(_seg_kernel_x2, chunk, ns, kva, pack,
                               dev.w_rows, S)
    in_specs = (
        [pl.BlockSpec((chunk * ns // kva, LANES), lambda i, *_: (i, 0),
                      memory_space=pltpu.VMEM)] * (2 * pack * kva)
        + [pl.BlockSpec((chunk * ns, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)] * (pack + 2)
        + [pl.BlockSpec((round_up(ns, SUBLANES), LANES),
                        lambda i, *_: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]  # x table (hi ∥ lo)
    )
    shape = jax.ShapeDtypeStruct((dev.out_rows, LANES), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(TM // (chunk * ns),),
            in_specs=in_specs,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
        ),
        out_shape=(shape, shape),
        interpret=_interpret(),
    )(dev.base_w, dev.sub_base, *dev.vals, *dev.vals_lo, *dev.lo, dev.hi,
      dev.gidx, dev.meta, x2d)
