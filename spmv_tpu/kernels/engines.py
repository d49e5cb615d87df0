"""The two Pallas SpMV kernel engines + the σ-unpermute epilogue.

These are the TPU-native replacements of the reference's five hand-written
OpenCL kernels (``/root/reference/kernels/*.cl``).  Design and measured
cost model in ``docs/DESIGN.md``.

Engine 1 ``panel_spmv``     — ELL / SELL-C-σ   (vs ``Ell.cl``, ``Sigma_C.cl``)
Engine 2 ``segmented_spmv`` — CSR / COO / CMRS (vs ``Csr.cl``, ``Coo.cl``,
                                                 ``Cmrs.cl``)

Memory system (the measured constraint that shapes everything): the Pallas
grid pipeline streams ~67 GB/s per input array but scales with distinct
arrays (in-engine aggregate ~530-690 GB/s at 14-27 arrays), so each plan
stream arrives pre-split into several interleaved device arrays (see
``spmv_tpu.device``); one grid step consumes a **superchunk** of
``ns·chunk`` sublane rows over the concurrent DMAs.

Compute per chunk, fused at chunk width (per-subtile (8,128) op streams
measured ~4-7 cycles/op; chunk-wide ops pipeline properly):

* x-gather: per subtile one (8,128) window slice of the VMEM-resident
  x table + depth-8 sublane gather by the per-row stripe offset ``hi``;
  then one chunk-wide lane gather by the in-stripe column ``lo`` — exact
  because ``hi`` is constant within each sublane row.
* Engine 2 reduction: inclusive lane prefix sums as one chunk-wide matmul
  against upper-triangular ones on the MXU (``jnp.cumsum`` does not lower
  in Mosaic and a VPU scan costs ~40 vector ops) as a **2-pass split-f32
  product** (the 0/1 stationary operand is exact in bf16; measured
  31.7 → 51.5 Gnnz/s vs ``Precision.HIGHEST``), over a **P-packed**
  stream: each lane slot carries P ∈ {1,2,4,8} elements in separate
  value/column planes that the VPU combines (``p = Σ v_p·x[lo_p]``)
  *before* the prefix, amortizing the MXU passes and the segment-bound
  bytes over P elements (measured 42 → 113 Gelem/s at P=4,
  scripts/probe_pack.py).  Per-row segment sums are
  ``cs[gidx] − cs[shift(gidx)]``: ``gidx`` arrives *filled* (running max
  over lids), so the old pidx stream is a one-lane shift — one fewer
  index stream (lane 0 of every sublane row is a guaranteed zero pad, so
  no masking).
* **Windowed y-reduction** (round 3, both engines): each sublane row
  carries a u8 target ``w`` (one ``meta`` row per sub-chunk); the kernel
  builds the 0/1 matrix ``Rw[t,r] = (w[r]==t)`` from a broadcast compare
  and reduces the whole sub-chunk into a ``(W,128)`` window with one
  split-bf16 MXU matmul, then does ONE dynamic
  ``o[base_w : base_w+W] += parts`` RMW.  This replaced round 2's static
  8-row subtile sums + per-subtile accumulate loop (measured ~80 GB/s of
  the segmented engine, scripts/probe_ablate.py ``noacc``) and dropped
  the block-purity constraint on subtiles (×1.7 padding on scattered
  matrices).

The kernels run compiled on TPU and in interpreter mode elsewhere (CPU
tests, multi-host simulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.formats.base import LANES, SUBLANES, round_up

__all__ = ["panel_spmv", "segmented_spmv", "inverse_permute_blocks",
           "panel_spmv_fused", "panel_spmv_partials",
           "segmented_spmv_fused", "segmented_spmv_partials",
           "panel_spmv_multi", "segmented_spmv_multi", "MULTI_RHS_MAX"]

# Fused multi-RHS ceiling: the kernel streams the plan ONCE for R
# right-hand sides (measured 1.19x per vector at R=2, 1.32x at R=4 vs R
# separate passes, scripts/probe_spmm.py); past R~8 the per-vector time
# saturates at the compute share and BSR's block-dense path takes over.
MULTI_RHS_MAX = 8

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


def _chunk_slice(refs, k: int, ns: int, chunk: int):
    """Sub-chunk k's rows from a stream split into len(refs) arrays
    (ns = sub-chunks per superchunk step)."""
    per = ns // len(refs)
    r = refs[k // per]
    off = (k % per) * chunk
    return r[off : off + chunk, :]


def _split_rowsum(R, p):
    """2-pass bf16 row-combining matmul on the MXU (R is 0/1, exact in
    bf16; only the streaming operand p needs the hi+lo split)."""
    ph = p.astype(jnp.bfloat16)
    plo = (p - ph.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(R, ph, preferred_element_type=jnp.float32)
            + jnp.dot(R, plo, preferred_element_type=jnp.float32))


def _lane_shift_diff(t):
    """``t − shift₁(t)`` along lanes with lane 0 bound at 0 — the
    per-lane segment difference.  Uses the hardware lane rotate
    (``pltpu.roll``) + a lane-0 mask instead of a concat: the concat
    materializes a new (chunk,128) buffer and measured +72 GB/s slower
    at production geometry (scripts/probe_ablate3.py ``rollshift`` vs
    ``full``, DESIGN.md fact 13).  Exact — same f32 arithmetic, only
    the shift's implementation changes."""
    rows = t.shape[0]
    rolled = pltpu.roll(t, 1, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return t - jnp.where(lane == 0, 0.0, rolled)


def _window_partial(op_ref, pieces, meta_ref, k: int, ns: int,
                    chunk: int, W: int):
    """Reduce a (chunk,128) sub-chunk into its (W,128) y-window partial:
    build ``Rw[t,r] = (w[r]==t)`` from the streamed per-row target (one
    compare), one MXU matmul, then a PURE STORE into the pipelined
    partials output block (sub-chunk k at rows [k·W, (k+1)·W) — static,
    8-aligned).  The round-3 ablation (DESIGN.md fact 9) measured the
    old in-kernel dynamic ``o[ds(base,W)] +=`` RMW at ~130 GB/s of a
    738 GB/s DMA ceiling — the RMW serialized against the next
    sub-chunk's overlapping window — so the scatter-add into y moved to
    the tiny ``_window_scatter`` epilogue kernel.  ``meta`` arrives
    blocked round_up(ns,8) rows per grid step (sub-chunk k at block row
    k) so the row index is STATIC — Mosaic rejects dynamic sublane
    offsets it cannot prove 8-aligned."""
    Rw = _window_rw(meta_ref, k, chunk, W)
    op_ref[k * W : (k + 1) * W, :] = _split_rowsum(Rw, pieces)


def _window_rw(meta_ref, k: int, chunk: int, W: int):
    """The compare-built 0/1 window-reduction matrix for sub-chunk k —
    shared by the partials/fused single-RHS reductions and across the R
    right-hand sides of the multi-RHS kernels."""
    wv = meta_ref[k : k + 1, 0:chunk].astype(jnp.int32)  # (1,chunk)
    tt = jax.lax.broadcasted_iota(jnp.int32, (W, chunk), 0)
    return (jnp.broadcast_to(wv, (W, chunk)) == tt).astype(jnp.bfloat16)


def _window_accumulate(o_ref, pieces, meta_ref, base_ref, k: int, ns: int,
                       chunk: int, W: int):
    """Single-dispatch variant of the windowed y-reduction: same
    compare-built ``Rw`` matmul as ``_window_partial``, but the (W,128)
    window lands straight in the VMEM-resident y with one dynamic RMW.
    At production scale the RMW serializes against the next sub-chunk's
    overlapping window (~130 GB/s of the DMA ceiling, DESIGN.md fact 9) —
    but on SMALL streams the second dispatch's fixed ramp costs more than
    the serialization, so ``segmented_spmv``/``panel_spmv`` auto-pick this
    path below ``FUSED_STREAM_BYTES_MAX`` (scripts/probe_small.py)."""
    Rw = _window_rw(meta_ref, k, chunk, W)
    parts = _split_rowsum(Rw, pieces)  # (W, 128)
    base = base_ref[pl.program_id(0) * ns + k]
    o_ref[pl.ds(base, W), :] += parts


def _scatter_kernel(ns: int, W: int, base_ref, p_ref, o_ref):
    """Epilogue: y[base_w[s] : base_w[s]+W] += partial_s.  One grid step
    per main-kernel step (block = that step's ns partials); y stays
    VMEM-resident.  Traffic: the partials stream once in, y once out —
    ~2% of the plan stream."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for k in range(ns):
        base = base_ref[step * ns + k]
        o_ref[pl.ds(base, W), :] += p_ref[k * W : (k + 1) * W, :]


def _window_scatter(partials, base_w, ns: int, W: int, out_rows: int):
    nsteps = partials.shape[0] // (ns * W)
    return pl.pallas_call(
        functools.partial(_scatter_kernel, ns, W),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec((ns * W, LANES), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((out_rows, LANES), jnp.float32),
        interpret=_interpret(),
    )(base_w, partials)


def _packed_products(k: int, ns: int, chunk: int, pack: int, kva: int,
                     vals_refs, lo_refs, hi_refs, x_ref, sub_base_ref, g0,
                     seg: bool = False, b2_refs=None):
    """p = Σ_planes vals_p · x[col_p] for one (chunk,128) sub-chunk: one
    shared x-window gather (hi uniform per sublane row) + P lane gathers
    combined on the VPU.

    For the segmented engine (``seg=True``) also returns the mid-quad
    boundary correction ``c2 = Σ_planes msb(lo_p) · vals_p · x[col_p]``:
    segments pack densely (at most one segment boundary per quad slot) and
    the MSB of ``lo`` marks planes belonging to the *next* segment, so the
    prefix difference runs on ``d = cs − c2`` (zero extra stream bytes —
    the flag rides the spare bit of the u8 in-stripe column).

    Two-bank streams (``b2_refs`` set — ``formats.bank``): a second
    per-lane stripe map rides bits 4-6 of the ``b2`` plane; each plane's
    selector bit (bit p, at the element's slot position) picks which
    bank's gathered x feeds the product.  Cost: one extra sublane gather
    per subtile + one lane gather and select per plane."""
    hi_c = _chunk_slice(hi_refs, k, ns, chunk).astype(jnp.int32)
    banked = b2_refs is not None
    if banked:
        b2_c = _chunk_slice(b2_refs, k, ns, chunk).astype(jnp.int32)
        hi2_c = (b2_c >> 4) & (SUBLANES - 1)
    ts = []
    ts2 = []
    for s in range(chunk // SUBLANES):
        w = x_ref[pl.ds(sub_base_ref[g0 + s], SUBLANES), :]
        ts.append(jnp.take_along_axis(
            w, hi_c[s * SUBLANES:(s + 1) * SUBLANES, :], axis=0))
        if banked:
            ts2.append(jnp.take_along_axis(
                w, hi2_c[s * SUBLANES:(s + 1) * SUBLANES, :], axis=0))
    T = jnp.concatenate(ts, axis=0)  # (chunk,128) per-row x windows
    T2 = jnp.concatenate(ts2, axis=0) if banked else None
    p = jnp.zeros((chunk, LANES), jnp.float32)
    c2 = jnp.zeros((chunk, LANES), jnp.float32) if seg else None
    for pp in range(pack):
        lo_c = _chunk_slice((lo_refs[pp],), k, ns, chunk).astype(jnp.int32)
        v_c = _chunk_slice(vals_refs[pp * kva:(pp + 1) * kva], k, ns, chunk)
        if seg:
            lol = lo_c & (LANES - 1)
            xg = jnp.take_along_axis(T, lol, axis=1)
            if banked:
                xg2 = jnp.take_along_axis(T2, lol, axis=1)
                xg = jnp.where(((b2_c >> pp) & 1) == 1, xg2, xg)
            t = v_c * xg
            p = p + t
            c2 = c2 + jnp.where(lo_c >= LANES, t, 0.0)
        else:
            p = p + v_c * jnp.take_along_axis(T, lo_c, axis=1)
    return (p, c2) if seg else p


# ---------------------------------------------------------------- engine 1


def _panel_refs(pack: int, kva: int, refs):
    nv = pack * kva
    return (refs[:nv],  # vals
            refs[nv : nv + pack],  # lo
            refs[nv + pack : nv + pack + 1],  # hi
            refs[nv + pack + 1],  # meta
            refs[-2], refs[-1])  # x table, output


def _panel_kernel(chunk: int, ns: int, kva: int, pack: int, W: int,
                  sub_base_ref, *refs):
    (vals_refs, lo_refs, hi_refs, meta_ref,
     x_ref, op_ref) = _panel_refs(pack, kva, refs)
    step = pl.program_id(0)

    nsub = chunk // SUBLANES
    for k in range(ns):
        g0 = step * (ns * nsub) + k * nsub
        p = _packed_products(k, ns, chunk, pack, kva, vals_refs, lo_refs,
                             hi_refs, x_ref, sub_base_ref, g0)
        _window_partial(op_ref, p, meta_ref, k, ns, chunk, W)


def _panel_kernel_fused(chunk: int, ns: int, kva: int, pack: int, W: int,
                        base_ref, sub_base_ref, *refs):
    (vals_refs, lo_refs, hi_refs, meta_ref,
     x_ref, o_ref) = _panel_refs(pack, kva, refs)
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    nsub = chunk // SUBLANES
    for k in range(ns):
        g0 = step * (ns * nsub) + k * nsub
        p = _packed_products(k, ns, chunk, pack, kva, vals_refs, lo_refs,
                             hi_refs, x_ref, sub_base_ref, g0)
        _window_accumulate(o_ref, p, meta_ref, base_ref, k, ns, chunk, W)


def _panel_in_specs(chunk, ns, kva, pack):
    return (
        [pl.BlockSpec((chunk * ns // kva, LANES), lambda i, *_: (i, 0),
                      memory_space=pltpu.VMEM)] * (pack * kva)
        + [pl.BlockSpec((chunk * ns, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)] * (pack + 1)
        + [pl.BlockSpec((round_up(ns, SUBLANES), LANES),
                        lambda i, *_: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]  # x table, resident
    )


@jax.jit
def panel_spmv(dev, x2d):
    """Engine 1: y(out_rows, 128) = A·x over P-packed stripe-pure
    mini-panels (vs ``Ell.cl``'s workgroup-per-row tree reduction and
    ``Sigma_C.cl``'s slice kernel).  Window partials stream out of the
    main kernel; ``_window_scatter`` folds them into y.  Small streams
    auto-take the single-dispatch fused-RMW variant (``dev.fused``)."""
    if dev.fused:
        return panel_spmv_fused(dev, x2d)
    return panel_spmv_partials(dev, x2d)


@jax.jit
def panel_spmv_partials(dev, x2d):
    """Engine 1, two-dispatch: window partials stream out of the main
    kernel; ``_window_scatter`` folds them into y (DESIGN.md fact 9)."""
    chunk, ns, kva, pack = dev.chunk, dev.ns, dev.kva, dev.pack
    W = dev.w_rows
    TM = dev.vals[0].shape[0] * kva
    nsteps = TM // (chunk * ns)
    kernel = functools.partial(_panel_kernel, chunk, ns, kva, pack, W)
    partials = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=_panel_in_specs(chunk, ns, kva, pack),
            out_specs=pl.BlockSpec((ns * W, LANES), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nsteps * ns * W, LANES),
                                       jnp.float32),
        interpret=_interpret(),
    )(dev.sub_base, *dev.vals, *dev.lo, dev.hi, dev.meta, x2d)
    return _window_scatter(partials, dev.base_w, ns, W, dev.out_rows)


@jax.jit
def panel_spmv_fused(dev, x2d):
    """Engine 1, single-dispatch: the windowed reduce RMWs straight into
    the VMEM-resident y (no partials round-trip, no epilogue kernel)."""
    chunk, ns, kva, pack = dev.chunk, dev.ns, dev.kva, dev.pack
    W = dev.w_rows
    TM = dev.vals[0].shape[0] * kva
    nsteps = TM // (chunk * ns)
    kernel = functools.partial(_panel_kernel_fused, chunk, ns, kva, pack, W)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nsteps,),
            in_specs=_panel_in_specs(chunk, ns, kva, pack),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((dev.out_rows, LANES), jnp.float32),
        interpret=_interpret(),
    )(dev.base_w, dev.sub_base, *dev.vals, *dev.lo, dev.hi, dev.meta, x2d)


# ---------------------------------------------------------------- engine 2


def _seg_pieces(k: int, ns: int, chunk: int, pack: int, kva: int,
                vals_refs, lo_refs, hi_refs, gidx_refs, x_ref,
                sub_base_ref, g0, U, b2_refs=None):
    """One sub-chunk's per-(row,lane) segment sums — the segmented
    engine's compute path, shared by the streamed-partials and fused-RMW
    variants."""
    # P-packed pre-reduction (shared with engine 1): the VPU combine
    # amortizes the MXU prefix and the index bytes over P elements.
    p, c2 = _packed_products(k, ns, chunk, pack, kva, vals_refs,
                             lo_refs, hi_refs, x_ref, sub_base_ref, g0,
                             seg=True, b2_refs=b2_refs)
    cs = _split_dot(p, U)  # inclusive lane prefix on the MXU
    # d[q] = everything through the portion of quad q belonging to the
    # segment ending in q (c2 subtracts the next segment's head) — the
    # prefix difference stays exact with mid-quad segment boundaries.
    d = cs - c2
    gi = _chunk_slice(gidx_refs, k, ns, chunk).astype(jnp.int32)
    # pieces = d[gi] − d[shift(gi)].  Gathering at the shifted index
    # equals shifting the gathered values (same per-row table), so ONE
    # lane gather + a lane shift replaces two gathers (the gathers
    # cost ~46 GB/s of the DMA ceiling, DESIGN.md fact 13).  Absent
    # lids vanish as t−t (gidx is a running max); lane 0's bound is
    # d[:,0] == 0 (the guaranteed zero pad).
    t = jnp.take_along_axis(d, gi, axis=1)
    return _lane_shift_diff(t)


def _seg_refs(pack: int, kva: int, refs, banked: bool = False):
    nv = pack * kva
    nb = 1 if banked else 0
    return (refs[:nv],  # vals, plane-major: plane pp is [pp*kva,(pp+1)*kva)
            refs[nv : nv + pack],  # lo
            refs[nv + pack : nv + pack + 1],  # hi
            refs[nv + pack + 1 : nv + pack + 1 + nb] or None,  # b2 (banked)
            refs[nv + pack + 1 + nb : nv + pack + 2 + nb],  # gidx
            refs[nv + pack + 2 + nb],  # meta
            refs[-2], refs[-1])  # x table, output


def _seg_kernel(chunk: int, ns: int, kva: int, pack: int, W: int,
                banked: bool, sub_base_ref, *refs):
    (vals_refs, lo_refs, hi_refs, b2_refs, gidx_refs, meta_ref,
     x_ref, op_ref) = _seg_refs(pack, kva, refs, banked)
    step = pl.program_id(0)

    U = _triu_ones().astype(jnp.bfloat16)
    nsub = chunk // SUBLANES
    for k in range(ns):
        g0 = step * (ns * nsub) + k * nsub
        pieces = _seg_pieces(k, ns, chunk, pack, kva, vals_refs, lo_refs,
                             hi_refs, gidx_refs, x_ref, sub_base_ref, g0, U,
                             b2_refs=b2_refs)
        _window_partial(op_ref, pieces, meta_ref, k, ns, chunk, W)


def _seg_kernel_fused(chunk: int, ns: int, kva: int, pack: int, W: int,
                      banked: bool, base_ref, sub_base_ref, *refs):
    (vals_refs, lo_refs, hi_refs, b2_refs, gidx_refs, meta_ref,
     x_ref, o_ref) = _seg_refs(pack, kva, refs, banked)
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    U = _triu_ones().astype(jnp.bfloat16)
    nsub = chunk // SUBLANES
    for k in range(ns):
        g0 = step * (ns * nsub) + k * nsub
        pieces = _seg_pieces(k, ns, chunk, pack, kva, vals_refs, lo_refs,
                             hi_refs, gidx_refs, x_ref, sub_base_ref, g0, U,
                             b2_refs=b2_refs)
        _window_accumulate(o_ref, pieces, meta_ref, base_ref, k, ns, chunk,
                           W)


def _seg_in_specs(chunk, ns, kva, pack, banked: bool = False):
    return (
        [pl.BlockSpec((chunk * ns // kva, LANES), lambda i, *_: (i, 0),
                      memory_space=pltpu.VMEM)] * (pack * kva)
        + [pl.BlockSpec((chunk * ns, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)] * (pack + 2 + int(banked))
        + [pl.BlockSpec((round_up(ns, SUBLANES), LANES),
                        lambda i, *_: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]  # x table, resident
    )


@jax.jit
def segmented_spmv(dev, x2d):
    """Engine 2: P-packed MXU-prefix segmented-reduction SpMV.

    Replaces the reference's CAS-atomic scatter (``Coo.cl:4-22``), scalar
    row loop (``Csr.cl:5-16``) and strip reduction (``Cmrs.cl:5-44``) with
    one deterministic engine; the P-packing (measured 42 → 113 Gelem/s at
    P=4, scripts/probe_pack.py) amortizes the triangular-prefix matmul
    over P elements per lane slot.  Small streams auto-take the
    single-dispatch fused-RMW variant (``dev.fused`` — the second
    dispatch's fixed ramp outweighs the RMW serialization below
    ~``FUSED_STREAM_BYTES_MAX``, scripts/probe_small.py)."""
    if dev.fused:
        return segmented_spmv_fused(dev, x2d)
    return segmented_spmv_partials(dev, x2d)


@jax.jit
def segmented_spmv_partials(dev, x2d):
    """Engine 2, two-dispatch: window partials stream out of the main
    kernel; ``_window_scatter`` folds them into y (DESIGN.md fact 9)."""
    chunk, ns, kva, pack = dev.chunk, dev.ns, dev.kva, dev.pack
    W = dev.w_rows
    banked = dev.b2 is not None
    b2 = (dev.b2,) if banked else ()
    TM = dev.vals[0].shape[0] * kva
    nsteps = TM // (chunk * ns)
    kernel = functools.partial(_seg_kernel, chunk, ns, kva, pack, W, banked)
    partials = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=_seg_in_specs(chunk, ns, kva, pack, banked),
            out_specs=pl.BlockSpec((ns * W, LANES), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nsteps * ns * W, LANES),
                                       jnp.float32),
        interpret=_interpret(),
    )(dev.sub_base, *dev.vals, *dev.lo, dev.hi, *b2, dev.gidx, dev.meta,
      x2d)
    return _window_scatter(partials, dev.base_w, ns, W, dev.out_rows)


@jax.jit
def segmented_spmv_fused(dev, x2d):
    """Engine 2, single-dispatch: the windowed reduce RMWs straight into
    the VMEM-resident y (no partials round-trip, no epilogue kernel)."""
    chunk, ns, kva, pack = dev.chunk, dev.ns, dev.kva, dev.pack
    W = dev.w_rows
    banked = dev.b2 is not None
    b2 = (dev.b2,) if banked else ()
    TM = dev.vals[0].shape[0] * kva
    nsteps = TM // (chunk * ns)
    kernel = functools.partial(_seg_kernel_fused, chunk, ns, kva, pack, W,
                               banked)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nsteps,),
            in_specs=_seg_in_specs(chunk, ns, kva, pack, banked),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((dev.out_rows, LANES), jnp.float32),
        interpret=_interpret(),
    )(dev.base_w, dev.sub_base, *dev.vals, *dev.lo, dev.hi, *b2, dev.gidx,
      dev.meta, x2d)


# ----------------------------------------------------- multi-RHS variants


def _scatter_kernel_multi(ns: int, W: int, rhs: int, out_rows: int,
                          base_ref, p_ref, o_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for k in range(ns):
        base = base_ref[step * ns + k]
        for r in range(rhs):
            j = k * rhs + r
            o_ref[pl.ds(base + r * out_rows, W), :] += (
                p_ref[j * W : (j + 1) * W, :])


def _window_scatter_multi(partials, base_w, ns: int, W: int, rhs: int,
                          out_rows: int):
    nsteps = partials.shape[0] // (ns * rhs * W)
    return pl.pallas_call(
        functools.partial(_scatter_kernel_multi, ns, W, rhs, out_rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec((ns * rhs * W, LANES),
                                   lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((rhs * out_rows, LANES), jnp.float32),
        interpret=_interpret(),
    )(base_w, partials)


def _seg_kernel_multi(chunk: int, ns: int, kva: int, pack: int, W: int,
                      rhs: int, xS: int, banked: bool, sub_base_ref, *refs):
    (vals_refs, lo_refs, hi_refs, b2_refs, gidx_refs, meta_ref,
     x_ref, op_ref) = _seg_refs(pack, kva, refs, banked)
    step = pl.program_id(0)

    U = _triu_ones().astype(jnp.bfloat16)
    nsub = chunk // SUBLANES
    for k in range(ns):
        g0 = step * (ns * nsub) + k * nsub
        # plan streams sliced ONCE per sub-chunk, shared by all R vectors
        hi_c = _chunk_slice(hi_refs, k, ns, chunk).astype(jnp.int32)
        if banked:
            b2_c = _chunk_slice(b2_refs, k, ns, chunk).astype(jnp.int32)
            hi2_c = (b2_c >> 4) & (SUBLANES - 1)
        gi = _chunk_slice(gidx_refs, k, ns, chunk).astype(jnp.int32)
        los = [_chunk_slice((lo_refs[pp],), k, ns, chunk).astype(jnp.int32)
               for pp in range(pack)]
        vs = [_chunk_slice(vals_refs[pp * kva:(pp + 1) * kva], k, ns, chunk)
              for pp in range(pack)]
        Rw = _window_rw(meta_ref, k, chunk, W)
        for r in range(rhs):
            ts = []
            ts2 = []
            for s in range(nsub):
                w = x_ref[pl.ds(r * xS + sub_base_ref[g0 + s], SUBLANES), :]
                ts.append(jnp.take_along_axis(
                    w, hi_c[s * SUBLANES:(s + 1) * SUBLANES, :], axis=0))
                if banked:
                    ts2.append(jnp.take_along_axis(
                        w, hi2_c[s * SUBLANES:(s + 1) * SUBLANES, :],
                        axis=0))
            T = jnp.concatenate(ts, axis=0)
            T2 = jnp.concatenate(ts2, axis=0) if banked else None
            p = jnp.zeros((chunk, LANES), jnp.float32)
            c2 = jnp.zeros((chunk, LANES), jnp.float32)
            for pp in range(pack):
                lol = los[pp] & (LANES - 1)
                xg = jnp.take_along_axis(T, lol, axis=1)
                if banked:
                    xg2 = jnp.take_along_axis(T2, lol, axis=1)
                    xg = jnp.where(((b2_c >> pp) & 1) == 1, xg2, xg)
                t = vs[pp] * xg
                p = p + t
                c2 = c2 + jnp.where(los[pp] >= LANES, t, 0.0)
            d = _split_dot(p, U) - c2
            t = jnp.take_along_axis(d, gi, axis=1)
            j = k * rhs + r
            op_ref[j * W : (j + 1) * W, :] = _split_rowsum(
                Rw, _lane_shift_diff(t))


def _panel_kernel_multi(chunk: int, ns: int, kva: int, pack: int, W: int,
                        rhs: int, xS: int, sub_base_ref, *refs):
    (vals_refs, lo_refs, hi_refs, meta_ref,
     x_ref, op_ref) = _panel_refs(pack, kva, refs)
    step = pl.program_id(0)

    nsub = chunk // SUBLANES
    for k in range(ns):
        g0 = step * (ns * nsub) + k * nsub
        hi_c = _chunk_slice(hi_refs, k, ns, chunk).astype(jnp.int32)
        los = [_chunk_slice((lo_refs[pp],), k, ns, chunk).astype(jnp.int32)
               for pp in range(pack)]
        vs = [_chunk_slice(vals_refs[pp * kva:(pp + 1) * kva], k, ns, chunk)
              for pp in range(pack)]
        Rw = _window_rw(meta_ref, k, chunk, W)
        for r in range(rhs):
            ts = []
            for s in range(nsub):
                w = x_ref[pl.ds(r * xS + sub_base_ref[g0 + s], SUBLANES), :]
                ts.append(jnp.take_along_axis(
                    w, hi_c[s * SUBLANES:(s + 1) * SUBLANES, :], axis=0))
            T = jnp.concatenate(ts, axis=0)
            p = jnp.zeros((chunk, LANES), jnp.float32)
            for pp in range(pack):
                p = p + vs[pp] * jnp.take_along_axis(T, los[pp], axis=1)
            j = k * rhs + r
            op_ref[j * W : (j + 1) * W, :] = _split_rowsum(Rw, p)


@functools.partial(jax.jit, static_argnames=("rhs",))
def segmented_spmv_multi(dev, x2d, rhs: int):
    """Engine 2, fused multi-RHS: one plan-stream pass computes R
    segmented SpMVs against R stacked x tables (x2d is (R·S, 128), the
    r-th table at rows [r·S, (r+1)·S)).  Returns (R·out_rows, 128) — the
    r-th y at rows [r·out_rows, (r+1)·out_rows).  Measured 1.19×/1.32×
    per vector at R=2/4 vs R separate passes (scripts/probe_spmm.py) —
    the plan DMA amortizes over R while the per-vector VPU work stays."""
    chunk, ns, kva, pack = dev.chunk, dev.ns, dev.kva, dev.pack
    W = dev.w_rows
    banked = dev.b2 is not None
    b2 = (dev.b2,) if banked else ()
    TM = dev.vals[0].shape[0] * kva
    nsteps = TM // (chunk * ns)
    xS = x2d.shape[0] // rhs
    kernel = functools.partial(_seg_kernel_multi, chunk, ns, kva, pack, W,
                               rhs, xS, banked)
    partials = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=_seg_in_specs(chunk, ns, kva, pack, banked),
            out_specs=pl.BlockSpec((ns * rhs * W, LANES),
                                   lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nsteps * ns * rhs * W, LANES),
                                       jnp.float32),
        interpret=_interpret(),
    )(dev.sub_base, *dev.vals, *dev.lo, dev.hi, *b2, dev.gidx, dev.meta,
      x2d)
    return _window_scatter_multi(partials, dev.base_w, ns, W, rhs,
                                 dev.out_rows)


@functools.partial(jax.jit, static_argnames=("rhs",))
def panel_spmv_multi(dev, x2d, rhs: int):
    """Engine 1, fused multi-RHS (see ``segmented_spmv_multi``)."""
    chunk, ns, kva, pack = dev.chunk, dev.ns, dev.kva, dev.pack
    W = dev.w_rows
    TM = dev.vals[0].shape[0] * kva
    nsteps = TM // (chunk * ns)
    xS = x2d.shape[0] // rhs
    kernel = functools.partial(_panel_kernel_multi, chunk, ns, kva, pack, W,
                               rhs, xS)
    partials = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=_panel_in_specs(chunk, ns, kva, pack),
            out_specs=pl.BlockSpec((ns * rhs * W, LANES),
                                   lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nsteps * ns * rhs * W, LANES),
                                       jnp.float32),
        interpret=_interpret(),
    )(dev.sub_base, *dev.vals, *dev.lo, dev.hi, dev.meta, x2d)
    return _window_scatter_multi(partials, dev.base_w, ns, W, rhs,
                                 dev.out_rows)


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
