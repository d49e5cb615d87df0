"""The two Pallas SpMV kernel engines + the σ-unpermute epilogue.

These are the TPU-native replacements of the reference's five hand-written
OpenCL kernels (``/root/reference/kernels/*.cl``).  Design and measured
cost model in ``docs/DESIGN.md``.

Engine 1 ``panel_spmv``     — ELL / SELL-C-σ   (vs ``Ell.cl``, ``Sigma_C.cl``)
Engine 2 ``segmented_spmv`` — CSR / COO / CMRS (vs ``Csr.cl``, ``Coo.cl``,
                                                 ``Cmrs.cl``)

Both stream (8,128) subtiles whose sublane rows are stripe-pure and whose
rows are block-pure (see ``formats.base``), keep the whole x in VMEM as an
(S,128) table and the whole y in VMEM as the pallas output, and resolve
``x[col]`` with an **exact two-step gather**: one (8,128) window slice of
the x table at the subtile's base stripe, a depth-8 sublane gather by the
per-row stripe offset ``hi``, then a lane gather by the in-stripe column
``lo`` (exact because ``hi`` is constant within each sublane row).  Both
indices ride in a single uint16 ``loc = hi·128 + lo`` stream.

Engine 2 additionally reduces each sublane row's contiguous row-segments
with a **prefix-difference on the MXU**: ``cs = p @ triu(1)`` computes the
inclusive lane prefix sums as one (8,128)×(128,128) matmul on the systolic
array (``jnp.cumsum`` does not lower in Mosaic, and a Hillis-Steele VPU
scan costs ~40 vector ops); the per-row sums are then
``cs[gidx] − cs[pidx]`` with conversion-precomputed uint8 bounds.  Lane 0
of every sublane row is a guaranteed zero pad, so ``pidx ≥ 0`` and absent
segments (``gidx == pidx``) vanish without masking.

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


def _gather_x(window, loc):
    """Exact two-step x-gather of an (8,128) subtile from an (8,128) window.

    ``loc = hi·128 + lo`` with ``hi`` constant within each sublane row, so
    ``window[hi[r, lo[r,c]], lo[r,c]] == window[hi[r,c], lo[r,c]]``.
    """
    loc = loc.astype(jnp.int32)
    hi = loc >> 7
    lo = loc & (LANES - 1)
    t = jnp.take_along_axis(window, hi, axis=0)  # depth-8 sublane gather
    return jnp.take_along_axis(t, lo, axis=1)  # per-row lane gather


# ---------------------------------------------------------------- engine 1


def _panel_kernel(chunk: int, sub_block_ref, sub_base_ref,
                  vals_ref, loc_ref, x_ref, o_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    nsub = chunk // SUBLANES
    for s in range(nsub):
        g = step * nsub + s
        b = sub_block_ref[g]
        window = x_ref[pl.ds(sub_base_ref[g], SUBLANES), :]
        xg = _gather_x(window, loc_ref[s * SUBLANES : (s + 1) * SUBLANES, :])
        p = vals_ref[s * SUBLANES : (s + 1) * SUBLANES, :] * xg
        part = jnp.sum(p, axis=0, keepdims=True)  # (1,128) per-y-row sums
        off = pl.multiple_of(b * LANES, LANES)
        o_ref[0:1, pl.ds(off, LANES)] += part


@functools.partial(jax.jit, static_argnames=("chunk", "out_blocks"))
def panel_spmv(vals, loc, sub_block, sub_base, x2d, *,
               chunk: int, out_blocks: int):
    """Engine 1: y(1, 128·out_blocks) = A·x over stripe-pure mini-panels."""
    TR = vals.shape[0]
    grid = (TR // chunk,)
    kernel = functools.partial(_panel_kernel, chunk)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((chunk, LANES), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, LANES), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, out_blocks * LANES), jnp.float32),
        interpret=_interpret(),
    )(sub_block, sub_base, vals, loc, x2d)


# ---------------------------------------------------------------- engine 2


def _seg_kernel(chunk: int, sub_block_ref, sub_base_ref,
                vals_ref, loc_ref, gidx_ref, pidx_ref, x_ref, o_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # Upper-triangular ones: cs = p @ U is the inclusive lane prefix sum,
    # computed on the MXU.  Traced once per grid step.
    rk = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    ck = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    U = (rk <= ck).astype(jnp.float32)

    nsub = chunk // SUBLANES
    for s in range(nsub):
        g = step * nsub + s
        b = sub_block_ref[g]
        window = x_ref[pl.ds(sub_base_ref[g], SUBLANES), :]
        xg = _gather_x(window, loc_ref[s * SUBLANES : (s + 1) * SUBLANES, :])
        p = vals_ref[s * SUBLANES : (s + 1) * SUBLANES, :] * xg
        # HIGHEST: the MXU's default f32 path rounds operands to bf16; the
        # prefix sums must keep full f32 mantissa.
        cs = jnp.dot(p, U, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        gi = gidx_ref[s * SUBLANES : (s + 1) * SUBLANES, :].astype(jnp.int32)
        pi = pidx_ref[s * SUBLANES : (s + 1) * SUBLANES, :].astype(jnp.int32)
        seg_end = jnp.take_along_axis(cs, gi, axis=1)
        seg_pre = jnp.take_along_axis(cs, pi, axis=1)
        part = jnp.sum(seg_end - seg_pre, axis=0, keepdims=True)  # (1,128)
        off = pl.multiple_of(b * LANES, LANES)
        o_ref[0:1, pl.ds(off, LANES)] += part


@functools.partial(jax.jit, static_argnames=("chunk", "out_blocks"))
def segmented_spmv(vals, loc, gidx, pidx, sub_block, sub_base, x2d, *,
                   chunk: int, out_blocks: int):
    """Engine 2: MXU-prefix segmented-reduction SpMV over 1024-nnz tiles."""
    TM = vals.shape[0]
    grid = (TM // chunk,)
    kernel = functools.partial(_seg_kernel, chunk)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((chunk, LANES), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, LANES), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, LANES), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, LANES), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, out_blocks * LANES), jnp.float32),
        interpret=_interpret(),
    )(sub_block, sub_base, vals, loc, gidx, pidx, x2d)


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
