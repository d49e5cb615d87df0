"""The two Pallas SpMV kernel engines + the σ-unpermute epilogue.

These are the TPU-native replacements of the reference's five hand-written
OpenCL kernels (``/root/reference/kernels/*.cl``).  Design and measured
cost model in ``docs/DESIGN.md``.

Engine 1 ``gather_rowsum``  — ELL / SELL-C-σ   (vs ``Ell.cl``, ``Sigma_C.cl``)
Engine 2 ``segmented``      — CSR / COO / CMRS (vs ``Csr.cl``, ``Coo.cl``,
                                                 ``Cmrs.cl``)

Both keep the dense vector x resident in VMEM as an (S,128) table and the
whole y in VMEM as the pallas output, stream (vals, cols[, lid]) tiles from
HBM via the grid pipeline, and resolve x[col] with a windowed select-gather
(the only dynamic-gather forms Mosaic exposes are lane-gather with a
128-entry table per sublane row and depth-8 sublane gather).

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


def _windowed_gather(window, cols_rel, W: int):
    """x-gather of an (8,128) subtile from a (W,128) VMEM window.

    ``cols_rel`` = col − 128·wrow; elements outside the window (possible
    only for padding slots) read as 0.
    """
    hi = cols_rel >> 7
    lo = cols_rel & (LANES - 1)
    xg = jnp.zeros(cols_rel.shape, jnp.float32)
    for k in range(W):
        tbl = jnp.broadcast_to(window[k : k + 1, :], cols_rel.shape)
        g = jnp.take_along_axis(tbl, lo, axis=1)
        xg = jnp.where(hi == k, g, xg)
    return xg


def _segmented_lane_scan(v, keep):
    """Inclusive *segmented* prefix sum along lanes: the sum resets at
    segment heads (``keep`` is 0.0 at heads, 1.0 elsewhere).  jnp.cumsum
    does not lower in Mosaic; Hillis-Steele over pltpu.roll does.  The
    reset keeps fp32 error proportional to each segment's own magnitude
    instead of the whole 128-lane prefix."""
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    m = keep
    sh = 1
    while sh < v.shape[1]:
        vr = pltpu.roll(v, sh, 1)
        mr = pltpu.roll(m, sh, 1)
        ok = col >= sh
        v = v + jnp.where(ok, m * vr, 0.0)
        m = jnp.where(ok, m * mr, m)
        sh *= 2
    return v


# ---------------------------------------------------------------- engine 1


def _panel_kernel(W: int, chunk: int, sub_block_ref, sub_wrow_ref,
                  vals_ref, cols_ref, x_ref, o_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    nsub = chunk // SUBLANES
    for s in range(nsub):
        g = step * nsub + s
        b = sub_block_ref[g]
        wr = sub_wrow_ref[g]
        window = x_ref[pl.ds(wr, W), :]
        cols = cols_ref[s * SUBLANES : (s + 1) * SUBLANES, :]
        vals = vals_ref[s * SUBLANES : (s + 1) * SUBLANES, :]
        xg = _windowed_gather(window, cols - wr * LANES, W)
        part = jnp.sum(vals * xg, axis=0, keepdims=True)  # (1,128)
        off = pl.multiple_of(b * LANES, LANES)
        o_ref[0:1, pl.ds(off, LANES)] += part


@functools.partial(jax.jit, static_argnames=("window_rows", "chunk", "out_blocks"))
def panel_spmv(vals, cols, sub_block, sub_wrow, x2d, *,
               window_rows: int, chunk: int, out_blocks: int):
    """Engine 1: y(1, 128·out_blocks) = A·x over flat padded row panels."""
    TR = vals.shape[0]
    grid = (TR // chunk,)
    kernel = functools.partial(_panel_kernel, window_rows, chunk)
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
    )(sub_block, sub_wrow, vals, cols, x2d)


# ---------------------------------------------------------------- engine 2


def _seg_kernel(W: int, chunk: int, sub_block_ref, sub_wrow_ref,
                vals_ref, cols_ref, ends_ref, x_ref, o_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    nsub = chunk // SUBLANES
    for s in range(nsub):
        g = step * nsub + s
        b = sub_block_ref[g]
        wr = sub_wrow_ref[g]
        window = x_ref[pl.ds(wr, W), :]
        cols_enc = cols_ref[s * SUBLANES : (s + 1) * SUBLANES, :]
        vals = vals_ref[s * SUBLANES : (s + 1) * SUBLANES, :]
        keep = jnp.where(cols_enc < 0, 0.0, 1.0)  # sign bit = segment head
        cols = cols_enc & jnp.int32(2**31 - 1)
        xg = _windowed_gather(window, cols - wr * LANES, W)
        p = vals * xg  # (8,128) products, row-major nnz order

        # Row-local segmented reduction: within each sublane row, a segment
        # (= block-local y row) is contiguous; the resetting scan makes the
        # value at a segment's last position its exact per-row sum, read
        # back at end positions E (uint8, [0,128]).
        cs = _segmented_lane_scan(p, keep)
        e = ends_ref[s * SUBLANES : (s + 1) * SUBLANES, :].astype(jnp.int32)
        idx = jnp.maximum(e - 1, 0)
        a = jnp.take_along_axis(cs, idx, axis=1)  # seg-sum at E_r[j]-1
        eprev = pltpu.roll(e, 1, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, e.shape, 1)
        eprev = jnp.where(lane == 0, 0, eprev)
        a = jnp.where(e > eprev, a, 0.0)  # row j present in this sublane row
        part = jnp.sum(a, axis=0, keepdims=True)  # (1,128)

        off = pl.multiple_of(b * LANES, LANES)
        o_ref[0:1, pl.ds(off, LANES)] += part


@functools.partial(jax.jit, static_argnames=("window_rows", "chunk", "out_blocks"))
def segmented_spmv(vals, cols, ends, sub_block, sub_wrow, x2d, *,
                   window_rows: int, chunk: int, out_blocks: int):
    """Engine 2: segmented-reduction SpMV over 1024-nnz tiles."""
    TM = vals.shape[0]
    grid = (TM // chunk,)
    kernel = functools.partial(_seg_kernel, window_rows, chunk)
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
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, out_blocks * LANES), jnp.float32),
        interpret=_interpret(),
    )(sub_block, sub_wrow, vals, cols, ends, x2d)


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
