"""Stripe-local device-layout plans shared by the five format conversions.

Both engines consume the same geometric decomposition (see docs/DESIGN.md):

* y is tiled into **128-row blocks** (the TPU lane dimension);
* x is tiled into **128-column stripes** = rows of the ``(S,128)`` x table;
* the nonzeros are laid out as a flat stream of (8,128) **subtiles** such
  that every 128-wide sublane row is *stripe-pure* (all its columns fall in
  one stripe) and every subtile is *block-pure* (all its rows fall in one
  y block) with stripe span ≤ 8.

That makes the x-gather exact and cheap in-kernel: load one (8,128) window
of the x table at the subtile's base stripe, sublane-gather by the per-row
stripe offset ``hi`` and lane-gather by the in-stripe column ``lo`` — both
ride in a single uint16 stream ``loc = hi·128 + lo``.  This replaces v1's
O(W) select-loop gather, which left the kernels VPU-bound at ~11% of the
HBM roofline.

* **PanelPlan** (engine 1): per (block, stripe) a padded mini-panel — slot
  ``k`` of row ``r`` lives at sublane row ``panel_start+k``, lane ``r&127``.
  Used by ELL and SELL-C-σ (the TPU analog of ELLPACK's dense padding,
  ``ell.c:121-164`` / ``sigma_c.c:156-202``).
* **SegPlan** (engine 2): the (block, stripe, row)-sorted nnz stream packed
  127-per-sublane-row (lane 0 is a guaranteed zero pad so the in-kernel
  prefix-difference needs no masking); per-(sublane row, block-local row id)
  segment bounds ride as uint8 ``gidx``/``pidx`` streams.  Used by CSR, COO
  and CMRS — the deterministic TPU replacement for the reference's atomic
  scatter (``Coo.cl:4-22``) and strip scheduling (``Cmrs.cl:5-44``).

All builders are pure NumPy — the vectorized replacement of the reference's
per-driver ``fscanf`` conversion loops (``coo.c:75-84``, ``csr.c:68-91``,
``ell.c:68-164``, ``sigma_c.c:71-204``, ``cmrs.c:72-117``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

LANES = 128  # y rows per block / x cols per stripe; the lane dimension
SUBLANES = 8  # sublane rows per subtile; also the x-window height
ROW_CAP = LANES - 1  # real elements per seg sublane row (lane 0 = zero pad)
DEFAULT_CHUNK = 64  # sublane rows fetched per grid step (8 subtiles)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(a: int, b: int) -> int:
    return cdiv(a, b) * b


def x_stripes(ncols: int) -> int:
    """Rows of the (S,128) x table: at least 8 so every (8,128) window
    slice stays in bounds."""
    return max(cdiv(max(ncols, 1), LANES), SUBLANES)


@dataclass
class PanelPlan:
    """Engine-1 device layout (stripe-pure padded mini-panels)."""

    vals: np.ndarray  # (TR, 128) f32
    loc: np.ndarray  # (TR, 128) u16 — hi·128 + lo per element
    sub_block: np.ndarray  # (TR//8,) i32 — y block per subtile
    sub_base: np.ndarray  # (TR//8,) i32 — x window base stripe per subtile
    nrows: int
    ncols: int
    nnz: int  # true nonzeros
    chunk: int  # sublane rows per grid step

    @property
    def padded_slots(self) -> int:
        return self.vals.shape[0] * LANES

    @property
    def padding_ratio(self) -> float:
        return self.padded_slots / max(self.nnz, 1)


@dataclass
class SegPlan:
    """Engine-2 device layout (stripe-pure segmented nnz stream)."""

    vals: np.ndarray  # (TM, 128) f32
    loc: np.ndarray  # (TM, 128) u16
    gidx: np.ndarray  # (TM, 128) u8 — last position of segment j in the row
    pidx: np.ndarray  # (TM, 128) u8 — (first position − 1); == gidx if absent
    sub_block: np.ndarray  # (TM//8,) i32
    sub_base: np.ndarray  # (TM//8,) i32
    nrows: int
    ncols: int
    nnz: int
    chunk: int

    @property
    def padded_slots(self) -> int:
        return self.vals.shape[0] * LANES

    @property
    def padding_ratio(self) -> float:
        return self.padded_slots / max(self.nnz, 1)


def _group_subtiles(subrow_blk: np.ndarray, subrow_stp: np.ndarray, S: int,
                    chunk: int):
    """Greedy subtile grouping of the ordered sublane-row stream.

    Subrows arrive sorted by (block, stripe).  Consecutive subrows join a
    subtile while (a) it has < 8 rows, (b) they share the block, and
    (c) the stripe span stays < 8 (so the in-kernel window is one (8,128)
    slice of the x table).  Violations close the subtile early with pad
    rows.

    Returns (slot_of_subrow (n,), sub_block (nsub,), sub_base (nsub,), TM)
    where TM = nsub·8 rounded up to ``chunk``.

    The per-subrow loop runs in C++ when ``native/plan_group.cpp`` is
    available (identical semantics; ~100× faster on 100M-nnz matrices).
    """
    from spmv_tpu.formats import native_group

    n = subrow_blk.size
    nat = native_group.group_subtiles(subrow_blk, subrow_stp, S)
    if nat is not None:
        slot, blocks, bases, ntiles = nat
    else:
        slot = np.empty(n, dtype=np.int64)
        blocks_l: list[int] = []
        bases_l: list[int] = []
        tile = -1
        count = SUBLANES  # force a new tile on the first subrow
        cur_blk = -1
        base = 0
        for i in range(n):
            b, s = int(subrow_blk[i]), int(subrow_stp[i])
            if count == SUBLANES or b != cur_blk or s - base >= SUBLANES:
                tile += 1
                count = 0
                cur_blk = b
                base = s
                blocks_l.append(b)
                bases_l.append(min(s, S - SUBLANES))
            slot[i] = tile * SUBLANES + count
            count += 1
        ntiles = tile + 1
        blocks, bases = blocks_l, bases_l
    ntiles = max(ntiles, 1)
    TM = round_up(ntiles * SUBLANES, chunk)
    nsub = TM // SUBLANES
    sub_block = np.zeros(nsub, dtype=np.int32)
    sub_base = np.zeros(nsub, dtype=np.int32)
    sub_block[: len(blocks)] = blocks
    sub_base[: len(bases)] = bases
    return slot, sub_block, sub_base, TM


def _run_heads(keys: np.ndarray):
    """Group a sorted key array: returns (run_id_per_elem, run_sizes)."""
    n = keys.size
    head = np.ones(n, dtype=bool)
    head[1:] = keys[1:] != keys[:-1]
    run_id = np.cumsum(head) - 1
    run_sizes = np.bincount(run_id)
    return run_id, run_sizes, head


def _empty_panel(nrows, ncols, chunk) -> PanelPlan:
    return PanelPlan(
        vals=np.zeros((chunk, LANES), np.float32),
        loc=np.zeros((chunk, LANES), np.uint16),
        sub_block=np.zeros(chunk // SUBLANES, np.int32),
        sub_base=np.zeros(chunk // SUBLANES, np.int32),
        nrows=nrows, ncols=ncols, nnz=0, chunk=chunk,
    )


def _empty_seg(nrows, ncols, chunk) -> SegPlan:
    return SegPlan(
        vals=np.zeros((chunk, LANES), np.float32),
        loc=np.zeros((chunk, LANES), np.uint16),
        gidx=np.zeros((chunk, LANES), np.uint8),
        pidx=np.zeros((chunk, LANES), np.uint8),
        sub_block=np.zeros(chunk // SUBLANES, np.int32),
        sub_base=np.zeros(chunk // SUBLANES, np.int32),
        nrows=nrows, ncols=ncols, nnz=0, chunk=chunk,
    )


def build_seg_plan(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    nrows: int,
    ncols: int,
    *,
    chunk: int = DEFAULT_CHUNK,
    dtype=np.float32,
) -> SegPlan:
    """Pack COO triplets (any order; duplicates sum in-kernel) into the
    stripe-pure segmented stream."""
    from spmv_tpu import cache as _cache

    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)
    nnz = rows.size
    if nnz == 0:
        return _empty_seg(nrows, ncols, chunk)
    hit = _cache.plan_lookup("seg", rows, cols, vals, nrows, ncols, chunk,
                             SegPlan)
    if hit is not None:
        return hit
    S = x_stripes(ncols)

    blk = rows >> 7
    stp = cols >> 7
    order = np.lexsort((cols, rows, stp, blk))
    r, c, v = rows[order], cols[order], vals[order]
    blk, stp = blk[order], stp[order]

    # (block, stripe) runs → 127-wide sublane rows with a leading zero pad.
    nstripes = cdiv(max(ncols, 1), LANES)
    run_id, run_sizes, _ = _run_heads(blk * nstripes + stp)
    run_starts = np.zeros(run_sizes.size + 1, dtype=np.int64)
    np.cumsum(run_sizes, out=run_starts[1:])
    idx_in_run = np.arange(nnz, dtype=np.int64) - run_starts[run_id]
    subrow_in_run = idx_in_run // ROW_CAP
    pos = 1 + idx_in_run % ROW_CAP  # lane 0 reserved as the zero pad

    run_nsub = -(-run_sizes // ROW_CAP)
    subrow_start = np.zeros(run_sizes.size + 1, dtype=np.int64)
    np.cumsum(run_nsub, out=subrow_start[1:])
    elem_subrow = subrow_start[run_id] + subrow_in_run

    heads = np.zeros(nnz, dtype=bool)
    heads[run_starts[:-1]] = True
    subrow_blk = np.repeat(blk[heads], run_nsub)
    subrow_stp = np.repeat(stp[heads], run_nsub)

    slot, sub_block, sub_base, TM = _group_subtiles(
        subrow_blk, subrow_stp, S, chunk)
    final_row = slot[elem_subrow]

    v2d = np.zeros((TM, LANES), dtype=dtype)
    # The two-step gather is exact only when hi is uniform across the whole
    # sublane row — pad slots must carry the row's hi, not 0.
    loc2d = np.zeros((TM, LANES), dtype=np.uint16)
    row_hi = subrow_stp - sub_base[slot // SUBLANES].astype(np.int64)
    loc2d[slot, :] = (row_hi * LANES).astype(np.uint16)[:, None]
    hi = stp - sub_base[final_row // SUBLANES].astype(np.int64)
    assert hi.size == 0 or (0 <= hi.min() and hi.max() < SUBLANES)
    v2d[final_row, pos] = v
    loc2d[final_row, pos] = (hi * LANES + (c & (LANES - 1))).astype(np.uint16)

    # Per-(sublane row, block-local row id) segment bounds.  Elements are
    # already grouped: within a sublane row, lid runs are contiguous with
    # ascending positions.
    lid = (r & (LANES - 1)).astype(np.int64)
    gkey = final_row * LANES + lid
    _, g_sizes, g_head = _run_heads(gkey)
    g_first_pos = pos[g_head]
    g_last_pos = pos[np.flatnonzero(g_head) + g_sizes - 1]
    gidx = np.zeros((TM, LANES), dtype=np.uint8)
    pidx = np.zeros((TM, LANES), dtype=np.uint8)
    hrow = final_row[g_head]
    hlid = lid[g_head]
    gidx[hrow, hlid] = g_last_pos
    pidx[hrow, hlid] = g_first_pos - 1

    plan = SegPlan(
        vals=v2d, loc=loc2d, gidx=gidx, pidx=pidx,
        sub_block=sub_block, sub_base=sub_base,
        nrows=nrows, ncols=ncols, nnz=nnz, chunk=chunk,
    )
    _cache.plan_store("seg", rows, cols, vals, nrows, ncols, chunk, plan)
    return plan


def build_panel_plan(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    nrows: int,
    ncols: int,
    *,
    chunk: int = DEFAULT_CHUNK,
    dtype=np.float32,
) -> PanelPlan:
    """Pack COO triplets into stripe-pure padded mini-panels.

    Per (128-row block, 128-col stripe): width K_bs = max over the block's
    rows of that row's element count in the stripe; row ``i``'s k-th element
    lands at sublane row ``panel_start+k``, lane ``i&127``; short rows pad
    with explicit zeros (the reference left ELL pad values uninitialized,
    ``ell.c:147-151``).
    """
    from spmv_tpu import cache as _cache

    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)
    nnz = rows.size
    if nnz == 0:
        return _empty_panel(nrows, ncols, chunk)
    hit = _cache.plan_lookup("panel", rows, cols, vals, nrows, ncols, chunk,
                             PanelPlan)
    if hit is not None:
        return hit
    S = x_stripes(ncols)

    blk = rows >> 7
    stp = cols >> 7
    order = np.lexsort((cols, rows, stp, blk))
    r, c, v = rows[order], cols[order], vals[order]
    blk, stp = blk[order], stp[order]

    nstripes = cdiv(max(ncols, 1), LANES)
    run_key = blk * nstripes + stp
    run_id, run_sizes, _ = _run_heads(run_key)
    run_starts = np.zeros(run_sizes.size + 1, dtype=np.int64)
    np.cumsum(run_sizes, out=run_starts[1:])

    # k = rank of the element within its (row, stripe) group.
    grp_id, grp_sizes, grp_head = _run_heads(run_key * (nrows + 1) + r)
    grp_starts = np.zeros(grp_sizes.size + 1, dtype=np.int64)
    np.cumsum(grp_sizes, out=grp_starts[1:])
    k = np.arange(nnz, dtype=np.int64) - grp_starts[grp_id]

    # K_bs = max group size within each run.
    run_of_grp = run_id[grp_head]
    K_bs = np.zeros(run_sizes.size, dtype=np.int64)
    np.maximum.at(K_bs, run_of_grp, grp_sizes)

    subrow_start = np.zeros(run_sizes.size + 1, dtype=np.int64)
    np.cumsum(K_bs, out=subrow_start[1:])
    elem_subrow = subrow_start[run_id] + k

    heads = np.zeros(nnz, dtype=bool)
    heads[run_starts[:-1]] = True
    subrow_blk = np.repeat(blk[heads], K_bs)
    subrow_stp = np.repeat(stp[heads], K_bs)

    slot, sub_block, sub_base, TR = _group_subtiles(
        subrow_blk, subrow_stp, S, chunk)
    final_row = slot[elem_subrow]
    lane = r & (LANES - 1)

    v2d = np.zeros((TR, LANES), dtype=dtype)
    # Pad slots must carry the row's hi (see build_seg_plan).
    loc2d = np.zeros((TR, LANES), dtype=np.uint16)
    row_hi = subrow_stp - sub_base[slot // SUBLANES].astype(np.int64)
    loc2d[slot, :] = (row_hi * LANES).astype(np.uint16)[:, None]
    hi = stp - sub_base[final_row // SUBLANES].astype(np.int64)
    assert hi.size == 0 or (0 <= hi.min() and hi.max() < SUBLANES)
    v2d[final_row, lane] = v
    loc2d[final_row, lane] = (hi * LANES + (c & (LANES - 1))).astype(np.uint16)

    plan = PanelPlan(
        vals=v2d, loc=loc2d, sub_block=sub_block, sub_base=sub_base,
        nrows=nrows, ncols=ncols, nnz=nnz, chunk=chunk,
    )
    _cache.plan_store("panel", rows, cols, vals, nrows, ncols, chunk, plan)
    return plan
