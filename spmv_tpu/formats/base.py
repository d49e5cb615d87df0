"""Device-layout plans shared by the five format conversions.

Two target layouts (see ``docs/DESIGN.md``):

* **PanelPlan** (engine 1, ``gather_rowsum``): rows grouped into 128-row
  blocks (the TPU lane dimension); each block is a dense padded panel
  ``(K_b, 128)`` — slot ``k`` of row ``r`` lives at ``[k, r]`` — and the
  panels are concatenated into one flat ``(ΣK_b, 128)`` stream.  Used by
  ELL and SELL-C-σ.
* **SegPlan** (engine 2, ``segmented``): the row-major nnz stream cut into
  1024-nnz (8,128) tiles, each tile touching a single 128-row y block;
  per-element block-local row ids (int8) + per-tile segment-end positions
  drive an in-kernel prefix-sum segmented reduction.  Used by CSR, COO and
  CMRS.

Both plans carry per-subtile x-**window** metadata: the windowed gather in
the kernels reads x rows ``[wrow, wrow + window_rows)`` of the ``(S,128)``
x table; ``window_rows`` is static per matrix (the compile specializes).

All builders are pure NumPy — the vectorized replacement of the reference's
per-driver ``fscanf`` conversion loops (``coo.c:75-84``, ``csr.c:68-91``,
``ell.c:68-164``, ``sigma_c.c:71-204``, ``cmrs.c:72-117``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

LANES = 128  # y rows per block; the lane dimension
SUBLANES = 8  # sublane rows per subtile
TILE_NNZ = LANES * SUBLANES  # nnz per (8,128) tile in engine 2
DEFAULT_CHUNK = 64  # sublane rows fetched per grid step (8 subtiles)
PAD_LID = LANES - 1  # lid assigned to padding elements (val 0 ⇒ harmless)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(a: int, b: int) -> int:
    return cdiv(a, b) * b


@dataclass
class PanelPlan:
    """Engine-1 device layout (flat padded row panels)."""

    vals: np.ndarray  # (TR, 128) f32
    cols: np.ndarray  # (TR, 128) i32
    sub_block: np.ndarray  # (TR//8,) i32 — y block per subtile
    sub_wrow: np.ndarray  # (TR//8,) i32 — x window first row per subtile
    window_rows: int  # static gather window height (W)
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
    """Engine-2 device layout (segmented nnz tiles)."""

    vals: np.ndarray  # (TM, 128) f32
    cols: np.ndarray  # (TM, 128) i32
    lid: np.ndarray  # (TM, 128) i8 — block-local row id
    ends: np.ndarray  # (TM, 128) u8 — E_r[j]: #elems with lid<=j per sublane row
    sub_block: np.ndarray  # (TM//8,) i32
    sub_wrow: np.ndarray  # (TM//8,) i32
    window_rows: int
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


def _window_meta(cols2d: np.ndarray, valid: np.ndarray, ncols: int):
    """Per-subtile x-window metadata.

    cols2d: (T, 8, 128) int32 column ids; valid: same-shape bool mask.
    Returns (wrow (T,), window_rows, safe_cols (T,8,128)) where padding
    columns are rewritten to the subtile min so they never widen the window.
    """
    T = cols2d.shape[0]
    S = cdiv(max(ncols, 1), LANES)
    if T == 0:
        return np.zeros(0, np.int32), 1, cols2d
    big = np.where(valid, cols2d, np.iinfo(np.int32).max)
    minc = big.reshape(T, -1).min(axis=1)
    minc = np.where(minc == np.iinfo(np.int32).max, 0, minc)  # all-pad tile
    small = np.where(valid, cols2d, np.iinfo(np.int32).min)
    maxc = small.reshape(T, -1).max(axis=1)
    maxc = np.where(maxc == np.iinfo(np.int32).min, 0, maxc)

    wrow = (minc >> 7).astype(np.int64)
    wneed = (maxc >> 7) - wrow + 1
    window_rows = int(max(wneed.max(), 1))
    window_rows = min(window_rows, S)
    # Clamp so the window stays inside the (S,128) x table; clamping only
    # moves the start down, which keeps coverage.
    wrow = np.minimum(wrow, S - window_rows)
    wrow = np.maximum(wrow, 0)
    safe = np.where(valid, cols2d, minc[:, None, None].astype(cols2d.dtype))
    return wrow.astype(np.int32), window_rows, safe


def build_panel_plan(
    block_width: np.ndarray,
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    nrows: int,
    ncols: int,
    *,
    chunk: int = DEFAULT_CHUNK,
    dtype=np.float32,
) -> PanelPlan:
    """Pack a row-sorted COO stream into flat padded panels.

    ``block_width[b]`` is the padded row length K_b (will be rounded up to a
    multiple of 8) for rows ``[128b, 128(b+1))``.  Entries beyond K_b are an
    error (callers size K_b from true row lengths).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    nnz = rows.size
    nblocks = cdiv(max(nrows, 1), LANES)
    block_width = np.asarray(block_width, dtype=np.int64)
    assert block_width.shape == (nblocks,)
    kb = np.maximum(round_up_arr(block_width, SUBLANES), SUBLANES)

    # Slot index of each nnz within its row (rank within row).
    # rows sorted ⇒ rank = position − row start.
    row_starts = np.zeros(nrows + 1, dtype=np.int64)
    np.add.at(row_starts, rows + 1, 1)
    np.cumsum(row_starts, out=row_starts)
    rank = np.arange(nnz, dtype=np.int64) - row_starts[rows]

    blk = rows >> 7
    if nnz and (rank >= kb[blk]).any():
        raise ValueError("block_width too small for actual row lengths")

    panel_start = np.zeros(nblocks + 1, dtype=np.int64)
    panel_start[1:] = np.cumsum(kb)
    TR = round_up(int(panel_start[-1]), chunk)
    TR = max(TR, chunk)

    v = np.zeros((TR, LANES), dtype=dtype)
    c = np.zeros((TR, LANES), dtype=np.int32)
    valid = np.zeros((TR, LANES), dtype=bool)
    sub_r = panel_start[blk] + rank  # sublane row in the flat stream
    lane = rows & (LANES - 1)
    v[sub_r, lane] = vals
    c[sub_r, lane] = cols
    valid[sub_r, lane] = True

    nsub = TR // SUBLANES
    sub_block = np.zeros(nsub, dtype=np.int32)
    # subtile s covers sublane rows [8s, 8s+8) → block via searchsorted
    first_row = np.arange(nsub, dtype=np.int64) * SUBLANES
    sub_block[:] = np.minimum(
        np.searchsorted(panel_start, first_row, side="right") - 1, nblocks - 1
    ).astype(np.int32)
    sub_block = np.maximum(sub_block, 0)

    c3 = c.reshape(nsub, SUBLANES, LANES)
    valid3 = valid.reshape(nsub, SUBLANES, LANES)
    wrow, window_rows, safe = _window_meta(c3, valid3, ncols)
    c = safe.reshape(TR, LANES).astype(np.int32)

    return PanelPlan(
        vals=v,
        cols=c,
        sub_block=sub_block,
        sub_wrow=wrow,
        window_rows=window_rows,
        nrows=nrows,
        ncols=ncols,
        nnz=nnz,
        chunk=chunk,
    )


def round_up_arr(a: np.ndarray, b: int) -> np.ndarray:
    return -(-a // b) * b


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
    """Pack a **row-sorted** COO stream into segmented 1024-nnz tiles.

    Tiles are cut so no tile crosses a 128-row block boundary (pad-split),
    the deterministic TPU replacement for the reference's atomic scatter
    (``Coo.cl:4-22``) / strip scheduling (``Cmrs.cl:5-44``).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)
    nnz = rows.size

    blk = rows >> 7
    # Count nnz per block, pad each block's stream to a TILE_NNZ multiple.
    nblocks = cdiv(max(nrows, 1), LANES)
    per_blk = np.bincount(blk, minlength=nblocks).astype(np.int64) if nnz else np.zeros(nblocks, np.int64)
    padded_per_blk = round_up_arr(per_blk, TILE_NNZ)
    tiles_per_blk = padded_per_blk // TILE_NNZ
    blk_start_pad = np.zeros(nblocks + 1, dtype=np.int64)
    blk_start_pad[1:] = np.cumsum(padded_per_blk)
    total_pad = int(blk_start_pad[-1])
    ntiles = max(total_pad // TILE_NNZ, 1)
    TM = round_up(ntiles * SUBLANES, chunk)
    ntiles = TM // SUBLANES
    total_pad = ntiles * TILE_NNZ

    # Destination position of each nnz in the padded stream.
    blk_starts_true = np.zeros(nblocks + 1, dtype=np.int64)
    blk_starts_true[1:] = np.cumsum(per_blk)
    pos_in_blk = np.arange(nnz, dtype=np.int64) - blk_starts_true[blk]
    dest = blk_start_pad[blk] + pos_in_blk

    v = np.zeros(total_pad, dtype=dtype)
    c = np.zeros(total_pad, dtype=np.int64)
    lid = np.full(total_pad, PAD_LID, dtype=np.int16)
    valid = np.zeros(total_pad, dtype=bool)
    v[dest] = vals
    c[dest] = cols
    lid[dest] = (rows & (LANES - 1)).astype(np.int16)
    valid[dest] = True

    # Per-tile metadata.
    tile_of = np.arange(ntiles, dtype=np.int64)
    tile_first = tile_of * TILE_NNZ
    sub_block = np.minimum(
        np.searchsorted(blk_start_pad, tile_first, side="right") - 1, nblocks - 1
    ).astype(np.int32)
    sub_block = np.maximum(sub_block, 0)

    # Row-local segment ends: E[sr, j] = #elements in sublane row sr with
    # lid <= j (lid is sorted within each 128-element sublane row, so a
    # segment's elements in that row are [E[sr, j-1], E[sr, j])).  Padding
    # (lid=127, val 0) keeps E monotone with E[sr, 127] = 128.  Row-local
    # prefixes keep fp32 cancellation error 8x smaller than tile-level ones.
    nsubrows = total_pad // LANES
    counts = np.zeros((nsubrows, LANES), dtype=np.int64)
    sr_idx = np.repeat(np.arange(nsubrows), LANES)
    np.add.at(counts, (sr_idx, lid.astype(np.int64)), 1)
    ends = np.cumsum(counts, axis=1).astype(np.uint8)  # values in [0,128]

    c2 = c.reshape(ntiles, SUBLANES, LANES)
    valid2 = valid.reshape(ntiles, SUBLANES, LANES)
    wrow, window_rows, safe = _window_meta(c2, valid2, ncols)
    c = safe.reshape(TM, LANES).astype(np.int32)

    # Segment-head flags (first element of each (sublane row, lid) run) ride
    # in the sign bit of cols — they gate the in-kernel segmented scan at
    # zero extra memory traffic.
    lid2 = lid.reshape(total_pad // LANES, LANES)
    head = np.ones_like(lid2, dtype=bool)
    head[:, 1:] = lid2[:, 1:] != lid2[:, :-1]
    c = np.where(head, (c.astype(np.int64) | np.int64(-(2**31))), c).astype(np.int32)

    return SegPlan(
        vals=v.reshape(TM, LANES),
        cols=c,
        lid=lid.reshape(TM, LANES).astype(np.int8),
        ends=ends,
        sub_block=sub_block,
        sub_wrow=wrow,
        window_rows=window_rows,
        nrows=nrows,
        ncols=ncols,
        nnz=nnz,
        chunk=chunk,
    )
