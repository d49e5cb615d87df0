"""BSR — 128×128 block-sparse, the multi-RHS (SpMM) format.

Framework extension beyond the reference (which is strictly single-vector,
``coo.c:163-168``).  Only the nonempty (128-row block, 128-col stripe)
tiles are materialized densely; ``Y = A @ X`` is then one batched matmul on
the MXU plus a segment-sum over block rows — entirely XLA, no Pallas
needed, because with R right-hand sides the arithmetic intensity is
R × SpMV's and the systolic array is the right unit.

Trade-off: dense tiles inflate memory/traffic by ``fill = dense slots/nnz``
(~13× on the cant-scale band matrix), but for R ≳ 32 the MXU pays for it —
measured 135 Gnnz·vec/s at R=128 on one v5e chip vs ~40 Gnnz/s for the
best matvec format run R times.  ``from_coo`` refuses matrices whose fill
exceeds ``max_fill`` (hypersparse inputs should loop a matvec format
instead).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.formats.base import LANES, cdiv

__all__ = ["BSRMatrix"]


@partial(jax.jit, static_argnames=("nb", "ns", "nrows", "precision"))
def _bsr_matmat(tiles, tile_blk, tile_stp, X, *, nb, ns, nrows, precision):
    R = X.shape[1]
    Xp = jnp.pad(X, ((0, ns * LANES - X.shape[0]), (0, 0)))
    Xg = Xp.reshape(ns, LANES, R)[tile_stp]  # (T,128,R) stripe per tile
    P = jax.lax.dot_general(
        tiles, Xg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if precision == "highest"
                   else jax.lax.Precision.DEFAULT),
    )  # (T,128,R)
    Y = jax.ops.segment_sum(P, tile_blk, num_segments=nb)
    return Y.reshape(nb * LANES, R)[:nrows]


@dataclass
class BSRMatrix:
    nrows: int
    ncols: int
    nnz: int
    fill: float  # dense tile slots per nonzero
    precision: str  # "highest" (f32-grade) or "default" (bf16 operands)
    tiles: object = field(repr=False)  # jnp (T,128,128) f32
    tile_blk: object = field(repr=False)  # jnp (T,) i32
    tile_stp: object = field(repr=False)  # jnp (T,) i32

    @classmethod
    def from_coo(
        cls,
        nrows: int,
        ncols: int,
        rows: np.ndarray,
        cols: np.ndarray,
        vals: np.ndarray,
        *,
        max_fill: float = 64.0,
        precision: str = "highest",
    ) -> "BSRMatrix":
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)
        nnz = rows.size
        ns = cdiv(max(ncols, 1), LANES)
        pair = (rows >> 7) * ns + (cols >> 7)
        upair, inv = np.unique(pair, return_inverse=True)
        T = max(upair.size, 1)
        fill = T * LANES * LANES / max(nnz, 1)
        # Guard only when the dense blowup is material (tiny matrices are
        # cheap regardless of their fill ratio).
        if nnz and fill > max_fill and T * LANES * LANES * 4 > 16 * 2**20:
            raise ValueError(
                f"block density too low for BSR (fill {fill:.0f}x > "
                f"max_fill {max_fill}); use a matvec format instead")
        tiles = np.zeros((T, LANES, LANES), np.float32)
        if nnz:
            np.add.at(tiles, (inv, rows & (LANES - 1), cols & (LANES - 1)),
                      vals)
        tile_blk = (upair // ns).astype(np.int32) if nnz else np.zeros(1, np.int32)
        tile_stp = (upair % ns).astype(np.int32) if nnz else np.zeros(1, np.int32)
        return cls(
            nrows=nrows, ncols=ncols, nnz=nnz, fill=fill, precision=precision,
            tiles=jnp.asarray(tiles), tile_blk=jnp.asarray(tile_blk),
            tile_stp=jnp.asarray(tile_stp),
        )

    def to_coo(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """``(rows, cols, vals)`` reconstructed from the dense tiles.
        Lossy by the format's nature: explicitly-stored zeros vanish
        (a zero tile slot is padding) and duplicate inputs arrive summed
        — the triplets reproduce the *operator*, not the input list."""
        tiles = np.asarray(self.tiles)
        t, rr, cc = np.nonzero(tiles)
        if self.nnz == 0:
            z = np.zeros(0, np.int64)
            return z, z.copy(), np.zeros(0)
        blk = np.asarray(self.tile_blk, np.int64)[t]
        stp = np.asarray(self.tile_stp, np.int64)[t]
        return (blk * LANES + rr, stp * LANES + cc,
                tiles[t, rr, cc].astype(np.float64))

    def matmat(self, X):
        """Y = A @ X for X of shape (ncols, R)."""
        X = jnp.asarray(X, jnp.float32)
        if X.ndim != 2 or X.shape[0] != self.ncols:
            raise ValueError(f"X must be ({self.ncols}, R), got {X.shape}")
        return _bsr_matmat(
            self.tiles, self.tile_blk, self.tile_stp, X,
            nb=cdiv(max(self.nrows, 1), LANES), ns=cdiv(max(self.ncols, 1), LANES),
            nrows=self.nrows, precision=self.precision,
        )

    def matvec(self, x):
        return self.matmat(jnp.asarray(x, jnp.float32).reshape(-1, 1))[:, 0]

    __matmul__ = matmat
