"""Device-resident plan wrappers and x/y shape helpers."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from spmv_tpu.formats.base import LANES, PanelPlan, SegPlan, cdiv

__all__ = ["DevPanel", "DevSeg", "x_to_table", "y_from_padded"]


@dataclass(frozen=True)
class DevPanel:
    vals: jnp.ndarray
    cols: jnp.ndarray
    sub_block: jnp.ndarray
    sub_wrow: jnp.ndarray
    window_rows: int
    chunk: int
    nrows: int
    ncols: int
    nnz: int

    @classmethod
    def from_plan(cls, p: PanelPlan) -> "DevPanel":
        return cls(
            vals=jnp.asarray(p.vals),
            cols=jnp.asarray(p.cols),
            sub_block=jnp.asarray(p.sub_block),
            sub_wrow=jnp.asarray(p.sub_wrow),
            window_rows=p.window_rows,
            chunk=p.chunk,
            nrows=p.nrows,
            ncols=p.ncols,
            nnz=p.nnz,
        )

    @property
    def out_blocks(self) -> int:
        return cdiv(max(self.nrows, 1), LANES)


@dataclass(frozen=True)
class DevSeg:
    vals: jnp.ndarray
    cols: jnp.ndarray
    ends: jnp.ndarray
    sub_block: jnp.ndarray
    sub_wrow: jnp.ndarray
    window_rows: int
    chunk: int
    nrows: int
    ncols: int
    nnz: int

    @classmethod
    def from_plan(cls, p: SegPlan) -> "DevSeg":
        return cls(
            vals=jnp.asarray(p.vals),
            cols=jnp.asarray(p.cols),
            ends=jnp.asarray(p.ends),
            sub_block=jnp.asarray(p.sub_block),
            sub_wrow=jnp.asarray(p.sub_wrow),
            window_rows=p.window_rows,
            chunk=p.chunk,
            nrows=p.nrows,
            ncols=p.ncols,
            nnz=p.nnz,
        )

    @property
    def out_blocks(self) -> int:
        return cdiv(max(self.nrows, 1), LANES)


def x_table_rows(ncols: int, window_rows: int) -> int:
    """Rows of the (S,128) x table: at least window_rows and at least 8 so
    every dynamic window slice stays in bounds."""
    return max(cdiv(max(ncols, 1), LANES), window_rows, 8)


def x_to_table(x, ncols: int, window_rows: int):
    """(ncols,) → zero-padded (S,128) VMEM table. jit-composable."""
    S = x_table_rows(ncols, window_rows)
    xf = jnp.asarray(x, jnp.float32).reshape(-1)
    if xf.shape[0] != ncols:
        raise ValueError(f"x has {xf.shape[0]} entries, matrix has {ncols} columns")
    pad = S * LANES - xf.shape[0]
    if pad:
        xf = jnp.pad(xf, (0, pad))
    return xf.reshape(S, LANES)


def y_from_padded(y2d, nrows: int):
    """(1, NB*128) → (nrows,). jit-composable."""
    return y2d.reshape(-1)[:nrows]
