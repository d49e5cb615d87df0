"""Device-resident plan wrappers and x/y shape helpers."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from spmv_tpu.formats.base import LANES, PanelPlan, SegPlan, cdiv, x_stripes

__all__ = ["DevPanel", "DevSeg", "x_table_rows", "x_to_table", "y_from_padded"]


@dataclass(frozen=True)
class DevPanel:
    vals: jnp.ndarray
    loc: jnp.ndarray
    sub_block: jnp.ndarray
    sub_base: jnp.ndarray
    chunk: int
    nrows: int
    ncols: int
    nnz: int

    @classmethod
    def from_plan(cls, p: PanelPlan) -> "DevPanel":
        return cls(
            vals=jnp.asarray(p.vals),
            loc=jnp.asarray(p.loc),
            sub_block=jnp.asarray(p.sub_block),
            sub_base=jnp.asarray(p.sub_base),
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
    loc: jnp.ndarray
    gidx: jnp.ndarray
    pidx: jnp.ndarray
    sub_block: jnp.ndarray
    sub_base: jnp.ndarray
    chunk: int
    nrows: int
    ncols: int
    nnz: int

    @classmethod
    def from_plan(cls, p: SegPlan) -> "DevSeg":
        return cls(
            vals=jnp.asarray(p.vals),
            loc=jnp.asarray(p.loc),
            gidx=jnp.asarray(p.gidx),
            pidx=jnp.asarray(p.pidx),
            sub_block=jnp.asarray(p.sub_block),
            sub_base=jnp.asarray(p.sub_base),
            chunk=p.chunk,
            nrows=p.nrows,
            ncols=p.ncols,
            nnz=p.nnz,
        )

    @property
    def out_blocks(self) -> int:
        return cdiv(max(self.nrows, 1), LANES)


def x_table_rows(ncols: int) -> int:
    """Rows of the (S,128) x table: at least 8 so every (8,128) window
    slice stays in bounds."""
    return x_stripes(ncols)


def x_to_table(x, ncols: int):
    """(ncols,) → zero-padded (S,128) VMEM table. jit-composable."""
    S = x_table_rows(ncols)
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
