"""High-level API: load → convert → spmv.

The reference exposes five standalone executables with hard-coded
filenames and no flags (``coo.c:18-19``); here the equivalent surface is a
library call plus the ``spmv-tpu`` CLI (``spmv_tpu.cli``).
"""

from __future__ import annotations

import numpy as np

from spmv_tpu.formats.bsr import BSRMatrix
from spmv_tpu.formats.cmrs import CMRSMatrix
from spmv_tpu.formats.coo import COOMatrix
from spmv_tpu.formats.csr import CSRMatrix
from spmv_tpu.formats.ell import EllMatrix
from spmv_tpu.formats.hyb import HybMatrix
from spmv_tpu.formats.sell import SellMatrix

__all__ = ["FORMATS", "from_coo", "load", "spmv", "spmm"]

FORMATS = {
    "coo": COOMatrix,
    "csr": CSRMatrix,
    "ell": EllMatrix,
    "sell": SellMatrix,
    "sell_c_sigma": SellMatrix,
    "cmrs": CMRSMatrix,
    "hyb": HybMatrix,  # framework extension: ELL panel + segmented spill
    "bsr": BSRMatrix,  # framework extension: 128x128 block-dense SpMM
}


def from_coo(format: str, nrows: int, ncols: int, rows, cols, vals, **kwargs):
    """Convert COO triplets to the named format's device representation."""
    try:
        cls = FORMATS[format.lower()]
    except KeyError:
        raise ValueError(f"unknown format {format!r}; choose from {sorted(FORMATS)}")
    return cls.from_coo(nrows, ncols, np.asarray(rows), np.asarray(cols),
                        np.asarray(vals), **kwargs)


def load(path: str, format: str = "csr", *, synth: dict | None = None, **kwargs):
    """Read a MatrixMarket file (or synthesize, if it is a git-LFS pointer —
    as the reference's bundled matrices are, or missing) and convert.
    ``synth`` kwargs go to :func:`spmv_tpu.synth.synthetic_cant`; the rest
    to the format's ``from_coo``.

    Matrices beyond the resident-vector VMEM budget (~3M rows or ~3M
    cols) automatically route to the slab×panel-tiled single-chip container
    (:class:`spmv_tpu.big.TiledSpmv`) — the reference's only size limit
    was device RAM (``coo.c:116-120``), so is ours."""
    from spmv_tpu.big import TiledSpmv, fits_single_kernel
    from spmv_tpu.io.mmio import read_path_or_synthesize

    info, rows, cols, vals = read_path_or_synthesize(path, **(synth or {}))
    if not fits_single_kernel(info.nrows, info.ncols):
        return TiledSpmv(format, info.nrows, info.ncols, rows, cols, vals,
                         **kwargs)
    return from_coo(format, info.nrows, info.ncols, rows, cols, vals, **kwargs)


def spmv(a, x):
    """y = A @ x for any format container."""
    return a.matvec(x)


def spmm(a, X):
    """Y = A @ X for X of shape (ncols, R).

    BSR computes this as one batched MXU matmul (the right tool for
    R ≳ 32); every other format runs one SpMV per column.  A fused
    multi-RHS variant of the Pallas engines was measured SLOWER per
    vector than this loop on the bench TPU (compute scales with R while
    the single-vector kernels already sit at the compute/DMA balance
    point), so the loop is the honest implementation.
    """
    import jax.numpy as jnp
    import numpy as np

    if hasattr(a, "matmat"):
        return a.matmat(X)
    if getattr(a, "x2", False):
        # double-single containers take fp64 x and return fp64 y — an
        # f32 cast here would zero every residual (xl == 0) and silently
        # collapse the documented ~window·2⁻³⁸ accuracy to f32 grade
        X = np.asarray(X, np.float64)
        if X.ndim != 2 or X.shape[0] != a.ncols:
            raise ValueError(f"X must be ({a.ncols}, R), got {X.shape}")
        return np.stack([np.asarray(a.matvec(X[:, j]))
                         for j in range(X.shape[1])], axis=1)
    X = jnp.asarray(X, jnp.float32)
    if X.ndim != 2 or X.shape[0] != a.ncols:
        raise ValueError(f"X must be ({a.ncols}, R), got {X.shape}")
    return jnp.stack([a.matvec(X[:, j]) for j in range(X.shape[1])], axis=1)
