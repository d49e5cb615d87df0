"""ELL — ELLPACK (global padded row length K).

Reference: ``/root/reference/ell.c`` + ``kernels/Ell.cl`` (two-pass file
conversion to row-major (rows, K) arrays, one 16-lane workgroup per row with
a shared-memory tree reduction).  TPU-native: the padded layout is engine
1's stripe-pure mini-panels in natural row order (SELL-C-σ is the same
layout after a σ-sort) and the reduction is a dense ``sum(axis=0)``; no
shared memory, no barriers.

Reference bugs fixed by construction (SURVEY.md §2.2):
* padded value slots were uninitialized memory (``ell.c:147-151``) — here
  padding is explicit zeros;
* the final row's length was never flushed into K (``ell.c:89-100``) — here
  K comes from a bincount over all rows.

Also reproduces the reference's row-length stats output (``ell.c:103-104``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from spmv_tpu.device import DevPanel, x_to_table, y_from_padded
from spmv_tpu.formats.base import DEFAULT_CHUNK, build_panel_plan
from spmv_tpu.kernels.engines import panel_spmv

__all__ = ["EllMatrix"]


@dataclass
class EllMatrix:
    nrows: int
    ncols: int
    nnz: int
    K: int  # max row length (the ELL width)
    row_length_stats: dict  # average / shortest / longest (ell.c:103-104)
    dev: DevPanel = field(repr=False)
    plan: object = field(repr=False, default=None)  # PanelPlan (host arrays)

    @classmethod
    def from_coo(
        cls,
        nrows: int,
        ncols: int,
        rows: np.ndarray,
        cols: np.ndarray,
        vals: np.ndarray,
        *,
        chunk: int = DEFAULT_CHUNK,
    ) -> "EllMatrix":
        rows = np.asarray(rows, dtype=np.int64)
        order = np.lexsort((cols, rows))
        rows_s, cols_s, vals_s = rows[order], np.asarray(cols)[order], np.asarray(vals)[order]
        lengths = np.bincount(rows_s, minlength=nrows) if rows.size else np.zeros(nrows, np.int64)
        K = int(lengths.max()) if nrows else 0
        stats = {
            "average": float(lengths.mean()) if nrows else 0.0,
            "shortest": int(lengths.min()) if nrows else 0,
            "longest": K,
        }
        plan = build_panel_plan(rows_s, cols_s, vals_s, nrows, ncols, chunk=chunk)
        return cls(
            nrows=nrows, ncols=ncols, nnz=rows.size, K=K,
            row_length_stats=stats, dev=DevPanel.from_plan(plan), plan=plan,
        )

    def padded_matvec(self, x2d):
        return panel_spmv(self.dev, x2d)

    def matvec(self, x):
        x2d = x_to_table(x, self.ncols)
        return y_from_padded(self.padded_matvec(x2d), self.nrows)

    __matmul__ = matvec
