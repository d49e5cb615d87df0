"""Beyond-VMEM single-chip SpMV: slab × panel tiling.

The resident-vector design (whole x table + whole y in VMEM,
``device._check_fits``) caps one kernel at ~1.5M rows+cols.  The
reference's only limit was device RAM (``coo.c:116-120`` just mallocs);
this module restores that capability on one chip: the matrix is tiled
into (row slab × column panel) sub-matrices, each held as a regular
single-chip format container with its own tight plan and kernel
geometry — a slab's nonempty tiles run as a statically-unrolled jitted
sum per slab.  A banded matrix's off-band tiles never exist: no plan
arrays, no dispatches, no DMA.  (An earlier stacked-uniform design
padded every tile to the largest tile's plan — 5.7× slots on a 4M-row
band matrix; per-tile containers keep each plan as tight as a
standalone matrix.)  Only one panel's x table and one slab's y are
VMEM-resident at a time: peak VMEM = streams + O(cps + rps) instead of
O(ncols + nrows).

Extra HBM traffic vs the resident design: the slab's nonempty x panels
re-stream once per slab, plus the per-panel y accumulate and one y
write per slab — all counted exactly in ``stream_bytes`` /
``aux_traffic_bytes`` so the bench's roofline is honest.

SELL works tile-locally: each tile σ-sorts its own rows and its
unpermute epilogue restores natural order inside ``padded_matvec``, so
summing tiles across a slab's panels stays correct.
"""

from __future__ import annotations

import numpy as np

from spmv_tpu.device import x_table_rows
from spmv_tpu.formats.base import LANES, cdiv, round_up

__all__ = ["TiledSpmv", "fits_single_kernel"]

# keep each sub-kernel's resident vectors comfortably inside the budget
_TILE_VEC_BYTES = 4 * 1024 * 1024

# container device-array attributes that must ride as jit ARGUMENTS
# (same set as bench.runner._chained_loop; a closure would embed them as
# compile-payload constants — the tunnel rejects >~100 MB payloads)
_LEAF_ATTRS = ("dev", "dev_spill", "_perm_whi", "_perm_idx")


def fits_single_kernel(nrows: int, ncols: int) -> bool:
    from spmv_tpu.device import _VMEM_VECTOR_BUDGET, _vector_bytes

    return _vector_bytes(nrows, ncols) <= _VMEM_VECTOR_BUDGET


def _leaves(cont):
    attrs = [n for n in _LEAF_ATTRS if getattr(cont, n, None) is not None]
    return attrs, [getattr(cont, n) for n in attrs]


def _rebound(cont, attrs, vals):
    import copy

    b = copy.copy(cont)
    for n, v in zip(attrs, vals):
        object.__setattr__(b, n, v)
    return b


class TiledSpmv:
    """y = A·x for matrices beyond the whole-x/whole-y VMEM budget.

    Supports the plan-based formats (csr/coo/cmrs/ell/sell/hyb; BSR's
    block-dense fill pricing doesn't tile usefully — use csr/hyb)."""

    def __init__(self, format: str, nrows: int, ncols: int, rows, cols,
                 vals, *, slab_rows: int | None = None,
                 panel_cols: int | None = None, **fmt_kwargs):
        from spmv_tpu.api import FORMATS
        from spmv_tpu.formats.base import panel_pack_for, seg_pack_for

        format = format.lower()
        if format == "bsr":
            raise NotImplementedError(
                "tiled BSR not supported; use csr/coo/cmrs/ell/sell/hyb")
        self.format = format
        self.is_hyb = format == "hyb"
        cls = FORMATS[format]
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)

        cap = _TILE_VEC_BYTES // 4  # f32 slots for one slab + one panel
        rps = slab_rows or min(round_up(max(cdiv(nrows, 1), LANES), LANES),
                               round_up(cap // 2, LANES))
        cps = panel_cols or min(round_up(max(ncols, LANES), LANES),
                                round_up(cap // 2, LANES))
        rps = round_up(min(rps, round_up(nrows, LANES)), LANES)
        cps = round_up(min(cps, round_up(ncols, LANES)), LANES)
        DR = cdiv(nrows, rps)
        DC = cdiv(ncols, cps)
        self.rps, self.cps, self.DR, self.DC = rps, cps, DR, DC

        if format in ("csr", "coo", "cmrs") and "pack" not in fmt_kwargs:
            fmt_kwargs = dict(fmt_kwargs,
                              pack=seg_pack_for(rows, cols, nrows, ncols))
        elif format in ("ell", "sell") and "pack" not in fmt_kwargs:
            fmt_kwargs = dict(fmt_kwargs,
                              pack=panel_pack_for(rows, cols, nrows, ncols))
        elif self.is_hyb:
            fmt_kwargs = dict(fmt_kwargs)
            fmt_kwargs.setdefault("pack",
                                  seg_pack_for(rows, cols, nrows, ncols))
            fmt_kwargs.setdefault("panel_pack",
                                  panel_pack_for(rows, cols, nrows, ncols))

        # ---- nonempty-tile bucketing --------------------------------
        tile_of = (rows // rps) * DC + (cols // cps)
        per_tile = np.bincount(tile_of, minlength=DR * DC).reshape(DR, DC)
        order = np.argsort(tile_of, kind="stable")
        rows, cols, vals = rows[order], cols[order], vals[order]
        bounds = np.concatenate([[0], np.cumsum(per_tile.reshape(-1))])

        # per slab: [(panel j, container)] for nonempty tiles only; an
        # all-empty matrix keeps one empty tile so shapes stay real
        self.tiles: list[list] = []
        nvalid = np.zeros(DR, np.int32)
        for d in range(DR):
            slab = []
            for j in range(DC):
                t = d * DC + j
                if per_tile[d, j] == 0 and not (
                        d == 0 and j == 0 and per_tile.sum() == 0):
                    continue
                lo, hi = bounds[t], bounds[t + 1]
                slab.append((j, cls.from_coo(
                    rps, cps, rows[lo:hi] - d * rps, cols[lo:hi] - j * cps,
                    vals[lo:hi], **fmt_kwargs)))
            nvalid[d] = len(slab)
            self.tiles.append(slab)
        self.nvalid = nvalid
        self.n_tiles = int(nvalid.sum())
        self._nrows, self._ncols = nrows, ncols
        self.nnz = rows.size
        self.S_local = x_table_rows(cps)
        self._slab_fns = [self._build_slab(d) for d in range(DR)]

    def _slab_parts(self, d, conts, x_panels):
        """This slab's y2d: Σ over its tiles (statically unrolled)."""
        import jax
        import jax.numpy as jnp

        nb = self.rps // LANES
        y = jnp.zeros((nb, LANES), jnp.float32)
        for (j, _), b in zip(self.tiles[d], conts):
            x2d = jax.lax.dynamic_index_in_dim(x_panels, j, axis=0,
                                               keepdims=False)
            y = y + b.padded_matvec(x2d)[:nb]
        return y

    def _build_slab(self, d):
        import jax

        slab = self.tiles[d]
        attrs = [_leaves(c)[0] for _, c in slab]

        @jax.jit
        def slab_fn(x_panels, *flat):
            conts, k = [], 0
            for (_, c), a in zip(slab, attrs):
                conts.append(_rebound(c, a, flat[k:k + len(a)]))
                k += len(a)
            return self._slab_parts(d, conts, x_panels)

        flat = [v for _, c in slab for v in _leaves(c)[1]]
        return lambda x_panels: slab_fn(x_panels, *flat)

    def x_table(self, x) -> "jnp.ndarray":
        """(DC, S_local, 128) HBM-resident panel table of x."""
        import jax.numpy as jnp

        xf = np.asarray(x, dtype=np.float32).reshape(-1)
        if xf.shape[0] != self._ncols:
            raise ValueError(f"x has {xf.shape[0]} entries, matrix has "
                             f"{self._ncols} columns")
        DC, cps, S_local = self.DC, self.cps, self.S_local
        xp = np.zeros((DC, S_local * LANES), dtype=np.float32)
        pad = np.zeros(DC * cps, dtype=np.float32)
        pad[: xf.size] = xf
        xp[:, :cps] = pad.reshape(DC, cps)
        return jnp.asarray(xp.reshape(DC, S_local, LANES))

    def matvec(self, x) -> np.ndarray:
        x_panels = self.x_table(x)
        outs = [np.asarray(fn(x_panels)) for fn in self._slab_fns]
        y = np.concatenate(outs, axis=0).reshape(-1)
        return y[: self._nrows]

    __matmul__ = matvec

    def chained_loop(self, iters: int):
        """`iters` chained full matvecs inside ONE jit — the slope-timing
        hook ``bench.runner._chained_loop`` delegates to (same protocol:
        device arrays as jit ARGUMENTS, ~1 KB probe-row dependency).

        The FULL (DR·nb, 128) y rides as a loop carry.  Round 3 fed only
        ``y[0:1]`` of each slab into the probe; the per-slab add chains
        are plain XLA elementwise ops, so XLA narrowed them to row 0 and
        the billed per-tile part reads + per-slab y writes (~11% of the
        4.2M-row traffic) never happened in the timed loop — the source
        of the recorded *102.6%* roofline (a kernel can't beat the
        ceiling; the bench was under-doing, not over-performing).  With
        y as a carry the body must materialize every row each iteration,
        so the timed loop streams exactly what ``matvec`` does."""
        import jax
        import jax.numpy as jnp

        DR = self.DR
        nb = self.rps // LANES
        attrs = [[_leaves(c)[0] for _, c in self.tiles[d]]
                 for d in range(DR)]

        @jax.jit
        def loop(x_panels, *flat):
            rebound, k = [], 0
            for d in range(DR):
                conts = []
                for (_, c), a in zip(self.tiles[d], attrs[d]):
                    conts.append(_rebound(c, a, flat[k:k + len(a)]))
                    k += len(a)
                rebound.append(conts)

            y0 = jnp.zeros((DR * nb, LANES), jnp.float32)

            def body(i, state):
                xp, y_prev = state
                ys = [self._slab_parts(d, rebound[d], xp)
                      for d in range(DR)]
                y_full = jnp.concatenate(ys, axis=0)  # (DR·nb, 128)
                # the probe must feed back into EVERY panel: updating only
                # panel 0 left panels 1..DC-1 loop-invariant, and XLA
                # hoisted those tiles' entire kernels out of the loop —
                # the recorded big row then measured a fraction of the
                # work (billed 848 GB/s > the 819 GB/s part spec, the
                # giveaway).  ~DC·512 B of extra traffic per iteration.
                # y_prev's row 0 joins so the y carry is live every
                # iteration.
                probe = y_full[0:1, :LANES] + y_prev[0:1, :LANES] * 1e-38
                probe_rows = xp[:, 0:1, :] + probe[None] * 1e-38
                return (jax.lax.dynamic_update_slice(
                    xp, probe_rows, (0, 0, 0)), y_full)

            # both carries returned: the y write is part of the timed work
            return jax.lax.fori_loop(0, iters, body, (x_panels, y0))

        flat = [v for d in range(DR) for _, c in self.tiles[d]
                for v in _leaves(c)[1]]
        return lambda xp: loop(xp, *flat)

    # ---- exact traffic accounting (bench.runner.traffic_model hooks) --

    def _conts(self):
        return [c for slab in self.tiles for _, c in slab]

    @property
    def element_slots(self) -> int:
        from spmv_tpu.bench.runner import traffic_model

        return sum(traffic_model(c)[0] for c in self._conts())

    @property
    def stream_bytes(self) -> int:
        from spmv_tpu.bench.runner import traffic_model

        return int(sum(traffic_model(c)[1] for c in self._conts()))

    @property
    def aux_traffic_bytes(self) -> int:
        """The tiling's own extra vector traffic on top of each tile's
        exact stream: one x-panel read per visited tile, one tile-part
        read per visited tile, one y write per slab.  XLA fuses each
        slab's ``y + p₀ + p₁ + …`` chain into a single pass, so billing
        a 3-pass RMW per tile (read y, read part, write y — the round-3
        original) overcounted ~150 MB on the 4.2M bench row and printed
        an impossible 847 GB/s effective (> the 819 GB/s part spec).
        Each tile's kernel-internal aux traffic is already in
        ``stream_bytes`` via its own traffic model."""
        nb = self.rps // LANES
        return (self.n_tiles * self.S_local * LANES * 4
                + self.n_tiles * nb * LANES * 4
                + self.DR * nb * LANES * 4)

    @property
    def nrows(self) -> int:
        return self._nrows

    @property
    def ncols(self) -> int:
        return self._ncols
