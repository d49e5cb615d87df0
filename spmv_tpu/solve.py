"""Iterative solvers on top of the device formats — the "production use"
layer the reference lacks entirely (its drivers run one SpMV and exit,
``coo.c:193-199``).

Everything here composes the formats' jit-composable ``padded_matvec``
into single fused XLA programs: the whole Krylov loop runs on-device with
one dispatch, the SpMV kernel pipelining intact.

Round 4: the same solvers compose with the distributed containers
(``dist.RowShardedSpmv`` / ``ColShardedSpmv``) through their
``_matvec_traced`` hook — the whole Krylov loop then compiles as ONE SPMD
program over the mesh (matvec collectives + GSPMD-partitioned dot
products), the production-use layer the reference lacks entirely.
"""

from __future__ import annotations

import copy
from functools import partial

import jax
import jax.numpy as jnp

from spmv_tpu.device import x_to_table, y_from_padded

__all__ = ["bicgstab", "cg", "power_iteration"]


def _operator(a):
    """``(build, leaves)``: ``build(*leaves)`` yields a traceable
    ``v -> y`` closure with the container's device arrays bound as jit
    ARGUMENTS — a closure over them would embed the plan as
    compile-payload constants, which the tunnel rejects above ~100 MB
    (DESIGN.md fact 6).  Dist containers route through their
    ``_matvec_traced`` hook; single-chip containers through
    ``padded_matvec``."""
    if not hasattr(a, "_matvec_traced") and not hasattr(a, "padded_matvec"):
        raise TypeError(
            f"solve requires a jit-composable container (padded_matvec or "
            f"_matvec_traced); {type(a).__name__} has neither — use "
            f"csr/coo/cmrs/ell/sell/hyb")
    if hasattr(a, "_matvec_traced"):  # Row/ColShardedSpmv
        leaves = tuple(a.arrays.values())

        def build(*lv):
            return lambda v: a._matvec_traced(v, lv)

        return build, leaves

    leaf_attrs = [n for n in ("dev", "dev_spill", "_perm_whi", "_perm_idx")
                  if getattr(a, n, None) is not None]
    leaves = tuple(getattr(a, n) for n in leaf_attrs)

    def build(*lv):
        b = copy.copy(a)
        for n, v in zip(leaf_attrs, lv):
            object.__setattr__(b, n, v)
        return lambda v: y_from_padded(
            b.padded_matvec(x_to_table(v, a.ncols)), a.nrows)

    return build, leaves


def cg(a, b, *, tol: float = 1e-5, maxiter: int = 1000, x0=None):
    """Conjugate gradients for SPD ``A``: returns (x, iterations, residual).

    The loop is one jitted ``lax.while_loop``; fp32 on device (use a
    smallish ``tol`` accordingly).
    """
    if a.nrows != a.ncols:
        raise ValueError("cg requires a square matrix")
    build, leaves = _operator(a)
    b = jnp.asarray(b, jnp.float32).reshape(-1)
    if b.shape[0] != a.nrows:
        raise ValueError(f"b has {b.shape[0]} entries, matrix is {a.nrows}")
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0, jnp.float32)

    @jax.jit
    def run(b, x0, *lv):
        mv = build(*lv)
        r0 = b - mv(x0)
        state = (x0, r0, r0, jnp.vdot(r0, r0), jnp.int32(0))
        tol2 = jnp.float32(tol) ** 2 * jnp.maximum(jnp.vdot(b, b), 1e-30)

        def cond(s):
            _, _, _, rs, k = s
            return jnp.logical_and(rs > tol2, k < maxiter)

        def body(s):
            x, r, p, rs, k = s
            ap = mv(p)
            alpha = rs / jnp.vdot(p, ap)
            x = x + alpha * p
            r = r - alpha * ap
            rs_new = jnp.vdot(r, r)
            p = r + (rs_new / rs) * p
            return (x, r, p, rs_new, k + 1)

        x, r, _, rs, k = jax.lax.while_loop(cond, body, state)
        return x, k, jnp.sqrt(rs)

    x, k, res = run(b, x0, *leaves)
    return x, int(k), float(res)


def bicgstab(a, b, *, tol: float = 1e-5, maxiter: int = 1000, x0=None):
    """BiCGSTAB for general (nonsymmetric) square ``A``: returns
    (x, iterations, residual).  One jitted ``lax.while_loop``; the van der
    Vorst smoothing step needs two SpMVs per iteration, both fused into
    the same device program."""
    if a.nrows != a.ncols:
        raise ValueError("bicgstab requires a square matrix")
    build, leaves = _operator(a)
    b = jnp.asarray(b, jnp.float32).reshape(-1)
    if b.shape[0] != a.nrows:
        raise ValueError(f"b has {b.shape[0]} entries, matrix is {a.nrows}")
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0, jnp.float32)
    eps = jnp.float32(1e-30)

    @jax.jit
    def run(b, x0, *lv):
        mv = build(*lv)
        r0 = b - mv(x0)
        rhat = r0  # fixed shadow residual
        state = (x0, r0, r0, jnp.vdot(rhat, r0), jnp.vdot(r0, r0),
                 jnp.int32(0))
        tol2 = jnp.float32(tol) ** 2 * jnp.maximum(jnp.vdot(b, b), 1e-30)

        def cond(s):
            *_, rs, k = s
            return jnp.logical_and(rs > tol2, k < maxiter)

        def body(s):
            x, r, p, rho, _, k = s
            v = mv(p)
            alpha = rho / (jnp.vdot(rhat, v) + eps)
            h = x + alpha * p
            s_vec = r - alpha * v
            t = mv(s_vec)
            omega = jnp.vdot(t, s_vec) / (jnp.vdot(t, t) + eps)
            x = h + omega * s_vec
            r = s_vec - omega * t
            rho_new = jnp.vdot(rhat, r)
            beta = (rho_new / (rho + eps)) * (alpha / (omega + eps))
            p = r + beta * (p - omega * v)
            return (x, r, p, rho_new, jnp.vdot(r, r), k + 1)

        x, r, _, _, rs, k = jax.lax.while_loop(cond, body, state)
        return x, k, jnp.sqrt(rs)

    x, k, res = run(b, x0, *leaves)
    return x, int(k), float(res)


def power_iteration(a, *, iters: int = 100, seed: int = 0):
    """Dominant eigenvalue estimate by fused power iteration; returns
    (eigenvalue, eigenvector)."""
    if a.nrows != a.ncols:
        raise ValueError("power_iteration requires a square matrix")
    build, leaves = _operator(a)
    v0 = jax.random.normal(jax.random.PRNGKey(seed), (a.ncols,), jnp.float32)

    @partial(jax.jit, static_argnums=1)
    def run(v, n, *lv):
        mv = build(*lv)

        def body(i, v):
            w = mv(v)
            return w * jax.lax.rsqrt(jnp.vdot(w, w) + 1e-30)
        v = jax.lax.fori_loop(0, n, body, v)
        w = mv(v)
        return jnp.vdot(v, w), v

    lam, v = run(v0, iters, *leaves)
    return float(lam), v
