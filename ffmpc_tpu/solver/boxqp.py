"""Projected-Newton box-QP used by BoxFDDP's backward pass.

Equivalent of Crocoddyl's BoxQP (consumed by SolverBoxFDDP::computeGains;
reference solver selection: crocoddyl_classical.py:442-445).  Solves

    min_x  0.5 x^T Q x + q^T x   s.t.  lb <= x <= ub

with an active-set projected-Newton iteration.  Fixed iteration count and
masked linear solves keep it jit/vmap-friendly (no data-dependent shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.smallchol import spd_solve


class BoxQPResult(NamedTuple):
    x: jnp.ndarray       # (n,) solution
    free: jnp.ndarray    # (n,) bool free-dimension mask at the solution


def _masked_solve(Q, rhs, free, reg):
    """Solve Q_ff y_f = rhs_f on the free subspace; clamped dims get 0.

    Masking trick: clamped rows/cols are replaced by identity so one dense
    (n, n) solve serves any active set — no dynamic shapes.
    rhs may be (n,) or (n, m).
    """
    n = Q.shape[-1]
    fm = free.astype(Q.dtype)
    mask2 = fm[:, None] * fm[None, :]
    Qm = Q * mask2 + jnp.diag(1.0 - fm) + reg * jnp.eye(n, dtype=Q.dtype)
    # Qm is SPD (PSD Q on the free block, identity on the clamped block)
    if rhs.ndim == 1:
        return spd_solve(Qm, rhs * fm)
    return spd_solve(Qm, rhs * fm[:, None])


def boxqp(Q, q, lb, ub, x0, *, iters: int = 8, reg: float = 1e-9) -> BoxQPResult:
    """Fixed-iteration projected Newton with a 4-point step-size polish."""
    x = jnp.clip(x0, lb, ub)
    eps = jnp.asarray(1e-9, Q.dtype)

    def obj(xx):
        return 0.5 * xx @ (Q @ xx) + q @ xx

    def body(_, x):
        g = q + Q @ x
        lo = (x <= lb + eps) & (g > 0)
        hi = (x >= ub - eps) & (g < 0)
        free = ~(lo | hi)
        dx = -_masked_solve(Q, g, free, reg)
        # monotone step polish: pick the best of a few scaled candidates
        cands = jnp.stack([x, jnp.clip(x + dx, lb, ub),
                           jnp.clip(x + 0.5 * dx, lb, ub),
                           jnp.clip(x + 0.25 * dx, lb, ub)])
        vals = jax.vmap(obj)(cands)
        return cands[jnp.argmin(vals)]

    x = jax.lax.fori_loop(0, iters, body, x)
    g = q + Q @ x
    lo = (x <= lb + eps) & (g > 0)
    hi = (x >= ub - eps) & (g < 0)
    return BoxQPResult(x=x, free=~(lo | hi))
