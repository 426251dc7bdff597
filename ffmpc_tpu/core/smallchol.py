"""Unrolled Cholesky factorization/solve for small SPD systems.

``jnp.linalg.cholesky`` / ``cho_solve`` / ``linalg.solve`` are opaque library
calls on TPU: they break XLA fusion and dominate dispatch latency when the
matrices are tiny (7x7 joint-space systems, nc<=3 contact Schur complements)
but the batch is large.  These unrolled versions emit plain elementwise ops
(mul/sub/div/sqrt) over the batch dimensions, which XLA fuses into the
surrounding dynamics chain — no kernel-launch barrier at all.

All functions broadcast over arbitrary leading batch dims; n is static.
"""

from __future__ import annotations

import jax.numpy as jnp


def chol_factor(A):
    """Lower-triangular Cholesky of SPD A (..., n, n), unrolled at trace time.

    Returns L with A = L L^T.  n is read from the static shape.
    """
    n = A.shape[-1]
    # build L column by column as a list of scalar-slice rows
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    rows = []
    zero = jnp.zeros_like(A[..., 0, 0])
    for i in range(n):
        rows.append(jnp.stack(
            [L[i][j] if j <= i else zero for j in range(n)], axis=-1))
    return jnp.stack(rows, axis=-2)


def chol_solve(L, b):
    """Solve A x = b given L = chol_factor(A).

    b: (..., n) or (..., n, m); returns the matching shape.
    """
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    # forward: L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - L[..., i, k, None] * y[k]
        y[i] = s / L[..., i, i, None]
    # backward: L^T x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i, None] * x[k]
        x[i] = s / L[..., i, i, None]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


def spd_solve(A, b):
    """x = A^{-1} b for small SPD A via the unrolled factorization."""
    return chol_solve(chol_factor(A), b)
