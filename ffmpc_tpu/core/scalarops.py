"""Scalar-channel algebra with Python-level partial evaluation.

The dynamics/cost chain of one OCP knot is ~5k scalar multiply-adds over
7-DoF quantities.  The vectorized formulation (arrays shaped (..., 3) /
(..., 3, 3) / (..., 7, 7)) maps those trailing small dims onto TPU *lanes* —
3 of 128 lanes used — so the VPU runs at ~2-5% utilization.  This module
supports the opposite layout: every logical scalar is its own value, so under
``vmap`` each op becomes a full-lane (B,)-elementwise op.

Scalars are either Python floats (compile-time constants) or traced JAX
values.  The helpers partially evaluate float-float ops and fold
multiplications by 0/±1 and additions of 0 at trace time, so multiplying by
a constant rotation matrix (mostly zeros and ±1/±s2 entries) or evaluating
RNEA at qdd == 0 emits only the surviving ops — the scalar equivalent of the
symbolic simplification code generators like Pinocchio's CppADCodeGen
pipeline perform.

Small matrices/vectors are plain Python lists (rows) of scalars; all helpers
work on those.
"""

from __future__ import annotations

import jax.numpy as jnp


def is_const(a) -> bool:
    return isinstance(a, (int, float))


def sneg(a):
    if is_const(a):
        return -float(a)
    return -a


def smul(a, b):
    if is_const(a) and is_const(b):
        return float(a) * float(b)
    if is_const(b):
        a, b = b, a
    if is_const(a):
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
        if a == -1.0:
            return sneg(b)
        return a * b
    return a * b


def sadd(*terms):
    """Sum of scalars; folds float constants, drops exact zeros."""
    const = 0.0
    out = None
    for t in terms:
        if is_const(t):
            const += float(t)
        elif out is None:
            out = t
        else:
            out = out + t
    if out is None:
        return const
    if const != 0.0:
        out = out + const
    return out


def ssub(a, b):
    return sadd(a, sneg(b))


def sdot(u, v):
    return sadd(*[smul(a, b) for a, b in zip(u, v)])


def cross(u, v):
    return [
        ssub(smul(u[1], v[2]), smul(u[2], v[1])),
        ssub(smul(u[2], v[0]), smul(u[0], v[2])),
        ssub(smul(u[0], v[1]), smul(u[1], v[0])),
    ]


def vadd(u, v):
    return [sadd(a, b) for a, b in zip(u, v)]


def vsub(u, v):
    return [ssub(a, b) for a, b in zip(u, v)]


def vscale(s, u):
    return [smul(s, a) for a in u]


def mat_T(M):
    return [[M[j][i] for j in range(len(M))] for i in range(len(M[0]))]


def mat_vec(M, v):
    return [sdot(row, v) for row in M]


def mat_mul(A, B):
    BT = mat_T(B)
    return [[sdot(row, col) for col in BT] for row in A]


def from_np(a):
    """numpy array -> nested lists of Python floats (compile-time constants)."""
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    if a.ndim == 0:
        return float(a)
    return [from_np(x) for x in a]


def unstack(x, n: int):
    """Traced vector (n,) -> list of n scalar channels."""
    return [x[i] for i in range(n)]


def chol(M, n: int):
    """Scalar-unrolled Cholesky of an SPD n x n list-matrix.

    Returns (L lower-triangular list-matrix, inv_diag list) — the reciprocal
    diagonal is precomputed once so the triangular solves use multiplies.
    """
    L = [[0.0] * n for _ in range(n)]
    inv = [None] * n
    for j in range(n):
        d = sadd(M[j][j], *[sneg(smul(L[j][k], L[j][k])) for k in range(j)])
        Ljj = jnp.sqrt(d)
        L[j][j] = Ljj
        inv[j] = 1.0 / Ljj
        for i in range(j + 1, n):
            s = sadd(M[i][j], *[sneg(smul(L[i][k], L[j][k])) for k in range(j)])
            L[i][j] = smul(s, inv[j])
    return L, inv


def chol_solve(L, inv, b):
    """Solve (L L^T) x = b for one list-vector b."""
    n = len(inv)
    y = [None] * n
    for i in range(n):
        y[i] = smul(
            sadd(b[i], *[sneg(smul(L[i][k], y[k])) for k in range(i)]), inv[i])
    x = [None] * n
    for i in reversed(range(n)):
        x[i] = smul(
            sadd(y[i], *[sneg(smul(L[k][i], x[k])) for k in range(i + 1, n)]),
            inv[i])
    return x
