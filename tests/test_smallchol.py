"""Unrolled small-Cholesky vs jnp.linalg reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ffmpc_tpu.core.smallchol import chol_factor, chol_solve, spd_solve

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("n", [1, 3, 7, 14, 21])
def test_factor_and_solve(n):
    rng = np.random.default_rng(n)
    B = 5
    X = rng.normal(size=(B, n, n))
    A = X @ np.swapaxes(X, -1, -2) + n * np.eye(n)
    b = rng.normal(size=(B, n))
    Bm = rng.normal(size=(B, n, 3))

    L = chol_factor(jnp.asarray(A))
    L_ref = np.linalg.cholesky(A)
    assert np.allclose(np.asarray(L), L_ref, atol=1e-10)

    x = chol_solve(L, jnp.asarray(b))
    x_ref = np.linalg.solve(A, b[..., None])[..., 0]
    assert np.allclose(np.asarray(x), x_ref, atol=1e-8)

    Xm = chol_solve(L, jnp.asarray(Bm))
    assert np.allclose(np.asarray(Xm), np.linalg.solve(A, Bm), atol=1e-8)

    x2 = spd_solve(jnp.asarray(A), jnp.asarray(b))
    assert np.allclose(np.asarray(x2), x_ref, atol=1e-8)


def test_jit_and_grad():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(7, 7))
    A = X @ X.T + 7 * np.eye(7)
    b = rng.normal(size=7)

    f = jax.jit(lambda A_, b_: jnp.sum(spd_solve(A_, b_)))
    v = f(jnp.asarray(A), jnp.asarray(b))
    assert np.isfinite(float(v))
    g = jax.grad(lambda b_: jnp.sum(spd_solve(jnp.asarray(A), b_)))(jnp.asarray(b))
    g_ref = np.linalg.solve(A, np.ones(7))  # d(sum A^-1 b)/db = A^-T 1
    assert np.allclose(np.asarray(g), g_ref, atol=1e-8)
