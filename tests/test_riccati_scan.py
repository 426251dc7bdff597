"""Parallel associative-scan Riccati vs the sequential reference sweep.

Both must produce identical gains/value functions on random LQ problems with
feasibility gaps (the FDDP backward subproblem)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ffmpc_tpu.solver.riccati_scan import parallel_riccati


def _sequential(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next, LxT, LxxT):
    """Plain sequential sweep with gap deflection folded into V' (no reg)."""
    N, nx = Fx.shape[0], Fx.shape[-1]
    nu = Fu.shape[-1]
    Vx = LxT.copy()
    Vxx = LxxT.copy()
    Ks = np.zeros((N, nu, nx))
    ks = np.zeros((N, nu))
    Vxs = np.zeros((N + 1, nx))
    Vxxs = np.zeros((N + 1, nx, nx))
    Vxs[N] = Vx
    Vxxs[N] = Vxx
    for t in range(N - 1, -1, -1):
        # deflect by the incoming gap of step t (same convention as
        # parallel_riccati: V' used at step t is V[t+1] + Vxx[t+1] fs[t+1])
        Vx_d = Vx + Vxx @ fs_next[t]
        Qx = Lx[t] + Fx[t].T @ Vx_d
        Qu = Lu[t] + Fu[t].T @ Vx_d
        Qxx = Lxx[t] + Fx[t].T @ Vxx @ Fx[t]
        Qxu = Lxu[t] + Fx[t].T @ Vxx @ Fu[t]
        Quu = Luu[t] + Fu[t].T @ Vxx @ Fu[t]
        K = np.linalg.solve(Quu, Qxu.T)
        k = np.linalg.solve(Quu, Qu)
        Vx = Qx - Qxu @ k
        Vxx = Qxx - Qxu @ K
        Vxx = 0.5 * (Vxx + Vxx.T)
        Ks[t] = K
        ks[t] = k
        Vxs[t] = Vx
        Vxxs[t] = Vxx
    return Ks, ks, Vxs, Vxxs


@pytest.mark.parametrize("N,nx,nu,seed", [
    pytest.param(8, 4, 2, 0, marks=pytest.mark.quick),
    (24, 6, 3, 1), (40, 14, 7, 2)])
def test_parallel_matches_sequential(N, nx, nu, seed):
    rng = np.random.default_rng(seed)
    Fx = np.eye(nx) + 0.05 * rng.normal(size=(N, nx, nx))
    Fu = 0.2 * rng.normal(size=(N, nx, nu))
    Lx = rng.normal(size=(N, nx))
    Lu = rng.normal(size=(N, nu))
    Q_ = rng.normal(size=(N, nx, nx))
    Lxx = np.einsum("tij,tkj->tik", Q_, Q_) * 0.1 + 0.5 * np.eye(nx)
    Lxu = 0.05 * rng.normal(size=(N, nx, nu))
    R_ = rng.normal(size=(N, nu, nu))
    Luu = np.einsum("tij,tkj->tik", R_, R_) * 0.1 + 0.5 * np.eye(nu)
    fs_next = 0.1 * rng.normal(size=(N, nx))
    LxT = rng.normal(size=nx)
    QT_ = rng.normal(size=(nx, nx))
    LxxT = QT_ @ QT_.T * 0.1 + np.eye(nx)

    K_s, k_s, Vx_s, Vxx_s = _sequential(
        Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next, LxT, LxxT)
    K_p, k_p, Vx_p, Vxx_p = parallel_riccati(
        *(jnp.asarray(a) for a in (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next,
                                   LxT, LxxT)))
    assert np.allclose(np.asarray(Vxx_p), Vxx_s, atol=1e-8), \
        np.abs(np.asarray(Vxx_p) - Vxx_s).max()
    assert np.allclose(np.asarray(Vx_p), Vx_s, atol=1e-8), \
        np.abs(np.asarray(Vx_p) - Vx_s).max()
    assert np.allclose(np.asarray(K_p), K_s, atol=1e-8)
    assert np.allclose(np.asarray(k_p), k_s, atol=1e-8)
