"""FDDP/BoxFDDP correctness: analytic LQR cross-check, convergence on the
Panda free-space problem, box-constraint satisfaction, batched solves."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ffmpc_tpu.core import make_panda_model, KEYFRAMES, gravity_torque
from ffmpc_tpu.ocp.weights import OCPWeights
from ffmpc_tpu.ocp.action import make_classical_knot, KnotModel, KnotDeriv
from ffmpc_tpu.ocp.problem import build_problem_refs
from ffmpc_tpu.solver.fddp import solve, FDDPSettings
from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj


# ---------------------------------------------------------------------------
# synthetic LQR knot (analytic oracle for the Riccati machinery)
# ---------------------------------------------------------------------------

def _lqr_knot(A, B, Q, R, QT, u_lb=(-1e9,) * 2, u_ub=(1e9,) * 2):
    A, B, Q, R, QT = map(jnp.asarray, (A, B, Q, R, QT))
    nx, nu = B.shape

    def calc(ref, x, u):
        return A @ x + B @ u, 0.5 * (x @ Q @ x + u @ R @ u)

    def diff(ref, x, u):
        return KnotDeriv(
            xnext=A @ x + B @ u,
            cost=0.5 * (x @ Q @ x + u @ R @ u),
            Fx=A, Fu=B,
            Lx=Q @ x, Lu=R @ u,
            Lxx=Q, Lxu=jnp.zeros((nx, nu), x.dtype), Luu=R,
        )

    def term_calc(ref, x):
        return 0.5 * x @ QT @ x

    def term_diff(ref, x):
        return 0.5 * x @ QT @ x, QT @ x, QT

    return KnotModel(calc, diff, term_calc, term_diff, nx, nu, u_lb, u_ub)


def _lqr_analytic(A, B, Q, R, QT, x0, N):
    """Discrete-time finite-horizon LQR via backward Riccati (numpy oracle)."""
    P = QT.copy()
    Ks = []
    for _ in range(N):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ (A - B @ K)
        Ks.append(K)
    Ks = Ks[::-1]
    xs, us = [x0], []
    x = x0
    for t in range(N):
        u = -Ks[t] @ x
        us.append(u)
        x = A @ x + B @ u
        xs.append(x)
    return np.array(xs), np.array(us)


@pytest.fixture(scope="module")
def lqr_problem():
    rng = np.random.default_rng(0)
    nx, nu, N = 4, 2, 12
    A = np.eye(nx) + 0.1 * rng.normal(size=(nx, nx)) / np.sqrt(nx)
    B = 0.3 * rng.normal(size=(nx, nu))
    Q = np.eye(nx) * 0.5
    R = np.eye(nu) * 0.2
    QT = np.eye(nx) * 5.0
    x0 = rng.normal(size=nx)
    return A, B, Q, R, QT, x0, N


def _solve_lqr(lqr_problem, use_box, u_lim=1e9, max_iters=20):
    A, B, Q, R, QT, x0, N = lqr_problem
    knot = _lqr_knot(A, B, Q, R, QT, u_lb=(-u_lim,) * 2, u_ub=(u_lim,) * 2)
    refs_run = jnp.zeros((N, 1))  # unused by the LQR knot
    ref_T = jnp.zeros((1,))
    x0j = jnp.asarray(x0)
    xs0 = jnp.tile(x0j, (N + 1, 1))
    us0 = jnp.zeros((N, 2))
    st = FDDPSettings(max_iters=max_iters, use_box=use_box)
    return solve(knot, refs_run, ref_T, x0j, xs0, us0, st)


@pytest.mark.quick
def test_fddp_matches_analytic_lqr(lqr_problem):
    A, B, Q, R, QT, x0, N = lqr_problem
    xs_ref, us_ref = _lqr_analytic(A, B, Q, R, QT, x0, N)
    res = _solve_lqr(lqr_problem, use_box=False)
    assert bool(res.feasible)
    assert np.allclose(np.asarray(res.us), us_ref, atol=1e-6), (
        np.abs(np.asarray(res.us) - us_ref).max())
    assert np.allclose(np.asarray(res.xs), xs_ref, atol=1e-6)


@pytest.mark.quick
def test_boxfddp_matches_analytic_lqr_inactive_bounds(lqr_problem):
    res = _solve_lqr(lqr_problem, use_box=True, u_lim=1e3)
    A, B, Q, R, QT, x0, N = lqr_problem
    _, us_ref = _lqr_analytic(A, B, Q, R, QT, x0, N)
    assert np.allclose(np.asarray(res.us), us_ref, atol=1e-5)


@pytest.mark.quick
def test_boxfddp_respects_bounds(lqr_problem):
    u_lim = 0.3
    res = _solve_lqr(lqr_problem, use_box=True, u_lim=u_lim, max_iters=40)
    us = np.asarray(res.us)
    assert np.all(np.abs(us) <= u_lim + 1e-9)
    # clipped problem must cost no more than naive clamping of the LQR solution
    A, B, Q, R, QT, x0, N = lqr_problem
    _, us_ref = _lqr_analytic(A, B, Q, R, QT, x0, N)
    us_clip = np.clip(us_ref, -u_lim, u_lim)

    def rollout_cost(us_seq):
        x = x0.copy()
        c = 0.0
        for t in range(N):
            c += 0.5 * (x @ Q @ x + us_seq[t] @ R @ us_seq[t])
            x = A @ x + B @ us_seq[t]
        return c + 0.5 * x @ QT @ x

    assert rollout_cost(us) <= rollout_cost(us_clip) + 1e-8


# ---------------------------------------------------------------------------
# Panda free-space problem
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def panda_problem():
    model = make_panda_model("plant", dtype=jnp.float64)
    W = OCPWeights(dt_ocp=0.01, w_ee_pos=1.2e3, w_ee_ori=5.0e1,
                   w_q_soft_limits=8.0, w_tau_soft_limits=2.0)
    knot = make_classical_knot(model, W, surface=False)
    traj = ApproachCircleTraj(center=(-0.5, 0.0, 0.36), radius=0.10, omega=1.5,
                              z_contact=0.36, t_approach=0.55, t_pre=0.25,
                              ee_start=(0.0879, -0.0008, 0.8551))
    q0 = jnp.asarray(KEYFRAMES["neutral"])
    x0 = jnp.concatenate([q0, jnp.zeros(7)])
    tau_g = gravity_torque(model, q0)
    R_des = jnp.asarray(np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]]))
    N = 12
    refs_run, ref_T = build_problem_refs(
        traj, 0.0, N, W.dt_ocp, x0, tau_g, R_des, dtype=jnp.float64)
    return model, knot, refs_run, ref_T, x0, tau_g, N


def test_fddp_converges_panda_free(panda_problem):
    model, knot, refs_run, ref_T, x0, tau_g, N = panda_problem
    xs0 = jnp.tile(x0, (N + 1, 1))
    us0 = jnp.tile(tau_g, (N, 1))
    res = solve(knot, refs_run, ref_T, x0, xs0, us0,
                FDDPSettings(max_iters=20, use_box=True))
    assert bool(res.feasible)
    assert not bool(res.diverged)
    # torques respect the box (wrist joints saturate at +-12 Nm on this
    # problem, so ||Qu|| stays finite at clamped dims — that's correct for
    # BoxFDDP; the unboxed variant below must drive the gradient to ~0)
    lim = np.array([87, 87, 87, 87, 12, 12, 12], dtype=float)
    assert np.all(np.abs(np.asarray(res.us)) <= lim + 1e-9)

    res_nb = solve(knot, refs_run, ref_T, x0, xs0, us0,
                   FDDPSettings(max_iters=30, use_box=False))
    assert bool(res_nb.feasible)
    assert float(res_nb.stop) < 1e-4, float(res_nb.stop)
    # the constrained optimum cannot beat the unconstrained one
    assert float(res.cost) >= float(res_nb.cost) - 1e-8


def test_fddp_warmstart_improves(panda_problem):
    model, knot, refs_run, ref_T, x0, tau_g, N = panda_problem
    xs0 = jnp.tile(x0, (N + 1, 1))
    us0 = jnp.tile(tau_g, (N, 1))
    st = FDDPSettings(max_iters=20, use_box=True)
    res1 = solve(knot, refs_run, ref_T, x0, xs0, us0, st)
    # warm-started resolve of the same problem: should converge immediately
    res2 = solve(knot, refs_run, ref_T, x0, res1.xs, res1.us,
                 FDDPSettings(max_iters=10, use_box=True, th_stop=1e-6))
    assert int(res2.iters) <= int(res1.iters)
    assert float(res2.cost) <= float(res1.cost) + 1e-6


def test_fddp_batched_vmap(panda_problem):
    model, knot, refs_run, ref_T, x0, tau_g, N = panda_problem
    B = 4
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.asarray(x0)[None] + 0.01 * rng.normal(size=(B, 14)))
    xs0 = jnp.tile(x0s[:, None, :], (1, N + 1, 1))
    us0 = jnp.tile(jnp.asarray(tau_g)[None, None, :], (B, N, 1))
    st = FDDPSettings(max_iters=10, use_box=True)

    batched = jax.vmap(lambda x0_, xs_, us_: solve(
        knot, refs_run, ref_T, x0_, xs_, us_, st))
    res = batched(x0s, xs0, us0)
    assert res.us.shape == (B, N, 7)
    assert np.all(np.asarray(res.feasible))
    # batched result matches a single solve for element 0
    res0 = solve(knot, refs_run, ref_T, x0s[0], xs0[0], us0[0], st)
    assert np.allclose(np.asarray(res.us[0]), np.asarray(res0.us), atol=1e-8)


def test_flat_diff_batched_identical(panda_problem):
    """The lane-filling (B, N) -> (B*N,) derivative-pass flatten
    (fddp.make_flat_vdiff) is layout-only: batched solves must be
    IDENTICAL with it on and off."""
    model, knot, refs_run, ref_T, x0, tau_g, N = panda_problem
    B = 3
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(np.asarray(x0)[None] + 0.01 * rng.normal(size=(B, 14)))
    xs0 = jnp.tile(x0s[:, None, :], (1, N + 1, 1))
    us0 = jnp.tile(jnp.asarray(tau_g)[None, None, :], (B, N, 1))

    def run(flat):
        st = FDDPSettings(max_iters=6, use_box=True, flat_diff=flat)
        return jax.vmap(lambda x0_, xs_, us_: solve(
            knot, refs_run, ref_T, x0_, xs_, us_, st))(x0s, xs0, us0)

    r1, r0 = run(True), run(False)
    # not bitwise: the reshaped batch lets XLA fuse/tile reductions
    # differently (measured ~5e-9 abs drift over 6 iterations at f64);
    # anything beyond tight roundoff-amplification is a real bug
    for name in ("xs", "us", "K", "k", "cost"):
        np.testing.assert_allclose(
            np.asarray(getattr(r1, name)), np.asarray(getattr(r0, name)),
            rtol=1e-5, atol=1e-7, err_msg=name)
