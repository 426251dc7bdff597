"""Cross-language solver parity: the independent C++ BoxFDDP oracle
(native/ffmpc_oracle.cpp — FD derivatives, own rigid-body recursion, own
linear algebra) vs the JAX solver in Crocoddyl-semantics mode.

This is the project's stand-in for the tau-parity-vs-Crocoddyl north star
(BASELINE.md): crocoddyl/pinocchio cannot be installed in this container, so
the oracle re-implements Crocoddyl's published BoxFDDP from spec in C++.
Agreement here means the whole chain — dynamics, contact KKT, cost stack,
GN assembly, backward sweep, box QP, line-search acceptance — matches an
independent implementation at the benchmark iteration budget.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ffmpc_tpu.core import make_panda_model, KEYFRAMES, gravity_torque
from ffmpc_tpu.ocp.weights import OCPWeights, make_problem_refs
from ffmpc_tpu.ocp.action import make_classical_knot
from ffmpc_tpu.ocp.problem import build_problem_refs
from ffmpc_tpu.solver.fddp import solve, FDDPSettings
from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj
from ffmpc_tpu.mpc.controllers import make_vertical_down_R
from ffmpc_tpu.utils.native import (oracle_weights_flat, oracle_knot_calc,
                                    oracle_solve)


@pytest.fixture(scope="module")
def setup():
    model = make_panda_model("plant", dtype=jnp.float64)
    W = OCPWeights(dt_ocp=0.01, w_ee_pos=1.2e3, w_ee_ori=5.0e1,
                   ori_weights=(2.4, 2.4, 0.3),
                   w_posture=1.5e-1, w_v=8.0e-2,
                   w_q_soft_limits=8.0, q_soft_limit_margin=0.05,
                   w_tau=8.0e-4, w_tau_soft_limits=2.0,
                   w_plane_z=1.2e3, w_vz=5.0e2, w_tangent_pos=2.6e3,
                   w_tangent_vel=7.0e2, contact_gains=(140.0, 80.0),
                   fn_des=22.0, w_fn=2.8e1, w_unilateral=3.0e1,
                   w_friction_cone=0.0, z_press=0.0065,
                   w_wdamp=6.0e1, w_wdamp_weights=(1.8, 1.8, 0.3))
    wf = oracle_weights_flat(W, model)
    R_des = make_vertical_down_R()
    z_c = 0.342
    traj = ApproachCircleTraj(center=(-0.5, 0.0, z_c), radius=0.10, omega=1.5,
                              z_contact=z_c, t_approach=0.55,
                              z_pre=z_c + 0.05, t_pre=0.25,
                              ee_start=(-0.3, 0.0, 0.633), t_stabilize=0.2)
    return model, W, wf, R_des, traj


def _refs_arrays(traj, t0, N, dt_ocp):
    pv = np.zeros((N + 1, 6))
    for k in range(N + 1):
        p, v, _ = traj.numpy(t0 + k * dt_ocp)
        pv[k, :3] = p
        pv[k, 3:] = v
    return pv


def test_knot_calc_parity_random_states(setup):
    model, W, wf, R_des, traj = setup
    rng = np.random.default_rng(1)
    q0 = np.asarray(KEYFRAMES["neutral"])
    x_reg = np.concatenate([q0, np.zeros(7)])
    tau_ref = np.asarray(gravity_torque(model, jnp.asarray(q0)))
    for surface in (False, True):
        knot = make_classical_knot(model, W, surface=surface)
        for _ in range(3):
            q = q0 + 0.1 * rng.normal(size=7)
            v = 0.3 * rng.normal(size=7)
            u = tau_ref + 2.0 * rng.normal(size=7)
            x = np.concatenate([q, v])
            p_ref = np.array([-0.45, 0.05, 0.345])
            v_ref = 0.05 * rng.normal(size=3)
            refs = make_problem_refs(p_ref, v_ref, x_reg, tau_ref, R_des,
                                     dtype=jnp.float64)
            xn_j, c_j = knot.calc(refs, jnp.asarray(x), jnp.asarray(u))
            pv = np.concatenate([p_ref, v_ref])
            xn_o, c_o = oracle_knot_calc(wf, pv, x_reg, tau_ref,
                                         np.asarray(R_des).ravel(), surface,
                                         False, x, u)
            assert np.abs(xn_o - np.asarray(xn_j)).max() < 1e-10
            assert abs(c_o - float(c_j)) < 1e-9 * max(1.0, abs(float(c_j)))


@pytest.mark.parametrize("phase,t0", [("free", 0.3), ("contact", 1.5)])
def test_solve_tau_parity(setup, phase, t0):
    """Full BoxFDDP solve: independent C++ oracle vs JAX solver in
    Crocoddyl-semantics mode, same warm start, same 10-iteration budget.
    North-star criterion: tau trajectory within 1e-3 Nm.

    The problems are the benchmark's operating regime: warm-started MPC
    resolves (warm start = a converged solution, x0 perturbed by a
    one-tick-scale prediction error).  Cold bang-bang starts on the stiff
    contact OCP are numerically chaotic — both implementations reach the
    same cost basin (within ~10%) while individual torques diverge; see
    test_solve_cost_parity_cold below, which pins that weaker property.
    """
    model, W, wf, R_des, traj = setup
    # Free phase runs at the benchmark classical horizon (N=36).  The
    # contact case stays at N=20: at N=36 this particular warm-started
    # problem sits ON a line-search/active-set tie (dtau flips between
    # 1e-5 and 1.9 run-to-run with XLA:CPU thread-level reduction
    # reordering) — exactly the knife-edge mechanism proven by
    # tools/parity_iterates.py.  Benchmark-shape parity coverage comes
    # from tools/parity_scenarios.py (N=36/40 real controller problems,
    # all 5 scenarios) and the iterate-level study.
    N = 36 if phase == "free" else 20
    surface = phase == "contact"
    q0 = np.asarray(KEYFRAMES["neutral"])
    rng = np.random.default_rng(7 if surface else 3)
    q = q0 + 0.05 * rng.normal(size=7)
    v = 0.1 * rng.normal(size=7)
    x_reg = np.concatenate([q0, np.zeros(7)])
    tau_ref = np.asarray(gravity_torque(model, jnp.asarray(q0)))

    knot = make_classical_knot(model, W, surface=surface)
    refs_run, ref_T = build_problem_refs(
        traj, jnp.float64(t0), N, W.dt_ocp, jnp.asarray(x_reg),
        jnp.asarray(tau_ref), jnp.asarray(R_des, jnp.float64),
        dtype=jnp.float64)

    # converge once to get a realistic MPC warm start
    x0_cold = np.concatenate([q, v])
    warm = solve(knot, refs_run, ref_T, jnp.asarray(x0_cold),
                 jnp.asarray(np.tile(x0_cold, (N + 1, 1))),
                 jnp.asarray(np.tile(tau_ref, (N, 1))),
                 FDDPSettings(max_iters=80, use_box=True))
    xs_w = np.asarray(warm.xs)
    us_w = np.asarray(warm.us)
    # one-tick prediction error on x0
    x0 = xs_w[0] + np.concatenate([1e-3 * rng.normal(size=7),
                                   1e-2 * rng.normal(size=7)])

    res = solve(knot, refs_run, ref_T, jnp.asarray(x0), jnp.asarray(xs_w),
                jnp.asarray(us_w),
                FDDPSettings(max_iters=10, use_box=True,
                             crocoddyl_semantics=True))

    pv = _refs_arrays(traj, t0, N, W.dt_ocp)
    xs_o, us_o, cost_o, iters_o = oracle_solve(
        wf, pv, [surface] * N, x_reg, tau_ref, np.asarray(R_des).ravel(),
        x0, xs_w, us_w, max_iters=10, use_box=True)

    dtau = np.abs(us_o - np.asarray(res.us)).max()
    dcost = abs(cost_o - float(res.cost)) / max(abs(cost_o), 1.0)
    assert dtau < 1e-3, (phase, dtau, cost_o, float(res.cost), iters_o)
    assert dcost < 1e-6, (phase, dcost)


def test_solve_cost_parity_cold_contact(setup):
    """Cold bang-bang contact solves are chaotic at the iterate level; the
    implementations must still land in the same cost basin."""
    model, W, wf, R_des, traj = setup
    N, t0 = 20, 1.5
    q0 = np.asarray(KEYFRAMES["neutral"])
    rng = np.random.default_rng(7)
    q = q0 + 0.05 * rng.normal(size=7)
    v = 0.1 * rng.normal(size=7)
    x0 = np.concatenate([q, v])
    x_reg = np.concatenate([q0, np.zeros(7)])
    tau_ref = np.asarray(gravity_torque(model, jnp.asarray(q0)))
    knot = make_classical_knot(model, W, surface=True)
    refs_run, ref_T = build_problem_refs(
        traj, jnp.float64(t0), N, W.dt_ocp, jnp.asarray(x_reg),
        jnp.asarray(tau_ref), jnp.asarray(R_des, jnp.float64),
        dtype=jnp.float64)
    xs0 = np.tile(x0, (N + 1, 1))
    us0 = np.tile(tau_ref, (N, 1))
    res = solve(knot, refs_run, ref_T, jnp.asarray(x0), jnp.asarray(xs0),
                jnp.asarray(us0),
                FDDPSettings(max_iters=2, use_box=True,
                             crocoddyl_semantics=True))
    pv = _refs_arrays(traj, t0, N, W.dt_ocp)
    _, _, cost_o, _ = oracle_solve(
        wf, pv, [True] * N, x_reg, tau_ref, np.asarray(R_des).ravel(),
        x0, xs0, us0, max_iters=2, use_box=True)
    assert abs(cost_o - float(res.cost)) / max(abs(cost_o), 1.0) < 0.02, (
        cost_o, float(res.cost))


@pytest.mark.quick
def test_oracle_traced_matches_untraced(setup):
    """ffmpc_oracle_solve_traced must be the SAME solver as
    ffmpc_oracle_solve (identical xs/us/cost) and emit a coherent trace
    (monotone accepted costs down to the final cost, populated rows for
    every executed iteration)."""
    from ffmpc_tpu.utils.native import oracle_solve_traced

    model, W, wf, R_des, traj = setup
    N, t0, surface = 20, 1.5, True
    q0 = np.asarray(KEYFRAMES["neutral"])
    rng = np.random.default_rng(7)
    q = q0 + 0.05 * rng.normal(size=7)
    v = 0.1 * rng.normal(size=7)
    x0 = np.concatenate([q, v])
    x_reg = np.concatenate([q0, np.zeros(7)])
    tau_ref = np.asarray(gravity_torque(model, jnp.asarray(q0)))
    xs0 = np.tile(x0, (N + 1, 1))
    us0 = np.tile(tau_ref, (N, 1))
    pv = _refs_arrays(traj, t0, N, W.dt_ocp)
    args = (wf, pv, [surface] * N, x_reg, tau_ref,
            np.asarray(R_des).ravel(), x0, xs0, us0)
    xs_a, us_a, cost_a, it_a = oracle_solve(*args, max_iters=6)
    xs_b, us_b, cost_b, it_b, tr = oracle_solve_traced(*args, max_iters=6)
    assert it_a == it_b
    assert abs(cost_a - cost_b) < 1e-12 * max(1.0, abs(cost_a))
    assert np.abs(xs_a - xs_b).max() < 1e-12
    assert np.abs(us_a - us_b).max() < 1e-12
    # trace coherence: every executed row populated, costs finite, the
    # final accepted cost_try equals the returned trajectory cost
    assert np.all(np.isfinite(tr["cost_cur"][:it_b]))
    acc = tr["accepted"][:it_b] > 0.5
    assert acc.any()
    last_acc = np.nonzero(acc)[0][-1]
    if last_acc == it_b - 1:
        assert abs(tr["cost_try"][last_acc] - cost_b) < 1e-9 * max(
            1.0, abs(cost_b))
