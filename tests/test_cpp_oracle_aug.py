"""Cross-language parity for the AUGMENTED (force-feedback) family: the
independent C++ oracle's 21-state BoxFDDP (native/ffmpc_oracle.cpp — FD
derivatives, own rigid-body recursion) vs the JAX solver in
Crocoddyl-semantics mode.

Round 2 scoped the oracle to the classical family; the augmented LPF model
— the reference's actual research contribution
(/root/reference/src/mpc/crocoddyl_force_feedback.py:149-290) — was only
validated self-consistently (FD + block-structure tests).  These tests close
that gap: a sign error in the LPF rows, the outer y/w costs, or the
terminal dt-scaling now breaks a cross-language comparison.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ffmpc_tpu.core import make_panda_model, KEYFRAMES, gravity_torque
from ffmpc_tpu.ocp.weights import OCPWeights, make_problem_refs
from ffmpc_tpu.ocp.action import make_augmented_knot
from ffmpc_tpu.ocp.problem import build_problem_refs
from ffmpc_tpu.solver.fddp import solve, FDDPSettings
from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj
from ffmpc_tpu.utils.native import (oracle_weights_flat_aug,
                                    oracle_knot_calc_aug, oracle_solve_aug)


@pytest.fixture(scope="module")
def setup():
    model = make_panda_model("plant", dtype=jnp.float64)
    alpha = float(np.exp(-2 * np.pi * 25.0 * 0.01))
    W = OCPWeights(dt_ocp=0.01, w_ee_pos=1.2e3, w_ee_ori=4.5e1,
                   w_q_soft_limits=8.0, w_tau_soft_limits=1.5,
                   w_plane_z=9.0e2, w_vz=3.0e2, w_tangent_pos=3.6e3,
                   w_tangent_vel=1.2e3, contact_gains=(145.0, 85.0),
                   fn_des=22.0, w_fn=3.0e1, w_unilateral=3.0e1,
                   w_friction_cone=0.0, z_press=0.0065,
                   ff_alpha=alpha, w_w=6.0e-4, w_w_soft_limits=2.0,
                   w_y=8.0e-4)
    wf = oracle_weights_flat_aug(W, model)
    z_c = 0.342
    traj = ApproachCircleTraj(center=(-0.5, 0.0, z_c), radius=0.10,
                              omega=1.5, z_contact=z_c, t_approach=0.55,
                              z_pre=z_c + 0.05, t_pre=0.25,
                              ee_start=(-0.3, 0.0, 0.633), t_stabilize=0.2)
    q0 = np.asarray(KEYFRAMES["neutral"])
    tau_g = np.asarray(gravity_torque(model, jnp.asarray(q0)))
    return model, W, wf, traj, q0, tau_g


def test_aug_knot_calc_parity(setup):
    """Augmented knot (ynext, cost) parity at random states: running and
    terminal, free and contact.  Pins the LPF rows, the inner-control=tau
    wiring (including at the terminal, where the wrapper calls the inner
    RUNNING calc), the dt-scaling split and the outer y/w costs."""
    model, W, wf, traj, q0, tau_g = setup
    x_reg = np.concatenate([q0, np.zeros(7)])
    y_ref = np.concatenate([q0, np.zeros(7), tau_g])
    R_des = np.diag([1.0, -1.0, -1.0])
    rng = np.random.default_rng(2)
    for surface in (False, True):
        knot = make_augmented_knot(model, W, surface=surface,
                                   calc_mode="vector")
        for terminal in (False, True):
            for _ in range(3):
                q = q0 + 0.1 * rng.normal(size=7)
                v = 0.3 * rng.normal(size=7)
                tau = tau_g + 2.0 * rng.normal(size=7)
                w = tau_g + 3.0 * rng.normal(size=7)
                y = np.concatenate([q, v, tau])
                p_ref = np.array([-0.45, 0.05, 0.345])
                v_ref = 0.05 * rng.normal(size=3)
                refs = make_problem_refs(p_ref, v_ref, x_reg, tau_g, R_des,
                                         y_ref=jnp.asarray(y_ref),
                                         dtype=jnp.float64)
                if terminal:
                    c_j = float(knot.term_calc(refs, jnp.asarray(y)))
                else:
                    yn_j, c_j = knot.calc(refs, jnp.asarray(y),
                                          jnp.asarray(w))
                    c_j = float(c_j)
                pv = np.concatenate([p_ref, v_ref])
                yn_o, c_o = oracle_knot_calc_aug(
                    wf, pv, x_reg, tau_g, R_des.ravel(), y_ref, surface,
                    terminal, y, w)
                assert abs(c_o - c_j) < 1e-8 * max(1.0, abs(c_j))
                if not terminal:
                    assert np.abs(yn_o - np.asarray(yn_j)).max() < 1e-10


@pytest.mark.parametrize("phase,t0", [("free", 0.3), ("contact", 1.5)])
def test_aug_solve_tau_parity(setup, phase, t0):
    """Full augmented BoxFDDP solve: C++ oracle vs JAX solver in
    Crocoddyl-semantics mode, same warm start, 10-iteration budget.
    North-star criterion (BASELINE.md): tau trajectory within 1e-3 Nm —
    here both the filtered tau STATE channel and the w plan."""
    model, W, wf, traj, q0, tau_g = setup
    N = 20
    surface = phase == "contact"
    rng = np.random.default_rng(7 if surface else 3)
    q = q0 + 0.05 * rng.normal(size=7)
    v = 0.1 * rng.normal(size=7)
    y0_nom = np.concatenate([q, v, tau_g])
    x_reg = np.concatenate([q0, np.zeros(7)])
    y_ref = np.concatenate([q0, np.zeros(7), tau_g])
    R_des = np.diag([1.0, -1.0, -1.0])

    knot = make_augmented_knot(model, W, surface=surface, calc_mode="vector")
    refs_run, ref_T = build_problem_refs(
        traj, jnp.float64(t0), N, W.dt_ocp, jnp.asarray(x_reg),
        jnp.asarray(tau_g), jnp.asarray(R_des, jnp.float64),
        y_ref=jnp.asarray(y_ref), dtype=jnp.float64)

    warm = solve(knot, refs_run, ref_T, jnp.asarray(y0_nom),
                 jnp.asarray(np.tile(y0_nom, (N + 1, 1))),
                 jnp.asarray(np.tile(tau_g, (N, 1))),
                 FDDPSettings(max_iters=60, use_box=True))
    # MPC-style resolve: one-tick-scale prediction error on y0, warm plan
    y0 = y0_nom + np.concatenate([5e-4 * rng.normal(size=7),
                                  2e-3 * rng.normal(size=7),
                                  1e-2 * rng.normal(size=7)])
    ys_init = np.asarray(warm.xs)
    ws_init = np.asarray(warm.us)

    res = solve(knot, refs_run, ref_T, jnp.asarray(y0),
                jnp.asarray(ys_init), jnp.asarray(ws_init),
                FDDPSettings(max_iters=10, use_box=True,
                             crocoddyl_semantics=True))

    pv = np.zeros((N + 1, 6))
    for k in range(N + 1):
        p, vv, _ = traj.numpy(t0 + k * W.dt_ocp)
        pv[k, :3] = p
        pv[k, 3:] = vv
    surf = np.full(N, int(surface), np.int32)
    ys_o, ws_o, cost_o, _ = oracle_solve_aug(
        wf, pv, surf, x_reg, tau_g, R_des.ravel(), y_ref, y0, ys_init,
        ws_init, max_iters=10, use_box=True)
    dw = np.abs(ws_o - np.asarray(res.us)).max()
    dtau = np.abs(ys_o[:, 14:] - np.asarray(res.xs)[:, 14:]).max()
    assert dw < 1e-3, dw
    assert dtau < 1e-3, dtau
    assert abs(cost_o - float(res.cost)) < 1e-5 * max(1.0, abs(float(res.cost)))
