"""Full-solver equivalence: riccati_mode="parallel" vs "sequential" on the
no-box Panda free-space problem (same solution trajectory)."""

import numpy as np
import jax.numpy as jnp

from ffmpc_tpu.core import make_panda_model, KEYFRAMES, gravity_torque
from ffmpc_tpu.ocp.weights import OCPWeights
from ffmpc_tpu.ocp.action import make_classical_knot
from ffmpc_tpu.ocp.problem import build_problem_refs
from ffmpc_tpu.solver.fddp import solve, FDDPSettings
from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj


def test_parallel_riccati_mode_matches_sequential():
    model = make_panda_model("plant", dtype=jnp.float64)
    W = OCPWeights(dt_ocp=0.01, w_ee_pos=1.2e3)
    knot = make_classical_knot(model, W, surface=False)
    traj = ApproachCircleTraj(center=(-0.5, 0.0, 0.36), radius=0.10, omega=1.5,
                              z_contact=0.36, t_approach=0.55, t_pre=0.25,
                              ee_start=(0.088, 0.0, 0.855))
    q0 = jnp.asarray(KEYFRAMES["neutral"])
    x0 = jnp.concatenate([q0, jnp.zeros(7)])
    tau_g = gravity_torque(model, q0)
    R_des = jnp.asarray(np.diag([1.0, -1.0, -1.0]))
    N = 10
    refs_run, ref_T = build_problem_refs(
        traj, 0.0, N, W.dt_ocp, x0, tau_g, R_des, dtype=jnp.float64)
    xs0 = jnp.tile(x0, (N + 1, 1))
    us0 = jnp.tile(tau_g, (N, 1))

    res_seq = solve(knot, refs_run, ref_T, x0, xs0, us0,
                    FDDPSettings(max_iters=8, use_box=False,
                                 riccati_mode="sequential"))
    res_par = solve(knot, refs_run, ref_T, x0, xs0, us0,
                    FDDPSettings(max_iters=8, use_box=False,
                                 riccati_mode="parallel"))
    assert np.isclose(float(res_par.cost), float(res_seq.cost), rtol=1e-6), (
        float(res_par.cost), float(res_seq.cost))
    assert np.allclose(np.asarray(res_par.us), np.asarray(res_seq.us),
                       atol=1e-5), np.abs(
        np.asarray(res_par.us) - np.asarray(res_seq.us)).max()


def _problem(N=10, anchored=True):
    from ffmpc_tpu.core import fk
    model = make_panda_model("plant", dtype=jnp.float64)
    W = OCPWeights(dt_ocp=0.01, w_ee_pos=1.2e3)
    knot = make_classical_knot(model, W, surface=False)
    q0 = jnp.asarray(KEYFRAMES["neutral"])
    if anchored:
        # reference anchored at the actual start pose: the unconstrained
        # optimum is a gentle gravity-hold (torque box inactive)
        ee0 = tuple(float(v) for v in fk(model, q0).ee_p)
    else:
        # far-away reference: the cold solution slams the torque box
        ee0 = (0.088, 0.0, 0.855)
    traj = ApproachCircleTraj(center=(-0.5, 0.0, 0.36), radius=0.10, omega=1.5,
                              z_contact=0.36, t_approach=0.55, t_pre=0.25,
                              ee_start=ee0)
    x0 = jnp.concatenate([q0, jnp.zeros(7)])
    tau_g = gravity_torque(model, q0)
    R_des = jnp.asarray(np.diag([1.0, -1.0, -1.0]))
    refs_run, ref_T = build_problem_refs(
        traj, 0.0, N, W.dt_ocp, x0, tau_g, R_des, dtype=jnp.float64)
    xs0 = jnp.tile(x0, (N + 1, 1))
    us0 = jnp.tile(tau_g, (N, 1))
    return knot, refs_run, ref_T, x0, xs0, us0


def test_parallel_box_matches_sequential_when_bounds_inactive():
    """Warm-started near the optimum (where the torque box is inactive),
    the frozen-active-set parallel backward must reproduce the sequential
    box path's solution."""
    knot, refs_run, ref_T, x0, xs0, us0 = _problem()
    warm = solve(knot, refs_run, ref_T, x0, xs0, us0,
                 FDDPSettings(max_iters=30, use_box=False))
    lim = np.asarray(knot.u_ub)
    assert np.all(np.abs(np.asarray(warm.us)) < lim[None, :] - 1e-3)
    res_seq = solve(knot, refs_run, ref_T, x0, warm.xs, warm.us,
                    FDDPSettings(max_iters=4, use_box=True,
                                 riccati_mode="sequential"))
    res_par = solve(knot, refs_run, ref_T, x0, warm.xs, warm.us,
                    FDDPSettings(max_iters=4, use_box=True,
                                 riccati_mode="parallel"))
    assert np.isclose(float(res_par.cost), float(res_seq.cost), rtol=1e-5), (
        float(res_par.cost), float(res_seq.cost))
    assert np.allclose(np.asarray(res_par.us), np.asarray(res_seq.us),
                       atol=1e-3)


def test_parallel_box_quality_with_active_bounds():
    """Far-reference cold problem where bounds bind: the parallel
    refinement must respect the bounds and land within a few % of the
    sequential box solve's cost."""
    knot, refs_run, ref_T, x0, xs0, us0 = _problem(anchored=False)
    res_seq = solve(knot, refs_run, ref_T, x0, xs0, us0,
                    FDDPSettings(max_iters=12, use_box=True,
                                 riccati_mode="sequential"))
    res_par = solve(knot, refs_run, ref_T, x0, xs0, us0,
                    FDDPSettings(max_iters=12, use_box=True,
                                 riccati_mode="parallel",
                                 parallel_box_refinements=2))
    lim = np.asarray(knot.u_ub)
    # bounds genuinely active on the sequential solution
    assert np.any(np.abs(np.asarray(res_seq.us)) >= lim[None, :] - 1e-6)
    # parallel solution respects bounds and is competitive
    assert np.all(np.abs(np.asarray(res_par.us)) <= lim[None, :] + 1e-8)
    assert float(res_par.cost) <= 1.05 * float(res_seq.cost), (
        float(res_par.cost), float(res_seq.cost))
