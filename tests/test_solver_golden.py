"""Golden-trace regression: the solver's control sequences on three fixed
problems must stay within tight tolerance of the recorded fixtures.

Fixtures were produced by this solver version after full validation (LQR
exactness, FD derivative checks, closed-loop benchmark sweeps); they protect
future refactors (Pallas kernels, analytic derivatives) from silent
numerical drift.  Regenerate deliberately with tests/fixtures/regen note in
the commit when semantics change on purpose.
"""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "solver_golden.npz"


@pytest.mark.skipif(not FIXTURE.exists(), reason="fixtures not generated")
@pytest.mark.parametrize("calc_mode", ["scalar", "vector"])
@pytest.mark.parametrize("case", ["classical_free", "classical_contact", "ff_contact"])
def test_solver_matches_golden(case, calc_mode):
    from ffmpc_tpu.core import make_panda_model, KEYFRAMES, gravity_torque
    from ffmpc_tpu.ocp.weights import OCPWeights
    from ffmpc_tpu.ocp.action import make_classical_knot, make_augmented_knot
    from ffmpc_tpu.ocp.problem import build_problem_refs
    from ffmpc_tpu.solver.fddp import solve, FDDPSettings
    from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj
    from ffmpc_tpu.mpc.controllers import make_vertical_down_R

    model = make_panda_model("plant", dtype=jnp.float64)
    q0 = jnp.asarray(KEYFRAMES["neutral"])
    tau_g = gravity_torque(model, q0)
    R_des = jnp.asarray(make_vertical_down_R())
    z_c = 0.342
    traj = ApproachCircleTraj(center=(-0.5, 0.0, z_c), radius=0.10, omega=1.5,
                              z_contact=z_c, t_approach=0.55, z_pre=z_c + 0.05,
                              t_pre=0.25, ee_start=(-0.3, 0.0, 0.633),
                              t_stabilize=0.2)
    W = OCPWeights(dt_ocp=0.01, w_ee_pos=1.2e3, w_q_soft_limits=8.0,
                   w_tau_soft_limits=2.0, w_plane_z=1.2e3, w_vz=5.0e2,
                   contact_gains=(140.0, 80.0), fn_des=22.0, w_fn=28.0,
                   ff_alpha=float(np.exp(-2 * np.pi * 25.0 * 0.01)),
                   w_w=6.0e-4, w_w_soft_limits=2.0, w_y=8.0e-4)
    st = FDDPSettings(max_iters=10, use_box=True)

    surface = case != "classical_free"
    t0 = 0.3 if case == "classical_free" else 1.2
    is_ff = case == "ff_contact"
    make = make_augmented_knot if is_ff else make_classical_knot
    knot = make(model, W, surface=surface, calc_mode=calc_mode)
    x0 = (jnp.concatenate([q0, jnp.zeros(7), tau_g]) if is_ff
          else jnp.concatenate([q0, jnp.zeros(7)]))
    N = 12
    refs_run, ref_T = build_problem_refs(
        traj, t0, N, W.dt_ocp, jnp.concatenate([q0, jnp.zeros(7)]), tau_g,
        R_des, y_ref=(x0 if is_ff else None), dtype=jnp.float64)
    xs0 = jnp.tile(x0, (N + 1, 1))
    us0 = jnp.tile(tau_g, (N, 1))
    res = solve(knot, refs_run, ref_T, x0, xs0, us0, st)

    with np.load(FIXTURE) as z:
        us_ref = z[f"{case}_{calc_mode}_us"]
        cost_ref = float(z[f"{case}_{calc_mode}_cost"])
    assert np.allclose(np.asarray(res.us), us_ref, atol=1e-6), \
        np.abs(np.asarray(res.us) - us_ref).max()
    assert np.isclose(float(res.cost), cost_ref, rtol=1e-8)
