"""Regression tests pinning the FDDP acceptance clamps (PARITY.md
deviations 3-4).

Crocoddyl's published acceptance has two holes on stiff contact problems:
the negative-improvement (gap-contraction) branch accepts unbounded cost
increases, and the ``d1 < th_grad`` escape hatch fires on strongly
*negative* gradients.  Round 1 clamped both
(``FDDPSettings.neg_step_cost_factor/neg_step_cost_slack``) after closed
-loop blowups, but nothing pinned the behavior.  This fixture (found by
``tools/find_acceptance_fixture.py``) is a warm start on the benchmark
contact OCP where the exact Crocoddyl semantics
(``crocoddyl_semantics=True``) accept divergent iterates — a 13x cost
jump inside one accepted step, ending ~50x worse — while the default
clamps keep every accepted increase bounded.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ffmpc_tpu.core import make_panda_model, KEYFRAMES, gravity_torque
from ffmpc_tpu.ocp.action import make_classical_knot
from ffmpc_tpu.ocp.weights import OCPWeights
from ffmpc_tpu.ocp.problem import build_problem_refs
from ffmpc_tpu.solver.fddp import solve, FDDPSettings
from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj

Z_C = 0.342
N = 40
# fixture: seed 6, |dq0| ~ 6 rad/s, 0.5-scale state-gap noise, t0=1.2
SEED, VEL, GAP, USC, T0 = 6, 6.0, 0.5, 0.0, 1.2


@pytest.fixture(scope="module")
def problem():
    dtype = jnp.float64
    model = make_panda_model("plant", dtype=dtype)
    W = OCPWeights(dt_ocp=0.01, w_ee_pos=1.2e3, w_plane_z=9.0e2, w_vz=3.0e2,
                   w_tangent_pos=3.6e3, w_tangent_vel=1.2e3,
                   contact_gains=(145.0, 85.0), fn_des=22.0, w_fn=3.0e1,
                   w_unilateral=3.0e1, z_press=0.0065)
    traj = ApproachCircleTraj(center=(-0.5, 0.0, Z_C), radius=0.10, omega=1.5,
                              z_contact=Z_C, t_approach=0.55,
                              z_pre=Z_C + 0.05, t_pre=0.25,
                              ee_start=(-0.3, 0.0, 0.633), t_stabilize=0.2)
    knot = make_classical_knot(model, W, surface=True)
    q0 = jnp.asarray(KEYFRAMES["neutral"], dtype)
    tau_g = gravity_torque(model, q0)

    rng = np.random.default_rng(SEED)
    dq0 = VEL * rng.normal(size=7)
    x0 = jnp.concatenate([q0, jnp.asarray(dq0, dtype)])
    xs = jnp.tile(x0, (N + 1, 1)) + GAP * jnp.asarray(
        rng.normal(size=(N + 1, 14)), dtype)
    us = jnp.tile(tau_g, (N, 1)) + USC * jnp.asarray(
        rng.normal(size=(N, 7)), dtype)

    x_reg = jnp.concatenate([q0, jnp.zeros(7, dtype)])
    refs_run, ref_T = build_problem_refs(
        traj, jnp.asarray(T0, dtype), N, W.dt_ocp, x_reg, tau_g,
        jnp.asarray(np.diag([1.0, -1.0, -1.0]), dtype), dtype=dtype)

    def run(crocoddyl_semantics: bool):
        st = FDDPSettings(max_iters=10, use_box=True,
                          crocoddyl_semantics=crocoddyl_semantics)
        return jax.jit(lambda: solve(knot, refs_run, ref_T, x0, xs, us, st,
                                     debug_history=True))()

    return run


def test_default_clamps_bound_accepted_increases(problem):
    st = FDDPSettings()
    res, hist = problem(False)
    acc = np.asarray(hist["accepted"])
    cc = np.asarray(hist["cost_cur"])
    ct = np.asarray(hist["cost_try"])
    live = np.arange(len(acc)) < int(res.iters)
    sel = acc & live
    # every accepted step obeys the multiplicative guard
    guard = st.neg_step_cost_factor * cc + st.neg_step_cost_slack
    assert np.all(ct[sel] <= guard[sel] + 1e-9), (
        f"accepted step violated the cost guard: {ct[sel]} vs {guard[sel]}")
    assert np.isfinite(float(res.cost))


def test_crocoddyl_semantics_accept_divergent_iterates(problem):
    """The fixture must DEMONSTRATE the hole the clamps close: bare
    Crocoddyl acceptance takes a >2x cost jump and lands far above the
    clamped solver.  If this stops reproducing, the fixture is stale —
    regenerate with tools/find_acceptance_fixture.py."""
    res_def, _ = problem(False)
    res_cro, hist = problem(True)
    acc = np.asarray(hist["accepted"])
    cc = np.asarray(hist["cost_cur"])
    ct = np.asarray(hist["cost_try"])
    live = np.arange(len(acc)) < int(res_cro.iters)
    sel = acc & live & (cc > 0)
    max_jump = float(np.max(ct[sel] / cc[sel]))
    assert max_jump > 2.0, f"fixture stale: croco max jump {max_jump}"
    assert float(res_cro.cost) > 10.0 * float(res_def.cost), (
        f"fixture stale: croco {float(res_cro.cost):.3e} vs "
        f"default {float(res_def.cost):.3e}")
