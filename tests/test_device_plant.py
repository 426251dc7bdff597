"""Device plant (JAX) vs host MuJoCo plant: free fall, damped dynamics and
the soft contact channel must track the arbiter closely."""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax
import jax.numpy as jnp

from ffmpc_tpu.core import make_panda_model, KEYFRAMES, gravity_torque
from ffmpc_tpu.sim.mujoco_sim import PandaMujocoSim
from ffmpc_tpu.sim.device_plant import (
    make_table_params, init_plant_state, plant_step)


@pytest.fixture(scope="module")
def setup():
    model = make_panda_model("plant", dtype=jnp.float64)
    sim = PandaMujocoSim(command_type="torque", n_substeps=5)
    sim.model.opt.timestep = 0.001
    mujoco.mj_forward(sim.model, sim.data)
    table = make_table_params(0.0, dtype=jnp.float64)
    return model, sim, table


def _run_both(model, sim, table, tau_fn, steps, q0_name="neutral"):
    obs = sim.reset(q0_name)
    state = init_plant_state(np.asarray(obs.q), dtype=jnp.float64)
    step = jax.jit(lambda s, u: plant_step(model, table, s, u,
                                           timestep=0.001, n_substeps=5))
    qs_mj, qs_dev, fn_mj, fn_dev = [], [], [], []
    for k in range(steps):
        tau = tau_fn(k, obs)
        obs = sim.step(tau)
        state, dobs = step(state, jnp.asarray(tau, jnp.float64))
        qs_mj.append(obs.q.copy())
        qs_dev.append(np.asarray(dobs.q))
        fn_mj.append(obs.f_contact_normal)
        fn_dev.append(float(dobs.f_contact_normal))
    return (np.array(qs_mj), np.array(qs_dev), np.array(fn_mj), np.array(fn_dev))


def test_free_motion_matches(setup):
    """Gravity-comp + small excitation, no contact: trajectories match to
    sub-mrad over 0.25 s."""
    model, sim, table = setup
    tau_g = lambda obs: np.asarray(gravity_torque(model, jnp.asarray(obs.q, jnp.float64)))

    def tau_fn(k, obs):
        return tau_g(obs) + 0.5 * np.sin(0.01 * k * np.arange(1, 8))

    qs_mj, qs_dev, fn_mj, fn_dev = _run_both(model, sim, table, tau_fn, 50)
    assert np.all(fn_mj == 0.0) and np.all(fn_dev == 0.0)
    err = np.abs(qs_mj - qs_dev).max()
    assert err < 2e-4, err


def test_contact_force_matches_selfconsistent_press(setup):
    """Each plant runs its own task-space press loop (gravity comp + a
    -30 N vertical push using its own observation): both must settle into
    steady contact whose normal force balances the commanded push."""
    model, sim, table = setup
    import mujoco
    from ffmpc_tpu.core import ee_jacobian

    # host plant
    obs = sim.reset("neutral")
    for _ in range(400):
        tau_g = np.asarray(gravity_torque(model, jnp.asarray(obs.q, jnp.float64)))
        tau = tau_g + obs.J_pos.T @ np.array([0.0, 0.0, -30.0]) - 2.0 * np.asarray(obs.dq)
        obs = sim.step(tau)
    fn_host = float(obs.f_contact_normal)

    # device plant with its own loop
    state = init_plant_state(np.asarray(sim.reset("neutral").q), dtype=jnp.float64)
    step = jax.jit(lambda s, u: plant_step(model, table, s, u,
                                           timestep=0.001, n_substeps=5))
    fn_dev = 0.0
    for _ in range(400):
        q = jnp.asarray(state.q)
        tau_g = gravity_torque(model, q)
        Jp, _ = ee_jacobian(model, q)
        tau = tau_g + Jp.T @ jnp.asarray([0.0, 0.0, -30.0]) - 2.0 * state.v
        state, dobs = step(state, tau)
        fn_dev = float(dobs.f_contact_normal)

    assert fn_host > 5.0 and fn_dev > 5.0, (fn_host, fn_dev)
    # quasi-static balance: fn ~= commanded 30 N push on both plants
    assert abs(fn_host - 30.0) < 3.0, fn_host
    assert abs(fn_dev - 30.0) < 4.5, fn_dev


def test_contact_force_law_state_matched(setup):
    """Instantaneous constraint force at identical (q, v): device soft-contact
    law vs MuJoCo's, across approach depths.  The device model reproduces
    MuJoCo's margin-zone force onset and magnitude to ~15%."""
    model, sim, table = setup
    import mujoco
    from ffmpc_tpu.sim.device_plant import _contact_force
    from ffmpc_tpu.core import fk as fk_fn, ee_jacobian, mass_matrix, rnea

    # take the steady pressed configuration from a host press
    obs = sim.reset("neutral")
    for _ in range(400):
        tau_g = np.asarray(gravity_torque(model, jnp.asarray(obs.q, jnp.float64)))
        tau = tau_g + obs.J_pos.T @ np.array([0.0, 0.0, -30.0]) - 2.0 * np.asarray(obs.dq)
        obs = sim.step(tau)
    assert obs.f_contact_normal > 5.0

    q = jnp.asarray(obs.q, jnp.float64)
    v = jnp.zeros(7, jnp.float64)
    tau = jnp.asarray(tau, jnp.float64)

    # host: instantaneous constraint torque at frozen velocity
    sim.data.qvel[:7] = 0.0
    sim.data.qfrc_applied[:7] = np.asarray(tau)
    mujoco.mj_forward(sim.model, sim.data)
    fn_host = float(obs.f_contact_normal)

    # device law at the same state
    fkr = fk_fn(model, q)
    Jp, _ = ee_jacobian(model, q)
    n = table.normal
    Jn = n @ Jp
    from ffmpc_tpu.core.panda import TOOL_SPHERE_RADIUS
    dist = float((fkr.ee_p - table.point) @ n) - TOOL_SPHERE_RADIUS
    M = mass_matrix(model, q)
    L = jnp.linalg.cholesky(M)
    bias_nd = rnea(model, q, v, jnp.zeros(7)) - model.damping * v
    minv_tau = jax.scipy.linalg.cho_solve((L, True), (tau - bias_nd)[:, None])[:, 0]
    fn_dev, active = _contact_force(model, table, q, v, minv_tau, L, fkr, Jn,
                                    Jn @ v, jnp.asarray(dist))
    assert bool(active)
    # with MuJoCo's compile-time diagA regularization constant the law
    # matches to well under 1% (was ~15-20% with the exact-A regularizer)
    assert abs(float(fn_dev) - fn_host) / max(fn_host, 1.0) < 0.01, \
        (float(fn_dev), fn_host, dist)


def test_diag_approx_matches_compiled_model(setup):
    """TableParams.diag_approx must equal MuJoCo's efc_diagA for the
    ee-sphere/table pair = sum of the bodies' translational invweight0."""
    model, sim, table = setup
    m = sim.model
    total = 0.0
    for gname in ("ee_collision", "table_contact"):
        gid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, gname)
        total += float(m.body_invweight0[m.geom_bodyid[gid], 0])
    assert abs(float(table.diag_approx) - total) < 1e-6, (float(table.diag_approx), total)


def test_batched_plants(setup):
    """vmap over a batch of plants: batched step equals per-element step."""
    model, sim, table = setup
    obs = sim.reset("neutral")
    B = 4
    rng = np.random.default_rng(0)
    q0s = np.asarray(obs.q)[None] + 0.02 * rng.normal(size=(B, 7))
    taus = rng.normal(scale=2.0, size=(B, 7))

    states = jax.vmap(lambda q: init_plant_state(q, dtype=jnp.float64))(jnp.asarray(q0s))
    stepb = jax.jit(jax.vmap(lambda s, u: plant_step(
        model, table, s, u, timestep=0.001, n_substeps=5)))
    new_states, dobs = stepb(states, jnp.asarray(taus))
    assert new_states.q.shape == (B, 7)

    s0 = init_plant_state(jnp.asarray(q0s[0]), dtype=jnp.float64)
    s0n, _ = plant_step(model, table, s0, jnp.asarray(taus[0]),
                        timestep=0.001, n_substeps=5)
    assert np.allclose(np.asarray(new_states.q[0]), np.asarray(s0n.q), atol=1e-12)
