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


def test_contact_force_matches(setup):
    """Press the tool into the table (gravity-only drop from neutral reaches
    contact? no — command a downward push): normal-force channels agree to
    ~10% once in steady contact."""
    model, sim, table = setup
    obs0 = sim.reset("neutral")

    # task-space press: gravity compensation minus a steady vertical push
    def tau_fn(k, obs):
        tau_g = np.asarray(gravity_torque(model, jnp.asarray(obs.q, jnp.float64)))
        if obs.J_pos is not None:
            f_des = np.array([0.0, 0.0, -30.0])
            tau_push = obs.J_pos.T @ f_des
            # mild joint damping for stability of the open-loop push
            return tau_g + tau_push - 2.0 * np.asarray(obs.dq)
        return tau_g

    qs_mj, qs_dev, fn_mj, fn_dev = _run_both(model, sim, table, tau_fn, 400)
    # both must establish contact
    assert fn_mj[-50:].min() > 1.0, "host plant never reached steady contact"
    assert fn_dev[-50:].min() > 1.0, "device plant never reached steady contact"
    # steady-state forces agree
    mj_ss = float(np.mean(fn_mj[-50:]))
    dev_ss = float(np.mean(fn_dev[-50:]))
    assert abs(mj_ss - dev_ss) / mj_ss < 0.15, (mj_ss, dev_ss)
    # joint trajectories stay close through the whole press
    assert np.abs(qs_mj - qs_dev).max() < 5e-2


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
