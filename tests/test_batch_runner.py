"""On-device closed-loop episode: runs under scan+vmap, finite telemetry,
uncertainty injection variant."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ffmpc_tpu.core import make_panda_model, KEYFRAMES
from ffmpc_tpu.ocp.weights import OCPWeights
from ffmpc_tpu.solver.fddp import FDDPSettings
from ffmpc_tpu.sim.device_plant import make_table_params
from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj
from ffmpc_tpu.run.batch_runner import (
    make_episode_fn, EpisodeConfig, DeviceUncertainty)


@pytest.fixture(scope="module")
def setup():
    dtype = jnp.float64
    model = make_panda_model("plant", dtype=dtype)
    W = OCPWeights(dt_ocp=0.01, w_ee_pos=1.2e3)
    settings = FDDPSettings(max_iters=2, use_box=True)
    z_c = 0.342
    traj = ApproachCircleTraj(center=(-0.5, 0.0, z_c), radius=0.10, omega=1.5,
                              z_contact=z_c, t_approach=0.55,
                              z_pre=z_c + 0.05, t_pre=0.25,
                              ee_start=(-0.3, 0.0, 0.633), t_stabilize=0.2)
    table = make_table_params(0.0, dtype=dtype)
    q0 = np.asarray(KEYFRAMES["neutral"])
    return dtype, model, W, settings, traj, table, q0


@pytest.mark.parametrize("controller", ["classical", "force_feedback"])
def test_episode_runs(setup, controller):
    dtype, model, W, settings, traj, table, q0 = setup
    ep = EpisodeConfig(controller=controller, horizon=4, n_ticks=3,
                       ff_alpha_ocp=0.2, ff_alpha_ctrl=0.45)
    episode = jax.jit(make_episode_fn(model, W, settings, traj, table, ep,
                                      q0, dtype=dtype))
    telem = episode(jnp.asarray(q0, dtype))
    assert telem["err_3d"].shape == (3,)
    assert np.all(np.isfinite(np.asarray(telem["q"])))
    assert np.all(np.isfinite(np.asarray(telem["tau_cmd"])))


def test_episode_with_uncertainty(setup):
    dtype, model, W, settings, traj, table, q0 = setup
    ep = EpisodeConfig(controller="classical", horizon=4, n_ticks=3)
    unc = DeviceUncertainty(a=1.03, b=0.05, sigma_q=5e-4, sigma_dq=2e-3,
                            sigma_tau=5e-2, seed=15)
    episode = jax.jit(make_episode_fn(model, W, settings, traj, table, ep,
                                      q0, uncertainty=unc, dtype=dtype))
    telem = episode(jnp.asarray(q0, dtype))
    assert np.all(np.isfinite(np.asarray(telem["q"])))
    # injection changes the trajectory vs the clean episode
    clean = jax.jit(make_episode_fn(model, W, settings, traj, table, ep,
                                    q0, dtype=dtype))(jnp.asarray(q0, dtype))
    assert not np.allclose(np.asarray(telem["q"]), np.asarray(clean["q"]))


def test_chunked_episode_matches_single_scan(setup):
    """episode.init + two episode.chunk calls == one full-episode scan."""
    dtype, model, W, settings, traj, table, q0 = setup
    ep = EpisodeConfig(controller="force_feedback", horizon=4, n_ticks=4,
                       ff_alpha_ocp=0.2, ff_alpha_ctrl=0.45)
    episode = make_episode_fn(model, W, settings, traj, table, ep, q0,
                              dtype=dtype)
    q0j = jnp.asarray(q0, dtype)
    full = jax.jit(episode)(q0j)

    chunk = jax.jit(lambda c, t: episode.chunk(c, t, 2))
    carry = jax.jit(episode.init)(q0j)
    carry, t1 = chunk(carry, jnp.asarray(0.0, dtype))
    _, t2 = chunk(carry, jnp.asarray(2 * ep.dt_mpc, dtype))
    merged = jax.tree.map(
        lambda a, b: np.concatenate([np.asarray(a), np.asarray(b)]), t1, t2)
    for k in ("q", "tau_cmd", "err_3d", "fn_meas"):
        assert np.allclose(merged[k], np.asarray(full[k]), atol=1e-12), k
