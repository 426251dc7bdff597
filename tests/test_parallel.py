"""Mesh/sharding scale-out tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ffmpc_tpu.parallel.mesh import make_dp_mesh, shard_batch, shard_batched_fn


@pytest.fixture(scope="module")
def mesh8():
    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return make_dp_mesh(8, devices=cpus)


def test_sharded_batched_solve(mesh8):
    """Batched Panda free-space solves sharded over 8 devices equal the
    unsharded result."""
    from ffmpc_tpu.core import make_panda_model, KEYFRAMES, gravity_torque
    from ffmpc_tpu.ocp.weights import OCPWeights
    from ffmpc_tpu.ocp.action import make_classical_knot
    from ffmpc_tpu.ocp.problem import build_problem_refs
    from ffmpc_tpu.solver.fddp import solve, FDDPSettings
    from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj

    model = make_panda_model("plant", dtype=jnp.float64)
    W = OCPWeights(dt_ocp=0.01)
    knot = make_classical_knot(model, W, surface=False)
    traj = ApproachCircleTraj(center=(-0.5, 0.0, 0.36), radius=0.10, omega=1.5,
                              z_contact=0.36, t_approach=0.55, t_pre=0.25,
                              ee_start=(0.088, 0.0, 0.855))
    q0 = jnp.asarray(KEYFRAMES["neutral"])
    x0 = jnp.concatenate([q0, jnp.zeros(7)])
    tau_g = gravity_torque(model, q0)
    R_des = jnp.asarray(np.diag([1.0, -1.0, -1.0]))
    N = 6
    refs_run, ref_T = build_problem_refs(
        traj, 0.0, N, W.dt_ocp, x0, tau_g, R_des, dtype=jnp.float64)
    st = FDDPSettings(max_iters=4, use_box=True)

    def one(x0_, xs_, us_):
        return solve(knot, refs_run, ref_T, x0_, xs_, us_, st).us

    B = 16
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.asarray(x0)[None] + 0.01 * rng.normal(size=(B, 14)))
    xs0 = jnp.tile(x0s[:, None], (1, N + 1, 1))
    us0 = jnp.tile(jnp.asarray(tau_g)[None, None], (B, N, 1))

    sharded = shard_batched_fn(jax.vmap(one), mesh8, 3)
    bs = shard_batch(mesh8)
    us_sharded = sharded(jax.device_put(x0s, bs), jax.device_put(xs0, bs),
                         jax.device_put(us0, bs))
    us_plain = jax.vmap(one)(x0s, xs0, us0)
    assert np.allclose(np.asarray(us_sharded), np.asarray(us_plain), atol=1e-10)
    # outputs actually live on the mesh
    assert len(us_sharded.sharding.device_set) == 8


@pytest.mark.quick
def test_cross_device_metric_reduction(mesh8):
    """Metric reduction over a sharded batch lowers to a collective."""
    bs = shard_batch(mesh8)

    @jax.jit
    def mean_err(x):
        return jnp.mean(jnp.linalg.norm(x, axis=-1))

    x = jax.device_put(jnp.arange(64.0).reshape(16, 4), bs)
    v = mean_err(x)
    expect = np.mean(np.linalg.norm(np.arange(64.0).reshape(16, 4), axis=-1))
    assert np.isclose(float(v), expect)
