"""Fused Pallas line-search rollout == alpha-vmapped XLA scan.

Interpreter-mode equality tests (same kernel code Mosaic compiles on TPU):
the scalar-channel knot calc runs INSIDE the kernel, so this also pins
that the chain is kernel-safe.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ffmpc_tpu.core import make_panda_model, KEYFRAMES, gravity_torque
from ffmpc_tpu.ocp.action import make_augmented_knot
from ffmpc_tpu.ocp.weights import OCPWeights
from ffmpc_tpu.ocp.problem import build_problem_refs
from ffmpc_tpu.solver.fddp import solve, FDDPSettings
from ffmpc_tpu.solver.rollout_pallas import make_fused_rollout
from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj
import pytest

NH, BN, NA = 4, 2, 6
Z_C = 0.342


def _setup(dtype=jnp.float64):
    model = make_panda_model("plant", dtype=dtype)
    alpha = 0.3
    W = OCPWeights(dt_ocp=0.01, w_ee_pos=1.2e3, w_plane_z=9.0e2,
                   contact_gains=(145.0, 85.0), fn_des=22.0, w_fn=3.0e1,
                   z_press=0.0065, ff_alpha=alpha, w_w=6.0e-4, w_y=8.0e-4)
    traj = ApproachCircleTraj(center=(-0.5, 0.0, Z_C), radius=0.10,
                              omega=1.5, z_contact=Z_C, t_approach=0.55,
                              z_pre=Z_C + 0.05, t_pre=0.25,
                              ee_start=(-0.3, 0.0, 0.633), t_stabilize=0.2)
    knot = make_augmented_knot(model, W, surface=True)   # calc_mode scalar
    q0 = jnp.asarray(KEYFRAMES["neutral"], dtype)
    tau_g = gravity_torque(model, q0)
    y0 = jnp.concatenate([q0, jnp.zeros(7, dtype), tau_g])
    x_reg = jnp.concatenate([q0, jnp.zeros(7, dtype)])
    refs_run, ref_T = build_problem_refs(
        traj, jnp.asarray(1.2, dtype), NH, W.dt_ocp, x_reg, tau_g,
        jnp.asarray(np.diag([1.0, -1.0, -1.0]), dtype), y_ref=y0,
        dtype=dtype)
    return knot, refs_run, ref_T, y0, tau_g


def _batch(rng, y0, tau_g, dtype=jnp.float64):
    nx = y0.shape[0]
    x0s = y0[None] + 0.05 * jnp.asarray(rng.normal(size=(BN, nx)), dtype)
    xss = jnp.tile(x0s[:, None, :], (1, NH + 1, 1)) + 0.02 * jnp.asarray(
        rng.normal(size=(BN, NH + 1, nx)), dtype)
    uss = jnp.tile(tau_g, (BN, NH, 1)) + 2.0 * jnp.asarray(
        rng.normal(size=(BN, NH, 7)), dtype)
    Ks = 0.1 * jnp.asarray(rng.normal(size=(BN, NH, 7, nx)), dtype)
    kffs = 1.0 * jnp.asarray(rng.normal(size=(BN, NH, 7)), dtype)
    fss = 0.1 * jnp.asarray(rng.normal(size=(BN, NH + 1, nx)), dtype)
    feas = jnp.asarray([False, True])
    return x0s, xss, uss, Ks, kffs, fss, feas


@pytest.mark.quick
def test_fused_rollout_matches_scan():
    knot, refs_run, ref_T, y0, tau_g = _setup()
    rng = np.random.default_rng(7)
    x0s, xss, uss, Ks, kffs, fss, feas = _batch(rng, y0, tau_g)
    rollout = make_fused_rollout(knot, NA, use_box=True)

    out_b = jax.vmap(
        rollout, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None))(
        x0s, xss, uss, Ks, kffs, fss, feas, refs_run, ref_T)

    for b in range(BN):
        ref = rollout(x0s[b], xss[b], uss[b], Ks[b], kffs[b], fss[b],
                      feas[b], refs_run, ref_T)
        for i, name in enumerate(("xs_tries", "us_tries", "cost_tries")):
            np.testing.assert_allclose(
                np.asarray(out_b[i][b]), np.asarray(ref[i]),
                rtol=5e-9, atol=1e-10, err_msg=f"b={b} {name}")


def test_solve_with_pallas_rollout_matches_default():
    knot, refs_run, ref_T, y0, tau_g = _setup()
    rng = np.random.default_rng(8)
    nx = y0.shape[0]
    x0s = y0[None] + 0.03 * jnp.asarray(rng.normal(size=(BN, nx)),
                                        jnp.float64)
    xss = jnp.tile(x0s[:, None, :], (1, NH + 1, 1))
    uss = jnp.tile(tau_g, (BN, NH, 1))

    def run(settings):
        return jax.vmap(lambda x0, xs, us: solve(
            knot, refs_run, ref_T, x0, xs, us, settings))(x0s, xss, uss)

    # one iteration: no acceptance-branch compounding — strict equality
    # up to kernel reassociation noise
    st1 = FDDPSettings(max_iters=1, use_box=True, n_alphas=NA)
    r_ref = run(st1)
    r_pal = run(dataclasses.replace(st1, rollout_mode="pallas"))
    for name in ("xs", "us", "K", "k", "cost", "stop", "iters"):
        np.testing.assert_allclose(
            np.asarray(getattr(r_pal, name)),
            np.asarray(getattr(r_ref, name)), rtol=1e-6, atol=1e-8,
            err_msg=name)

    # three iterations: tiny reassociation differences get amplified
    # through acceptance branches — check convergence-level agreement
    st3 = FDDPSettings(max_iters=3, use_box=True, n_alphas=NA)
    r_ref3 = run(st3)
    r_pal3 = run(dataclasses.replace(st3, rollout_mode="pallas"))
    np.testing.assert_allclose(np.asarray(r_pal3.cost),
                               np.asarray(r_ref3.cost), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(r_pal3.iters),
                                  np.asarray(r_ref3.iters))


def test_solve_with_both_pallas_kernels_matches_default():
    """The production default (backward_mode + rollout_mode = pallas)
    against the all-XLA solve — the combined configuration bench.py
    ships with."""
    knot, refs_run, ref_T, y0, tau_g = _setup()
    rng = np.random.default_rng(9)
    nx = y0.shape[0]
    x0s = y0[None] + 0.03 * jnp.asarray(rng.normal(size=(BN, nx)),
                                        jnp.float64)
    xss = jnp.tile(x0s[:, None, :], (1, NH + 1, 1))
    uss = jnp.tile(tau_g, (BN, NH, 1))

    def run(settings):
        return jax.vmap(lambda x0, xs, us: solve(
            knot, refs_run, ref_T, x0, xs, us, settings))(x0s, xss, uss)

    st1 = FDDPSettings(max_iters=1, use_box=True, n_alphas=NA)
    st1p = dataclasses.replace(st1, rollout_mode="pallas",
                               backward_mode="pallas")
    r_ref = run(st1)
    r_pal = run(st1p)
    # both kernels reassociate and the backward's K feeds the rollout —
    # compounded float noise, an order looser than each kernel alone
    for name in ("xs", "us", "K", "k", "cost", "stop", "iters"):
        np.testing.assert_allclose(
            np.asarray(getattr(r_pal, name)),
            np.asarray(getattr(r_ref, name)), rtol=1e-4, atol=1e-6,
            err_msg=name)

    st3 = FDDPSettings(max_iters=3, use_box=True, n_alphas=NA)
    r_ref3 = run(st3)
    r_pal3 = run(dataclasses.replace(st3, rollout_mode="pallas",
                                     backward_mode="pallas"))
    np.testing.assert_allclose(np.asarray(r_pal3.cost),
                               np.asarray(r_ref3.cost), rtol=1e-4)
