"""f32 cold-start hardening (VERDICT r2 weak #3 / next-round item 5).

The flagship augmented contact OCP mixes cost curvatures across ~7 decades
(contact tangent ~3e4 vs tau channel ~6e-4): RESULTS.md r2 recorded f32
value recursions "at the edge of overflow" on pathological cold bang-bang
iterates.  These tests pin, at the SHIPPED dtype (f32) and shapes
(N=40, nx=21):

  - the sequential box backward produces finite gains on a cold bang-bang
    iterate (saturated alternating controls rolled out from the start),
    at reg levels from 1e-9 to 1e-1;
  - full cold-start BoxFDDP solves (tiled warm start, large state
    perturbations) finish with finite gains/controls and never trip the
    backward-pass regularization retry;
  - the equilibrated parallel Riccati stays finite on the same iterate.

The runtime guard for genuinely indefinite/overflowed sweeps is the
backward-pass retry: non-finite gains set bw_bad and re-run the sweep at
10x regularization (fddp.solve bw_cond/bw_body), mirroring Crocoddyl's
increaseRegularization-on-failure semantics.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from __graft_entry__ import _common
from ffmpc_tpu.core import gravity_torque
from ffmpc_tpu.ocp.action import make_augmented_knot
from ffmpc_tpu.ocp.problem import build_problem_refs
from ffmpc_tpu.solver.backward_pallas import _backward_seq
from ffmpc_tpu.solver.fddp import solve, FDDPSettings

HORIZON = 40
DTYPE = jnp.float32


@pytest.fixture(scope="module")
def flagship():
    model, W, settings, traj, ep, q0 = _common(DTYPE, horizon=HORIZON,
                                               max_iters=10)
    knot = make_augmented_knot(model, W, surface=True, calc_mode="vector")
    tau_g = gravity_torque(model, jnp.asarray(q0, DTYPE))
    y0 = jnp.concatenate([jnp.asarray(q0, DTYPE), jnp.zeros(7, DTYPE), tau_g])
    R_des = jnp.asarray(np.diag([1.0, -1.0, -1.0]), DTYPE)
    refs_run, ref_T = build_problem_refs(
        traj, 1.2, HORIZON, W.dt_ocp, y0[:14], tau_g, R_des, y_ref=y0,
        dtype=DTYPE)
    return knot, refs_run, ref_T, y0, tau_g


def _bang_bang_problem(knot, refs_run, ref_T, y0):
    """Linearization along a cold bang-bang rollout: alternating saturated
    controls integrated from y0 (the 'aggressive bang-bang plans' regime of
    cold stiff-contact solves, ROADMAP round-1 notes)."""
    lim = jnp.asarray(knot.u_ub, DTYPE)
    sign = jnp.asarray([(-1.0) ** k for k in range(HORIZON)], DTYPE)
    us = sign[:, None] * lim[None, :]

    def roll(y0, us):
        def step(y, inp):
            ref, u = inp
            ynext, _ = knot.calc(ref, y, u)
            return ynext, ynext
        _, ys = jax.lax.scan(step, y0, (refs_run, us))
        return jnp.concatenate([y0[None], ys])

    ys = jax.jit(roll)(y0, us)
    derivs = jax.jit(jax.vmap(knot.diff))(refs_run, ys[:-1], us)
    _, LxT, LxxT = jax.jit(knot.term_diff)(ref_T, ys[-1])
    fs = jnp.concatenate([jnp.zeros((1, 21), DTYPE),
                          derivs.xnext - ys[1:]], axis=0)
    lb = -lim[None, :] - us
    ub = lim[None, :] - us
    return derivs, fs, LxT, LxxT, lb, ub


def test_cold_bang_bang_backward_finite(flagship):
    knot, refs_run, ref_T, y0, tau_g = flagship
    derivs, fs, LxT, LxxT, lb, ub = _bang_bang_problem(
        knot, refs_run, ref_T, y0)
    assert bool(jnp.all(jnp.isfinite(derivs.Lxx)))
    bw = jax.jit(lambda *a: _backward_seq(*a, boxqp_iters=8,
                                          kgain_reg=1e-12))
    for reg in (1e-9, 1e-5, 1e-1):
        K, kff, qu2, dg, dq, bad, w_all = bw(
            derivs.Fx, derivs.Fu, derivs.Lx, derivs.Lu, derivs.Lxx,
            derivs.Lxu, derivs.Luu, fs, LxT, LxxT, lb, ub,
            jnp.asarray(reg, DTYPE), jnp.asarray(reg, DTYPE))
        assert bool(jnp.all(jnp.isfinite(K))), reg
        assert bool(jnp.all(jnp.isfinite(kff))), reg
        assert not bool(bad), reg


def test_cold_bang_bang_parallel_riccati_finite(flagship):
    """The equilibrated associative-scan sweep on the same iterate."""
    from ffmpc_tpu.solver.riccati_scan import parallel_riccati
    knot, refs_run, ref_T, y0, tau_g = flagship
    derivs, fs, LxT, LxxT, lb, ub = _bang_bang_problem(
        knot, refs_run, ref_T, y0)
    K, k, Vx, Vxx = jax.jit(parallel_riccati, static_argnames="ureg")(
        derivs.Fx, derivs.Fu, derivs.Lx, derivs.Lu, derivs.Lxx,
        derivs.Lxu, derivs.Luu, fs[1:], LxT, LxxT, ureg=1e-6)
    assert bool(jnp.all(jnp.isfinite(K)))
    assert bool(jnp.all(jnp.isfinite(k)))


def test_cold_full_solve_finite(flagship):
    """Cold 10-iteration BoxFDDP from tiled starts with large state noise:
    finite outputs, no backward retry trips."""
    knot, refs_run, ref_T, y0, tau_g = flagship
    settings = FDDPSettings(max_iters=10, use_box=True)
    solv = jax.jit(lambda y0_, xs, us: solve(
        knot, refs_run, ref_T, y0_, xs, us, settings, debug_history=True))
    rng = np.random.default_rng(0)
    for trial in range(2):
        dy = np.concatenate([0.3 * rng.normal(size=7),
                             2.0 * rng.normal(size=7),
                             20.0 * rng.normal(size=7)])
        y0t = y0 + jnp.asarray(dy, DTYPE)
        xs = jnp.tile(y0t, (HORIZON + 1, 1))
        us = jnp.tile(tau_g, (HORIZON, 1))
        res, hist = solv(y0t, xs, us)
        assert bool(jnp.all(jnp.isfinite(res.K))), trial
        assert bool(jnp.all(jnp.isfinite(res.us))), trial
        assert bool(jnp.all(jnp.isfinite(res.cost))), trial
