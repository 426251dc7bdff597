"""Analytic knot derivatives vs the jacfwd reference path.

The analytic path (KKT implicit-function-theorem dynamics derivatives +
frame-Jacobian residual derivatives, ocp/action.py _classical_analytic)
must reproduce the full-AD jacfwd path to roundoff: both differentiate the
same damped-KKT dynamics, so this is an exactness check, not a tolerance
judgement call.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ffmpc_tpu.core import make_panda_model, KEYFRAMES
from ffmpc_tpu.ocp.weights import OCPWeights, ProblemRefs
from ffmpc_tpu.ocp.action import make_classical_knot, make_augmented_knot


@pytest.fixture(scope="module")
def setup():
    model = make_panda_model("plant", dtype=jnp.float64)
    W = OCPWeights(
        dt_ocp=0.01,
        w_q_soft_limits=8.0, w_tau_soft_limits=2.0,
        w_plane_z=1.2e3, w_vz=5.0e2,
        contact_gains=(140.0, 80.0), fn_des=22.0, w_fn=28.0,
        ff_alpha=float(np.exp(-2 * np.pi * 25.0 * 0.01)),
    )
    q0 = KEYFRAMES["neutral"]
    x = jnp.asarray(np.concatenate([q0, 0.1 * np.ones(7)]))
    u = jnp.asarray(np.linspace(-5, 5, 7))
    ref = ProblemRefs(
        p_ref=jnp.asarray([0.4, 0.1, 0.35]),
        v_ref=jnp.asarray([0.1, -0.05, 0.0]),
        x_reg_ref=x,
        tau_ref=jnp.asarray(np.linspace(-1, 1, 7)),
        R_des=jnp.asarray(np.diag([1.0, -1.0, -1.0])),
        y_ref=jnp.concatenate([x, jnp.asarray(np.linspace(-1, 1, 7))]),
    )
    return model, W, ref, x, u


def _compare(d_an, d_ad, tol=1e-9):
    for fld in d_an._fields:
        a = np.asarray(getattr(d_an, fld))
        b = np.asarray(getattr(d_ad, fld))
        scale = max(1.0, np.abs(b).max())
        assert np.allclose(a, b, atol=tol * scale), (
            f"{fld}: max err {np.abs(a - b).max():.3e} (scale {scale:.3e})")


def _compare_term(t_an, t_ad, tol=1e-9):
    for a, b, nm in zip(t_an, t_ad, ("cost", "Lx", "Lxx")):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(b).max())
        assert np.allclose(a, b, atol=tol * scale), f"terminal {nm}"


@pytest.mark.parametrize("surface", [False, True])
def test_classical(setup, surface):
    model, W, ref, x, u = setup
    kn_an = make_classical_knot(model, W, surface, deriv_mode="analytic")
    kn_ad = make_classical_knot(model, W, surface, deriv_mode="jacfwd")
    _compare(kn_an.diff(ref, x, u), kn_ad.diff(ref, x, u))
    _compare_term(kn_an.term_diff(ref, x), kn_ad.term_diff(ref, x))


def test_classical_point3d(setup):
    model, W, ref, x, u = setup
    W3 = OCPWeights(**{**W.__dict__, "contact_model": "point3d",
                       "w_friction_cone": 2.0e2})
    kn_an = make_classical_knot(model, W3, True, deriv_mode="analytic")
    kn_ad = make_classical_knot(model, W3, True, deriv_mode="jacfwd")
    _compare(kn_an.diff(ref, x, u), kn_ad.diff(ref, x, u))
    _compare_term(kn_an.term_diff(ref, x), kn_ad.term_diff(ref, x))


@pytest.mark.parametrize("surface", [False, True])
def test_augmented(setup, surface):
    model, W, ref, x, u = setup
    kn_an = make_augmented_knot(model, W, surface, deriv_mode="analytic")
    kn_ad = make_augmented_knot(model, W, surface, deriv_mode="jacfwd")
    tau = jnp.asarray(np.linspace(-2, 2, 7))
    y = jnp.concatenate([x, tau])
    _compare(kn_an.diff(ref, y, u), kn_ad.diff(ref, y, u))
    _compare_term(kn_an.term_diff(ref, y), kn_ad.term_diff(ref, y))


def test_augmented_no_inner_regs(setup):
    model, W, ref, x, u = setup
    W2 = OCPWeights(**{**W.__dict__, "use_inner_state_reg": False,
                       "use_inner_tau_reg": False})
    kn_an = make_augmented_knot(model, W2, True, deriv_mode="analytic")
    kn_ad = make_augmented_knot(model, W2, True, deriv_mode="jacfwd")
    tau = jnp.asarray(np.linspace(-2, 2, 7))
    y = jnp.concatenate([x, tau])
    _compare(kn_an.diff(ref, y, u), kn_ad.diff(ref, y, u))
    _compare_term(kn_an.term_diff(ref, y), kn_ad.term_diff(ref, y))
