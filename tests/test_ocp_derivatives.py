"""Finite-difference checks of the knot action models (calc vs diff).

Fx/Fu and Lx/Lu must be exact derivatives of xnext/cost (Lx/Lu are exact
even under Gauss-Newton; only the Hessians drop residual curvature)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ffmpc_tpu.core import make_panda_model, KEYFRAMES
from ffmpc_tpu.ocp.weights import OCPWeights, ProblemRefs
from ffmpc_tpu.ocp.action import make_classical_knot, make_augmented_knot

pytestmark = pytest.mark.quick


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


def _fd_check(calc, ref, x, u, Fx, Fu, Lx, Lu, eps=1e-6, tol=2e-5):
    nx, nu = x.shape[0], u.shape[0]
    for i in range(nx):
        dx = jnp.zeros(nx, x.dtype).at[i].set(eps)
        xp, cp = calc(ref, x + dx, u)
        xm, cm = calc(ref, x - dx, u)
        assert np.allclose((xp - xm) / (2 * eps), Fx[:, i], atol=tol), f"Fx col {i}"
        assert np.isclose((cp - cm) / (2 * eps), Lx[i], atol=tol), f"Lx[{i}]"
    for i in range(nu):
        du = jnp.zeros(nu, u.dtype).at[i].set(eps)
        xp, cp = calc(ref, x, u + du)
        xm, cm = calc(ref, x, u - du)
        assert np.allclose((xp - xm) / (2 * eps), Fu[:, i], atol=tol), f"Fu col {i}"
        assert np.isclose((cp - cm) / (2 * eps), Lu[i], atol=tol), f"Lu[{i}]"


def test_classical_free_knot(setup):
    model, W, ref, x, u = setup
    knot = make_classical_knot(model, W, surface=False)
    d = knot.diff(ref, x, u)
    xnext, cost = knot.calc(ref, x, u)
    assert np.allclose(np.asarray(d.xnext), np.asarray(xnext))
    assert np.isclose(float(d.cost), float(cost))
    _fd_check(knot.calc, ref, x, u, d.Fx, d.Fu, d.Lx, d.Lu)


def test_classical_contact_knot(setup):
    model, W, ref, x, u = setup
    knot = make_classical_knot(model, W, surface=True)
    d = knot.diff(ref, x, u)
    _fd_check(knot.calc, ref, x, u, d.Fx, d.Fu, d.Lx, d.Lu)


def test_classical_contact_3d_knot(setup):
    model, W, ref, x, u = setup
    W3 = OCPWeights(**{**W.__dict__, "contact_model": "point3d",
                       "w_friction_cone": 2.0e2})
    knot = make_classical_knot(model, W3, surface=True)
    d = knot.diff(ref, x, u)
    _fd_check(knot.calc, ref, x, u, d.Fx, d.Fu, d.Lx, d.Lu)


def test_terminal_gradients(setup):
    model, W, ref, x, u = setup
    # calc_mode="vector": the FD probe must evaluate the SAME cost function
    # the analytic terminal gradient differentiates — the scalar calc path
    # agrees only to accumulation-order roundoff (~1e-13 rel), which the
    # 1e-6 central difference amplifies above the tolerance.  Scalar==vector
    # equality is covered by test_scalar_knot.
    knot = make_classical_knot(model, W, surface=True, calc_mode="vector")
    cost, Lx, Lxx = knot.term_diff(ref, x)
    assert np.isclose(float(cost), float(knot.term_calc(ref, x)))
    eps = 1e-6
    for i in range(14):
        dx = jnp.zeros(14, x.dtype).at[i].set(eps)
        cp = knot.term_calc(ref, x + dx)
        cm = knot.term_calc(ref, x - dx)
        assert np.isclose((cp - cm) / (2 * eps), Lx[i], atol=2e-5), f"LxT[{i}]"


def test_augmented_knot_structure(setup):
    """LPF rows: Fx bottom-right = alpha*I, Fu bottom = (1-alpha)*I
    (reference block assembly, crocoddyl_force_feedback.py:249-255)."""
    model, W, ref, x, u = setup
    knot = make_augmented_knot(model, W, surface=False)
    tau = jnp.asarray(np.linspace(-2, 2, 7))
    y = jnp.concatenate([x, tau])
    w = u
    d = knot.diff(ref, y, w)
    a = W.ff_alpha
    assert np.allclose(np.asarray(d.Fx)[14:, 14:], a * np.eye(7), atol=1e-12)
    assert np.allclose(np.asarray(d.Fx)[14:, :14], 0.0, atol=1e-12)
    assert np.allclose(np.asarray(d.Fu)[14:, :], (1 - a) * np.eye(7), atol=1e-12)
    assert np.allclose(np.asarray(d.Fu)[:14, :], 0.0, atol=1e-12)
    _fd_check(knot.calc, ref, y, w, d.Fx, d.Fu, d.Lx, d.Lu)


def test_augmented_contact_knot(setup):
    model, W, ref, x, u = setup
    knot = make_augmented_knot(model, W, surface=True)
    tau = jnp.asarray(np.linspace(-2, 2, 7))
    y = jnp.concatenate([x, tau])
    d = knot.diff(ref, y, u)
    _fd_check(knot.calc, ref, y, u, d.Fx, d.Fu, d.Lx, d.Lu)
