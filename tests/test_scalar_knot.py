"""Scalar-channel knot calc == vectorized knot calc (float64, to roundoff).

The scalar path (ocp/scalar_knot.py) is the production rollout kernel on
TPU; the vectorized path is the readable oracle.  Any divergence beyond
accumulation-order roundoff is a bug in one of them.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ffmpc_tpu.core.panda import make_panda_model, KEYFRAMES
from ffmpc_tpu.core.dynamics import gravity_torque
from ffmpc_tpu.ocp.action import make_classical_knot, make_augmented_knot
from ffmpc_tpu.ocp.weights import OCPWeights
from ffmpc_tpu.ocp.problem import build_problem_refs
from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj
from ffmpc_tpu.mpc.controllers import make_vertical_down_R


def _setup(W, surface, family, dtype=jnp.float64):
    model = make_panda_model("plant", dtype=dtype)
    traj = ApproachCircleTraj(center=(-0.5, 0.0, 0.342), radius=0.10,
                              omega=1.5, z_contact=0.342, t_approach=0.55,
                              z_pre=0.392, t_pre=0.25,
                              ee_start=(-0.3, 0.0, 0.633), t_stabilize=0.2)
    q0 = jnp.asarray(KEYFRAMES["neutral"], dtype)
    tau_g = gravity_torque(model, q0)
    x_reg = jnp.concatenate([q0, jnp.zeros(7, dtype)])
    y0 = jnp.concatenate([q0, jnp.zeros(7, dtype), tau_g])
    refs_run, ref_T = build_problem_refs(
        traj, 1.2, 8, W.dt_ocp, x_reg, tau_g,
        jnp.asarray(make_vertical_down_R(), dtype),
        y_ref=(y0 if family == "augmented" else None), dtype=dtype)
    make = make_augmented_knot if family == "augmented" else make_classical_knot
    kv = make(model, W, surface=surface, calc_mode="vector")
    ks = make(model, W, surface=surface, calc_mode="scalar")
    return kv, ks, refs_run, ref_T, q0, tau_g


CASES = [
    ("classical", False, {}),
    ("classical", True, {}),
    ("classical", True, {"contact_model": "point3d"}),
    ("classical", True, {"w_q_soft_limits": 5.0, "w_tau_soft_limits": 2.0,
                         "w_plane_z": 10.0, "w_vz": 3.0}),
    ("augmented", False, {"ff_alpha": 0.4}),
    ("augmented", True, {"ff_alpha": 0.4}),
    ("augmented", True, {"ff_alpha": 0.4, "contact_model": "point3d"}),
]


@pytest.mark.parametrize("family,surface,overrides", CASES)
def test_scalar_calc_matches_vector(family, surface, overrides):
    W = OCPWeights(contact_gains=(140.0, 80.0), **overrides)
    kv, ks, refs_run, ref_T, q0, tau_g = _setup(W, surface, family)
    nx = kv.nx
    rng = np.random.default_rng(3)

    ref0 = jax.tree.map(lambda a: a[0], refs_run)
    for trial in range(4):
        q = np.asarray(q0) + 0.3 * rng.normal(size=7)
        v = 0.8 * rng.normal(size=7)
        tau = np.asarray(tau_g) + 3.0 * rng.normal(size=7)
        if nx == 21:
            x = jnp.asarray(np.concatenate([q, v, tau]))
        else:
            x = jnp.asarray(np.concatenate([q, v]))
        u = jnp.asarray(np.asarray(tau_g) + 2.0 * rng.normal(size=7))

        xn_v, c_v = kv.calc(ref0, x, u)
        xn_s, c_s = ks.calc(ref0, x, u)
        np.testing.assert_allclose(np.asarray(xn_s), np.asarray(xn_v),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(float(c_s), float(c_v), rtol=1e-9)

        tv = kv.term_calc(ref_T, x)
        ts = ks.term_calc(ref_T, x)
        np.testing.assert_allclose(float(ts), float(tv), rtol=1e-9)


DIFF_CASES = [
    ("classical", False, {}),
    ("classical", True, {}),
    ("classical", True, {"contact_model": "point3d"}),
    ("augmented", True, {"ff_alpha": 0.4}),
    ("augmented", False, {"ff_alpha": 0.4}),
]


@pytest.mark.parametrize(
    "family,surface,overrides",
    [pytest.param(*c, marks=pytest.mark.quick) if i < 2 else c
     for i, c in enumerate(DIFF_CASES)])
def test_scalar_diff_matches_analytic(family, surface, overrides):
    """deriv_mode="scalar" (jacfwd through the scalar chain) must agree with
    the FD-verified analytic derivative path."""
    W = OCPWeights(contact_gains=(140.0, 80.0), w_q_soft_limits=5.0,
                   w_tau_soft_limits=2.0, **overrides)
    model = make_panda_model("plant", dtype=jnp.float64)
    make = make_augmented_knot if family == "augmented" else make_classical_knot
    ka = make(model, W, surface=surface, deriv_mode="analytic")
    ks = make(model, W, surface=surface, deriv_mode="scalar")
    _, _, refs_run, ref_T, q0, tau_g = _setup(W, surface, family)
    ref0 = jax.tree.map(lambda a: a[0], refs_run)

    rng = np.random.default_rng(11)
    q = np.asarray(q0) + 0.25 * rng.normal(size=7)
    v = 0.6 * rng.normal(size=7)
    tau = np.asarray(tau_g) + 2.0 * rng.normal(size=7)
    if ka.nx == 21:
        x = jnp.asarray(np.concatenate([q, v, tau]))
    else:
        x = jnp.asarray(np.concatenate([q, v]))
    u = jnp.asarray(np.asarray(tau_g) + 1.5 * rng.normal(size=7))

    da = ka.diff(ref0, x, u)
    ds = ks.diff(ref0, x, u)
    for name in ("xnext", "cost", "Fx", "Fu", "Lx", "Lu", "Lxx", "Lxu", "Luu"):
        np.testing.assert_allclose(
            np.asarray(getattr(ds, name)), np.asarray(getattr(da, name)),
            rtol=1e-7, atol=1e-9, err_msg=name)

    ca, lxa, lxxa = ka.term_diff(ref_T, x)
    cs, lxs, lxxs = ks.term_diff(ref_T, x)
    np.testing.assert_allclose(float(cs), float(ca), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(lxs), np.asarray(lxa), rtol=1e-7,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(lxxs), np.asarray(lxxa), rtol=1e-7,
                               atol=1e-9)


@pytest.mark.parametrize("family,surface,overrides", [
    ("classical", True, {}),
    ("augmented", True, {"ff_alpha": 0.4}),
    ("augmented", False, {"ff_alpha": 0.4}),
])
def test_scalar_unroll_diff_identical(family, surface, overrides):
    """deriv_mode="scalar_unroll" (7 unrolled one-hot jvp sweeps — the
    full-lane TPU layout, core.scalar_chain._jacfwd7) must be numerically
    IDENTICAL to "scalar" (jacfwd tangent vmap): same ops, different
    batching, zero tolerance."""
    W = OCPWeights(contact_gains=(140.0, 80.0), w_q_soft_limits=5.0,
                   w_tau_soft_limits=2.0, **overrides)
    model = make_panda_model("plant", dtype=jnp.float64)
    make = make_augmented_knot if family == "augmented" else make_classical_knot
    ks = make(model, W, surface=surface, deriv_mode="scalar")
    ku = make(model, W, surface=surface, deriv_mode="scalar_unroll")
    _, _, refs_run, ref_T, q0, tau_g = _setup(W, surface, family)
    ref0 = jax.tree.map(lambda a: a[0], refs_run)

    rng = np.random.default_rng(7)
    for _ in range(2):
        q = np.asarray(q0) + 0.25 * rng.normal(size=7)
        v = 0.6 * rng.normal(size=7)
        tau = np.asarray(tau_g) + 2.0 * rng.normal(size=7)
        if ks.nx == 21:
            x = jnp.asarray(np.concatenate([q, v, tau]))
        else:
            x = jnp.asarray(np.concatenate([q, v]))
        u = jnp.asarray(np.asarray(tau_g) + 1.5 * rng.normal(size=7))
        ds = ks.diff(ref0, x, u)
        du = ku.diff(ref0, x, u)
        for name in ("xnext", "cost", "Fx", "Fu", "Lx", "Lu", "Lxx", "Lxu",
                     "Luu"):
            np.testing.assert_array_equal(
                np.asarray(getattr(du, name)), np.asarray(getattr(ds, name)),
                err_msg=name)


def test_scalar_calc_vmaps():
    """Batched (vmapped) scalar calc == loop over singles."""
    W = OCPWeights(contact_gains=(140.0, 80.0), ff_alpha=0.4)
    _, ks, refs_run, _, q0, tau_g = _setup(W, True, "augmented")
    rng = np.random.default_rng(0)
    B = 5
    ys = np.concatenate(
        [np.asarray(q0)[None] + 0.1 * rng.normal(size=(B, 7)),
         0.5 * rng.normal(size=(B, 7)),
         np.asarray(tau_g)[None] + rng.normal(size=(B, 7))], axis=1)
    ws = np.asarray(tau_g)[None] + rng.normal(size=(B, 7))
    ref0 = jax.tree.map(lambda a: a[0], refs_run)
    refsB = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), ref0)
    xnB, cB = jax.vmap(ks.calc)(refsB, jnp.asarray(ys), jnp.asarray(ws))
    for b in range(B):
        xn1, c1 = ks.calc(ref0, jnp.asarray(ys[b]), jnp.asarray(ws[b]))
        np.testing.assert_allclose(np.asarray(xnB[b]), np.asarray(xn1),
                                   rtol=1e-12, atol=0)
        np.testing.assert_allclose(float(cB[b]), float(c1), rtol=1e-12)


def _all_weights_on():
    """OCPWeights with every w_* field nonzero: any cost term a future
    weight gates is automatically exercised by the parity tests below
    (advisor round-1 finding: a term added only to the vector path would
    silently diverge from the scalar path until a case covered it)."""
    import dataclasses
    kw = {}
    for f in dataclasses.fields(OCPWeights):
        if f.name.startswith("w_") and f.type == "float":
            default = f.default
            kw[f.name] = 1.7 if (isinstance(default, float) and default == 0.0) else default
    kw["contact_gains"] = (140.0, 80.0)
    kw["ff_alpha"] = 0.4
    return OCPWeights(**kw)


@pytest.mark.parametrize("family,surface,contact_model", [
    ("classical", False, "normal_1d"),
    ("classical", True, "normal_1d"),
    ("classical", True, "point3d"),
    ("augmented", True, "point3d"),
])
def test_scalar_parity_exhaustive_over_cost_terms(family, surface,
                                                  contact_model):
    """calc AND diff parity with every weight enabled — the completeness
    guard over the shared cost-term spec (ocp/action._make_spec)."""
    import dataclasses
    W = dataclasses.replace(_all_weights_on(), contact_model=contact_model)
    from ffmpc_tpu.ocp.action import _make_spec
    model = make_panda_model("plant", dtype=jnp.float64)
    spec, _ = _make_spec(model, W, surface)
    # every spec term this family/surface can have must be active
    inactive = [n for n, t in spec.items() if t.weight == 0.0]
    assert not inactive, f"terms with zero weight in exhaustive case: {inactive}"

    kv, ks, refs_run, ref_T, q0, tau_g = _setup(W, surface, family)
    make = make_augmented_knot if family == "augmented" else make_classical_knot
    ka = make(model, W, surface=surface, deriv_mode="analytic")
    ksd = make(model, W, surface=surface, deriv_mode="scalar")
    ref0 = jax.tree.map(lambda a: a[0], refs_run)
    rng = np.random.default_rng(23)
    q = np.asarray(q0) + 0.2 * rng.normal(size=7)
    v = 0.5 * rng.normal(size=7)
    tau = np.asarray(tau_g) + 2.0 * rng.normal(size=7)
    x = jnp.asarray(np.concatenate([q, v, tau] if kv.nx == 21
                                   else [q, v]))
    u = jnp.asarray(np.asarray(tau_g) + 1.5 * rng.normal(size=7))

    xn_v, c_v = kv.calc(ref0, x, u)
    xn_s, c_s = ks.calc(ref0, x, u)
    np.testing.assert_allclose(np.asarray(xn_s), np.asarray(xn_v),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(float(c_s), float(c_v), rtol=1e-9)
    np.testing.assert_allclose(float(ks.term_calc(ref_T, x)),
                               float(kv.term_calc(ref_T, x)), rtol=1e-9)

    da = ka.diff(ref0, x, u)
    ds = ksd.diff(ref0, x, u)
    for name in ("xnext", "cost", "Fx", "Fu", "Lx", "Lu", "Lxx", "Lxu", "Luu"):
        np.testing.assert_allclose(
            np.asarray(getattr(ds, name)), np.asarray(getattr(da, name)),
            rtol=1e-7, atol=1e-9, err_msg=name)
