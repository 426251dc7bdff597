"""Oracle tests: ffmpc_tpu.core kinematics/dynamics vs MuJoCo on the same scene.

This generalizes the reference's runtime MuJoCo<->Pinocchio alignment check
(run_classical.py:113-178) into a proper test suite, and extends it to
dynamics (mass matrix, bias forces, forward dynamics), which the reference
never cross-checked at all.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax.numpy as jnp

from ffmpc_tpu.core import (
    make_panda_model, fk, ee_jacobian, ee_velocity,
    rnea, bias_forces, gravity_torque, mass_matrix, fwd_dynamics_free,
)
from ffmpc_tpu.sim.paths import SCENE_XML

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def mj():
    model = mujoco.MjModel.from_xml_path(str(SCENE_XML))
    data = mujoco.MjData(model)
    return model, data


@pytest.fixture(scope="module")
def panda():
    return make_panda_model("plant", dtype=jnp.float64)


def _rand_qv(rng, n):
    lo = np.array([-2.8, -1.7, -2.8, -3.0, -2.8, 0.0, -2.8])
    hi = np.array([2.8, 1.7, 2.8, -0.1, 2.8, 3.7, 2.8])
    q = rng.uniform(lo, hi, size=(n, 7))
    v = rng.normal(scale=1.0, size=(n, 7))
    return q, v


def test_model_constants_match_mujoco(mj, panda):
    """Masses / inertias / COMs as MuJoCo derives them match our constants."""
    model, _ = mj
    for i in range(1, 8):
        bid = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_BODY, f"link{i}")
        m_mj = model.body_mass[bid]
        if i == 7:
            # our plant model folds the fixed tool body into link7
            tool_id = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_BODY, "tool")
            m_mj = m_mj + model.body_mass[tool_id]
        assert np.isclose(float(panda.mass[i - 1]), m_mj, rtol=1e-6), f"link{i} mass"


def test_fk_matches_mujoco_site(mj, panda):
    model, data = mj
    site_id = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_SITE, "ee_site")
    rng = np.random.default_rng(0)
    q, _ = _rand_qv(rng, 32)

    res = fk(panda, jnp.asarray(q))
    for k in range(q.shape[0]):
        data.qpos[:7] = q[k]
        data.qvel[:] = 0.0
        mujoco.mj_forward(model, data)
        p_mj = data.site_xpos[site_id].copy()
        R_mj = data.site_xmat[site_id].reshape(3, 3).copy()
        assert np.allclose(np.asarray(res.ee_p)[k], p_mj, atol=1e-10)
        assert np.allclose(np.asarray(res.ee_R)[k], R_mj, atol=1e-10)


def test_jacobian_matches_mujoco(mj, panda):
    model, data = mj
    site_id = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_SITE, "ee_site")
    rng = np.random.default_rng(1)
    q, v = _rand_qv(rng, 16)

    Jp, Jr = ee_jacobian(panda, jnp.asarray(q))
    lin, ang = ee_velocity(panda, jnp.asarray(q), jnp.asarray(v))
    for k in range(q.shape[0]):
        data.qpos[:7] = q[k]
        data.qvel[:7] = v[k]
        mujoco.mj_forward(model, data)
        jacp = np.zeros((3, model.nv)); jacr = np.zeros((3, model.nv))
        mujoco.mj_jacSite(model, data, jacp, jacr, site_id)
        assert np.allclose(np.asarray(Jp)[k], jacp[:, :7], atol=1e-10)
        assert np.allclose(np.asarray(Jr)[k], jacr[:, :7], atol=1e-10)
        assert np.allclose(np.asarray(lin)[k], jacp[:, :7] @ v[k], atol=1e-10)
        assert np.allclose(np.asarray(ang)[k], jacr[:, :7] @ v[k], atol=1e-10)


def test_mass_matrix_matches_mujoco(mj, panda):
    model, data = mj
    rng = np.random.default_rng(2)
    q, _ = _rand_qv(rng, 8)
    M_ours = np.asarray(mass_matrix(panda, jnp.asarray(q)))
    for k in range(q.shape[0]):
        data.qpos[:7] = q[k]
        data.qvel[:] = 0.0
        mujoco.mj_forward(model, data)
        M_mj = np.zeros((model.nv, model.nv))
        mujoco.mj_fullM(model, data, M_mj)
        assert np.allclose(M_ours[k], M_mj[:7, :7], atol=1e-8), f"sample {k}"


def test_bias_matches_mujoco(mj, panda):
    """rnea(q, v, 0) == qfrc_bias + damping*v (MuJoCo keeps damping in passive)."""
    model, data = mj
    rng = np.random.default_rng(3)
    q, v = _rand_qv(rng, 8)
    b_ours = np.asarray(bias_forces(panda, jnp.asarray(q), jnp.asarray(v)))
    for k in range(q.shape[0]):
        data.qpos[:7] = q[k]
        data.qvel[:7] = v[k]
        mujoco.mj_forward(model, data)
        b_mj = data.qfrc_bias[:7] - data.qfrc_passive[:7]  # passive = -damping*v
        assert np.allclose(b_ours[k], b_mj, atol=1e-8), f"sample {k}"


def test_gravity_torque_matches_mujoco(mj, panda):
    model, data = mj
    rng = np.random.default_rng(4)
    q, _ = _rand_qv(rng, 8)
    g_ours = np.asarray(gravity_torque(panda, jnp.asarray(q)))
    for k in range(q.shape[0]):
        data.qpos[:7] = q[k]
        data.qvel[:] = 0.0
        mujoco.mj_forward(model, data)
        assert np.allclose(g_ours[k], data.qfrc_bias[:7], atol=1e-8)


def test_fwd_dynamics_matches_mujoco(mj, panda):
    """a = M^-1(tau - b) vs MuJoCo forward with qfrc_applied (no contact)."""
    model, data = mj
    rng = np.random.default_rng(5)
    q, v = _rand_qv(rng, 8)
    # keep ee away from the table: q from _rand_qv can touch; lift the base q2
    tau = rng.normal(scale=5.0, size=(8, 7))
    a_ours = np.asarray(fwd_dynamics_free(panda, jnp.asarray(q), jnp.asarray(v), jnp.asarray(tau)))
    for k in range(q.shape[0]):
        data.qpos[:7] = q[k]
        data.qvel[:7] = v[k]
        data.qfrc_applied[:7] = tau[k]
        data.ctrl[:] = 0.0
        model.actuator_gainprm[:, :] = 0.0
        model.actuator_biasprm[:, :] = 0.0
        mujoco.mj_forward(model, data)
        if data.ncon > 0:      # skip in-contact samples: different code path
            continue
        assert np.allclose(a_ours[k], data.qacc[:7], atol=1e-6), f"sample {k}"


def test_rnea_inverse_of_fwd(panda):
    """rnea(q, v, fwd(q, v, tau)) == tau (batched round-trip)."""
    rng = np.random.default_rng(6)
    q, v = _rand_qv(rng, 64)
    tau = rng.normal(scale=10.0, size=(64, 7))
    a = fwd_dynamics_free(panda, jnp.asarray(q), jnp.asarray(v), jnp.asarray(tau))
    tau_rt = rnea(panda, jnp.asarray(q), jnp.asarray(v), a)
    assert np.allclose(np.asarray(tau_rt), tau, atol=1e-8)
