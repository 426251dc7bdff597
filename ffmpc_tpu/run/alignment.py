"""Randomized controller-model vs plant kinematic consistency check.

Generalization of the reference's MuJoCo<->Pinocchio alignment check
(run_classical.py:113-178): sample random joint configurations within 40% of
the joint range, compare the sim's ee site pose against our model's FK.
Because the controller model is built in the MuJoCo frame, the expected
error is machine epsilon — a nonzero result flags model drift immediately.
"""

from __future__ import annotations

import numpy as np
import mujoco
import jax.numpy as jnp

from ..core import fk


def check_model_sim_alignment(sim, model, samples: int = 16, seed: int = 0) -> dict:
    samples = int(max(samples, 0))
    if samples == 0:
        return {"samples": 0, "max_pos_m": np.nan, "rms_pos_m": np.nan,
                "max_rot_deg": np.nan, "rms_rot_deg": np.nan}

    qpos0 = sim.data.qpos.copy()
    qvel0 = sim.data.qvel.copy()
    qacc0 = sim.data.qacc.copy()
    rng = np.random.default_rng(int(seed))
    q_ref = np.asarray(sim.data.qpos[sim.qpos_adr], dtype=float).copy()
    jnt_range = np.asarray(sim.model.jnt_range[sim.jnt_ids], dtype=float)

    qs = []
    for _ in range(samples):
        q = q_ref.copy()
        for j in range(7):
            lo, hi = jnt_range[j]
            if np.isfinite(lo) and np.isfinite(hi) and hi > lo:
                mid, half = 0.5 * (lo + hi), 0.4 * (hi - lo)
                q[j] = rng.uniform(mid - half, mid + half)
            else:
                q[j] = q_ref[j] + rng.normal(scale=0.2)
        qs.append(q)
    qs = np.stack(qs)

    res = fk(model, jnp.asarray(qs, jnp.float64))
    p_pred = np.asarray(res.ee_p)
    R_pred = np.asarray(res.ee_R)

    pos_errs, rot_errs = [], []
    try:
        for k in range(samples):
            sim.data.qvel[:] = 0.0
            for j, adr in enumerate(sim.qpos_adr):
                sim.data.qpos[adr] = qs[k, j]
            mujoco.mj_forward(sim.model, sim.data)
            p_mj = sim.data.site_xpos[sim.ee_site_id].copy()
            R_mj = sim.data.site_xmat[sim.ee_site_id].reshape(3, 3).copy()
            pos_errs.append(float(np.linalg.norm(p_mj - p_pred[k])))
            R_err = R_pred[k].T @ R_mj
            c = float(np.clip((np.trace(R_err) - 1) * 0.5, -1.0, 1.0))
            rot_errs.append(float(np.arccos(c)))
    finally:
        sim.data.qpos[:] = qpos0
        sim.data.qvel[:] = qvel0
        sim.data.qacc[:] = qacc0
        mujoco.mj_forward(sim.model, sim.data)

    pos = np.asarray(pos_errs)
    rot = np.asarray(rot_errs)
    return {
        "samples": samples,
        "max_pos_m": float(pos.max()),
        "rms_pos_m": float(np.sqrt(np.mean(pos ** 2))),
        "max_rot_deg": float(np.rad2deg(rot.max())),
        "rms_rot_deg": float(np.rad2deg(np.sqrt(np.mean(rot ** 2)))),
    }
