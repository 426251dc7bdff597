"""Manual task-space PD + normal-force PI demo (non-MPC sim-layer oracle).

Equivalent of the reference's test_sim_api.py (src/sim/test_sim_api.py:99-277):
an independent hand-written controller — task-space PD on the ee position,
normal-force PI once in contact, nullspace posture, gravity compensation —
that exercises every Observation channel and the logger without touching the
MPC stack.  Three-phase state machine: descend -> press -> hold force.

Run:  python -m ffmpc_tpu.sim.pd_press_demo --time 3.0
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..core import make_panda_model, gravity_torque
from .mujoco_sim import PandaMujocoSim
from ..utils.logging import RunLogger


def main(total_time: float = 3.0, fn_des: float = 15.0,
         results_dir: Path | str = "results/pd_demo", verbose: bool = True):
    model = make_panda_model("plant", dtype=jnp.float64)
    sim = PandaMujocoSim(command_type="torque", n_substeps=5)
    sim.model.opt.timestep = 0.001
    import mujoco
    mujoco.mj_forward(sim.model, sim.data)
    obs = sim.reset("neutral")
    q_nom = obs.q.copy()

    logger = RunLogger("pd_press_demo", results_dir=results_dir)
    grav = jax.jit(lambda q: gravity_torque(model, q))

    p_target = obs.ee_pos.copy()
    p_target[2] = 0.36
    kp, kd = 400.0, 40.0
    kfi = 2.0
    fi = 0.0
    phase = "descend"
    steps = int(total_time / sim.dt)
    t = 0.0
    for k in range(steps):
        tau_g = np.asarray(grav(jnp.asarray(obs.q)))
        J = obs.J_pos
        e = p_target - obs.ee_pos
        de = -obs.ee_vel
        f_cmd = kp * e + kd * de

        if phase == "descend":
            p_target[2] -= 0.08 * sim.dt   # slow descend
            if obs.f_contact_normal > 1.0:
                phase = "press"
        elif phase == "press":
            fi += kfi * (fn_des - obs.f_contact_normal) * sim.dt
            fi = float(np.clip(fi, -30.0, 30.0))
            f_cmd[2] = -(fn_des + fi)
            if abs(obs.f_contact_normal - fn_des) < 1.0:
                phase = "hold"
        else:
            fi += kfi * (fn_des - obs.f_contact_normal) * sim.dt
            fi = float(np.clip(fi, -30.0, 30.0))
            f_cmd[2] = -(fn_des + fi)

        tau_task = J.T @ f_cmd
        # nullspace posture + damping
        JJt_inv = np.linalg.pinv(J @ J.T + 1e-6 * np.eye(3))
        N = np.eye(7) - J.T @ JJt_inv @ J
        tau_null = N @ (-5.0 * (obs.q - q_nom) - 1.0 * obs.dq)
        tau = tau_g + tau_task + tau_null - 1.0 * obs.dq
        tau = np.clip(tau, -np.array([87.0] * 4 + [12.0] * 3),
                      np.array([87.0] * 4 + [12.0] * 3))
        obs = sim.step(tau)
        t += sim.dt
        logger.log(
            t=t, phase={"descend": 0, "press": 1, "hold": 2}[phase],
            q=obs.q.copy(), dq=obs.dq.copy(),
            ee_pos=obs.ee_pos.copy(), ee_vel=obs.ee_vel.copy(),
            fn=obs.f_contact_normal, fn_world_z=obs.f_contact_normal_world_z,
            f_tangent=obs.f_contact_tangent,
            contacts_table=obs.contact_count_table,
            tau_cmd=tau.copy(), tau_total=obs.tau_total.copy(),
            tau_constraint=obs.tau_constraint.copy(),
            tau_meas_filt=obs.tau_meas_filt.copy(),
        )
        if verbose and k % 100 == 0:
            print(f"k={k:4d} t={t:5.2f} phase={phase:8s} "
                  f"ee_z={obs.ee_pos[2]:.4f} fn={obs.f_contact_normal:6.2f}")

    logger.set_meta(fn_des=fn_des, total_time=total_time)
    logger.save()
    if verbose:
        print("saved to", logger.run_dir)
    return obs


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", type=float, default=3.0)
    ap.add_argument("--fn-des", type=float, default=15.0)
    ap.add_argument("--results-dir", type=Path, default=Path("results/pd_demo"))
    a = ap.parse_args()
    main(total_time=a.time, fn_des=a.fn_des, results_dir=a.results_dir)
