"""Host MuJoCo plant: the ground-truth arbiter simulation.

Equivalent of the reference FrankaMujocoSim (src/sim/franka_sim.py:39-355),
re-implemented against our mesh-free scene.  Semantics reproduced:

- torque mode drives the 7 arm DoFs through ``qfrc_applied`` with the
  position servos' gain/bias zeroed (franka_sim.py:115-118, 157-167);
- dual-rate stepping ``dt = opt.timestep * n_substeps``;
- torque decomposition channels tau_cmd / tau_act / tau_constraint /
  tau_total plus EMA low-pass "measured" proxies (alpha = 0.2);
- contact extraction with MuJoCo frame conventions: mj_contactForce gives
  (normal, t1, t2) in the contact frame; the table channel sums |f_normal|
  over ee<->table_contact contacts (scalar compression magnitude,
  franka_sim.py:254-322);
- table normal from the contact geom's xmat z column.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np
import mujoco

from .observation import Observation
from .paths import SCENE_XML


class PandaMujocoSim:
    def __init__(
        self,
        scene_xml: str | Path = SCENE_XML,
        command_type: str = "torque",
        n_substeps: int = 1,
        ee_site_name: str = "ee_site",
        ee_collision_geom_name: str = "ee_collision",
        tau_meas_lpf_alpha: float = 0.2,
    ):
        self.scene_xml = str(scene_xml)
        self.model = mujoco.MjModel.from_xml_path(self.scene_xml)
        self.data = mujoco.MjData(self.model)

        if command_type not in ("pos", "torque"):
            raise ValueError("command_type must be 'pos' or 'torque'")
        self.command_type = command_type
        self.n_substeps = int(n_substeps)
        self.tau_meas_lpf_alpha = float(np.clip(tau_meas_lpf_alpha, 0.0, 1.0))

        name2id = lambda kind, n: mujoco.mj_name2id(self.model, kind, n)
        self.joint_names = [f"joint{i}" for i in range(1, 8)]
        self.jnt_ids = [name2id(mujoco.mjtObj.mjOBJ_JOINT, n) for n in self.joint_names]
        if any(j < 0 for j in self.jnt_ids):
            raise ValueError("missing arm joints in scene")
        self.qpos_adr = [int(self.model.jnt_qposadr[j]) for j in self.jnt_ids]
        self.dof_adr = [int(self.model.jnt_dofadr[j]) for j in self.jnt_ids]

        self.act_ids = [name2id(mujoco.mjtObj.mjOBJ_ACTUATOR, f"actuator{i}")
                        for i in range(1, 8)]
        self.ee_site_id = name2id(mujoco.mjtObj.mjOBJ_SITE, ee_site_name)
        self.ee_geom_id = name2id(mujoco.mjtObj.mjOBJ_GEOM, ee_collision_geom_name)
        self.table_geom_id = name2id(mujoco.mjtObj.mjOBJ_GEOM, "table_top")
        self.table_contact_geom_id = name2id(mujoco.mjtObj.mjOBJ_GEOM, "table_contact")
        if self.table_contact_geom_id < 0:
            self.table_contact_geom_id = self.table_geom_id
        if min(self.ee_site_id, self.ee_geom_id) < 0:
            raise ValueError("missing ee site/geom in scene")

        self._tau_meas_filt = np.zeros(7)
        self._tau_meas_act_filt = np.zeros(7)

        if self.command_type == "torque":
            # qfrc_applied must be the only actuation source: kill the servos.
            self.data.ctrl[:] = 0.0
            self.model.actuator_gainprm[self.act_ids, :] = 0.0
            self.model.actuator_biasprm[self.act_ids, :] = 0.0

        mujoco.mj_forward(self.model, self.data)

    @property
    def dt(self) -> float:
        return float(self.model.opt.timestep * self.n_substeps)

    def reset(self, keyframe: str = "neutral") -> Observation:
        kf_id = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_KEY, keyframe)
        if kf_id < 0:
            raise ValueError(f"keyframe '{keyframe}' not found")
        mujoco.mj_resetDataKeyframe(self.model, self.data, kf_id)
        self.data.qfrc_applied[:] = 0.0
        self.data.ctrl[:] = 0.0
        mujoco.mj_forward(self.model, self.data)

        tau_cmd = self.data.qfrc_applied[self.dof_adr].copy()
        tau_act = self.data.qfrc_actuator[self.dof_adr].copy()
        tau_constraint = self.data.qfrc_constraint[self.dof_adr].copy()
        self._tau_meas_filt = tau_cmd + tau_act + tau_constraint
        self._tau_meas_act_filt = tau_cmd + tau_act
        return self.get_observation(with_ee=True, with_jacobian=True)

    def step(self, u: np.ndarray) -> Observation:
        u = np.asarray(u, dtype=np.float64).reshape(-1)
        if self.command_type == "pos":
            self.data.ctrl[:] = 0.0
            self.data.ctrl[self.act_ids] = u
            self.data.qfrc_applied[:] = 0.0
        else:
            if u.shape != (7,):
                raise ValueError(f"torque mode expects (7,), got {u.shape}")
            self.data.ctrl[:] = 0.0
            self.data.qfrc_applied[:] = 0.0
            for k, dof in enumerate(self.dof_adr):
                self.data.qfrc_applied[dof] = u[k]
        for _ in range(self.n_substeps):
            mujoco.mj_step(self.model, self.data)
        return self.get_observation(with_ee=True, with_jacobian=True)

    def bias_torque(self) -> np.ndarray:
        return self.data.qfrc_bias[self.dof_adr].copy()

    def get_observation(self, with_ee: bool = True, with_jacobian: bool = False) -> Observation:
        d, m = self.data, self.model
        q = d.qpos[self.qpos_adr].copy()
        dq = d.qvel[self.dof_adr].copy()
        tau_bias = d.qfrc_bias[self.dof_adr].copy()
        tau_cmd = d.qfrc_applied[self.dof_adr].copy()
        tau_act = d.qfrc_actuator[self.dof_adr].copy()
        tau_constraint = d.qfrc_constraint[self.dof_adr].copy()
        tau_meas_act = tau_cmd + tau_act
        tau_total = tau_meas_act + tau_constraint
        tau_meas = tau_total.copy()
        a = self.tau_meas_lpf_alpha
        self._tau_meas_filt = (1.0 - a) * self._tau_meas_filt + a * tau_meas
        self._tau_meas_act_filt = (1.0 - a) * self._tau_meas_act_filt + a * tau_meas_act

        (f_world, f_normal, f_normal_z, f_tan,
         n_ee, n_table) = self._ee_contact_force_world()

        ee_pos = ee_quat = ee_vel = None
        J_pos = J_rot = None
        if with_ee or with_jacobian:
            jacp = np.zeros((3, m.nv))
            jacr = np.zeros((3, m.nv))
            mujoco.mj_jacSite(m, d, jacp, jacr, self.ee_site_id)
        if with_ee:
            ee_pos = d.site_xpos[self.ee_site_id].copy()
            xmat = d.site_xmat[self.ee_site_id].reshape(3, 3)
            ee_quat = self._mat_to_quat_wxyz(xmat)
            ee_vel = (jacp @ d.qvel).copy()
        if with_jacobian:
            J_pos = jacp[:, self.dof_adr].copy()
            J_rot = jacr[:, self.dof_adr].copy()

        return Observation(
            q=q, dq=dq,
            tau_meas=tau_meas, tau_meas_filt=self._tau_meas_filt.copy(),
            tau_meas_act=tau_meas_act, tau_meas_act_filt=self._tau_meas_act_filt.copy(),
            tau_cmd=tau_cmd, tau_act=tau_act, tau_constraint=tau_constraint,
            tau_total=tau_total, tau_bias=tau_bias,
            f_contact_world=f_world,
            f_contact_normal=float(f_normal),
            f_contact_normal_world_z=float(f_normal_z),
            f_contact_tangent=float(f_tan),
            contact_count_ee=int(n_ee), contact_count_table=int(n_table),
            table_normal_world=self._table_normal_world(),
            ee_pos=ee_pos, ee_quat=ee_quat, ee_vel=ee_vel,
            J_pos=J_pos, J_rot=J_rot,
        )

    def _table_normal_world(self) -> np.ndarray:
        gid = int(self.table_contact_geom_id)
        if gid < 0:
            return np.array([0.0, 0.0, 1.0])
        n = self.data.geom_xmat[gid].reshape(3, 3)[:, 2].copy()
        return n / (np.linalg.norm(n) + 1e-12)

    def _ee_contact_force_world(self):
        d = self.data
        f_world_total = np.zeros(3)
        f_world_table = np.zeros(3)
        fn_table = 0.0
        ft_table = 0.0
        n_ee = 0
        n_table = 0
        for i in range(d.ncon):
            c = d.contact[i]
            if c.geom1 != self.ee_geom_id and c.geom2 != self.ee_geom_id:
                continue
            n_ee += 1
            cf = np.zeros(6)
            mujoco.mj_contactForce(self.model, d, i, cf)
            fr = np.asarray(c.frame)
            # world force ON geom2 = frame rows scaled by (normal, t1, t2)
            f_on_geom2 = fr[0:3] * cf[0] + fr[3:6] * cf[1] + fr[6:9] * cf[2]
            f_on_ee = f_on_geom2 if c.geom2 == self.ee_geom_id else -f_on_geom2
            f_world_total += f_on_ee
            other = int(c.geom1) if int(c.geom2) == self.ee_geom_id else int(c.geom2)
            if int(self.table_contact_geom_id) >= 0 and other == int(self.table_contact_geom_id):
                n_table += 1
                fn_table += abs(float(cf[0]))
                ft_table += float(np.linalg.norm(cf[1:3]))
                f_world_table += f_on_ee
        if n_table > 0:
            return (f_world_table, fn_table, max(float(f_world_table[2]), 0.0),
                    ft_table, n_ee, n_table)
        return (f_world_total, 0.0, max(float(f_world_total[2]), 0.0), 0.0, n_ee, 0)

    @staticmethod
    def _mat_to_quat_wxyz(R: np.ndarray) -> np.ndarray:
        q = np.zeros(4)
        mujoco.mju_mat2Quat(q, np.asarray(R, dtype=np.float64).reshape(9))
        return q
