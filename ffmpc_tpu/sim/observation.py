"""Plant observation record.

Mirrors the reference Observation channel set (franka_sim.py:11-36) so the
controllers, uncertainty injector and loggers see the same surface.  Kept as
a plain dataclass of numpy arrays on the host path; the on-device plant has
a pytree twin (``device_plant.DeviceObs``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class Observation:
    q: np.ndarray                  # (7,)
    dq: np.ndarray                 # (7,)
    tau_meas: np.ndarray           # (7,) measured-torque proxy (= tau_total)
    tau_meas_filt: np.ndarray      # (7,) LPF'd tau_meas
    tau_meas_act: np.ndarray       # (7,) actuation-side proxy (tau_cmd + tau_act)
    tau_meas_act_filt: np.ndarray  # (7,) LPF'd tau_meas_act
    tau_cmd: np.ndarray            # (7,) applied command torque
    tau_act: np.ndarray            # (7,) actuator torque contribution
    tau_constraint: np.ndarray     # (7,) constraint/contact torque contribution
    tau_total: np.ndarray          # (7,)
    tau_bias: np.ndarray           # (7,) gravity + Coriolis
    f_contact_world: np.ndarray    # (3,) contact force ON the ee geom, world
    f_contact_normal: float        # scalar |normal| vs table (>= 0)
    f_contact_normal_world_z: float
    f_contact_tangent: float
    contact_count_ee: int
    contact_count_table: int
    table_normal_world: np.ndarray # (3,)

    ee_pos: Optional[np.ndarray] = None    # (3,)
    ee_quat: Optional[np.ndarray] = None   # (4,) (w,x,y,z)
    J_pos: Optional[np.ndarray] = None     # (3,7)
    J_rot: Optional[np.ndarray] = None     # (3,7)
    ee_vel: Optional[np.ndarray] = None    # (3,)
