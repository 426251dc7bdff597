"""Benchmark scenario definitions: hidden table tilt, per-joint actuation
scaling, deterministic seeds.

Equivalent of the reference's scenario machinery (run_classical.py:30-106,
duplicated in run_force_feedback.py): five scenarios share one protocol;
tilts are applied to the *plant* after the controller calibrates on the
nominal flat geometry (hidden model mismatch).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import mujoco

SCENARIOS = ("flat", "tilted_5", "tilted_10", "tilted_15", "actuation_uncertainty")

_SEEDS = {"flat": 11, "tilted_5": 12, "tilted_10": 13, "tilted_15": 14,
          "actuation_uncertainty": 15, "tilted": 16}


def scenario_seed(name: str) -> int:
    return int(_SEEDS.get(name, 99))


@dataclass(frozen=True)
class ScenarioSettings:
    tilt_deg: float
    torque_scale: np.ndarray
    label: str


def scenario_settings(name: str) -> ScenarioSettings:
    ones = np.ones(7)
    table = {
        "flat": ScenarioSettings(0.0, ones, "Flat table"),
        "tilted_5": ScenarioSettings(5.0, ones, "Tilted table (5deg)"),
        "tilted_10": ScenarioSettings(10.0, ones, "Tilted table (10deg)"),
        "tilted_15": ScenarioSettings(15.0, ones, "Tilted table (15deg)"),
        "actuation_uncertainty": ScenarioSettings(
            0.0,
            np.array([0.90, 1.08, 0.92, 1.05, 0.88, 1.10, 0.86]),
            "Actuation gain mismatch"),
        "tilted": ScenarioSettings(8.0, ones, "Tilted table (8deg)"),  # legacy alias
    }
    if name not in table:
        raise ValueError(f"Unknown scenario '{name}'")
    return table[name]


def table_geometry_world(sim):
    """(geom_id, center, half_sizes, z_top) of the visual table top."""
    gid = mujoco.mj_name2id(sim.model, mujoco.mjtObj.mjOBJ_GEOM, "table_top")
    if gid < 0:
        raise RuntimeError("table_top geom not found")
    center = sim.data.geom_xpos[gid].copy()
    size = sim.model.geom_size[gid].copy()
    return gid, center, size, float(center[2] + size[2])


def apply_table_tilt(sim, tilt_deg: float) -> None:
    """Hidden tilt about world y by rewriting the table body quaternion
    (reference _apply_table_tilt, run_classical.py:94-106)."""
    if abs(float(tilt_deg)) < 1e-12:
        return
    bid = mujoco.mj_name2id(sim.model, mujoco.mjtObj.mjOBJ_BODY, "table")
    if bid < 0:
        raise RuntimeError("table body not found")
    a = np.deg2rad(float(tilt_deg))
    sim.model.body_quat[bid] = np.array([np.cos(a / 2), 0.0, np.sin(a / 2), 0.0])
    mujoco.mj_forward(sim.model, sim.data)
