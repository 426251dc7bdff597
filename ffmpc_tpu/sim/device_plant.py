"""On-device batched Panda + table plant (the MJX-equivalent).

A pure-JAX functional twin of the host MuJoCo plant for closed-loop rollouts
on TPU: thousands of plants step in parallel under vmap/shard_map, and a
whole control episode runs inside one ``lax.scan`` without host round-trips.

Semantics mirrored from the reference plant (franka_sim.py) and our scene:

- torque injection equivalent to ``qfrc_applied`` with actuators disabled;
- implicitfast-style integration: joint damping handled implicitly
  (v+ = (M + h D)^-1 (M v + h (tau - b_nodamp)) ), matching MuJoCo's
  ``implicitfast`` stability at the 1 kHz physics rate;
- the single ee-sphere <-> table-plane condim=1 (frictionless) contact via
  MuJoCo's soft-constraint model: solref=(0.02, 1), solimp=(0.9, 0.95,
  0.001, 0.5, 2), margin=0.001, solved exactly for one contact
  (f = clip(d * (aref - a0) / A, 0, inf) with R = A (1-d)/d );
- Observation channels with the reference's names, including the
  tau_meas / tau_meas_act EMA low-pass states and the |fn| scalar channel;
- table tilt as a plant parameter (supports the tilted_* scenarios fully
  on device).

The host MuJoCo plant remains the arbiter; tests compare the two.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.panda import PandaModel, TOOL_SPHERE_RADIUS
from ..core.kinematics import fk, ee_jacobian
from ..core.dynamics import rnea, mass_matrix
from ..core.smallchol import chol_factor, chol_solve, spd_solve


class TableParams(NamedTuple):
    """Contact-table geometry + MuJoCo soft-constraint constants."""
    point: jnp.ndarray      # (3,) a point on the contact plane (world)
    normal: jnp.ndarray     # (3,) unit plane normal (world)
    margin: jnp.ndarray     # scalar
    timeconst: jnp.ndarray  # solref[0]
    dampratio: jnp.ndarray  # solref[1]
    dmin: jnp.ndarray
    dmax: jnp.ndarray
    width: jnp.ndarray
    midpoint: jnp.ndarray
    power: jnp.ndarray
    diag_approx: jnp.ndarray  # MuJoCo efc_diagA for this contact pair


def make_table_params(tilt_deg: float = 0.0, dtype=jnp.float32,
                      table_body_pos=(-0.5, 0.0, 0.3),
                      plane_offset: float = 0.02) -> TableParams:
    """Table plane after an optional hidden tilt about world y through the
    table body origin (mirrors scenarios.apply_table_tilt)."""
    a = np.deg2rad(float(tilt_deg))
    R = np.array([[np.cos(a), 0.0, np.sin(a)],
                  [0.0, 1.0, 0.0],
                  [-np.sin(a), 0.0, np.cos(a)]])
    body = np.asarray(table_body_pos)
    point = body + R @ np.array([0.0, 0.0, plane_offset])
    normal = R @ np.array([0.0, 0.0, 1.0])
    c = lambda v: jnp.asarray(v, dtype)
    # includemargin: MuJoCo sums the two geoms' margins (ee_collision 1 mm +
    # table_contact 1 mm -> 2 mm force-onset distance; verified against
    # mjContact.includemargin).
    # MuJoCo regularizes with R = (1-d)/d * efc_diagA, where efc_diagA is
    # NOT the exact A = J M^-1 J^T but the compile-time constant
    # sum of the two bodies' translational body_invweight0 (table body is
    # static -> 0; ee tool body -> 0.1235373 for this scene).  Using the
    # exact A here left a systematic ~2% force error (and ~15% in the
    # margin zone); with MuJoCo's constant the state-matched force matches
    # to <0.1% (tests/test_device_plant.py pins the constant against the
    # compiled model).
    return TableParams(
        point=c(point), normal=c(normal), margin=c(2.0e-3),
        timeconst=c(0.02), dampratio=c(1.0),
        dmin=c(0.9), dmax=c(0.95), width=c(1.0e-3), midpoint=c(0.5),
        power=c(2.0), diag_approx=c(0.1235373),
    )


class PlantState(NamedTuple):
    q: jnp.ndarray                  # (..., 7)
    v: jnp.ndarray                  # (..., 7)
    tau_meas_filt: jnp.ndarray      # (..., 7) EMA state
    tau_meas_act_filt: jnp.ndarray  # (..., 7) EMA state


class DeviceObs(NamedTuple):
    """Pytree twin of sim.Observation (subset of channels that exist in the
    frictionless device plant; tau_act == 0 with disabled actuators)."""
    q: jnp.ndarray
    dq: jnp.ndarray
    tau_meas: jnp.ndarray
    tau_meas_filt: jnp.ndarray
    tau_meas_act: jnp.ndarray
    tau_meas_act_filt: jnp.ndarray
    tau_cmd: jnp.ndarray
    tau_constraint: jnp.ndarray
    tau_total: jnp.ndarray
    tau_bias: jnp.ndarray
    f_contact_normal: jnp.ndarray
    f_contact_normal_world_z: jnp.ndarray
    contact: jnp.ndarray            # bool: active contact
    table_normal_world: jnp.ndarray
    ee_pos: jnp.ndarray
    ee_vel: jnp.ndarray


def _impedance(table: TableParams, r):
    """MuJoCo solimp impedance d(r) for penetration r >= 0."""
    x = jnp.clip(r / jnp.maximum(table.width, 1e-12), 0.0, 1.0)
    p = table.power
    mid = table.midpoint
    # MuJoCo's sigmoid: y = x^p / (x^p + (1-x)^p) variant via midpoint split
    lo = 0.5 * jnp.power(x / mid, p)
    hi = 1.0 - 0.5 * jnp.power((1.0 - x) / (1.0 - mid), p)
    y = jnp.where(x < mid, lo, hi)
    return table.dmin + (table.dmax - table.dmin) * y


def _contact_force(model: PandaModel, table: TableParams, q, v, minv_tau, M_L,
                   fk_res, Jn, vel_n, dist):
    """Normal force of the single frictionless contact, MuJoCo soft model.

    dist: signed gap (sphere surface to plane, negative = penetrating).
    Returns (fn >= 0, active mask).
    """
    active = dist < table.margin
    # MuJoCo constraint pos for contacts: dist - margin (negative when active)
    pos = dist - table.margin
    r_pen = jnp.maximum(-pos, 0.0)
    d = _impedance(table, r_pen)

    k = 1.0 / (table.dmax * table.dmax * table.timeconst * table.timeconst
               * table.dampratio * table.dampratio)
    b = 2.0 / (table.dmax * table.timeconst)
    aref = -b * vel_n - k * d * pos

    # A = J M^-1 J^T (scalar, exact), a0 = J M^-1 (tau - bias).  The drift
    # Jdot*v is deliberately absent: MuJoCo's constraint residual is
    # jar = J qacc - aref (efc_b = J qacc_smooth - aref, verified against
    # data.efc_b), i.e. the arbiter itself omits it — adding it here would
    # *diverge* from MuJoCo.  Regularization uses MuJoCo's compile-time
    # diagonal approximation (see make_table_params), not the exact A.
    Minv_Jt = chol_solve(M_L, Jn)
    A = jnp.einsum("...i,...i->...", Jn, Minv_Jt)
    a0 = jnp.einsum("...i,...i->...", Jn, minv_tau)
    R = jnp.maximum(table.diag_approx * (1.0 - d) / jnp.maximum(d, 1e-6), 1e-12)
    f = (aref - a0) / (A + R)
    f = jnp.where(active, jnp.maximum(f, 0.0), 0.0)
    return f, active


def plant_step(model: PandaModel, table: TableParams, state: PlantState,
               tau_cmd, *, timestep: float = 0.001, n_substeps: int = 5,
               lpf_alpha: float = 0.2):
    """Advance the plant by one control period (n_substeps physics steps).

    Returns (new_state, DeviceObs at the final substep).  Broadcasts over
    leading batch dims; vmap/shard_map over plants for ensembles.
    """
    h = jnp.asarray(timestep, state.q.dtype)
    D = model.damping

    def substep(carry, _):
        q, v = carry
        fk_res = fk(model, q)
        Jp, _ = ee_jacobian(model, q, fk_res=fk_res)
        n = table.normal
        Jn = jnp.einsum("i,...ij->...j", n, Jp)              # (..., 7)
        p_rel = fk_res.ee_p - table.point
        dist = jnp.einsum("...i,i->...", p_rel, n) - TOOL_SPHERE_RADIUS
        vel_n = jnp.einsum("...i,...i->...", Jn, v)

        M = mass_matrix(model, q)
        M_L = chol_factor(M)
        bias_nodamp = rnea(model, q, v, jnp.zeros_like(q)) - D * v
        tau_eff = tau_cmd - bias_nodamp
        minv_tau = chol_solve(M_L, tau_eff)

        fn, active = _contact_force(model, table, q, v, minv_tau, M_L,
                                    fk_res, Jn, vel_n, dist)
        tau_con = Jn * fn[..., None]

        # implicit damping: (M + h D) v+ = M v + h (tau_eff + tau_con)
        Mi = M + h * jnp.diag(D)
        rhs = (jnp.einsum("...ij,...j->...i", M, v)
               + h * (tau_eff + tau_con))
        v_new = spd_solve(Mi, rhs)
        q_new = q + h * v_new
        return (q_new, v_new), (fn, active, tau_con)

    (q, v), (fns, actives, tau_cons) = jax.lax.scan(
        substep, (state.q, state.v), None, length=n_substeps)

    fn_last = fns[-1]
    active_last = actives[-1]
    tau_con_last = tau_cons[-1]

    # observation at the final substep (tau channels as the host plant defines)
    fk_res = fk(model, q)
    Jp, _ = ee_jacobian(model, q, fk_res=fk_res)
    tau_bias = rnea(model, q, v, jnp.zeros_like(q)) - model.damping * v
    tau_total = tau_cmd + tau_con_last
    tau_meas_act = tau_cmd
    a = jnp.asarray(lpf_alpha, q.dtype)
    tmf = (1 - a) * state.tau_meas_filt + a * tau_total
    tmaf = (1 - a) * state.tau_meas_act_filt + a * tau_meas_act

    fn_world_z = fn_last * table.normal[2]
    obs = DeviceObs(
        q=q, dq=v,
        tau_meas=tau_total, tau_meas_filt=tmf,
        tau_meas_act=tau_meas_act, tau_meas_act_filt=tmaf,
        tau_cmd=tau_cmd, tau_constraint=tau_con_last, tau_total=tau_total,
        tau_bias=tau_bias,
        f_contact_normal=jnp.abs(fn_last),
        f_contact_normal_world_z=jnp.maximum(fn_world_z, 0.0),
        contact=active_last,
        table_normal_world=jnp.broadcast_to(table.normal, q.shape[:-1] + (3,)),
        ee_pos=fk_res.ee_p,
        ee_vel=jnp.einsum("...ij,...j->...i", Jp, v),
    )
    return PlantState(q=q, v=v, tau_meas_filt=tmf, tau_meas_act_filt=tmaf), obs


def init_plant_state(q0, dtype=jnp.float32) -> PlantState:
    q0 = jnp.asarray(q0, dtype)
    z = jnp.zeros_like(q0)
    return PlantState(q=q0, v=z, tau_meas_filt=z, tau_meas_act_filt=z)
