"""Batched forward kinematics, frame Jacobians and frame velocities.

The Pinocchio-FK equivalent (reference crocoddyl_classical.py:199-225 and the
frame residuals in _make_dam) as pure JAX: the 7-joint serial chain is
unrolled at trace time into 3x3 matrix ops that broadcast over arbitrary
leading batch dimensions.  Jacobians are world-aligned (LOCAL_WORLD_ALIGNED
in Pinocchio terms: linear/angular axes expressed in world frame, taken at
the frame origin).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .panda import PandaModel
from .spatial import rot_z


class FKResult(NamedTuple):
    R: jnp.ndarray        # (..., 7, 3, 3) world rotations of link frames 1..7
    p: jnp.ndarray        # (..., 7, 3)    world positions of link-frame origins
    axis_w: jnp.ndarray   # (..., 7, 3)    world joint axes (+z of each link frame)
    ee_R: jnp.ndarray     # (..., 3, 3)    world rotation of the tool/ee frame
    ee_p: jnp.ndarray     # (..., 3)       world position of the tool/ee frame


def fk(model: PandaModel, q: jnp.ndarray) -> FKResult:
    """Forward kinematics. q: (..., 7)."""
    batch = q.shape[:-1]
    R_w = jnp.broadcast_to(model.base_rot, batch + (3, 3))
    p_w = jnp.broadcast_to(model.base_pos, batch + (3,))

    Rs, ps, axes = [], [], []
    for i in range(7):
        Rj = model.j_rot[i] @ rot_z(q[..., i])          # (...,3,3)
        p_w = p_w + jnp.einsum("...ij,j->...i", R_w, model.j_pos[i])
        R_w = jnp.einsum("...ij,...jk->...ik", R_w, Rj)
        Rs.append(R_w)
        ps.append(p_w)
        axes.append(R_w[..., :, 2])

    ee_R = jnp.einsum("...ij,jk->...ik", R_w, model.ee_rot)
    ee_p = p_w + jnp.einsum("...ij,j->...i", R_w, model.ee_pos)
    return FKResult(
        R=jnp.stack(Rs, axis=-3),
        p=jnp.stack(ps, axis=-2),
        axis_w=jnp.stack(axes, axis=-2),
        ee_R=ee_R,
        ee_p=ee_p,
    )


def ee_jacobian(model: PandaModel, q: jnp.ndarray, fk_res: FKResult | None = None):
    """World-aligned frame Jacobian at the ee frame origin.

    Returns (J_pos, J_rot), each (..., 3, 7): column j is the world-frame
    linear / angular velocity of the ee frame per unit qdot_j.
    Matches MuJoCo's mj_jacSite (franka_sim.py:207) and Pinocchio's
    LOCAL_WORLD_ALIGNED frame Jacobian.
    """
    f = fk_res if fk_res is not None else fk(model, q)
    r = f.ee_p[..., None, :] - f.p            # (..., 7, 3) joint->ee offsets
    jp = jnp.cross(f.axis_w, r)               # (..., 7, 3)
    J_pos = jnp.swapaxes(jp, -1, -2)          # (..., 3, 7)
    J_rot = jnp.swapaxes(f.axis_w, -1, -2)    # (..., 3, 7)
    return J_pos, J_rot


def ee_velocity(model: PandaModel, q: jnp.ndarray, v: jnp.ndarray,
                fk_res: FKResult | None = None):
    """World-aligned ee frame velocity (linear, angular), each (..., 3)."""
    J_pos, J_rot = ee_jacobian(model, q, fk_res)
    lin = jnp.einsum("...ij,...j->...i", J_pos, v)
    ang = jnp.einsum("...ij,...j->...i", J_rot, v)
    return lin, ang
