"""Batched rigid-body dynamics for the Panda chain: RNEA, mass matrix, bias,
free and contact forward dynamics.

The Pinocchio-RNEA/ABA and Crocoddyl contact-dynamics equivalent
(reference: crocoddyl_classical.py:447-451 gravity RNEA;
DifferentialActionModelFree/ContactFwdDynamics in _make_dam:558-728) as pure
JAX.  Recursions over the 7-joint serial chain are unrolled at trace time;
all ops broadcast over leading batch dims.  Contact dynamics solve the damped
KKT system

    [ M   J^T ] [ a ]   [ tau - b          ]
    [ J   -cI ] [-f ] = [ -a0 - baumgarte  ]

via Schur complement with ``JMinvJt_damping`` c (crocoddyl_classical.py:725).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .panda import PandaModel
from .kinematics import FKResult, fk, ee_jacobian
from .smallchol import chol_factor, chol_solve, spd_solve
from .spatial import rot_z

_EZ = jnp.array([0.0, 0.0, 1.0])


def rnea(model: PandaModel, q, v, a, *, gravity: bool = True,
         joint_terms: bool = True):
    """Recursive Newton-Euler: joint torques realizing acceleration ``a``.

    q, v, a: (..., 7).  Returns tau (..., 7).
    ``joint_terms`` adds armature*qdd + damping*qd (the MuJoCo plant's
    passive/rotor contributions; zero in the "parity" model variant).
    """
    dtype = q.dtype
    ez = _EZ.astype(dtype)
    batch = q.shape[:-1]

    # base quantities expressed in link frames as we descend
    R_stack = []     # parent->child rotations (for the backward pass)
    w = jnp.zeros(batch + (3,), dtype)
    wd = jnp.zeros(batch + (3,), dtype)
    acc0 = -model.gravity if gravity else jnp.zeros(3, dtype)
    ac = jnp.broadcast_to(
        jnp.einsum("ji,j->i", model.base_rot, acc0), batch + (3,)
    )  # base linear acceleration in base frame (gravity trick)

    ws, wds, acs = [], [], []
    for i in range(7):
        R_pi = model.j_rot[i] @ rot_z(q[..., i])              # (...,3,3)
        R_stack.append(R_pi)
        Rt = jnp.swapaxes(R_pi, -1, -2)
        p = model.j_pos[i]
        qd = v[..., i:i + 1]
        qdd = a[..., i:i + 1]

        w_p = jnp.einsum("...ij,...j->...i", Rt, w)
        wd_new = (jnp.einsum("...ij,...j->...i", Rt, wd)
                  + jnp.cross(w_p, qd * ez) + qdd * ez)
        ac = jnp.einsum(
            "...ij,...j->...i",
            Rt,
            ac + jnp.cross(wd, jnp.broadcast_to(p, batch + (3,)))
            + jnp.cross(w, jnp.cross(w, jnp.broadcast_to(p, batch + (3,)))),
        )
        w = w_p + qd * ez
        wd = wd_new
        ws.append(w); wds.append(wd); acs.append(ac)

    # backward pass
    f = jnp.zeros(batch + (3,), dtype)
    n = jnp.zeros(batch + (3,), dtype)
    tau = [None] * 7
    for i in range(6, -1, -1):
        c = model.com[i]
        m = model.mass[i]
        I = model.inertia[i]
        w_i, wd_i, a_i = ws[i], wds[i], acs[i]
        a_c = (a_i + jnp.cross(wd_i, jnp.broadcast_to(c, batch + (3,)))
               + jnp.cross(w_i, jnp.cross(w_i, jnp.broadcast_to(c, batch + (3,)))))
        F = m * a_c
        Iw = jnp.einsum("ij,...j->...i", I, w_i)
        N = jnp.einsum("ij,...j->...i", I, wd_i) + jnp.cross(w_i, Iw)

        f_i = F + f
        n_i = N + jnp.cross(jnp.broadcast_to(c, batch + (3,)), F) + n
        tau_i = n_i[..., 2]
        if joint_terms:
            tau_i = tau_i + model.armature[i] * a[..., i] + model.damping[i] * v[..., i]
        tau[i] = tau_i

        if i > 0:
            R_pi = R_stack[i]
            f_parent = jnp.einsum("...ij,...j->...i", R_pi, f_i)
            n = (jnp.einsum("...ij,...j->...i", R_pi, n_i)
                 + jnp.cross(jnp.broadcast_to(model.j_pos[i], batch + (3,)), f_parent))
            f = f_parent

    return jnp.stack(tau, axis=-1)


def bias_forces(model: PandaModel, q, v):
    """b(q, v) = Coriolis + gravity + damping*v  (torque units, (...,7))."""
    return rnea(model, q, v, jnp.zeros_like(q))


def gravity_torque(model: PandaModel, q):
    """tau_g(q) = rnea(q, 0, 0): gravity compensation torques.

    Reference equivalent: pin.rnea(model, data, q, 0, 0)
    (crocoddyl_classical.py:447-451).
    """
    z = jnp.zeros_like(q)
    return rnea(model, q, z, z)


def mass_matrix(model: PandaModel, q):
    """Joint-space inertia matrix M(q) (..., 7, 7), including armature."""
    z = jnp.zeros_like(q)
    eye = jnp.eye(7, dtype=q.dtype)

    def col(e):
        return rnea(model, q, z, jnp.broadcast_to(e, q.shape), gravity=False,
                    joint_terms=False)

    cols = jax.vmap(col, in_axes=0, out_axes=-1)(eye)      # (..., 7, 7)
    return cols + jnp.diag(model.armature)


def fwd_dynamics_free(model: PandaModel, q, v, tau):
    """Free-space forward dynamics a = M^{-1}(tau - b).  (..., 7) each.

    Equivalent of Crocoddyl's DifferentialActionModelFreeFwdDynamics
    (crocoddyl_classical.py:619).
    """
    M = mass_matrix(model, q)
    b = bias_forces(model, q, v)
    # unrolled small-matrix solve: fuses into the surrounding chain (no
    # cholesky/triangular-solve library-call dispatch barriers)
    return spd_solve(M, tau - b)


class ContactDynOut(NamedTuple):
    acc: jnp.ndarray    # (..., 7)
    force: jnp.ndarray  # (..., nc) contact force along the constrained axes
    fk_res: FKResult    # kinematics reused by residuals


def _contact_rows(model: PandaModel, q, v, nc1: bool, fk_res: FKResult):
    """Contact Jacobian rows and their drift (Jdot*v) at the ee frame.

    nc1=True  -> 1D normal contact along world z (ContactModel1D,
                 LOCAL_WORLD_ALIGNED, rotation=I; crocoddyl_classical.py:968).
    nc1=False -> 3D point contact (ContactModel3D; :944).
    Returns (Jc (..., nc, 7), gamma (..., nc) = d(J v)/dt at fixed v, p_ee).
    """
    J_pos, _ = ee_jacobian(model, q, fk_res=fk_res)

    # drift a0 = d/dt (J(q) v) |_{qdd=0} = (dJ/dq qdot) v : use jvp of J v wrt q.
    def linvel(qq):
        f = fk(model, qq)
        Jp, _ = ee_jacobian(model, qq, fk_res=f)
        return jnp.einsum("...ij,...j->...i", Jp, v)

    _, gamma3 = jax.jvp(linvel, (q,), (v,))

    if nc1:
        return J_pos[..., 2:3, :], gamma3[..., 2:3]
    return J_pos, gamma3


def fwd_dynamics_contact(model: PandaModel, q, v, tau, *,
                         ref_pos, nc1: bool = True,
                         baumgarte_kp: float = 0.0, baumgarte_kd: float = 0.0,
                         damping_c: float = 1.0e-8):
    """Constrained forward dynamics with a damped-KKT ee contact.

    ``ref_pos``: the contact reference — scalar world-z height for the 1D
    model (z_target, crocoddyl_classical.py:630) or the 3-vector anchor point
    for the 3D model.  Baumgarte gains (kp, kd) follow Crocoddyl's
    ContactModel gains=(alpha, beta): corrective acceleration
    -kp*gap - kd*vel added to the constraint RHS
    (reference contact_gains, run_classical.py:295 benchmark=(140, 80)).

    Sign convention: ``force`` is the force applied BY the environment ON the
    ee along the constrained axes (world z for 1D), matching Crocoddyl's
    contact-force residual data.
    """
    fk_res = fk(model, q)
    Jc, gamma = _contact_rows(model, q, v, nc1, fk_res)
    nc = Jc.shape[-2]

    M = mass_matrix(model, q)
    b = bias_forces(model, q, v)
    L = chol_factor(M)

    vel_c = jnp.einsum("...ij,...j->...i", Jc, v)
    if nc1:
        # ref_pos: scalar or (...,) world-z target -> broadcast against (..., 1)
        gap = fk_res.ee_p[..., 2:3] - jnp.expand_dims(jnp.asarray(ref_pos, q.dtype), -1)
    else:
        gap = fk_res.ee_p - jnp.asarray(ref_pos, q.dtype)
    a_des = -gamma - baumgarte_kp * gap - baumgarte_kd * vel_c

    Minv_tau = chol_solve(L, tau - b)
    Minv_Jt = chol_solve(L, jnp.swapaxes(Jc, -1, -2))
    S = jnp.einsum("...ij,...jk->...ik", Jc, Minv_Jt)        # J M^-1 J^T (nc,nc)
    S = S + damping_c * jnp.eye(nc, dtype=q.dtype)

    # lambda = (J M^-1 J^T + cI)^{-1} (a_des - J M^-1 (tau - b)):
    # the constraint force ON the robot (positive = table pushes the ee up).
    rhs = a_des - jnp.einsum("...ij,...j->...i", Jc, Minv_tau)
    f = spd_solve(S, rhs)                                    # (..., nc)

    acc = Minv_tau + jnp.einsum("...ij,...j->...i", Minv_Jt, f)
    return ContactDynOut(acc=acc, force=f, fk_res=fk_res)
