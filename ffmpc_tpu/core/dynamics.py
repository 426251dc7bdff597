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


class FreeDynDerivs(NamedTuple):
    acc: jnp.ndarray     # (7,)
    da_dx: jnp.ndarray   # (7, 14) d(acc)/d(q,v)
    da_du: jnp.ndarray   # (7, 7)  d(acc)/d(tau) = M^{-1}
    fk_res: FKResult


class ContactDynDerivs(NamedTuple):
    acc: jnp.ndarray     # (7,)
    force: jnp.ndarray   # (nc,)
    da_dx: jnp.ndarray   # (7, 14)
    df_dx: jnp.ndarray   # (nc, 14)
    da_du: jnp.ndarray   # (7, 7)
    df_du: jnp.ndarray   # (nc, 7)
    fk_res: FKResult


def free_dynamics_derivs(model: PandaModel, q, v, tau) -> FreeDynDerivs:
    """Free forward dynamics + analytic first derivatives (unbatched; vmap over
    leading dims at the call site).

    Uses the inverse-dynamics trick (Carpentier & Mansard, RSS 2018): with
    a* = M^{-1}(tau - b) fixed, RNEA(q, v, a*) = M(q) a* + b(q, v), so

        d(acc)/d(q,v) = -M^{-1} * d RNEA(q, v, a*)/d(q,v),   d(acc)/dtau = M^{-1}.

    Only one RNEA is differentiated (14 tangents) instead of pushing tangents
    through the whole mass-matrix (7x RNEA) + Cholesky + solve chain; measured
    ~3x faster knot-diff on TPU vs jacfwd through fwd_dynamics_free.
    """
    fk_res = fk(model, q)
    M = mass_matrix(model, q)
    b = bias_forces(model, q, v)
    L = chol_factor(M)
    acc = chol_solve(L, tau - b)

    def id_res(qv):
        # acc enters via closure: constant w.r.t. the differentiation variable
        return rnea(model, qv[:7], qv[7:], acc)

    G1 = jax.jacfwd(id_res)(jnp.concatenate([q, v]))        # (7, 14)
    da_dx = -chol_solve(L, G1)
    da_du = chol_solve(L, jnp.eye(7, dtype=q.dtype))
    return FreeDynDerivs(acc=acc, da_dx=da_dx, da_du=da_du, fk_res=fk_res)


def contact_dynamics_derivs(model: PandaModel, q, v, tau, *,
                            ref_pos, nc1: bool = True,
                            baumgarte_kp: float = 0.0, baumgarte_kd: float = 0.0,
                            damping_c: float = 1.0e-8) -> ContactDynDerivs:
    """Damped-KKT contact dynamics + analytic first derivatives (unbatched).

    The solution (a, f) of the damped KKT system satisfies

        g1(q, v, tau; a, f) = RNEA(q, v, a) - Jc(q)^T f - tau           = 0
        h2(q, v;     a, f) = Jc(q) a + gamma(q, v) + kp*gap + kd*Jc v + c f = 0

    Implicit function theorem: [M, -Jc^T; Jc, cI] [da; df] = -[dg1; dh2]
    with dg1/dh2 evaluated at FIXED (a, f) — a single RNEA + contact-row
    sweep under 14 forward tangents, then re-solves against the already
    factored M and Schur complement S = Jc M^{-1} Jc^T + cI.  Exact for the
    damped system (matches jacfwd of fwd_dynamics_contact to roundoff).
    """
    dtype = q.dtype
    fk_res = fk(model, q)
    Jc, gamma = _contact_rows(model, q, v, nc1, fk_res)
    nc = Jc.shape[-2]

    M = mass_matrix(model, q)
    b = bias_forces(model, q, v)
    L = chol_factor(M)

    vel_c = Jc @ v
    if nc1:
        gap = fk_res.ee_p[2:3] - jnp.reshape(jnp.asarray(ref_pos, dtype), (1,))
    else:
        gap = fk_res.ee_p - jnp.asarray(ref_pos, dtype)
    a_des = -gamma - baumgarte_kp * gap - baumgarte_kd * vel_c

    Minv_tau = chol_solve(L, tau - b)
    Minv_Jt = chol_solve(L, jnp.swapaxes(Jc, -1, -2))        # (7, nc)
    S = Jc @ Minv_Jt + damping_c * jnp.eye(nc, dtype=dtype)
    LS = chol_factor(S)
    f = chol_solve(LS, a_des - Jc @ Minv_tau)                # (nc,)
    acc = Minv_tau + Minv_Jt @ f

    def kkt_res(qv):
        qq, vv = qv[:7], qv[7:]
        fk2 = fk(model, qq)
        Jc2, gamma2 = _contact_rows(model, qq, vv, nc1, fk2)
        g1 = rnea(model, qq, vv, acc) - jnp.swapaxes(Jc2, -1, -2) @ f
        if nc1:
            gap2 = fk2.ee_p[2:3] - jnp.reshape(jnp.asarray(ref_pos, dtype), (1,))
        else:
            gap2 = fk2.ee_p - jnp.asarray(ref_pos, dtype)
        h2 = (Jc2 @ acc + gamma2 + baumgarte_kp * gap2
              + baumgarte_kd * (Jc2 @ vv))
        return g1, h2

    G1, H2 = jax.jacfwd(kkt_res)(jnp.concatenate([q, v]))    # (7,14), (nc,14)
    df_dx = chol_solve(LS, Jc @ chol_solve(L, G1) - H2)
    da_dx = chol_solve(L, -G1 + jnp.swapaxes(Jc, -1, -2) @ df_dx)

    df_du = -chol_solve(LS, jnp.swapaxes(Minv_Jt, -1, -2))   # -S^{-1} Jc M^{-1}
    da_du = chol_solve(L, jnp.eye(7, dtype=dtype)) + Minv_Jt @ df_du
    return ContactDynDerivs(acc=acc, force=f, da_dx=da_dx, df_dx=df_dx,
                            da_du=da_du, df_du=df_du, fk_res=fk_res)


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
