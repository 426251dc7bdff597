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

from typing import Any, NamedTuple

import numpy as np
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


def mass_matrix_fk(model: PandaModel, q, fk_res: FKResult | None = None):
    """Joint-space inertia via the world-frame Jacobian formulation,
    reusing FK:  M = sum_i [ m_i Jv_i^T Jv_i + Jw_i^T (R_i I_i R_i^T) Jw_i ]
    + diag(armature).

    Equivalent to ``mass_matrix`` (7x RNEA columns) but with no sequential
    recursion at all — every term is a masked batched cross product /
    small matmul over the already-computed FK, which XLA fuses into the
    surrounding knot chain.  Used on the hot paths (knot calc/diff) where
    fk_res is already available.
    """
    f = fk_res if fk_res is not None else fk(model, q)
    dtype = q.dtype
    batch = q.shape[:-1]

    c_w = f.p + jnp.einsum("...iab,ib->...ia", f.R, model.com)   # (...,7,3)
    I_w = jnp.einsum("...iab,ibc,...idc->...iad", f.R, model.inertia, f.R)

    # Jv[i, j] = axis_j x (com_i - p_j) for j <= i; Jw[i, j] = axis_j
    r = c_w[..., :, None, :] - f.p[..., None, :, :]              # (...,7i,7j,3)
    axis = jnp.broadcast_to(f.axis_w[..., None, :, :], batch + (7, 7, 3))
    mask = jnp.asarray(np.tril(np.ones((7, 7))), dtype)[..., None]
    Jv = jnp.cross(axis, r) * mask
    Jw = axis * mask

    m = jnp.asarray(model.mass, dtype)
    M = (jnp.einsum("i,...ija,...ika->...jk", m, Jv, Jv)
         + jnp.einsum("...ija,...iab,...ikb->...jk", Jw, I_w, Jw))
    return M + jnp.diag(model.armature.astype(dtype))


def fwd_dynamics_free(model: PandaModel, q, v, tau, fk_res: FKResult | None = None):
    """Free-space forward dynamics a = M^{-1}(tau - b).  (..., 7) each.

    Equivalent of Crocoddyl's DifferentialActionModelFreeFwdDynamics
    (crocoddyl_classical.py:619).
    """
    M = mass_matrix_fk(model, q, fk_res)
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
    extras_jac: Any      # d(extra_q_fn)/dq pytree, or None


def free_dynamics_derivs(model: PandaModel, q, v, tau) -> FreeDynDerivs:
    """Free forward dynamics + analytic first derivatives (unbatched; vmap over
    leading dims at the call site).

    Uses the inverse-dynamics trick (Carpentier & Mansard, RSS 2018): with
    a* = M^{-1}(tau - b) fixed, RNEA(q, v, a*) = M(q) a* + b(q, v), so

        d(acc)/d(q,v) = -M^{-1} * d RNEA(q, v, a*)/d(q,v),   d(acc)/dtau = M^{-1}.

    Only one RNEA is differentiated instead of pushing tangents through the
    whole mass-matrix (7x RNEA) + Cholesky + solve chain, and the q- and
    v-sweeps are separate so the v-sweep sees all joint rotations as
    constants (XLA DCEs the rotation-tangent chain entirely).
    """
    fk_res = fk(model, q)
    M = mass_matrix_fk(model, q, fk_res)
    b = bias_forces(model, q, v)
    L = chol_factor(M)
    acc = chol_solve(L, tau - b)

    # acc enters via closure: constant w.r.t. the differentiation variable
    G1q = jax.jacfwd(lambda qq: rnea(model, qq, v, acc))(q)
    G1v = jax.jacfwd(lambda vv: rnea(model, q, vv, acc))(v)
    da_dx = -chol_solve(L, jnp.concatenate([G1q, G1v], axis=1))
    da_du = chol_solve(L, jnp.eye(7, dtype=q.dtype))
    return FreeDynDerivs(acc=acc, da_dx=da_dx, da_du=da_du, fk_res=fk_res)


def contact_dynamics_derivs(model: PandaModel, q, v, tau, *,
                            ref_pos, nc1: bool = True,
                            baumgarte_kp: float = 0.0, baumgarte_kd: float = 0.0,
                            damping_c: float = 1.0e-8,
                            extra_q_fn=None) -> ContactDynDerivs:
    """Damped-KKT contact dynamics + analytic first derivatives (unbatched).

    The solution (a, f) of the damped KKT system satisfies

        g1(q, v, tau; a, f) = RNEA(q, v, a) - Jc(q)^T f - tau           = 0
        h2(q, v;     a, f) = Jc(q) a + gamma(q, v) + kp*gap + kd*Jc v + c f = 0

    Implicit function theorem: [M, -Jc^T; Jc, cI] [da; df] = -[dg1; dh2]
    with dg1/dh2 evaluated at FIXED (a, f) — one RNEA + contact-row sweep
    under forward tangents, then re-solves against the already factored M
    and Schur complement S = Jc M^{-1} Jc^T + cI.  Exact for the damped
    system (matches jacfwd of fwd_dynamics_contact to roundoff).

    The q- and v-sweeps are separate: the v-sweep sees FK/Jacobian as
    constants, so XLA DCEs their tangent chains (same effect as the
    measured-faster separate x/u sweeps in the jacfwd path).

    ``extra_q_fn(qq, fk2) -> pytree``: optional extra q-dependent outputs
    (e.g. cost-residual kinematics) evaluated inside the q-sweep so their
    Jacobians share the FK tangent computation; d/dq comes back in
    ``extras_jac``.
    """
    dtype = q.dtype
    fk_res = fk(model, q)
    Jc, gamma = _contact_rows(model, q, v, nc1, fk_res)
    nc = Jc.shape[-2]

    M = mass_matrix_fk(model, q, fk_res)
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

    def kkt_q(qq):
        fk2 = fk(model, qq)
        Jc2, gamma2 = _contact_rows(model, qq, v, nc1, fk2)
        g1 = rnea(model, qq, v, acc) - jnp.swapaxes(Jc2, -1, -2) @ f
        if nc1:
            gap2 = fk2.ee_p[2:3] - jnp.reshape(jnp.asarray(ref_pos, dtype), (1,))
        else:
            gap2 = fk2.ee_p - jnp.asarray(ref_pos, dtype)
        h2 = (Jc2 @ acc + gamma2 + baumgarte_kp * gap2
              + baumgarte_kd * (Jc2 @ v))
        extras = extra_q_fn(qq, fk2) if extra_q_fn is not None else 0.0
        return g1, h2, extras

    G1q, H2q, extras_jac = jax.jacfwd(kkt_q)(q)
    G1v, H2v = _kkt_v_jac(model, q, v, acc, Jc, nc1, baumgarte_kd)
    G1 = jnp.concatenate([G1q, G1v], axis=1)                 # (7, 14)
    H2 = jnp.concatenate([H2q, H2v], axis=1)                 # (nc, 14)
    if extra_q_fn is None:
        extras_jac = None

    df_dx = chol_solve(LS, Jc @ chol_solve(L, G1) - H2)
    da_dx = chol_solve(L, -G1 + jnp.swapaxes(Jc, -1, -2) @ df_dx)

    df_du = -chol_solve(LS, jnp.swapaxes(Minv_Jt, -1, -2))   # -S^{-1} Jc M^{-1}
    da_du = chol_solve(L, jnp.eye(7, dtype=dtype)) + Minv_Jt @ df_du
    return ContactDynDerivs(acc=acc, force=f, da_dx=da_dx, df_dx=df_dx,
                            da_du=da_du, df_du=df_du, fk_res=fk_res,
                            extras_jac=extras_jac)


def _kkt_v_jac(model: PandaModel, q, v, acc, Jc, nc1: bool, kd: float):
    """d(g1, h2)/dv at fixed (q, acc, f): RNEA velocity terms + drift.

    gamma(q, vv) = (dJ/dq . vv) vv is bilinear in vv; its v-Jacobian flows
    through both slots of the defining jvp.  FK primals are constants here.
    """

    def g1_of(vv):
        return rnea(model, q, vv, acc)

    def h2_of(vv):
        def linvel(qq):
            Jp2, _ = ee_jacobian(model, qq, fk_res=fk(model, qq))
            Jc2 = Jp2[2:3, :] if nc1 else Jp2
            return Jc2 @ vv

        _, gamma2 = jax.jvp(linvel, (q,), (vv,))
        return gamma2 + kd * (Jc @ vv)

    G1v = jax.jacfwd(g1_of)(v)
    H2v = jax.jacfwd(h2_of)(v)
    return G1v, H2v


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

    M = mass_matrix_fk(model, q, fk_res)
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
