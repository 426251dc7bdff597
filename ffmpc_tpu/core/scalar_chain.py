"""Scalar-channel Panda chain: FK, bias/drift, mass matrix, contact KKT.

Lane-efficient twin of ``core.kinematics`` / ``core.dynamics`` (see
``core.scalarops`` for the layout rationale): every quantity is a Python
list of scalar channels, so under ``vmap`` each op runs across the full
batch on the VPU lanes instead of across a 3- or 7-wide trailing dim.

Numerics match the vector implementations to float rounding:
- ``fk_chain``            == kinematics.fk + ee_jacobian
- bias in ``chain_bias_gamma`` == dynamics.bias_forces (RNEA at qdd=0)
- ``gamma`` (world drift) == dynamics._contact_rows' jvp-computed Jdot*v
- ``mass_matrix_chain``   == dynamics.mass_matrix_fk (same Jacobian form)
- ``contact_kkt``         == dynamics.fwd_dynamics_contact (damped Schur)

Reference semantics being reproduced: Pinocchio FK/RNEA and Crocoddyl
DifferentialActionModelFree/ContactFwdDynamics (crocoddyl_classical.py:
558-728), as catalogued in SURVEY.md §2.2.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .panda import PandaModel
from .scalarops import (chol, chol_solve, cross, from_np, mat_T, mat_mul,
                        mat_vec, sadd, sdot, smul, sneg, ssub, unstack, vadd,
                        vscale, vsub)


class ChainConsts(NamedTuple):
    """PandaModel constants as nested Python-float lists (trace-time)."""
    base_rot: list
    base_pos: list
    j_pos: list
    j_rot: list
    ee_pos: list
    ee_rot: list
    mass: list
    com: list
    inertia: list
    armature: list
    damping: list
    g_z: float          # |g| along -z (9.81)


def chain_consts(model: PandaModel) -> ChainConsts:
    g = np.asarray(model.gravity, dtype=np.float64)
    assert abs(g[0]) < 1e-12 and abs(g[1]) < 1e-12
    return ChainConsts(
        base_rot=from_np(model.base_rot), base_pos=from_np(model.base_pos),
        j_pos=from_np(model.j_pos), j_rot=from_np(model.j_rot),
        ee_pos=from_np(model.ee_pos), ee_rot=from_np(model.ee_rot),
        mass=from_np(model.mass), com=from_np(model.com),
        inertia=from_np(model.inertia), armature=from_np(model.armature),
        damping=from_np(model.damping), g_z=float(-g[2]))


class ChainFK(NamedTuple):
    R: list          # 7 world rotations (3x3 scalar lists)
    p: list          # 7 world positions (3-lists)
    axis: list       # 7 world joint axes
    R_local: list    # 7 parent->child rotations (for the RNEA sweeps)
    ee_R: list
    ee_p: list
    jp: list         # 7 linear Jacobian columns (axis_j x (ee_p - p_j))


def fk_chain(mc: ChainConsts, q: list) -> ChainFK:
    """Scalar FK over the 7-joint serial chain. q: list of 7 scalars."""
    R = mc.base_rot
    p = mc.base_pos
    Rs, ps, axes, Rloc = [], [], [], []
    for i in range(7):
        c = jnp.cos(q[i])
        s = jnp.sin(q[i])
        Rz = [[c, sneg(s), 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]]
        Rj = mat_mul(mc.j_rot[i], Rz)
        Rloc.append(Rj)
        p = vadd(p, mat_vec(R, mc.j_pos[i]))
        R = mat_mul(R, Rj)
        Rs.append(R)
        ps.append(p)
        axes.append([R[0][2], R[1][2], R[2][2]])
    ee_R = mat_mul(R, mc.ee_rot)
    ee_p = vadd(p, mat_vec(R, mc.ee_pos))
    jp = [cross(axes[j], vsub(ee_p, ps[j])) for j in range(7)]
    return ChainFK(R=Rs, p=ps, axis=axes, R_local=Rloc, ee_R=ee_R, ee_p=ee_p,
                   jp=jp)


def chain_rnea(mc: ChainConsts, f: ChainFK, q: list, v: list, a: list,
               want_ee_acc: bool = False):
    """One RNEA sweep: joint torques realizing acceleration ``a``, and
    optionally the world-frame gravity-free classical ee linear acceleration
    (``ee_acc = Jp a + dJp/dt v``, the quantity the contact constraint rows
    differentiate).

    The gravity trick seeds the base linear acceleration with -g; gravity
    enters the linear-acceleration recursion purely linearly (only rotations
    act on it), so the gravity-free ee acceleration is recovered by
    subtracting the world-frame g-offset at the end instead of running a
    second sweep.  With ``a`` a list of float zeros the qdd/armature terms
    partial-eval away and this computes bias torques b(q, v).
    """
    a0 = mat_vec(mat_T(mc.base_rot), [0.0, 0.0, mc.g_z])   # consts
    w = [0.0, 0.0, 0.0]
    wd = [0.0, 0.0, 0.0]
    ac = a0
    ws, wds, acs = [], [], []
    for i in range(7):
        Rt = mat_T(f.R_local[i])
        qd = v[i]
        w_p = mat_vec(Rt, w)
        wd_new = vadd(mat_vec(Rt, wd), cross(w_p, [0.0, 0.0, qd]))
        wd_new = [wd_new[0], wd_new[1], sadd(wd_new[2], a[i])]
        pi = mc.j_pos[i]
        ac = mat_vec(Rt, vadd(ac, vadd(cross(wd, pi), cross(w, cross(w, pi)))))
        w = [w_p[0], w_p[1], sadd(w_p[2], qd)]
        wd = wd_new
        ws.append(w)
        wds.append(wd)
        acs.append(ac)

    # backward Newton-Euler pass.  NOTE: with a != 0 the link linear
    # accelerations also gain J*a terms through the ac recursion only via
    # wd (revolute joints: qdd enters wd); the recursion above already
    # carries them, matching core.dynamics.rnea.
    fr = [0.0, 0.0, 0.0]
    nr = [0.0, 0.0, 0.0]
    tau = [None] * 7
    for i in range(6, -1, -1):
        c = mc.com[i]
        a_c = vadd(acs[i], vadd(cross(wds[i], c), cross(ws[i], cross(ws[i], c))))
        F = vscale(mc.mass[i], a_c)
        Iw = mat_vec(mc.inertia[i], ws[i])
        N = vadd(mat_vec(mc.inertia[i], wds[i]), cross(ws[i], Iw))
        f_i = vadd(F, fr)
        n_i = vadd(vadd(N, cross(c, F)), nr)
        tau[i] = sadd(n_i[2], smul(mc.armature[i], a[i]), smul(mc.damping[i], v[i]))
        if i > 0:
            f_parent = mat_vec(f.R_local[i], f_i)
            nr = vadd(mat_vec(f.R_local[i], n_i), cross(mc.j_pos[i], f_parent))
            fr = f_parent

    ee_acc = None
    if want_ee_acc:
        t = mc.ee_pos
        a_ee = vadd(acs[6], vadd(cross(wds[6], t), cross(ws[6], cross(ws[6], t))))
        ee_acc = mat_vec(f.R[6], a_ee)
        ee_acc = [ee_acc[0], ee_acc[1], ssub(ee_acc[2], mc.g_z)]
    return tau, ee_acc


def chain_bias_gamma(mc: ChainConsts, f: ChainFK, q: list, v: list,
                     want_gamma: bool = True):
    """Bias torques b(q, v) and the drift gamma = d/dt(Jp v)|_{qdd=0}
    (chain_rnea at a = 0, where ee_acc == gamma)."""
    zeros = [0.0] * 7
    return chain_rnea(mc, f, q, v, zeros, want_ee_acc=want_gamma)


def mass_matrix_chain(mc: ChainConsts, f: ChainFK):
    """Joint-space inertia in the world-Jacobian form of
    dynamics.mass_matrix_fk: M = sum_i m_i Jv_i^T Jv_i + Jw^T I_w,i Jw
    + diag(armature), with suffix-summed rotational terms."""
    c_w = [vadd(f.p[i], mat_vec(f.R[i], mc.com[i])) for i in range(7)]
    I_w = [mat_mul(mat_mul(f.R[i], mc.inertia[i]), mat_T(f.R[i]))
           for i in range(7)]

    # suffix sums of world inertias: Isum[k] = sum_{i >= k} I_w[i]
    Isum = [None] * 7
    Isum[6] = I_w[6]
    for k in range(5, -1, -1):
        Isum[k] = [[sadd(Isum[k + 1][r][c2], I_w[k][r][c2]) for c2 in range(3)]
                   for r in range(3)]
    u = [mat_vec(Isum[k], f.axis[k]) for k in range(7)]   # Isum[k] @ axis_k

    # Jv[i][j] = axis_j x (c_w[i] - p_j), j <= i
    Jv = [[cross(f.axis[j], vsub(c_w[i], f.p[j])) for j in range(i + 1)]
          for i in range(7)]

    M = [[0.0] * 7 for _ in range(7)]
    for j in range(7):
        for k in range(j, 7):
            terms = [smul(mc.mass[i], sdot(Jv[i][j], Jv[i][k]))
                     for i in range(k, 7)]
            val = sadd(sdot(f.axis[j], u[k]), *terms)
            if j == k:
                val = sadd(val, mc.armature[j])
            M[j][k] = val
            M[k][j] = val
    return M


class ChainDyn(NamedTuple):
    acc: list           # 7 scalars
    force: list | None  # nc scalars (contact) or None (free)
    f: ChainFK
    bias: list


def free_dynamics_chain(mc: ChainConsts, q: list, v: list, tau: list) -> ChainDyn:
    f = fk_chain(mc, q)
    bias, _ = chain_bias_gamma(mc, f, q, v, want_gamma=False)
    M = mass_matrix_chain(mc, f)
    L, inv = chol(M, 7)
    acc = chol_solve(L, inv, [ssub(tau[i], bias[i]) for i in range(7)])
    return ChainDyn(acc=acc, force=None, f=f, bias=bias)


def stack_mat(M, like):
    """Nested scalar lists -> jnp array, converting float consts."""
    import jax.numpy as _jnp

    def conv(x):
        if isinstance(x, (int, float)):
            return _jnp.zeros_like(like) + x
        return x
    if isinstance(M[0], (list, tuple)):
        return _jnp.stack([_jnp.stack([conv(x) for x in row]) for row in M])
    return _jnp.stack([conv(x) for x in M])


def _jacfwd7(f, x_vec, unroll: bool):
    """Jacobian of ``f`` at the 7-vector ``x_vec``.

    ``unroll=False``: plain ``jax.jacfwd`` (vmap over tangents).  Under the
    solver's outer sample vmap the 7/14-wide tangent axis lands as a
    trailing lane dim, leaving most of the 128 TPU lanes idle in every
    sweep op.  ``unroll=True``: seven one-hot ``jvp`` sweeps unrolled at
    trace time — each tangent sweep is its own full-lane op set, and XLA
    CSE collapses the seven identical primal subgraphs."""
    if not unroll:
        return jax.jacfwd(f)(x_vec)
    cols = []
    for i in range(7):
        e = np.zeros(7)
        e[i] = 1.0
        _, tan = jax.jvp(f, (x_vec,), (jnp.asarray(e, x_vec.dtype),))
        cols.append(tan)
    return jax.tree.map(lambda *c: jnp.stack(c, axis=-1), *cols)


class ChainFreeDerivs(NamedTuple):
    acc: jnp.ndarray       # (7,)
    da_dx: jnp.ndarray     # (7, 14)
    da_du: jnp.ndarray     # (7, 7)
    f: ChainFK
    extras_jac: object     # pytree of d(extra_q_fn)/dq, or None


class ChainContactDerivs(NamedTuple):
    acc: jnp.ndarray       # (7,)
    force: jnp.ndarray     # (nc,)
    da_dx: jnp.ndarray     # (7, 14)
    df_dx: jnp.ndarray     # (nc, 14)
    da_du: jnp.ndarray     # (7, 7)
    df_du: jnp.ndarray     # (nc, 7)
    f: ChainFK
    extras_jac: object


def free_dynamics_derivs_chain(mc: ChainConsts, q_vec, v_vec, u_vec,
                               extra_q_fn=None,
                               tangent_unroll: bool = False
                               ) -> ChainFreeDerivs:
    """Free forward dynamics + analytic first derivatives, scalar-channel.

    Same implicit-function structure as dynamics.free_dynamics_derivs
    (inverse-dynamics trick, separate q/v tangent sweeps), but every sweep
    runs through the scalar chain so the jacfwd tangents ride the
    lane-efficient layout."""
    from .smallchol import chol_solve as chol_solve_arr

    q = unstack(q_vec, 7)
    v = unstack(v_vec, 7)
    tau = unstack(u_vec, 7)
    f = fk_chain(mc, q)
    bias, _ = chain_bias_gamma(mc, f, q, v, want_gamma=False)
    M = mass_matrix_chain(mc, f)
    L, inv = chol(M, 7)
    acc = chol_solve(L, inv, [ssub(tau[i], bias[i]) for i in range(7)])

    def g1_q(qq_vec):
        qq = unstack(qq_vec, 7)
        f2 = fk_chain(mc, qq)
        tau_r, _ = chain_rnea(mc, f2, qq, v, acc)
        extras = extra_q_fn(qq, f2) if extra_q_fn is not None else 0.0
        return jnp.stack(tau_r), extras

    def g1_v(vv_vec):
        vv = unstack(vv_vec, 7)
        tau_r, _ = chain_rnea(mc, f, q, vv, acc)
        return jnp.stack(tau_r)

    G1q, extras_jac = _jacfwd7(g1_q, q_vec, tangent_unroll)
    G1v = _jacfwd7(g1_v, v_vec, tangent_unroll)
    G1 = jnp.concatenate([G1q, G1v], axis=1)                 # (7, 14)

    L_arr = stack_mat(L, L[0][0])
    da_dx = -chol_solve_arr(L_arr, G1)
    da_du = chol_solve_arr(L_arr, jnp.eye(7, dtype=q_vec.dtype))
    if extra_q_fn is None:
        extras_jac = None
    return ChainFreeDerivs(acc=jnp.stack(acc), da_dx=da_dx, da_du=da_du,
                           f=f, extras_jac=extras_jac)


def contact_dynamics_derivs_chain(mc: ChainConsts, q_vec, v_vec, u_vec, *,
                                  ref_pos, nc1: bool, baumgarte_kp: float,
                                  baumgarte_kd: float, damping_c: float,
                                  extra_q_fn=None,
                                  tangent_unroll: bool = False
                                  ) -> ChainContactDerivs:
    """Damped-KKT contact dynamics + analytic first derivatives,
    scalar-channel (the twin of dynamics.contact_dynamics_derivs).

    Sweep algebra: with (acc, f) fixed, g1(q) = RNEA(q, v, acc) - Jc(q)^T f
    and, using ee_acc(q, v, a) = Jc(q) a + gamma(q, v),
    h2(q) = Jc acc + gamma + kp*gap + kd*Jc v
          = ee_acc(q, v, acc) + kp*gap(q) + kd*Jc(q) v
    — so ONE chain_rnea sweep per tangent direction supplies both rows; the
    same identity gives the v-sweep (gap constant drops out)."""
    from .smallchol import chol_solve as chol_solve_arr

    dtype = q_vec.dtype
    kp, kd = float(baumgarte_kp), float(baumgarte_kd)
    q = unstack(q_vec, 7)
    v = unstack(v_vec, 7)
    tau = unstack(u_vec, 7)
    f = fk_chain(mc, q)
    bias, gamma = chain_bias_gamma(mc, f, q, v, want_gamma=True)
    M = mass_matrix_chain(mc, f)
    L, inv = chol(M, 7)

    axes = [2] if nc1 else [0, 1, 2]
    nc = len(axes)
    Jc = [[f.jp[j][ax] for j in range(7)] for ax in axes]
    if nc1:
        gap = [ssub(f.ee_p[2], ref_pos)]
    else:
        gap = [ssub(f.ee_p[ax], ref_pos[ax]) for ax in range(3)]
    gam = [gamma[ax] for ax in axes]

    Minv_tau = chol_solve(L, inv, [ssub(tau[i], bias[i]) for i in range(7)])
    Minv_Jt = [chol_solve(L, inv, Jc[r]) for r in range(nc)]
    a_des = [sadd(sneg(gam[r]), smul(-kp, gap[r]),
                  smul(-kd, sdot(Jc[r], v))) for r in range(nc)]
    srhs = [ssub(a_des[r], sdot(Jc[r], Minv_tau)) for r in range(nc)]
    if nc == 1:
        S_val = sadd(sdot(Jc[0], Minv_Jt[0]), damping_c)
        force = [srhs[0] / S_val]
        LS = inv_S = None
    else:
        S = [[sdot(Jc[r], Minv_Jt[c2]) for c2 in range(nc)] for r in range(nc)]
        for r in range(nc):
            S[r][r] = sadd(S[r][r], damping_c)
        LS, inv_S = chol(S, nc)
        force = chol_solve(LS, inv_S, srhs)
    acc = [sadd(Minv_tau[i], *[smul(force[r], Minv_Jt[r][i]) for r in range(nc)])
           for i in range(7)]

    def kkt_q(qq_vec):
        qq = unstack(qq_vec, 7)
        f2 = fk_chain(mc, qq)
        tau_r, ee_acc = chain_rnea(mc, f2, qq, v, acc, want_ee_acc=True)
        Jc2 = [[f2.jp[j][ax] for j in range(7)] for ax in axes]
        g1 = [sadd(tau_r[i],
                   *[sneg(smul(Jc2[r][i], force[r])) for r in range(nc)])
              for i in range(7)]
        if nc1:
            gap2 = [ssub(f2.ee_p[2], ref_pos)]
        else:
            gap2 = [ssub(f2.ee_p[ax], ref_pos[ax]) for ax in range(3)]
        h2 = [sadd(ee_acc[axes[r]], smul(kp, gap2[r]),
                   smul(kd, sdot(Jc2[r], v))) for r in range(nc)]
        extras = extra_q_fn(qq, f2) if extra_q_fn is not None else 0.0
        return jnp.stack(g1), jnp.stack(h2), extras

    def kkt_v(vv_vec):
        vv = unstack(vv_vec, 7)
        tau_r, ee_acc = chain_rnea(mc, f, q, vv, acc, want_ee_acc=True)
        h2 = [sadd(ee_acc[axes[r]], smul(kd, sdot(Jc[r], vv)))
              for r in range(nc)]
        return jnp.stack(tau_r), jnp.stack(h2)

    G1q, H2q, extras_jac = _jacfwd7(kkt_q, q_vec, tangent_unroll)
    G1v, H2v = _jacfwd7(kkt_v, v_vec, tangent_unroll)
    G1 = jnp.concatenate([G1q, G1v], axis=1)                 # (7, 14)
    H2 = jnp.concatenate([H2q, H2v], axis=1)                 # (nc, 14)

    L_arr = stack_mat(L, L[0][0])
    Jc_arr = stack_mat(Jc, L[0][0])
    Minv_Jt_arr = stack_mat(Minv_Jt, L[0][0]).T              # (7, nc)
    Minv_G1 = chol_solve_arr(L_arr, G1)
    rhs_f = Jc_arr @ Minv_G1 - H2                            # (nc, 14)
    if nc == 1:
        df_dx = rhs_f / S_val
        df_du = -(Minv_Jt_arr.T) / S_val
    else:
        LS_arr = stack_mat(LS, L[0][0])
        df_dx = chol_solve_arr(LS_arr, rhs_f)
        df_du = -chol_solve_arr(LS_arr, Minv_Jt_arr.T)
    da_dx = chol_solve_arr(L_arr, -G1 + Jc_arr.T @ df_dx)
    da_du = (chol_solve_arr(L_arr, jnp.eye(7, dtype=dtype))
             + Minv_Jt_arr @ df_du)
    if extra_q_fn is None:
        extras_jac = None
    return ChainContactDerivs(
        acc=jnp.stack(acc), force=jnp.stack(force), da_dx=da_dx, df_dx=df_dx,
        da_du=da_du, df_du=df_du, f=f, extras_jac=extras_jac)


def contact_dynamics_chain(mc: ChainConsts, q: list, v: list, tau: list, *,
                           ref_pos, nc1: bool, baumgarte_kp: float,
                           baumgarte_kd: float, damping_c: float) -> ChainDyn:
    """Damped-KKT contact dynamics (Schur complement), scalar channels.

    ``ref_pos``: scalar z-target (nc1) or 3-list anchor (point3d); may be
    traced (per-knot reference).  Matches dynamics.fwd_dynamics_contact.
    """
    f = fk_chain(mc, q)
    bias, gamma = chain_bias_gamma(mc, f, q, v, want_gamma=True)
    M = mass_matrix_chain(mc, f)
    L, inv = chol(M, 7)

    if nc1:
        Jc = [[f.jp[j][2] for j in range(7)]]                    # (1, 7)
        gap = [ssub(f.ee_p[2], ref_pos)]
        gam = [gamma[2]]
    else:
        Jc = [[f.jp[j][ax] for j in range(7)] for ax in range(3)]
        gap = [ssub(f.ee_p[ax], ref_pos[ax]) for ax in range(3)]
        gam = gamma
    nc = len(Jc)

    rhs = [ssub(tau[i], bias[i]) for i in range(7)]
    Minv_tau = chol_solve(L, inv, rhs)
    Minv_Jt = [chol_solve(L, inv, Jc[r]) for r in range(nc)]     # rows: (7,)

    a_des = [sadd(sneg(gam[r]), smul(-baumgarte_kp, gap[r]),
                  smul(-baumgarte_kd, sdot(Jc[r], v))) for r in range(nc)]
    srhs = [ssub(a_des[r], sdot(Jc[r], Minv_tau)) for r in range(nc)]

    if nc == 1:
        S = sadd(sdot(Jc[0], Minv_Jt[0]), damping_c)
        force = [srhs[0] / S]
    else:
        S = [[sdot(Jc[r], Minv_Jt[c2]) for c2 in range(nc)] for r in range(nc)]
        for r in range(nc):
            S[r][r] = sadd(S[r][r], damping_c)
        LS, invS = chol(S, nc)
        force = chol_solve(LS, invS, srhs)

    acc = [sadd(Minv_tau[i], *[smul(force[r], Minv_Jt[r][i]) for r in range(nc)])
           for i in range(7)]
    return ChainDyn(acc=acc, force=force, f=f, bias=bias)
