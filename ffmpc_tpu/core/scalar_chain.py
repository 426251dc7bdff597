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
import jax.numpy as jnp

from .panda import PandaModel
from .scalarops import (chol, chol_solve, cross, from_np, mat_T, mat_mul,
                        mat_vec, sadd, sdot, smul, sneg, ssub, vadd, vscale,
                        vsub)


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


def chain_bias_gamma(mc: ChainConsts, f: ChainFK, q: list, v: list,
                     want_gamma: bool = True):
    """One RNEA sweep at qdd = 0: bias torques b(q, v) and the world-frame
    classical ee linear acceleration drift gamma = d/dt(Jp v)|_{qdd=0}.

    The gravity trick seeds the base linear acceleration with -g; gravity
    enters the linear-acceleration recursion purely linearly (only rotations
    act on it), so the gravity-free drift is recovered by subtracting the
    world-frame g-offset at the end instead of running a second sweep.
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
        pi = mc.j_pos[i]
        ac = mat_vec(Rt, vadd(ac, vadd(cross(wd, pi), cross(w, cross(w, pi)))))
        w = [w_p[0], w_p[1], sadd(w_p[2], qd)]
        wd = wd_new
        ws.append(w)
        wds.append(wd)
        acs.append(ac)

    # backward Newton-Euler for the bias torques
    fr = [0.0, 0.0, 0.0]
    nr = [0.0, 0.0, 0.0]
    bias = [None] * 7
    for i in range(6, -1, -1):
        c = mc.com[i]
        a_c = vadd(acs[i], vadd(cross(wds[i], c), cross(ws[i], cross(ws[i], c))))
        F = vscale(mc.mass[i], a_c)
        Iw = mat_vec(mc.inertia[i], ws[i])
        N = vadd(mat_vec(mc.inertia[i], wds[i]), cross(ws[i], Iw))
        f_i = vadd(F, fr)
        n_i = vadd(vadd(N, cross(c, F)), nr)
        bias[i] = sadd(n_i[2], smul(mc.damping[i], v[i]))
        if i > 0:
            f_parent = mat_vec(f.R_local[i], f_i)
            nr = vadd(mat_vec(f.R_local[i], n_i), cross(mc.j_pos[i], f_parent))
            fr = f_parent

    gamma = None
    if want_gamma:
        t = mc.ee_pos
        a_ee = vadd(acs[6], vadd(cross(wds[6], t), cross(ws[6], cross(ws[6], t))))
        gamma = mat_vec(f.R[6], a_ee)
        gamma = [gamma[0], gamma[1], ssub(gamma[2], mc.g_z)]
    return bias, gamma


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
