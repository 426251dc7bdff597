"""Scalar-channel knot ``calc`` — the lane-efficient rollout kernel.

Twin of the vectorized knot calc in ``ocp.action`` (same residual stack,
same Euler integration, same cost scaling — reference _make_dam +
IntegratedActionModelEuler, crocoddyl_classical.py:558-728, and the
augmented LPF model, crocoddyl_force_feedback.py:149-290), but built on
``core.scalar_chain``: every logical scalar is its own channel, so under
``vmap`` the whole per-knot chain becomes full-lane (B,)-elementwise VPU
code instead of 3- and 7-wide padded ops.  The forward rollout is the
dominant solver stage; this layout is what makes it fast on TPU.

Zero-weight cost channels, infinite barrier bounds and constant-zero
inputs (e.g. the terminal knot's u = 0) are folded away at trace time by
the partial-evaluating scalar ops.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from ..core.panda import PandaModel
from ..core.scalar_chain import (chain_consts, contact_dynamics_chain,
                                 free_dynamics_chain)
from ..core.scalarops import (is_const, mat_T, mat_mul, sadd, sdot, smul,
                              sneg, ssub, unstack)
from . import activations as act
from .weights import OCPWeights

_BIG = 1e30   # barrier bounds beyond this are treated as infinite


def _act_value(a: act.Activation, r: list):
    """Scalar-channel activation value; folds zero weights / inf bounds."""
    if a.kind == "quad":
        return smul(0.5, sadd(*[smul(x, x) for x in r]))
    if a.kind == "wquad":
        terms = [smul(w, smul(x, x)) for w, x in zip(a.weights, r) if w != 0.0]
        return smul(0.5, sadd(*terms))
    terms = []
    for x, lb, ub in zip(r, a.lb, a.ub):
        hi = jnp.maximum(ssub(x, ub), 0.0) if ub < _BIG else 0.0
        lo = jnp.minimum(ssub(x, lb), 0.0) if lb > -_BIG else 0.0
        o = sadd(hi, lo)
        if is_const(o):
            continue
        terms.append(smul(o, o))
    return smul(0.5, sadd(*terms))


def _assemble_cost_s(spec, res: Dict[str, list], dt_scale: float,
                     terminal: bool):
    total = 0.0
    for name, term in spec.items():
        if terminal and not term.terminal:
            continue
        s = term.weight * (dt_scale if term.dt_scaled else 1.0)
        if s == 0.0:
            continue
        total = sadd(total, smul(s, _act_value(term.activation, res[name])))
    return total


def _arccos_newton(c):
    """arccos from supported-everywhere primitives (sqrt/sin/cos/where).

    Mosaic (Pallas TPU) has no acos/atan lowering, and the scalar knot
    calc runs verbatim inside the fused rollout kernel
    (solver/rollout_pallas.py).  Polynomial seed (Abramowitz-Stegun
    4.4.45) + 3 Newton steps on cos(t) = c converges to machine
    precision — numerically indistinguishable from libm acos for every
    parity tolerance in the suite."""
    a = jnp.abs(c)
    t = jnp.sqrt(jnp.maximum(1.0 - a, 0.0)) * (
        1.5707288 + a * (-0.2121144 + a * (0.0742610 + a * (-0.0187293))))
    t = jnp.where(c < 0, np.pi - t, t)
    for _ in range(3):
        s = jnp.sin(t)
        t = t + (jnp.cos(t) - c) / jnp.maximum(s, 1e-30)
    return t


def _log3_s(A):
    """Scalar SO(3) log map (matches core.spatial.log3)."""
    tr = sadd(A[0][0], A[1][1], A[2][2])
    c = jnp.clip(smul(0.5, ssub(tr, 1.0)), -1.0, 1.0)
    theta = _arccos_newton(c)
    w = [smul(0.5, ssub(A[2][1], A[1][2])),
         smul(0.5, ssub(A[0][2], A[2][0])),
         smul(0.5, ssub(A[1][0], A[0][1]))]
    small = theta < 1e-5
    sin_t = jnp.sin(theta)
    factor = jnp.where(small, 1.0 + theta * theta / 6.0,
                       theta / jnp.where(small, 1.0, sin_t))
    return [smul(factor, wi) for wi in w]


def _ref_scalars(ref):
    """Unpack a ProblemRefs knot into scalar channels."""
    return {
        "p_ref": unstack(ref.p_ref, 3),
        "v_ref": unstack(ref.v_ref, 3),
        "x_reg_ref": unstack(ref.x_reg_ref, 14),
        "tau_ref": unstack(ref.tau_ref, 7),
        "R_des": [[ref.R_des[i, j] for j in range(3)] for i in range(3)],
        "y_ref": unstack(ref.y_ref, 21),
    }


def _classical_raw_s(model: PandaModel, mc, W: OCPWeights, surface: bool,
                     nc: int, terminal: bool, ref, x: list, u: list):
    """Scalar twin of action._classical_raw: (q_next, v_next, res dict)."""
    from .action import _build_q_soft_barrier, _friction_cone_A

    dt = float(W.dt_ocp)
    q, v = x[:7], x[7:]
    r = _ref_scalars(ref)

    if surface:
        z_target = ssub(r["p_ref"][2], float(W.z_press))
        ref_pos = z_target if nc == 1 else [r["p_ref"][0], r["p_ref"][1], z_target]
        dyn = contact_dynamics_chain(
            mc, q, v, u, ref_pos=ref_pos, nc1=(nc == 1),
            baumgarte_kp=float(W.contact_gains[0]),
            baumgarte_kd=float(W.contact_gains[1]),
            damping_c=float(W.contact_inv_damping))
    else:
        dyn = free_dynamics_chain(mc, q, v, u)
    f = dyn.f
    force = dyn.force

    v_next = [sadd(v[i], smul(dt, dyn.acc[i])) for i in range(7)]
    q_next = [sadd(q[i], smul(dt, v_next[i])) for i in range(7)]

    lin = [sadd(*[smul(v[j], f.jp[j][ax]) for j in range(7)]) for ax in range(3)]
    ang = [sadd(*[smul(v[j], f.axis[j][ax]) for j in range(7)]) for ax in range(3)]
    vel6 = lin + ang

    res: Dict[str, list] = {}
    res["posture"] = [ssub(x[i], r["x_reg_ref"][i]) for i in range(14)]
    res["v_damp"] = x
    if W.w_q_soft_limits > 0.0:
        x_ref_np, _, _ = _build_q_soft_barrier(model, W.q_soft_limit_margin)
        res["q_soft_limits"] = [ssub(x[i], float(x_ref_np[i])) for i in range(14)]
    res["ee_ori"] = _log3_s(mat_mul(mat_T(r["R_des"]), f.ee_R))
    res["w_damp"] = vel6
    if not terminal:
        res["tau_reg"] = [ssub(u[i], r["tau_ref"][i]) for i in range(7)]
        if W.w_tau_soft_limits > 0.0:
            res["tau_soft_limits"] = u
    if not surface:
        res["ee_pos"] = [ssub(f.ee_p[i], r["p_ref"][i]) for i in range(3)]
    else:
        res["ee_xy"] = [ssub(f.ee_p[i], r["p_ref"][i]) for i in range(3)]
        v_ref6 = [r["v_ref"][0], r["v_ref"][1], 0.0, 0.0, 0.0, 0.0]
        res["ee_vxy"] = [ssub(vel6[i], v_ref6[i]) for i in range(6)]
        if W.w_plane_z > 0.0:
            p_c = [r["p_ref"][0], r["p_ref"][1], ssub(r["p_ref"][2], float(W.z_press))]
            res["plane_z"] = [ssub(f.ee_p[i], p_c[i]) for i in range(3)]
        if W.w_vz > 0.0:
            res["vz_damp"] = vel6
        if nc == 3 and W.w_friction_cone > 0.0:
            A = _friction_cone_A(W.mu)
            res["friction_cone"] = [
                sdot([float(A[rr, cc]) for cc in range(3)], force)
                for rr in range(4)]
        if W.w_unilateral > 0.0:
            res["unilateral"] = force
        if W.w_fn > 0.0:
            fn_ref = [float(W.fn_des)] if nc == 1 else [0.0, 0.0, float(W.fn_des)]
            res["fn_track"] = [ssub(force[i], fn_ref[i]) for i in range(len(force))]

    return q_next, v_next, res


def make_scalar_analytic_classical(model: PandaModel, W: OCPWeights,
                                   surface: bool,
                                   tangent_unroll: bool = False):
    """fn(ref, x, u, terminal) -> (xnext, res, Jx, Ju, Fx, Fu): the analytic
    derivative pass (same implicit-function structure as
    action._classical_analytic) with every tangent sweep running through the
    scalar chain, so jacfwd tangents ride the lane-efficient layout.

    Pure-regularization residual Jacobians are emitted as ("eye", offset)
    sentinels for the structured GN assembly."""
    from .action import _make_spec, _build_q_soft_barrier, _friction_cone_A
    from ..core.scalar_chain import (contact_dynamics_derivs_chain,
                                     free_dynamics_derivs_chain, stack_mat)
    from ..core.kinematics import FKResult
    from .action import _residual_values

    spec, nc = _make_spec(model, W, surface)
    mc = chain_consts(model)
    dt = float(W.dt_ocp)

    def fn(ref, x, u, terminal: bool):
        dtype = x.dtype
        q_vec, v_vec = x[:7], x[7:14]
        v_l = unstack(v_vec, 7)
        r = _ref_scalars(ref)
        Rdes_T = mat_T(r["R_des"])

        def kin_of(qq, f2):
            """Cost-residual kinematics inside the q-sweep (FK tangents
            computed once, shared with the dynamics rows)."""
            lin = [sadd(*[smul(v_l[j], f2.jp[j][ax]) for j in range(7)])
                   for ax in range(3)]
            ang = [sadd(*[smul(v_l[j], f2.axis[j][ax]) for j in range(7)])
                   for ax in range(3)]
            ori = _log3_s(mat_mul(Rdes_T, f2.ee_R))
            return jnp.stack(ori), jnp.stack(lin + ang)

        if surface:
            z_target = ssub(r["p_ref"][2], float(W.z_press))
            ref_pos = (z_target if nc == 1
                       else [r["p_ref"][0], r["p_ref"][1], z_target])
            dd = contact_dynamics_derivs_chain(
                mc, q_vec, v_vec, u, ref_pos=ref_pos, nc1=(nc == 1),
                baumgarte_kp=float(W.contact_gains[0]),
                baumgarte_kd=float(W.contact_gains[1]),
                damping_c=float(W.contact_inv_damping), extra_q_fn=kin_of,
                tangent_unroll=tangent_unroll)
            force, df_dx, df_du = dd.force, dd.df_dx, dd.df_du
        else:
            dd = free_dynamics_derivs_chain(mc, q_vec, v_vec, u,
                                            extra_q_fn=kin_of,
                                            tangent_unroll=tangent_unroll)
            force = df_dx = df_du = None
        dori_dq, dvel6_dq = dd.extras_jac
        acc, da_dx, da_du = dd.acc, dd.da_dx, dd.da_du

        v_next = v_vec + dt * acc
        q_next = q_vec + dt * v_next
        xnext = jnp.concatenate([q_next, v_next])

        I7 = jnp.eye(7, dtype=dtype)
        Aq, Av = da_dx[:, :7], da_dx[:, 7:]
        Fx = jnp.concatenate([
            jnp.concatenate([I7 + (dt * dt) * Aq, dt * I7 + (dt * dt) * Av], axis=1),
            jnp.concatenate([dt * Aq, I7 + dt * Av], axis=1),
        ], axis=0)
        Fu = jnp.concatenate([(dt * dt) * da_du, dt * da_du], axis=0)

        f = dd.f
        like = acc[0]
        Jp = stack_mat(f.jp, like).T        # (3, 7)
        Jr = stack_mat(f.axis, like).T      # (3, 7)
        vel6 = jnp.concatenate([Jp @ v_vec, Jr @ v_vec])
        fk_shim = FKResult(R=None, p=None, axis_w=None,
                           ee_R=stack_mat(f.ee_R, like),
                           ee_p=stack_mat(f.ee_p, like))
        res = _residual_values(model, W, surface, nc, terminal, ref, x, u,
                               fk_shim, vel6, force)

        Z37 = jnp.zeros((3, 7), dtype)
        J_ori = jnp.concatenate([dori_dq, Z37], axis=1)
        J_vel6 = jnp.concatenate(
            [dvel6_dq, jnp.concatenate([Jp, Jr], axis=0)], axis=1)
        J_pos14 = jnp.concatenate([Jp, Z37], axis=1)

        Jx = {"posture": ("eye", 0), "v_damp": ("eye", 0),
              "ee_ori": J_ori, "w_damp": J_vel6}
        Ju = {}
        if W.w_q_soft_limits > 0.0:
            Jx["q_soft_limits"] = ("eye", 0)
        if not terminal:
            Ju["tau_reg"] = ("eye", 0)
            if W.w_tau_soft_limits > 0.0:
                Ju["tau_soft_limits"] = ("eye", 0)
        if not surface:
            Jx["ee_pos"] = J_pos14
        else:
            Jx["ee_xy"] = J_pos14
            Jx["ee_vxy"] = J_vel6
            if W.w_plane_z > 0.0:
                Jx["plane_z"] = J_pos14
            if W.w_vz > 0.0:
                Jx["vz_damp"] = J_vel6
            if nc == 3 and W.w_friction_cone > 0.0:
                A = jnp.asarray(_friction_cone_A(W.mu), dtype)
                Jx["friction_cone"] = A @ df_dx
                Ju["friction_cone"] = A @ df_du
            if W.w_unilateral > 0.0:
                Jx["unilateral"] = df_dx
                Ju["unilateral"] = df_du
            if W.w_fn > 0.0:
                Jx["fn_track"] = df_dx
                Ju["fn_track"] = df_du
        return xnext, res, Jx, Ju, Fx, Fu

    return fn


def make_scalar_analytic_augmented(model: PandaModel, W: OCPWeights,
                                   surface: bool,
                                   tangent_unroll: bool = False):
    """fn(ref, y, w, terminal) -> (ynext, res, Jy, Jw, Fy, Fw): the augmented
    LPF lift of make_scalar_analytic_classical (block assembly as in
    action._aug_analytic / the reference's hand-built Jacobians,
    crocoddyl_force_feedback.py:249-290), sentinel-aware."""
    inner = make_scalar_analytic_classical(model, W, surface,
                                           tangent_unroll=tangent_unroll)
    alpha = float(np.clip(W.ff_alpha, 0.0, 0.999999))
    beta = 1.0 - alpha
    dropped = []
    if not W.use_inner_state_reg:
        dropped += ["posture", "v_damp"]
    if not W.use_inner_tau_reg:
        dropped += ["tau_reg", "tau_soft_limits"]

    def fn(ref, y, w, terminal: bool):
        dtype = y.dtype
        x_mb = y[:14]
        tau = y[14:21]
        xnext_mb, res, Jx_in, Ju_in, Fx_in, Fu_in = inner(ref, x_mb, tau,
                                                          terminal)
        for name in dropped:
            res.pop(name, None)
            Jx_in.pop(name, None)
            Ju_in.pop(name, None)
        tau_next = alpha * tau + beta * w
        ynext = jnp.concatenate([xnext_mb, tau_next])

        I7 = jnp.eye(7, dtype=dtype)
        Z7x14 = jnp.zeros((7, 14), dtype)
        Fy = jnp.concatenate([
            jnp.concatenate([Fx_in, Fu_in], axis=1),
            jnp.concatenate([Z7x14, alpha * I7], axis=1),
        ], axis=0)
        Fw = jnp.concatenate([jnp.zeros((14, 7), dtype), beta * I7], axis=0)

        Jy = {}
        for name in res:
            jx = Jx_in.get(name)
            ju = Ju_in.get(name)
            if jx is None and ju is None:
                continue
            if isinstance(jx, tuple):       # ("eye", off): x-block offsets
                Jy[name] = jx               # hold unchanged in y space
            elif isinstance(ju, tuple):     # inner control IS the tau state
                Jy[name] = ("eye", 14 + ju[1])
            else:
                nr = res[name].shape[0]
                jx_d = jx if jx is not None else jnp.zeros((nr, 14), dtype)
                ju_d = ju if ju is not None else jnp.zeros((nr, 7), dtype)
                Jy[name] = jnp.concatenate([jx_d, ju_d], axis=1)
        Jw = {}
        if W.w_y > 0.0:
            res["y_reg"] = y - ref.y_ref
            Jy["y_reg"] = ("eye", 0)
        if W.w_w > 0.0:
            res["w_reg"] = w
            Jw["w_reg"] = ("eye", 0)
        if W.w_w_soft_limits > 0.0:
            res["w_soft"] = w
            Jw["w_soft"] = ("eye", 0)
        return ynext, res, Jy, Jw, Fy, Fw

    return fn


def make_scalar_calc_classical(model: PandaModel, W: OCPWeights, surface: bool):
    """(calc, term_calc) for the classical knot in scalar-channel form."""
    from .action import _make_spec

    spec, nc = _make_spec(model, W, surface)
    mc = chain_consts(model)
    dt = float(W.dt_ocp)

    def calc(ref, x, u):
        xs = unstack(x, 14)
        us = unstack(u, 7)
        q_next, v_next, res = _classical_raw_s(
            model, mc, W, surface, nc, False, ref, xs, us)
        cost = _assemble_cost_s(spec, res, dt, False)
        return jnp.stack(q_next + v_next), cost

    def term_calc(ref, x):
        xs = unstack(x, 14)
        _, _, res = _classical_raw_s(
            model, mc, W, surface, nc, True, ref, xs, [0.0] * 7)
        return _assemble_cost_s(spec, res, 1.0, True)

    return calc, term_calc


def make_scalar_calc_augmented(model: PandaModel, W: OCPWeights, surface: bool):
    """(calc, term_calc) for the augmented LPF knot in scalar-channel form.

    Mirrors ocp.action.make_augmented_knot: y = (q, v, tau), control w,
    tau+ = alpha*tau + (1-alpha)*w, inner knot costs dt-scaled (terminal
    included — the FF-terminal subtlety), outer y/w costs discrete-level.
    """
    from .action import CostTerm, _make_spec

    spec, nc = _make_spec(model, W, surface)
    spec = dict(spec)
    dropped = []
    if not W.use_inner_state_reg:
        dropped += ["posture", "v_damp"]
    if not W.use_inner_tau_reg:
        dropped += ["tau_reg", "tau_soft_limits"]
    for name in dropped:
        spec.pop(name, None)

    mc = chain_consts(model)
    dt = float(W.dt_ocp)
    alpha = float(np.clip(W.ff_alpha, 0.0, 0.999999))
    beta = 1.0 - alpha

    w_lim = np.asarray(W.tau_limits)
    soft_lim = np.maximum(w_lim - max(W.tau_soft_limit_margin, 0.0), 1e-9)

    outer: Dict[str, CostTerm] = {}
    if W.w_y > 0.0:
        wy2 = [float(v) ** 2 for v in W.y_weights]
        outer["y_reg"] = CostTerm(W.w_y, act.wquad(wy2), False, True)
    if W.w_w > 0.0:
        outer["w_reg"] = CostTerm(W.w_w, act.quad(), False, True)
    if W.w_w_soft_limits > 0.0:
        outer["w_soft"] = CostTerm(
            W.w_w_soft_limits, act.barrier(-soft_lim, soft_lim), False, True)
    full_spec = {**spec, **outer}

    def raw(ref, y: list, w: list, terminal: bool):
        x = y[:14]
        tau = y[14:21]
        q_next, v_next, res = _classical_raw_s(
            model, mc, W, surface, nc, terminal, ref, x, tau)
        for name in dropped:
            res.pop(name, None)
        tau_next = [sadd(smul(alpha, tau[i]), smul(beta, w[i])) for i in range(7)]
        r = _ref_scalars(ref)
        if W.w_y > 0.0:
            res["y_reg"] = [ssub(y[i], r["y_ref"][i]) for i in range(21)]
        if W.w_w > 0.0:
            res["w_reg"] = w
        if W.w_w_soft_limits > 0.0:
            res["w_soft"] = w
        return q_next + v_next + tau_next, res

    def calc(ref, y, w):
        ys = unstack(y, 21)
        ws = unstack(w, 7)
        ynext, res = raw(ref, ys, ws, False)
        cost = _assemble_cost_s(full_spec, res, dt, False)
        return jnp.stack(ynext), cost

    def term_calc(ref, y):
        ys = unstack(y, 21)
        _, res = raw(ref, ys, [0.0] * 7, True)
        return _assemble_cost_s(full_spec, res, dt, True)

    return calc, term_calc
