"""Channel-native knot GN derivatives — the fused-diff-kernel body.

The third (and last) solver stage to get the kernel treatment after
backward (solver/backward_pallas.py) and rollout (solver/rollout_pallas.py):
the per-knot derivative pass — primal dynamics chain, analytic
implicit-function contact derivatives, residual Jacobians and Gauss-Newton
assembly — expressed entirely in scalar-channel algebra (lists of
channels, ``core.scalarops``), so the SAME code runs

  - under XLA with ()-shaped channels (vmapped: the equality-test path),
  - verbatim inside a Pallas TPU kernel with (Bt,)-lane channels
    (solver/diff_pallas.py).

Math mirrors ``ocp.scalar_knot.make_scalar_analytic_classical`` /
``_augmented`` + ``ocp.action._assemble_gn`` (reference semantics:
Crocoddyl calcDiff over the DAM stacks, crocoddyl_classical.py:558-728,
augmented block assembly crocoddyl_force_feedback.py:249-290), with two
kernel-motivated reformulations:

  1. tangent sweeps run as ONE vmap-of-jvp over the 7 one-hot q (and 7 v)
     directions — a single tangent chain with a leading direction axis
     (lands on TPU sublanes inside the kernel) instead of 7 unrolled
     sweeps or a jacfwd;
  2. the GN assembly shares Jacobian groups: residuals riding the same
     rows (w_damp/ee_vxy/vz_damp on the frame 6-velocity Jacobian,
     ee_xy/plane_z on the position rows, unilateral/fn_track on df) are
     folded into one J^T diag(h_eff) J accumulation with summed weighted
     activation Hessians, and only live (nonzero) columns are touched.

Everything is exact — same analytic derivatives, no approximation; the
equality tests pin channel == vector-analytic to float tolerance.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ..core.panda import PandaModel
from ..core.scalar_chain import (ChainConsts, chain_consts, chain_rnea,
                                 chain_bias_gamma, fk_chain,
                                 mass_matrix_chain)
from ..core.scalarops import (chol, chol_solve, sadd, sdot, smul, sneg,
                              ssub, is_const)
from . import activations as act
from .scalar_knot import _act_value, _log3_s, _BIG
from .action import _make_spec, _build_q_soft_barrier, _friction_cone_A
from .weights import OCPWeights


def _act_grad_hess_ch(a: act.Activation, r: List):
    """Channel activation gradient + diagonal Hessian (GN convention:
    residual second derivatives dropped, as Crocoddyl does)."""
    if a.kind == "quad":
        return list(r), [1.0] * len(r)
    if a.kind == "wquad":
        return ([smul(w, x) for w, x in zip(a.weights, r)],
                [float(w) for w in a.weights])
    g, h = [], []
    for x, lb, ub in zip(r, a.lb, a.ub):
        hi = jnp.maximum(ssub(x, ub), 0.0) if ub < _BIG else 0.0
        lo = jnp.minimum(ssub(x, lb), 0.0) if lb > -_BIG else 0.0
        o = sadd(hi, lo)
        g.append(o)
        if is_const(o):
            h.append(0.0)
        else:
            h.append((jnp.abs(o) > 0.0).astype(o.dtype))
    return g, h


class _GN:
    """Accumulator for Lx/Lu/Lxx/Lxu/Luu in channel form."""

    def __init__(self, nx: int, nu: int):
        self.nx, self.nu = nx, nu
        self.Lx = [0.0] * nx
        self.Lu = [0.0] * nu
        self.Lxx = [[0.0] * nx for _ in range(nx)]
        self.Lxu = [[0.0] * nu for _ in range(nx)]
        self.Luu = [[0.0] * nu for _ in range(nu)]
        self.cost = 0.0

    def add_eye_x(self, off: int, g: List, h: List, s: float):
        for i, (gi, hi) in enumerate(zip(g, h)):
            self.Lx[off + i] = sadd(self.Lx[off + i], smul(s, gi))
            self.Lxx[off + i][off + i] = sadd(self.Lxx[off + i][off + i],
                                              smul(s, hi))

    def add_eye_u(self, off: int, g: List, h: List, s: float):
        for i, (gi, hi) in enumerate(zip(g, h)):
            self.Lu[off + i] = sadd(self.Lu[off + i], smul(s, gi))
            self.Luu[off + i][off + i] = sadd(self.Luu[off + i][off + i],
                                              smul(s, hi))

    def add_group(self, cols_x: List[int], Jx: List[List],
                  g_eff: List, h_eff: List,
                  cols_u: List[int] = None, Ju: List[List] = None):
        """Shared-Jacobian accumulation: rows r with x-Jacobian Jx[r] over
        the live columns cols_x (and optionally u-Jacobian Ju[r] over
        cols_u).  g_eff/h_eff are the weight-and-dt-folded activation
        gradient / Hessian sums across all terms sharing these rows."""
        nr = len(g_eff)
        # Lx += J^T g ; Lu += Ju^T g
        for ci, c in enumerate(cols_x):
            self.Lx[c] = sadd(self.Lx[c],
                              *[smul(Jx[r][ci], g_eff[r]) for r in range(nr)])
        if cols_u:
            for ci, c in enumerate(cols_u):
                self.Lu[c] = sadd(self.Lu[c], *[smul(Ju[r][ci], g_eff[r])
                                                for r in range(nr)])
        # hJ[r][ci] = h_eff[r] * J[r][ci]
        hJx = [[smul(h_eff[r], Jx[r][ci]) for ci in range(len(cols_x))]
               for r in range(nr)]
        for a_i, ca in enumerate(cols_x):
            for b_i in range(a_i, len(cols_x)):
                cb = cols_x[b_i]
                v = sadd(self.Lxx[ca][cb],
                         *[smul(hJx[r][a_i], Jx[r][b_i]) for r in range(nr)])
                self.Lxx[ca][cb] = v
                if cb != ca:
                    self.Lxx[cb][ca] = v
        if cols_u:
            hJu = [[smul(h_eff[r], Ju[r][ci]) for ci in range(len(cols_u))]
                   for r in range(nr)]
            for a_i, ca in enumerate(cols_u):
                for b_i in range(a_i, len(cols_u)):
                    cb = cols_u[b_i]
                    v = sadd(self.Luu[ca][cb],
                             *[smul(hJu[r][a_i], Ju[r][b_i])
                               for r in range(nr)])
                    self.Luu[ca][cb] = v
                    if cb != ca:
                        self.Luu[cb][ca] = v
            for a_i, ca in enumerate(cols_x):
                for b_i, cb in enumerate(cols_u):
                    self.Lxu[ca][cb] = sadd(
                        self.Lxu[ca][cb],
                        *[smul(hJx[r][a_i], Ju[r][b_i]) for r in range(nr)])


def _seed_stack(zero, n: int):
    """(n, n) one-hot tangent seeds with a leading direction axis, built
    only from traced-derived values (Pallas kernels cannot materialize
    array constants)."""
    one = zero + 1.0
    return jnp.stack([jnp.stack([one if j == i else zero for j in range(n)])
                      for i in range(n)])


def make_channel_diff(model: PandaModel, W: OCPWeights, surface: bool,
                      family: str = "classical"):
    """Build the channel diff fn for one knot family.

    Returns ``fn(ref_ch, x, u) -> out`` where ``ref_ch`` is a dict of
    channel lists (p_ref[3], v_ref[3], x_reg_ref[14], tau_ref[7],
    R_des[3][3], y_ref[21]), ``x``/``u`` are channel lists (nx / 7), and
    ``out`` is a dict with channel entries: xnext (nx), cost (1),
    Fx (nx x nx), Fu (nx x 7), Lx (nx), Lu (7), Lxx, Lxu, Luu.  Entries
    may be Python floats (exact constants).  Running knots only (the
    terminal diff stays on the XLA path — one call per solve).
    """
    assert family in ("classical", "augmented")
    aug = family == "augmented"
    spec, nc = _make_spec(model, W, surface)
    mc = chain_consts(model)
    dt = float(W.dt_ocp)
    kp, kd = float(W.contact_gains[0]), float(W.contact_gains[1])
    damping_c = float(W.contact_inv_damping)

    dropped = []
    if aug:
        if not W.use_inner_state_reg:
            dropped += ["posture", "v_damp"]
        if not W.use_inner_tau_reg:
            dropped += ["tau_reg", "tau_soft_limits"]

    q_soft = None
    if W.w_q_soft_limits > 0.0:
        x_ref_np, _, _ = _build_q_soft_barrier(model, W.q_soft_limit_margin)
        q_soft = [float(v) for v in x_ref_np]

    alpha = float(np.clip(W.ff_alpha, 0.0, 0.999999)) if aug else 0.0
    beta = 1.0 - alpha

    def fn(ref_ch: Dict, x: List, u: List):
        if aug:
            q, v, tau = x[:7], x[7:14], x[14:21]
            u_inner = tau
        else:
            q, v = x[:7], x[7:14]
            u_inner = u
        Rdes_T = [[ref_ch["R_des"][j][i] for j in range(3)] for i in range(3)]
        p_ref = ref_ch["p_ref"]
        zero = q[0] * 0.0

        # ---- primal chain (shared with every sweep) --------------------
        f = fk_chain(mc, q)
        bias, gamma = chain_bias_gamma(mc, f, q, v, want_gamma=surface)
        M = mass_matrix_chain(mc, f)
        L, inv = chol(M, 7)
        Minv_tau = chol_solve(L, inv, [ssub(u_inner[i], bias[i])
                                       for i in range(7)])
        if surface and nc == 1:
            z_target = ssub(p_ref[2], float(W.z_press))
            Jc = [f.jp[j][2] for j in range(7)]
            gap = ssub(f.ee_p[2], z_target)
            Minv_Jt = chol_solve(L, inv, Jc)
            a_des = sadd(sneg(gamma[2]), smul(-kp, gap),
                         smul(-kd, sdot(Jc, v)))
            S_val = sadd(sdot(Jc, Minv_Jt), damping_c)
            S_inv = 1.0 / S_val
            force = smul(ssub(a_des, sdot(Jc, Minv_tau)), S_inv)
            acc = [sadd(Minv_tau[i], smul(force, Minv_Jt[i]))
                   for i in range(7)]
        elif surface:
            # ContactModel3D (point contact): 3x3 damped Schur complement
            # in channel algebra (crocoddyl_classical.py:944-997); the
            # contact anchor is p_ref with its z shifted by z_press
            # (action._contact_ref_pos)
            z_target = ssub(p_ref[2], float(W.z_press))
            ref_c = [p_ref[0], p_ref[1], z_target]
            Jc3 = [[f.jp[j][ax] for j in range(7)] for ax in range(3)]
            gap3 = [ssub(f.ee_p[ax], ref_c[ax]) for ax in range(3)]
            Minv_Jt3 = [chol_solve(L, inv, Jc3[ax]) for ax in range(3)]
            S3 = [[sadd(sdot(Jc3[a], Minv_Jt3[b]),
                        damping_c if a == b else 0.0) for b in range(3)]
                  for a in range(3)]
            LS, invS = chol(S3, 3)
            a_des3 = [sadd(sneg(gamma[ax]), smul(-kp, gap3[ax]),
                           smul(-kd, sdot(Jc3[ax], v))) for ax in range(3)]
            force3 = chol_solve(
                LS, invS, [ssub(a_des3[ax], sdot(Jc3[ax], Minv_tau))
                           for ax in range(3)])
            acc = [sadd(Minv_tau[i],
                        *[smul(force3[ax], Minv_Jt3[ax][i])
                          for ax in range(3)]) for i in range(7)]
            force = None
        else:
            force = None
            acc = Minv_tau

        # ---- kinematic residual pieces (primal) ------------------------
        lin = [sadd(*[smul(v[j], f.jp[j][ax]) for j in range(7)])
               for ax in range(3)]
        ang = [sadd(*[smul(v[j], f.axis[j][ax]) for j in range(7)])
               for ax in range(3)]
        vel6 = lin + ang
        ori = _log3_s([[sdot(Rdes_T[i], [f.ee_R[0][j], f.ee_R[1][j],
                                         f.ee_R[2][j]])
                        for j in range(3)] for i in range(3)])

        # ---- tangent sweeps: vmap-of-jvp over one-hot directions -------
        # q-sweep carries: RNEA rows at fixed (v, acc, force), contact row
        # h2, and the cost kinematics (ori, vel6) — exactly the sweep
        # algebra of scalar_chain.contact_dynamics_derivs_chain.
        def kin_of(qq, f2):
            lin2 = [sadd(*[smul(v[j], f2.jp[j][ax]) for j in range(7)])
                    for ax in range(3)]
            ang2 = [sadd(*[smul(v[j], f2.axis[j][ax]) for j in range(7)])
                    for ax in range(3)]
            ori2 = _log3_s([[sdot(Rdes_T[i], [f2.ee_R[0][j], f2.ee_R[1][j],
                                              f2.ee_R[2][j]])
                             for j in range(3)] for i in range(3)])
            return ori2, lin2 + ang2

        if surface and nc == 1:
            def g_q(qq):
                f2 = fk_chain(mc, qq)
                tau_r, ee_acc = chain_rnea(mc, f2, qq, v, acc,
                                           want_ee_acc=True)
                Jc2 = [f2.jp[j][2] for j in range(7)]
                g1 = [ssub(tau_r[i], smul(Jc2[i], force)) for i in range(7)]
                gap2 = ssub(f2.ee_p[2], z_target)
                h2 = sadd(ee_acc[2], smul(kp, gap2), smul(kd, sdot(Jc2, v)))
                ori2, vel62 = kin_of(qq, f2)
                return g1, [h2], ori2, vel62

            def g_v(vv):
                tau_r, ee_acc = chain_rnea(mc, f, q, vv, acc,
                                           want_ee_acc=True)
                h2 = sadd(ee_acc[2], smul(kd, sdot(Jc, vv)))
                return tau_r, [h2]
        elif surface:
            def g_q(qq):
                f2 = fk_chain(mc, qq)
                tau_r, ee_acc = chain_rnea(mc, f2, qq, v, acc,
                                           want_ee_acc=True)
                Jc2 = [[f2.jp[j][ax] for j in range(7)] for ax in range(3)]
                g1 = [sadd(tau_r[i],
                           *[sneg(smul(Jc2[ax][i], force3[ax]))
                             for ax in range(3)]) for i in range(7)]
                h2 = [sadd(ee_acc[ax],
                           smul(kp, ssub(f2.ee_p[ax], ref_c[ax])),
                           smul(kd, sdot(Jc2[ax], v))) for ax in range(3)]
                ori2, vel62 = kin_of(qq, f2)
                return g1, h2, ori2, vel62

            def g_v(vv):
                tau_r, ee_acc = chain_rnea(mc, f, q, vv, acc,
                                           want_ee_acc=True)
                h2 = [sadd(ee_acc[ax], smul(kd, sdot(Jc3[ax], vv)))
                      for ax in range(3)]
                return tau_r, h2
        else:
            def g_q(qq):
                f2 = fk_chain(mc, qq)
                tau_r, _ = chain_rnea(mc, f2, qq, v, acc)
                ori2, vel62 = kin_of(qq, f2)
                return tau_r, [], ori2, vel62

            def g_v(vv):
                tau_r, _ = chain_rnea(mc, f, q, vv, acc)
                return tau_r, []

        seeds = _seed_stack(zero, 7)

        def tan_q(seed):
            return jax.jvp(g_q, (q,), ([seed[j] for j in range(7)],))[1]

        def tan_v(seed):
            return jax.jvp(g_v, (v,), ([seed[j] for j in range(7)],))[1]

        tq = jax.vmap(tan_q)(seeds)   # leaves: (7 directions,) + ch shape
        tv = jax.vmap(tan_v)(seeds)
        G1q = [[tq[0][i][d] for d in range(7)] for i in range(7)]
        G1v = [[tv[0][i][d] for d in range(7)] for i in range(7)]
        G1 = [G1q[i] + G1v[i] for i in range(7)]          # (7, 14)
        dori_dq = [[tq[2][i][d] for d in range(7)] for i in range(3)]
        dvel6_dq = [[tq[3][i][d] for d in range(7)] for i in range(6)]

        # ---- implicit-function derivative solves ------------------------
        Minv_G1 = [chol_solve(L, inv, [G1[i][c] for i in range(7)])
                   for c in range(14)]          # cols: Minv_G1[c][i]
        eye7 = [[1.0 if i == j else 0.0 for j in range(7)] for i in range(7)]
        Minv_cols = [chol_solve(L, inv, eye7[j]) for j in range(7)]
        if surface and nc == 1:
            H2q = [tq[1][0][d] for d in range(7)]
            H2v = [tv[1][0][d] for d in range(7)]
            H2 = H2q + H2v                                   # (14,)
            # df_dx = (Jc Minv G1 - H2) / S
            df_dx = [smul(ssub(sdot(Jc, Minv_G1[c]), H2[c]), S_inv)
                     for c in range(14)]
            df_du = [smul(sneg(Minv_Jt[j]), S_inv) for j in range(7)]
            # da_dx = Minv (-G1 + Jc^T df_dx)
            da_dx = [[sadd(sneg(Minv_G1[c][i]), smul(df_dx[c], Minv_Jt[i]))
                      for c in range(14)] for i in range(7)]
            da_du = [[sadd(Minv_cols[j][i], smul(df_du[j], Minv_Jt[i]))
                      for j in range(7)] for i in range(7)]
        elif surface:
            # rows H2 (3, 14); per-column 3x3 Schur solves
            H2_3 = [[tq[1][ax][d] for d in range(7)]
                    + [tv[1][ax][d] for d in range(7)] for ax in range(3)]
            dfx_cols = [chol_solve(
                LS, invS, [ssub(sdot(Jc3[ax], Minv_G1[c]), H2_3[ax][c])
                           for ax in range(3)]) for c in range(14)]
            df_dx3 = [[dfx_cols[c][ax] for c in range(14)]
                      for ax in range(3)]                    # (3, 14)
            dfu_cols = [chol_solve(LS, invS,
                                   [Minv_Jt3[ax][j] for ax in range(3)])
                        for j in range(7)]
            df_du3 = [[sneg(dfu_cols[j][ax]) for j in range(7)]
                      for ax in range(3)]                    # (3, 7)
            da_dx = [[sadd(sneg(Minv_G1[c][i]),
                           *[smul(df_dx3[ax][c], Minv_Jt3[ax][i])
                             for ax in range(3)])
                      for c in range(14)] for i in range(7)]
            da_du = [[sadd(Minv_cols[j][i],
                           *[smul(df_du3[ax][j], Minv_Jt3[ax][i])
                             for ax in range(3)])
                      for j in range(7)] for i in range(7)]
            df_dx = df_du = None
        else:
            df_dx = df_du = None
            da_dx = [[sneg(Minv_G1[c][i]) for c in range(14)]
                     for i in range(7)]
            da_du = [[Minv_cols[j][i] for j in range(7)] for i in range(7)]

        # ---- discrete dynamics + Jacobian blocks ------------------------
        v_next = [sadd(v[i], smul(dt, acc[i])) for i in range(7)]
        q_next = [sadd(q[i], smul(dt, v_next[i])) for i in range(7)]
        dt2 = dt * dt
        Fx_in = [[0.0] * 14 for _ in range(14)]
        for i in range(7):
            for c in range(14):
                aq = smul(dt2, da_dx[i][c])
                Fx_in[i][c] = sadd(aq, 1.0 if i == c else 0.0,
                                   dt if c == i + 7 else 0.0)
                Fx_in[i + 7][c] = sadd(smul(dt, da_dx[i][c]),
                                       1.0 if i + 7 == c else 0.0)
        Fu_in = [[smul(dt2, da_du[i][j]) for j in range(7)]
                 for i in range(7)] + \
                [[smul(dt, da_du[i][j]) for j in range(7)] for i in range(7)]

        # ---- residual values -------------------------------------------
        res: Dict[str, List] = {}
        res["posture"] = [ssub(x[i], ref_ch["x_reg_ref"][i])
                          for i in range(14)]
        res["v_damp"] = list(x[:14])
        if q_soft is not None:
            res["q_soft_limits"] = [ssub(x[i], q_soft[i]) for i in range(14)]
        res["ee_ori"] = ori
        res["w_damp"] = vel6
        res["tau_reg"] = [ssub(u_inner[i], ref_ch["tau_ref"][i])
                          for i in range(7)]
        if W.w_tau_soft_limits > 0.0:
            res["tau_soft_limits"] = list(u_inner)
        if not surface:
            res["ee_pos"] = [ssub(f.ee_p[i], p_ref[i]) for i in range(3)]
        else:
            res["ee_xy"] = [ssub(f.ee_p[i], p_ref[i]) for i in range(3)]
            v_ref6 = [ref_ch["v_ref"][0], ref_ch["v_ref"][1],
                      0.0, 0.0, 0.0, 0.0]
            res["ee_vxy"] = [ssub(vel6[i], v_ref6[i]) for i in range(6)]
            if W.w_plane_z > 0.0:
                p_c = [p_ref[0], p_ref[1], z_target]
                res["plane_z"] = [ssub(f.ee_p[i], p_c[i]) for i in range(3)]
            if W.w_vz > 0.0:
                res["vz_damp"] = vel6
            if nc == 3 and W.w_friction_cone > 0.0:
                A_cone = _friction_cone_A(W.mu)
                res["friction_cone"] = [
                    sadd(*[smul(float(A_cone[r][c]), force3[c])
                           for c in range(3)]) for r in range(4)]
            if W.w_unilateral > 0.0:
                res["unilateral"] = ([force] if nc == 1 else list(force3))
            if W.w_fn > 0.0:
                if nc == 1:
                    res["fn_track"] = [ssub(force, float(W.fn_des))]
                else:
                    res["fn_track"] = [force3[0], force3[1],
                                       ssub(force3[2], float(W.fn_des))]
        for name in dropped:
            res.pop(name, None)

        # ---- GN assembly (shared Jacobian groups) -----------------------
        nx = 21 if aug else 14
        nu = 7
        gn = _GN(nx, nu)

        def s_of(name):
            term = spec[name]
            return term.weight * (dt if term.dt_scaled else 1.0)

        def fold(names):
            """Weight-folded g/h sums for terms sharing Jacobian rows."""
            present = [n for n in names if n in res and n in spec]
            if not present:
                return [], [], 0.0
            nr = len(res[present[0]])
            g_eff = [0.0] * nr
            h_eff = [0.0] * nr
            c = 0.0
            for name in names:
                if name not in res or name not in spec:
                    continue
                s = s_of(name)
                if s == 0.0:
                    continue
                g, h = _act_grad_hess_ch(spec[name].activation, res[name])
                for r in range(nr):
                    g_eff[r] = sadd(g_eff[r], smul(s, g[r]))
                    h_eff[r] = sadd(h_eff[r], smul(s, h[r]))
                c = sadd(c, smul(s, _act_value(spec[name].activation,
                                               res[name])))
            return g_eff, h_eff, c

        cost = 0.0

        def add_eye_terms(names, off, u_space=False):
            nonlocal cost
            for name in names:
                if name not in res or name not in spec:
                    continue
                s = s_of(name)
                if s == 0.0:
                    continue
                g, h = _act_grad_hess_ch(spec[name].activation, res[name])
                if u_space:
                    gn.add_eye_u(off, g, h, s)
                else:
                    gn.add_eye_x(off, g, h, s)
                cost = sadd(cost, smul(s, _act_value(spec[name].activation,
                                                     res[name])))

        # eye terms.  In the augmented family the inner control IS the tau
        # state -> tau_reg/tau_soft land at x offset 14; classical keeps
        # them in u space.
        add_eye_terms(["posture", "v_damp", "q_soft_limits"], 0)
        if aug:
            add_eye_terms(["tau_reg", "tau_soft_limits"], 14)
        else:
            add_eye_terms(["tau_reg", "tau_soft_limits"], 0, u_space=True)

        cols_q = list(range(7))
        cols_x14 = list(range(14))
        # orientation rows (q columns only)
        g_eff, h_eff, c = fold(["ee_ori"])
        gn.add_group(cols_q, dori_dq, g_eff, h_eff)
        cost = sadd(cost, c)
        # frame-velocity rows: w_damp (+ ee_vxy, vz_damp in contact).
        # d vel6 / dv: linear rows r<3 are the Jp columns f.jp[joint][r],
        # angular rows are the joint axes.
        vel_names = ["w_damp"] + (["ee_vxy", "vz_damp"] if surface else [])
        J_vel6 = [dvel6_dq[r] + ([f.jp[c][r] for c in range(7)] if r < 3
                                 else [f.axis[c][r - 3] for c in range(7)])
                  for r in range(6)]
        g_eff, h_eff, c = fold(vel_names)
        gn.add_group(cols_x14, J_vel6, g_eff, h_eff)
        cost = sadd(cost, c)
        # position rows (q columns): ee_pos (free) / ee_xy + plane_z
        pos_names = ["ee_pos"] if not surface else ["ee_xy", "plane_z"]
        J_pos = [[f.jp[c][r] for c in range(7)] for r in range(3)]
        g_eff, h_eff, c = fold(pos_names)
        gn.add_group(cols_q, J_pos, g_eff, h_eff)
        cost = sadd(cost, c)
        # force rows
        if surface and (W.w_unilateral > 0.0 or W.w_fn > 0.0):
            g_eff, h_eff, c = fold(["unilateral", "fn_track"])
            if nc == 1:
                Jf_x, Jf_u = [df_dx], [df_du]
            else:
                Jf_x, Jf_u = df_dx3, df_du3
            if aug:
                gn.add_group(list(range(21)),
                             [jx + ju for jx, ju in zip(Jf_x, Jf_u)],
                             g_eff, h_eff)
            else:
                gn.add_group(cols_x14, Jf_x, g_eff, h_eff,
                             cols_u=list(range(7)), Ju=Jf_u)
            cost = sadd(cost, c)
        if surface and nc == 3 and "friction_cone" in res:
            # cone rows A @ f: Jacobian = A @ df (A constant 4x3)
            g_eff, h_eff, c = fold(["friction_cone"])
            A_cone = _friction_cone_A(W.mu)

            def a_rows(J):       # (3, cols) -> (4, cols)
                return [[sadd(*[smul(float(A_cone[r][ax]), J[ax][col])
                                for ax in range(3)])
                         for col in range(len(J[0]))] for r in range(4)]
            if aug:
                gn.add_group(list(range(21)),
                             a_rows([jx + ju for jx, ju in
                                     zip(df_dx3, df_du3)]), g_eff, h_eff)
            else:
                gn.add_group(cols_x14, a_rows(df_dx3), g_eff, h_eff,
                             cols_u=list(range(7)), Ju=a_rows(df_du3))
            cost = sadd(cost, c)

        if not aug:
            return dict(xnext=q_next + v_next, cost=cost, Fx=Fx_in,
                        Fu=Fu_in, Lx=gn.Lx, Lu=gn.Lu, Lxx=gn.Lxx,
                        Lxu=gn.Lxu, Luu=gn.Luu)

        # ---- augmented lift --------------------------------------------
        # tau+ = alpha tau + beta w; Fy = [[Fx_in, Fu_in],[0, alpha I]];
        # Fw = [[0],[beta I]] (crocoddyl_force_feedback.py:249-290).
        tau_next = [sadd(smul(alpha, tau[i]), smul(beta, u[i]))
                    for i in range(7)]
        Fy = [[0.0] * 21 for _ in range(21)]
        for i in range(14):
            for c in range(14):
                Fy[i][c] = Fx_in[i][c]
            for j in range(7):
                Fy[i][14 + j] = Fu_in[i][j]
        for i in range(7):
            Fy[14 + i][14 + i] = alpha
        Fw = [[0.0] * 7 for _ in range(14)] + \
             [[beta if i == j else 0.0 for j in range(7)] for i in range(7)]

        # outer costs: y_reg (eye y), w_reg / w_soft (eye w) — NOT
        # dt-scaled (discrete-level costs of the augmented action model,
        # make_scalar_calc_augmented's outer spec: dt_scaled=False)
        if W.w_y > 0.0:
            wy2 = [float(vv) ** 2 for vv in W.y_weights]
            ry = [ssub(x[i], ref_ch["y_ref"][i]) for i in range(21)]
            a_y = act.wquad(wy2)
            g, h = _act_grad_hess_ch(a_y, ry)
            s = W.w_y
            gn.add_eye_x(0, g, h, s)
            cost = sadd(cost, smul(s, _act_value(a_y, ry)))
        if W.w_w > 0.0:
            a_w = act.quad()
            g, h = _act_grad_hess_ch(a_w, u)
            s = W.w_w
            gn.add_eye_u(0, g, h, s)
            cost = sadd(cost, smul(s, _act_value(a_w, u)))
        if W.w_w_soft_limits > 0.0:
            w_lim = np.asarray(W.tau_limits)
            soft = np.maximum(w_lim - max(W.tau_soft_limit_margin, 0.0),
                              1e-9)
            a_s = act.barrier(-soft, soft)
            g, h = _act_grad_hess_ch(a_s, u)
            s = W.w_w_soft_limits
            gn.add_eye_u(0, g, h, s)
            cost = sadd(cost, smul(s, _act_value(a_s, u)))

        return dict(xnext=q_next + v_next + tau_next, cost=cost, Fx=Fy,
                    Fu=Fw, Lx=gn.Lx, Lu=gn.Lu, Lxx=gn.Lxx, Lxu=gn.Lxu,
                    Luu=gn.Luu)

    return fn


def unstack_refs(ref) -> Dict:
    """ProblemRefs knot -> channel dict (for the XLA test path)."""
    return {
        "p_ref": [ref.p_ref[i] for i in range(3)],
        "v_ref": [ref.v_ref[i] for i in range(3)],
        "x_reg_ref": [ref.x_reg_ref[i] for i in range(14)],
        "tau_ref": [ref.tau_ref[i] for i in range(7)],
        "R_des": [[ref.R_des[i, j] for j in range(3)] for i in range(3)],
        "y_ref": [ref.y_ref[i] for i in range(21)],
    }


def diff_via_channels(model: PandaModel, W: OCPWeights, surface: bool,
                      family: str):
    """XLA wrapper: (ref, x, u) -> KnotDeriv, numerically equal to the
    analytic knot.diff — the equality-test surface for the kernel body."""
    from .action import KnotDeriv

    fn = make_channel_diff(model, W, surface, family)
    nx = 21 if family == "augmented" else 14

    def wrapped(ref, x, u):
        dtype = x.dtype
        out = fn(unstack_refs(ref), [x[i] for i in range(nx)],
                 [u[i] for i in range(7)])

        def cv(v):
            return jnp.full_like(x[0], v) if is_const(v) else v

        def pack_vec(vals):
            return jnp.stack([cv(v) for v in vals])

        def pack(rows):
            return jnp.stack([pack_vec(r) for r in rows])

        cost = out["cost"]
        if is_const(cost):
            cost = jnp.asarray(cost, dtype)
        return KnotDeriv(
            xnext=pack_vec(out["xnext"]), cost=cost,
            Fx=pack(out["Fx"]), Fu=pack(out["Fu"]),
            Lx=pack_vec(out["Lx"]), Lu=pack_vec(out["Lu"]),
            Lxx=pack(out["Lxx"]), Lxu=pack(out["Lxu"]),
            Luu=pack(out["Luu"]))

    return wrapped
