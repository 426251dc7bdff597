"""Discrete action models (knots) with Gauss-Newton derivatives.

Two knot families, the Crocoddyl-model-stack equivalents:

- classical knot: state x=(q,v) in R^14, control u=tau in R^7.  Semi-implicit
  Euler over free or contact forward dynamics with the reference's full cost
  stack (reference _make_dam + IntegratedActionModelEuler,
  crocoddyl_classical.py:558-728, 542).

- augmented LPF knot: state y=(q,v,tau) in R^21, control w in R^7, with
  tau+ = alpha*tau + (1-alpha)*w and outer y/w regularization costs
  (reference _AugmentedLPFActionModel, crocoddyl_force_feedback.py:149-290).
  Unlike the reference — which pays a per-knot-per-iteration Python callback
  from C++ — the LPF rows are fused into the same traced function.

Derivatives: dynamics Jacobians (Fx, Fu) and residual Jacobians come from one
forward-mode ``jax.jacfwd`` over a function returning (xnext, residual dict);
cost Hessians are assembled Gauss-Newton style exactly as Crocoddyl does
(activation grad / diagonal Hessian; residual second derivatives dropped).
Cost scaling mirrors IntegratedActionModelEuler: running knot cost is
dt * sum(costs); terminal cost is unscaled; the augmented outer costs are
discrete-level (never dt-scaled), as in the reference.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.panda import PandaModel
from ..core.dynamics import (fwd_dynamics_free, fwd_dynamics_contact,
                             free_dynamics_derivs, contact_dynamics_derivs,
                             mass_matrix, bias_forces)
from ..core.kinematics import fk, ee_jacobian
from ..core.spatial import log3
from . import activations as act
from .weights import OCPWeights, ProblemRefs


class CostTerm(NamedTuple):
    weight: float
    activation: act.Activation
    dt_scaled: bool         # True: running-knot cost is scaled by dt_ocp
    terminal: bool          # participates in the terminal knot


class KnotDeriv(NamedTuple):
    xnext: jnp.ndarray
    cost: jnp.ndarray
    Fx: jnp.ndarray
    Fu: jnp.ndarray
    Lx: jnp.ndarray
    Lu: jnp.ndarray
    Lxx: jnp.ndarray
    Lxu: jnp.ndarray
    Luu: jnp.ndarray


class KnotModel(NamedTuple):
    """Static bundle of knot callables consumed by the solver.

    calc:      (ref_k, x, u) -> (xnext, cost)
    diff:      (ref_k, x, u) -> KnotDeriv
    term_calc: (ref_T, x) -> cost
    term_diff: (ref_T, x) -> (cost, Lx, Lxx)
    diff_all:  optional (refs_run, xs_run, us) -> KnotDeriv (leading N) —
               the fused Pallas derivative pass (solver/diff_pallas.py),
               engaged by FDDPSettings.diff_mode="pallas"
    diff_packed: optional packed-layout fused diff pass
               (solver/diff_pallas.py::make_diff_packed), consumed by the
               packed-carry batched solve (solver/packed.py)
    """
    calc: Callable
    diff: Callable
    term_calc: Callable
    term_diff: Callable
    nx: int
    nu: int
    u_lb: Tuple[float, ...]
    u_ub: Tuple[float, ...]
    diff_all: Optional[Callable] = None
    diff_packed: Optional[Callable] = None


# ---------------------------------------------------------------------------
# residual stacks
# ---------------------------------------------------------------------------

def _friction_cone_A(mu: float):
    """Linearized 4-facet outer friction cone rows: A f >= 0 feasible.

    Equivalent of crocoddyl.FrictionCone(R=I, mu, nf=4, inner=False)
    (crocoddyl_classical.py:999-1018).  Benchmark configs set the cone weight
    to zero (run_classical.py:292); kept for parity/completeness.
    """
    return np.array(
        [
            [-1.0, 0.0, mu],
            [1.0, 0.0, mu],
            [0.0, -1.0, mu],
            [0.0, 1.0, mu],
        ]
    )


def _build_q_soft_barrier(model: PandaModel, margin: float):
    """Barrier bounds for the joint-limit soft cost.

    Mirrors _make_q_soft_limit_cost (crocoddyl_classical.py:487-519): the
    residual is x - x_ref with x_ref = (q_mid, 0); bounds shrink by margin.
    All Panda limits are finite, so the general inf-handling reduces to this.
    """
    q_lb = np.asarray(model.q_lower)
    q_ub = np.asarray(model.q_upper)
    q_ref = 0.5 * (q_lb + q_ub)
    lb_q = (q_lb + margin) - q_ref
    ub_q = (q_ub - margin) - q_ref
    bad = lb_q > ub_q
    lb_q[bad] = -1.0e-3
    ub_q[bad] = 1.0e-3
    lb = np.concatenate([lb_q, np.full(7, -np.inf)])
    ub = np.concatenate([ub_q, np.full(7, np.inf)])
    x_ref = np.concatenate([q_ref, np.zeros(7)])
    return x_ref, lb, ub


def _make_spec(model: PandaModel, W: OCPWeights, surface: bool):
    """Static cost-term spec: name -> CostTerm. Order fixes residual layout."""
    nc = 3 if (surface and W.contact_model == "point3d") else 1
    spec: Dict[str, CostTerm] = {}

    spec["posture"] = CostTerm(W.w_posture, act.quad(), True, True)
    spec["v_damp"] = CostTerm(
        W.w_v, act.wquad([0.0] * 7 + list(W.v_damp_weights)), True, True)
    if W.w_q_soft_limits > 0.0:
        _, lb, ub = _build_q_soft_barrier(model, W.q_soft_limit_margin)
        spec["q_soft_limits"] = CostTerm(W.w_q_soft_limits, act.barrier(lb, ub), True, True)
    spec["ee_ori"] = CostTerm(W.w_ee_ori, act.wquad(W.ori_weights), True, True)
    spec["w_damp"] = CostTerm(
        W.w_wdamp, act.wquad([0.0, 0.0, 0.0] + list(W.w_wdamp_weights)), True, True)

    # running-only control costs
    spec["tau_reg"] = CostTerm(W.w_tau, act.quad(), True, False)
    if W.w_tau_soft_limits > 0.0:
        tau_lim = np.asarray(W.tau_limits)
        margin = min(max(W.tau_soft_limit_margin, 0.0), float(tau_lim.min()) - 1e-6)
        spec["tau_soft_limits"] = CostTerm(
            W.w_tau_soft_limits, act.barrier(-tau_lim + margin, tau_lim - margin), True, False)

    if not surface:
        spec["ee_pos"] = CostTerm(W.w_ee_pos, act.wquad(W.ee_pos_weights), True, True)
    else:
        spec["ee_xy"] = CostTerm(W.w_tangent_pos, act.wquad([1.0, 1.0, 0.0]), True, True)
        spec["ee_vxy"] = CostTerm(
            W.w_tangent_vel, act.wquad([1.0, 1.0, 0.0, 0.0, 0.0, 0.0]), True, True)
        if W.w_plane_z > 0.0:
            spec["plane_z"] = CostTerm(W.w_plane_z, act.wquad([0.0, 0.0, 1.0]), True, True)
        if W.w_vz > 0.0:
            spec["vz_damp"] = CostTerm(
                W.w_vz, act.wquad([0.0, 0.0, 1.0, 0.0, 0.0, 0.0]), True, True)
        if nc == 3 and W.w_friction_cone > 0.0:
            eps = max(W.friction_margin, 0.0)
            spec["friction_cone"] = CostTerm(
                W.w_friction_cone, act.barrier([eps] * 4, [np.inf] * 4), True, True)
        if W.w_unilateral > 0.0:
            if nc == 1:
                lb, ub = [W.friction_margin], [np.inf]
            else:
                lb = [-np.inf, -np.inf, W.friction_margin]
                ub = [np.inf, np.inf, np.inf]
            spec["unilateral"] = CostTerm(W.w_unilateral, act.barrier(lb, ub), True, True)
        if W.w_fn > 0.0:
            aw = [1.0] if nc == 1 else [0.0, 0.0, 1.0]
            spec["fn_track"] = CostTerm(W.w_fn, act.wquad(aw), True, True)

    return spec, nc


def _contact_ref_pos(W: OCPWeights, nc: int, ref):
    z_target = ref.p_ref[2] - W.z_press
    if nc == 1:
        return z_target
    return ref.p_ref.at[2].set(z_target)


def _residual_values(model: PandaModel, W: OCPWeights, surface: bool, nc: int,
                     terminal: bool, ref, x, u, fk_res, vel6, force):
    """Residual dict for one classical knot from precomputed kinematics."""
    res: Dict[str, jnp.ndarray] = {}
    res["posture"] = x - ref.x_reg_ref
    res["v_damp"] = x
    if W.w_q_soft_limits > 0.0:
        x_ref_np, _, _ = _build_q_soft_barrier(model, W.q_soft_limit_margin)
        res["q_soft_limits"] = x - jnp.asarray(x_ref_np, x.dtype)
    res["ee_ori"] = log3(jnp.swapaxes(ref.R_des, -1, -2) @ fk_res.ee_R)
    res["w_damp"] = vel6
    if not terminal:
        res["tau_reg"] = u - ref.tau_ref
        if W.w_tau_soft_limits > 0.0:
            res["tau_soft_limits"] = u
    if not surface:
        res["ee_pos"] = fk_res.ee_p - ref.p_ref
    else:
        res["ee_xy"] = fk_res.ee_p - ref.p_ref
        v_ref6 = jnp.concatenate(
            [ref.v_ref[:2], jnp.zeros(4, x.dtype)])
        res["ee_vxy"] = vel6 - v_ref6
        if W.w_plane_z > 0.0:
            p_contact = ref.p_ref.at[2].set(ref.p_ref[2] - W.z_press)
            res["plane_z"] = fk_res.ee_p - p_contact
        if W.w_vz > 0.0:
            res["vz_damp"] = vel6
        if nc == 3 and W.w_friction_cone > 0.0:
            A = jnp.asarray(_friction_cone_A(W.mu), x.dtype)
            res["friction_cone"] = A @ force
        if W.w_unilateral > 0.0:
            res["unilateral"] = force
        if W.w_fn > 0.0:
            fn_ref = jnp.asarray([W.fn_des] if nc == 1 else [0.0, 0.0, W.fn_des], x.dtype)
            res["fn_track"] = force - fn_ref

    return res


def _classical_raw(model: PandaModel, W: OCPWeights, surface: bool, nc: int,
                   terminal: bool, ref, x, u):
    """xnext + residual dict for one classical knot. x: (14,), u: (7,)."""
    dt = jnp.asarray(W.dt_ocp, x.dtype)
    q, v = x[:7], x[7:]

    if surface:
        dyn = fwd_dynamics_contact(
            model, q, v, u, ref_pos=_contact_ref_pos(W, nc, ref), nc1=(nc == 1),
            baumgarte_kp=W.contact_gains[0], baumgarte_kd=W.contact_gains[1],
            damping_c=W.contact_inv_damping)
        acc, force, fk_res = dyn.acc, dyn.force, dyn.fk_res
    else:
        fk_res = fk(model, q)
        acc = fwd_dynamics_free(model, q, v, u, fk_res=fk_res)
        force = None

    v_next = v + dt * acc
    q_next = q + dt * v_next
    xnext = jnp.concatenate([q_next, v_next])

    Jp, Jr = ee_jacobian(model, q, fk_res=fk_res)
    vel6 = jnp.concatenate([Jp @ v, Jr @ v])

    res = _residual_values(model, W, surface, nc, terminal, ref, x, u,
                           fk_res, vel6, force)
    return xnext, res


def _assemble_cost(spec, res, dt_scale: float, terminal: bool, dtype):
    """Sum weighted activations.  ``dt_scale`` multiplies dt_scaled terms
    (Crocoddyl IAM Euler: dt for running knots, 1 for the classical terminal
    overload, dt again for the FF terminal since the augmented model calls
    the inner running calc — crocoddyl_force_feedback.py:220)."""
    cost = jnp.zeros((), dtype)
    for name, term in spec.items():
        if terminal and not term.terminal:
            continue
        scale = dt_scale if term.dt_scaled else 1.0
        cost = cost + term.weight * scale * act.value(term.activation, res[name])
    return cost


def _assemble_gn(spec, res, Jx, Ju, dt_scale: float, terminal: bool, nx: int, nu: int, dtype):
    """Gauss-Newton assembly.  Jx/Ju: dicts of residual Jacobians; a missing
    or ``None`` entry means an exactly-zero Jacobian (zero block in the
    stacked Jacobian); the sentinel ``("eye", offset)`` means rows
    e_offset..e_{offset+nr-1} (pure-regularization residuals), assembled as
    slice updates instead of dense J^T diag(h) J products — the nx=21
    identity terms otherwise dominate the assembly FLOPs.

    Per-term rank-k accumulation (a stacked single-J^T diag(h) J variant
    measured SLOWER on TPU — 420 -> 379 solves/s — the tiny-matrix padding
    and lost elementwise fusion outweigh the MXU-shaped matmul)."""
    Lx = jnp.zeros(nx, dtype)
    Lxx = jnp.zeros((nx, nx), dtype)
    Lu = jnp.zeros(nu, dtype)
    Luu = jnp.zeros((nu, nu), dtype)
    Lxu = jnp.zeros((nx, nu), dtype)
    cost = jnp.zeros((), dtype)
    with_u = Ju is not None and not terminal

    def is_eye(j):
        return isinstance(j, tuple) and j[0] == "eye"

    diag_x = jnp.zeros(nx, dtype)
    diag_u = jnp.zeros(nu, dtype)
    for name, term in spec.items():
        if terminal and not term.terminal:
            continue
        r = res[name]
        s = term.weight * (dt_scale if term.dt_scaled else 1.0)
        g = act.grad(term.activation, r)
        h = act.hess_diag(term.activation, r)
        jx = Jx.get(name)
        ju = Ju.get(name) if with_u else None
        cost = cost + s * act.value(term.activation, r)
        if is_eye(jx):
            off = jx[1]
            nr = r.shape[0]
            Lx = Lx.at[off:off + nr].add(s * g)
            diag_x = diag_x.at[off:off + nr].add(s * h)
        elif jx is not None:
            Lx = Lx + s * (jx.T @ g)
            Lxx = Lxx + s * (jx.T @ (h[:, None] * jx))
        if is_eye(ju):
            # eye-u terms must be pure u-regs: an x-Jacobian here would
            # need an Lxu cross-term this branch does not assemble.
            if jx is not None:
                raise ValueError(
                    f"cost term '{name}': eye-u residual with an x-Jacobian "
                    "is unsupported (missing Lxu cross-term)")
            off = ju[1]
            nr = r.shape[0]
            Lu = Lu.at[off:off + nr].add(s * g)
            diag_u = diag_u.at[off:off + nr].add(s * h)
        elif ju is not None:
            Lu = Lu + s * (ju.T @ g)
            Luu = Luu + s * (ju.T @ (h[:, None] * ju))
            if jx is not None and not is_eye(jx):
                Lxu = Lxu + s * (jx.T @ (h[:, None] * ju))
            elif is_eye(jx):
                off = jx[1]
                Lxu = Lxu.at[off:off + r.shape[0], :].add(s * (h[:, None] * ju))
    Lxx = Lxx + jnp.diag(diag_x)
    Luu = Luu + jnp.diag(diag_u)
    return cost, Lx, Lu, Lxx, Lxu, Luu


def _classical_analytic(model: PandaModel, W: OCPWeights, surface: bool,
                        nc: int, terminal: bool, ref, x, u):
    """Knot forward + analytic derivatives: (xnext, res, Jx, Ju, Fx, Fu).

    Dynamics derivatives come from the KKT implicit-function theorem
    (core.dynamics.free_dynamics_derivs / contact_dynamics_derivs); residual
    Jacobians are assembled from the frame Jacobian (d ee_p/dq == J_pos
    exactly) plus one 7-tangent jacfwd through the FK-only chain for the
    orientation log-map and the dJ/dq·v velocity term.  Replaces the
    21-tangent jacfwd through the full dynamics chain (~60% of solver
    iteration time before this change)."""
    dtype = x.dtype
    dt = float(W.dt_ocp)
    q, v = x[:7], x[7:]

    def kin_of(qq, fk2):
        """Cost-residual kinematics (q-dependent parts): shared with the
        dynamics q-sweep so FK tangents are computed once."""
        Jp2, Jr2 = ee_jacobian(model, qq, fk_res=fk2)
        ori = log3(jnp.swapaxes(ref.R_des, -1, -2) @ fk2.ee_R)
        vel62 = jnp.concatenate([Jp2 @ v, Jr2 @ v])
        return ori, vel62

    if surface:
        dd = contact_dynamics_derivs(
            model, q, v, u, ref_pos=_contact_ref_pos(W, nc, ref), nc1=(nc == 1),
            baumgarte_kp=W.contact_gains[0], baumgarte_kd=W.contact_gains[1],
            damping_c=W.contact_inv_damping, extra_q_fn=kin_of)
        acc, force, fk_res = dd.acc, dd.force, dd.fk_res
        da_dx, da_du, df_dx, df_du = dd.da_dx, dd.da_du, dd.df_dx, dd.df_du
        dori_dq, dvel6_dq = dd.extras_jac
    else:
        fd = free_dynamics_derivs(model, q, v, u)
        acc, fk_res = fd.acc, fd.fk_res
        da_dx, da_du = fd.da_dx, fd.da_du
        force = df_dx = df_du = None
        dori_dq, dvel6_dq = jax.jacfwd(lambda qq: kin_of(qq, fk(model, qq)))(q)

    v_next = v + dt * acc
    q_next = q + dt * v_next
    xnext = jnp.concatenate([q_next, v_next])

    # semi-implicit Euler chain rule (v+ = v + dt*a; q+ = q + dt*v+)
    I7 = jnp.eye(7, dtype=dtype)
    Aq, Av = da_dx[:, :7], da_dx[:, 7:]
    Fx = jnp.concatenate([
        jnp.concatenate([I7 + (dt * dt) * Aq, dt * I7 + (dt * dt) * Av], axis=1),
        jnp.concatenate([dt * Aq, I7 + dt * Av], axis=1),
    ], axis=0)
    Fu = jnp.concatenate([(dt * dt) * da_du, dt * da_du], axis=0)

    Jp, Jr = ee_jacobian(model, q, fk_res=fk_res)
    vel6 = jnp.concatenate([Jp @ v, Jr @ v])

    res = _residual_values(model, W, surface, nc, terminal, ref, x, u,
                           fk_res, vel6, force)

    Z37 = jnp.zeros((3, 7), dtype)
    eye14 = jnp.eye(14, dtype=dtype)
    J_ori = jnp.concatenate([dori_dq, Z37], axis=1)          # (3, 14)
    J_vel6 = jnp.concatenate([dvel6_dq, jnp.concatenate([Jp, Jr], axis=0)], axis=1)
    J_pos14 = jnp.concatenate([Jp, Z37], axis=1)             # (3, 14)

    Jx: Dict[str, jnp.ndarray] = {
        "posture": eye14, "v_damp": eye14,
        "ee_ori": J_ori, "w_damp": J_vel6,
    }
    Ju: Dict[str, jnp.ndarray] = {}
    if W.w_q_soft_limits > 0.0:
        Jx["q_soft_limits"] = eye14
    if not terminal:
        Ju["tau_reg"] = I7
        if W.w_tau_soft_limits > 0.0:
            Ju["tau_soft_limits"] = I7
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


class _LazyDiffAll:
    """Deferred construction of the fused Pallas derivative pass: knot
    builds stay decoupled from the solver/pallas modules (and pay no
    channel-diff closure construction) unless a solve actually engages
    ``FDDPSettings.diff_mode="pallas"``."""

    def __init__(self, builder: Callable):
        self._builder = builder
        self._fn = None

    def __call__(self, *args):
        if self._fn is None:
            self._fn = self._builder()
        return self._fn(*args)


# central-difference step of the C++ oracle (native/ffmpc_oracle.cpp:626);
# shared by deriv_mode="oracle_fd" so the FD-twin reproduces the oracle's
# truncation error exactly, not just its formula.
ORACLE_FD_STEP = 1e-5


def _central_fd(f, z, h):
    """Stacked central differences of pytree-valued ``f`` along each
    coordinate of ``z``: returns the tree of Jacobians with the
    differentiation axis LAST (so (nr,)-valued leaves become (nr, nz)
    Jacobians, matching the analytic-path layout)."""
    n = z.shape[0]
    eye = jnp.eye(n, dtype=z.dtype)
    fp = jax.vmap(lambda e: f(z + h * e))(eye)
    fm = jax.vmap(lambda e: f(z - h * e))(eye)
    return jax.tree.map(
        lambda p, m: jnp.moveaxis((p - m) / (2.0 * h), 0, -1), fp, fm)


def make_classical_knot(model: PandaModel, W: OCPWeights, surface: bool,
                        deriv_mode: str = "analytic",
                        calc_mode: str = "scalar") -> KnotModel:
    """calc_mode "scalar" uses the lane-efficient scalar-channel calc
    (ocp.scalar_knot) for calc/term_calc — numerically equal to the
    vectorized path to float rounding, ~10x faster on TPU where the
    rollout's small-trailing-dim ops waste VPU lanes.  "vector" keeps the
    array formulation (reference implementation / oracle).

    deriv_mode: "scalar" = analytic implicit-function derivatives with
    scalar-channel tangent sweeps — measured 9.5 ms vs 27.3 ms for
    "analytic" at B=256xN=40 on TPU v5e; the TPU batch paths
    (run.batch_runner / bench) select it.  It stays OFF by default because
    XLA:CPU's compile time explodes on the scalar-swept graph (>40 min vs
    ~1 min through the TPU toolchain) and the CPU host-loop controllers /
    tests would pay it.  "analytic" (default) = vector-layout analytic;
    "jacfwd" = full-chain forward-mode oracle."""
    spec, nc = _make_spec(model, W, surface)
    nx, nu = 14, 7
    dt = float(W.dt_ocp)

    def raw_run(ref, x, u):
        return _classical_raw(model, W, surface, nc, False, ref, x, u)

    def raw_term(ref, x):
        u0 = jnp.zeros(nu, x.dtype)   # crocoddyl terminal calc uses u = unone
        return _classical_raw(model, W, surface, nc, True, ref, x, u0)

    def calc(ref, x, u):
        xnext, res = raw_run(ref, x, u)
        return xnext, _assemble_cost(spec, res, dt, False, x.dtype)

    if calc_mode == "scalar":
        from .scalar_knot import make_scalar_calc_classical
        calc, scalar_term_calc = make_scalar_calc_classical(model, W, surface)

    if deriv_mode in ("analytic", "scalar", "scalar_unroll"):
        if deriv_mode in ("scalar", "scalar_unroll"):
            # analytic derivative structure with every tangent sweep running
            # through the scalar-channel chain (lane-efficient on TPU).
            # "scalar_unroll" additionally unrolls the 7 one-hot tangent
            # sweeps so each is full-lane under the batch vmap instead of a
            # trailing 7-wide lane dim (core.scalar_chain._jacfwd7).
            from .scalar_knot import make_scalar_analytic_classical
            afn = make_scalar_analytic_classical(
                model, W, surface,
                tangent_unroll=(deriv_mode == "scalar_unroll"))
        else:
            def afn(ref, x, u, terminal):
                return _classical_analytic(model, W, surface, nc, terminal,
                                           ref, x, u)

        def diff(ref, x, u):
            xnext, res, Jx, Ju, Fx, Fu = afn(ref, x, u, False)
            cost, Lx, Lu, Lxx, Lxu, Luu = _assemble_gn(
                spec, res, Jx, Ju, dt, False, nx, nu, x.dtype)
            return KnotDeriv(xnext, cost, Fx, Fu, Lx, Lu, Lxx, Lxu, Luu)
    elif deriv_mode == "oracle_fd":
        # FD-twin of the C++ oracle (native/ffmpc_oracle.cpp:609-695):
        # central differences at the oracle's exact step over the
        # (xnext, residual-stack) map, GN assembly at the unperturbed
        # residuals.  Used by tools/parity_iterates.py --deriv fd to prove
        # the classical contact-phase divergences vs the oracle are
        # FD-truncation-noise ties, not solver-semantics gaps: with shared
        # derivative noise the two solvers should walk iterate-identical.
        def diff(ref, x, u):
            h = ORACLE_FD_STEP
            xnext, res = raw_run(ref, x, u)
            Fx, Jx = _central_fd(lambda xx: raw_run(ref, xx, u), x, h)
            Fu, Ju = _central_fd(lambda uu: raw_run(ref, x, uu), u, h)
            cost, Lx, Lu, Lxx, Lxu, Luu = _assemble_gn(
                spec, res, Jx, Ju, dt, False, nx, nu, x.dtype)
            return KnotDeriv(xnext, cost, Fx, Fu, Lx, Lu, Lxx, Lxu, Luu)
    else:
        def diff(ref, x, u):
            (xnext, res), (jac_x, jac_u) = _value_and_jac(raw_run, ref, x, u)
            Fx, Jx = jac_x
            Fu, Ju = jac_u
            cost, Lx, Lu, Lxx, Lxu, Luu = _assemble_gn(
                spec, res, Jx, Ju, dt, False, nx, nu, x.dtype)
            return KnotDeriv(xnext, cost, Fx, Fu, Lx, Lu, Lxx, Lxu, Luu)

    def term_calc(ref, x):
        # crocoddyl IAM Euler terminal overload: cost NOT scaled by dt.
        _, res = raw_term(ref, x)
        return _assemble_cost(spec, res, 1.0, True, x.dtype)

    if calc_mode == "scalar":
        term_calc = scalar_term_calc

    if deriv_mode in ("analytic", "scalar", "scalar_unroll"):
        def term_diff(ref, x):
            u0 = jnp.zeros(nu, x.dtype)
            _, res, Jx, _, _, _ = afn(ref, x, u0, True)
            cost, Lx, _, Lxx, _, _ = _assemble_gn(
                spec, res, Jx, None, 1.0, True, nx, nu, x.dtype)
            return cost, Lx, Lxx
    elif deriv_mode == "oracle_fd":
        def term_diff(ref, x):
            h = ORACLE_FD_STEP
            _, res = raw_term(ref, x)
            _, Jx = _central_fd(lambda xx: raw_term(ref, xx), x, h)
            cost, Lx, _, Lxx, _, _ = _assemble_gn(
                spec, res, Jx, None, 1.0, True, nx, nu, x.dtype)
            return cost, Lx, Lxx
    else:
        def term_diff(ref, x):
            def f(xx):
                _, res = raw_term(ref, xx)
                return res
            res = f(x)
            Jx = jax.jacfwd(f)(x)
            cost, Lx, _, Lxx, _, _ = _assemble_gn(
                spec, res, Jx, None, 1.0, True, nx, nu, x.dtype)
            return cost, Lx, Lxx

    lim = tuple(float(t) for t in W.tau_limits)
    diff_all = diff_packed = None
    if True:  # channel diff covers nc=1 and nc=3 (point3d) families
        def _build_diff_all(diff=diff):
            from ..solver.diff_pallas import make_diff_all
            return make_diff_all(model, W, surface, "classical", diff)

        def _build_diff_packed():
            from ..solver.diff_pallas import make_diff_packed
            return make_diff_packed(model, W, surface, "classical")
        diff_all = _LazyDiffAll(_build_diff_all)
        diff_packed = _LazyDiffAll(_build_diff_packed)
    return KnotModel(calc, diff, term_calc, term_diff, nx, nu,
                     tuple(-t for t in lim), lim, diff_all, diff_packed)


def _value_and_jac(raw, ref, x, u):
    """(value, (d/dx, d/du)) of raw(ref, x, u) via two separate jacfwd
    sweeps.

    Keeping x- and u-tangents separate matters for performance: with a pure
    u-sweep the u-independent subgraph (FK, mass matrix, bias) carries zero
    tangents and XLA dead-code-eliminates its entire derivative computation.
    A merged (x,u) sweep forces all nx+nu tangents through the full chain
    and measured ~2.7x slower end-to-end on TPU."""
    val = raw(ref, x, u)
    jac_x = jax.jacfwd(lambda xx: raw(ref, xx, u))(x)
    jac_u = jax.jacfwd(lambda uu: raw(ref, x, uu))(u)
    return val, (jac_x, jac_u)


# ---------------------------------------------------------------------------
# augmented LPF knot (force-feedback)
# ---------------------------------------------------------------------------

def make_augmented_knot(model: PandaModel, W: OCPWeights, surface: bool,
                        deriv_mode: str = "analytic",
                        calc_mode: str = "scalar") -> KnotModel:
    """Augmented action model on y=(q,v,tau), control w.

    y+ = [EulerKnot(x, tau); alpha*tau + (1-alpha)*w]; costs = inner knot cost
    (dt-scaled) + discrete-level y-reg, w-reg, w-soft-limit terms
    (reference _AugmentedLPFActionModel.calc/calcDiff,
    crocoddyl_force_feedback.py:211-290).
    """
    spec, nc = _make_spec(model, W, surface)
    # drop inner regs if disabled (reference use_inner_state_reg/use_inner_tau_reg)
    spec = dict(spec)
    _dropped = []
    if not W.use_inner_state_reg:
        _dropped += ["posture", "v_damp"]
    if not W.use_inner_tau_reg:
        _dropped += ["tau_reg", "tau_soft_limits"]
    for _name in _dropped:
        spec.pop(_name, None)

    nx, nu, nx_mb = 21, 7, 14
    dt = float(W.dt_ocp)
    alpha = float(np.clip(W.ff_alpha, 0.0, 0.999999))
    beta = 1.0 - alpha

    w_lim = np.asarray(W.tau_limits)
    soft_lim = np.maximum(w_lim - max(W.tau_soft_limit_margin, 0.0), 1e-9)

    outer_spec: Dict[str, CostTerm] = {}
    if W.w_y > 0.0:
        wy2 = [float(v) ** 2 for v in W.y_weights]
        outer_spec["y_reg"] = CostTerm(W.w_y, act.wquad(wy2), False, True)
    if W.w_w > 0.0:
        outer_spec["w_reg"] = CostTerm(W.w_w, act.quad(), False, True)
    if W.w_w_soft_limits > 0.0:
        outer_spec["w_soft"] = CostTerm(
            W.w_w_soft_limits, act.barrier(-soft_lim, soft_lim), False, True)

    def raw(ref, y, w, terminal: bool):
        x_mb = y[:nx_mb]
        tau = y[nx_mb:]
        xnext_mb, res = _classical_raw(model, W, surface, nc, terminal, ref, x_mb, tau)
        if not W.use_inner_state_reg:
            res.pop("posture", None)
            res.pop("v_damp", None)
        if not W.use_inner_tau_reg:
            res.pop("tau_reg", None)
            res.pop("tau_soft_limits", None)
        tau_next = alpha * tau + beta * w
        ynext = jnp.concatenate([xnext_mb, tau_next])
        if W.w_y > 0.0:
            res["y_reg"] = y - ref.y_ref
        if W.w_w > 0.0:
            res["w_reg"] = w
        if W.w_w_soft_limits > 0.0:
            res["w_soft"] = w
        return ynext, res

    full_spec = {**spec, **outer_spec}

    def calc(ref, y, w):
        ynext, res = raw(ref, y, w, False)
        return ynext, _assemble_cost(full_spec, res, dt, False, y.dtype)

    if calc_mode == "scalar":
        from .scalar_knot import make_scalar_calc_augmented
        calc, scalar_term_calc = make_scalar_calc_augmented(model, W, surface)

    def _aug_analytic(ref, y, w, terminal: bool):
        """Inner classical analytic pieces lifted to y=(x_mb, tau), u=w.

        Block assembly mirrors the reference's hand-built Jacobians
        (crocoddyl_force_feedback.py:249-290):
        Fy = [[Fx_in, Fu_in], [0, alpha I]], Fw = [[0], [(1-alpha) I]];
        inner residual Jacobians gain a tau column-block (the inner control
        is the tau state), w appears only in the outer costs."""
        dtype = y.dtype
        x_mb = y[:nx_mb]
        tau = y[nx_mb:]
        xnext_mb, res, Jx_in, Ju_in, Fx_in, Fu_in = _classical_analytic(
            model, W, surface, nc, terminal, ref, x_mb, tau)
        for name in _dropped:
            res.pop(name, None)
            Jx_in.pop(name, None)
            Ju_in.pop(name, None)
        tau_next = alpha * tau + beta * w
        ynext = jnp.concatenate([xnext_mb, tau_next])

        I7 = jnp.eye(nu, dtype=dtype)
        Z7x14 = jnp.zeros((nu, nx_mb), dtype)
        Fy = jnp.concatenate([
            jnp.concatenate([Fx_in, Fu_in], axis=1),
            jnp.concatenate([Z7x14, alpha * I7], axis=1),
        ], axis=0)
        Fw = jnp.concatenate([jnp.zeros((nx_mb, nu), dtype), beta * I7], axis=0)

        Jy: Dict[str, jnp.ndarray] = {}
        for name in res:
            jx = Jx_in.get(name)
            ju = Ju_in.get(name)
            if jx is None and ju is None:
                continue
            nr = res[name].shape[0]
            jx = jx if jx is not None else jnp.zeros((nr, nx_mb), dtype)
            ju = ju if ju is not None else jnp.zeros((nr, nu), dtype)
            Jy[name] = jnp.concatenate([jx, ju], axis=1)
        Jw: Dict[str, jnp.ndarray] = {}
        if W.w_y > 0.0:
            res["y_reg"] = y - ref.y_ref
            Jy["y_reg"] = jnp.eye(nx, dtype=dtype)
        if W.w_w > 0.0:
            res["w_reg"] = w
            Jw["w_reg"] = I7
        if W.w_w_soft_limits > 0.0:
            res["w_soft"] = w
            Jw["w_soft"] = I7
        return ynext, res, Jy, Jw, Fy, Fw

    if deriv_mode in ("analytic", "scalar", "scalar_unroll"):
        if deriv_mode in ("scalar", "scalar_unroll"):
            from .scalar_knot import make_scalar_analytic_augmented
            aug_fn = make_scalar_analytic_augmented(
                model, W, surface,
                tangent_unroll=(deriv_mode == "scalar_unroll"))
        else:
            aug_fn = _aug_analytic

        def diff(ref, y, w):
            ynext, res, Jy, Jw, Fy, Fw = aug_fn(ref, y, w, False)
            cost, Lx, Lu, Lxx, Lxu, Luu = _assemble_gn(
                full_spec, res, Jy, Jw, dt, False, nx, nu, y.dtype)
            return KnotDeriv(ynext, cost, Fy, Fw, Lx, Lu, Lxx, Lxu, Luu)
    elif deriv_mode == "oracle_fd":
        # FD-twin of the oracle's augmented family (see the classical
        # branch above; ffmpc_oracle.cpp knot_diff_t<NY>).
        def diff(ref, y, w):
            h = ORACLE_FD_STEP
            ynext, res = raw(ref, y, w, False)
            Fy, Jy = _central_fd(lambda yy: raw(ref, yy, w, False), y, h)
            Fw, Jw = _central_fd(lambda ww: raw(ref, y, ww, False), w, h)
            cost, Lx, Lu, Lxx, Lxu, Luu = _assemble_gn(
                full_spec, res, Jy, Jw, dt, False, nx, nu, y.dtype)
            return KnotDeriv(ynext, cost, Fy, Fw, Lx, Lu, Lxx, Lxu, Luu)
    else:
        def diff(ref, y, w):
            ynext, res = raw(ref, y, w, False)
            Fx, Jx_res = jax.jacfwd(lambda yy: raw(ref, yy, w, False))(y)
            Fu, Ju_res = jax.jacfwd(lambda ww: raw(ref, y, ww, False))(w)
            cost, Lx, Lu, Lxx, Lxu, Luu = _assemble_gn(
                full_spec, res, Jx_res, Ju_res, dt, False, nx, nu, y.dtype)
            return KnotDeriv(ynext, cost, Fx, Fu, Lx, Lu, Lxx, Lxu, Luu)

    def term_calc(ref, y):
        w0 = jnp.zeros(nu, y.dtype)
        _, res = raw(ref, y, w0, True)
        # terminal: inner costs unscaled (IAM Euler terminal), outer as-is.
        return _assemble_cost(full_spec, res, dt, True, y.dtype)

    if calc_mode == "scalar":
        term_calc = scalar_term_calc

    if deriv_mode in ("analytic", "scalar", "scalar_unroll"):
        def term_diff(ref, y):
            w0 = jnp.zeros(nu, y.dtype)
            _, res, Jy, _, _, _ = aug_fn(ref, y, w0, True)
            cost, Lx, _, Lxx, _, _ = _assemble_gn(
                full_spec, res, Jy, None, dt, True, nx, nu, y.dtype)
            return cost, Lx, Lxx
    elif deriv_mode == "oracle_fd":
        def term_diff(ref, y):
            h = ORACLE_FD_STEP
            w0 = jnp.zeros(nu, y.dtype)
            _, res = raw(ref, y, w0, True)
            _, Jy = _central_fd(lambda yy: raw(ref, yy, w0, True), y, h)
            cost, Lx, _, Lxx, _, _ = _assemble_gn(
                full_spec, res, Jy, None, dt, True, nx, nu, y.dtype)
            return cost, Lx, Lxx
    else:
        def term_diff(ref, y):
            w0 = jnp.zeros(nu, y.dtype)

            def f(yy):
                _, res = raw(ref, yy, w0, True)
                return res
            res = f(y)
            Jx = jax.jacfwd(f)(y)
            cost, Lx, _, Lxx, _, _ = _assemble_gn(
                full_spec, res, Jx, None, dt, True, nx, nu, y.dtype)
            return cost, Lx, Lxx

    lim = tuple(float(t) for t in W.tau_limits)
    diff_all = diff_packed = None
    if True:  # channel diff covers nc=1 and nc=3 (point3d) families
        def _build_diff_all(diff=diff):
            from ..solver.diff_pallas import make_diff_all
            return make_diff_all(model, W, surface, "augmented", diff)

        def _build_diff_packed():
            from ..solver.diff_pallas import make_diff_packed
            return make_diff_packed(model, W, surface, "augmented")
        diff_all = _LazyDiffAll(_build_diff_all)
        diff_packed = _LazyDiffAll(_build_diff_packed)
    return KnotModel(calc, diff, term_calc, term_diff, nx, nu,
                     tuple(-t for t in lim), lim, diff_all, diff_packed)
