"""Functional FDDP / BoxFDDP: the Crocoddyl SolverBoxFDDP equivalent on TPU.

Reference use: solver.solve(xs, us, max_iters, False) with warm starts and
Riccati gains K consumed by the policy (crocoddyl_classical.py:363-388,
442-445).  This is a from-scratch JAX implementation of the
feasibility-driven DDP algorithm (Mastalli et al., ICRA 2020) mirroring
Crocoddyl's published semantics:

- feasibility gaps fs[0] = x0 - xs[0], fs[t+1] = f(xs[t], us[t]) - xs[t+1];
  the backward pass deflects Vx along the gaps, the forward pass keeps
  (1 - alpha)-scaled gaps open.
- Levenberg-Marquardt regularization schedule (inc/dec factor 10, bounds
  [1e-9, 1e9]) with backward-pass retry on an indefinite Quu.
- Goldstein-style acceptance with the gap-aware expected improvement
  d1 = dg + dv, d2 = dq - 2 dv, and negative-improvement acceptance
  (th_acceptnegstep) that lets pure gap-contraction steps through.
- BoxFDDP: control bounds via a projected-Newton box QP per knot; gain rows
  of clamped dimensions are zeroed and rollout controls are clamped.

Everything is jit-compatible (lax.scan sweeps, lax.while_loop iteration and
line search) and vmap-batchable over problems: ``solve`` has no Python-level
data-dependent control flow.  State spaces are Euclidean (all-revolute Panda
=> integrate/difference are plain +/-; no Lie retraction needed).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ocp.action import KnotModel
from ..core.smallchol import chol_factor, chol_solve
from .boxqp import boxqp, _masked_solve
from .backward_pallas import make_backward_box
from .rollout_pallas import make_fused_rollout


@dataclass(frozen=True)
class FDDPSettings:
    max_iters: int = 10
    n_alphas: int = 10          # alphas = 2^0 .. 2^-(n-1)
    reg_init: float = 1e-9
    reg_min: float = 1e-9
    reg_max: float = 1e9
    reg_inc: float = 10.0
    reg_dec: float = 10.0
    th_acceptstep: float = 0.1
    th_acceptnegstep: float = 2.0
    th_stop: float = 1e-9
    th_grad: float = 1e-12
    th_stepdec: float = 0.5
    th_stepinc: float = 0.01
    use_box: bool = True
    boxqp_iters: int = 8
    # bound on cost increases accepted through the gap-contraction branch
    # (see acceptance comment in the line search)
    neg_step_cost_factor: float = 1.2
    neg_step_cost_slack: float = 10.0
    # unroll factor for the sequential knot sweeps (1 = plain scan; measured
    # faster than unrolling on the current backend)
    scan_unroll: int = 1
    # "sequential" (crocoddyl-style lax.scan sweep) or "parallel"
    # (associative-scan Riccati, O(log N) depth).  With use_box the
    # parallel mode runs the frozen-active-set refinement
    # (riccati_scan.parallel_riccati_box); refinement rounds below.
    riccati_mode: str = "sequential"
    # "xla" or "pallas": the sequential box backward as one fused Pallas
    # kernel (solver/backward_pallas.py) — identical math/semantics to the
    # XLA scan, one launch per sweep instead of hundreds per knot.  Only
    # takes effect with use_box and riccati_mode="sequential"; engages the
    # kernel when the solve is vmapped (custom_vmap rule), single solves
    # keep the scan.
    backward_mode: str = "xla"
    # "xla" or "pallas": the alpha-batched line-search rollout as one fused
    # Pallas kernel (solver/rollout_pallas.py; the scalar-channel knot calc
    # runs inside the kernel).  Requires calc_mode="scalar" knots and
    # linesearch_mode="batched"; engages under vmap like backward_mode.
    rollout_mode: str = "xla"
    # "xla" or "pallas": the all-knot derivative pass as one fused Pallas
    # kernel (solver/diff_pallas.py + ocp/channel_diff.py) — primal chain,
    # vmap-of-jvp tangent sweeps and GN assembly in one launch over the
    # flattened (B*N) lane axis.  Engages under vmap when the knot carries
    # a diff_all (nc=1 families); single solves keep the per-knot vmap.
    diff_mode: str = "xla"
    parallel_box_refinements: int = 1
    # "batched": all n_alphas rollouts in one vmapped pass (fixed cost);
    # "while": descending-alpha while_loop, stops at the first acceptance —
    # warm-started MPC usually accepts alpha=1, cutting rollout work ~n_alphas
    # fold; under vmap(solve) the whole batch pays max-trips-over-lanes.
    linesearch_mode: str = "batched"
    # Reproduce Crocoddyl's exact acceptance/stopping semantics: the
    # unbounded negative-improvement (gap-contraction) acceptance and
    # th_grad as a post-acceptance STOP criterion instead of an acceptance
    # clause.  Used by the parity harness to measure the cost of our
    # robustness clamps (PARITY.md deviations 3-5) rather than assert it.
    crocoddyl_semantics: bool = False
    # Flatten the (B, N) knot axes into one full-lane axis for the
    # derivative pass under vmap(solve) (see make_flat_vdiff).  Layout-only;
    # per-knot math identical.  MEASURED NEUTRAL on TPU at B=256/N=40
    # (9.74 vs 9.56 ms per diff pass — XLA already tiles the nested layout
    # adequately), so it stays off by default; kept for mesh layouts whose
    # trailing dims are lane-hostile.  The companion tangent-sweep lever
    # (deriv_mode="scalar_unroll", 7 unrolled one-hot jvp sweeps) is
    # numerically identical to "scalar" but its 7x graph made the remote
    # TPU compile pathological (>65 min, killed) — available, not default.
    flat_diff: bool = False
    # Return the lowest-cost iterate seen instead of the last one.
    # MEASURED NEGATIVE RESULT for MPC loops: with return_best the
    # controller repeatedly re-executes the stale shifted plan whenever the
    # solver can't beat the warm start within budget (closed-loop classical
    # contact: 0.44 m RMS vs 0.009 m with the last iterate + reg carry-over)
    # — FDDP's cost-raising gap-contraction steps are *necessary* progress,
    # not noise.  Kept as an option for open-loop/offline solves where a
    # never-worse-than-warm-start guarantee matters.
    return_best: bool = False
    # NOTE on a measured negative result: scalarizing the backward-sweep
    # body (unstacking Vxx/Fx into channels, scalar GEMMs + scalar box-QP)
    # made the full solve 3x SLOWER (780 -> 247 solves/s at B=256).  The
    # backward scan runs at carry width B only — 2 f32 tiles per op — so
    # per-op overhead dominates; scalar channels pay off at the rollout /
    # derivative widths (B*n_alphas, n_tan*B >= ~2.5k lanes), not here.


def resolve_platform_mode(mode: str, scalar: str = "scalar",
                          vector: str = "vector",
                          platform: Optional[str] = None) -> str:
    """Resolve an "auto" kernel-mode against the platform the computation
    will run on.  Scalar-channel graphs are the fast path on TPU but
    pathologically slow to compile on XLA:CPU.

    ``platform`` pins the target explicitly (pass ``devs[0].platform`` when
    the solve is sharded onto known devices); otherwise the configured
    default device is consulted (which may be a Device *or* a platform
    string), falling back to the default backend.
    """
    if mode != "auto":
        return mode
    if platform is None:
        from .platform import default_platform
        platform = default_platform()
    return scalar if platform == "tpu" else vector


class FDDPResult(NamedTuple):
    xs: jnp.ndarray        # (N+1, nx)
    us: jnp.ndarray        # (N, nu)
    K: jnp.ndarray         # (N, nu, nx) Riccati feedback gains
    k: jnp.ndarray         # (N, nu) feedforward (crocoddyl sign: u_try = u - a*k - K dx)
    cost: jnp.ndarray      # scalar total cost of the returned trajectory
    stop: jnp.ndarray      # scalar sum ||Qu||^2 (crocoddyl stoppingCriteria)
    iters: jnp.ndarray     # int iterations actually performed
    converged: jnp.ndarray # bool
    diverged: jnp.ndarray  # bool (regularization blew past reg_max)
    feasible: jnp.ndarray  # bool gaps closed
    xreg: jnp.ndarray      # final regularization


class _Carry(NamedTuple):
    xs: Any
    us: Any
    cost: Any
    feasible: Any
    xreg: Any
    ureg: Any
    it: Any
    converged: Any
    diverged: Any
    K: Any
    kff: Any
    stop: Any
    best_xs: Any
    best_us: Any
    best_K: Any
    best_kff: Any
    best_cost: Any


def _compute_gaps(x0, xs, xnexts):
    fs0 = (x0 - xs[0])[None]
    fs_rest = xnexts - xs[1:]
    return jnp.concatenate([fs0, fs_rest], axis=0)


def make_flat_vdiff(knot: "KnotModel"):
    """All-knot derivative pass with a lane-filling batch rule.

    Unbatched (single solve): plain ``vmap(knot.diff)`` over the N knots.
    Under ``vmap(solve)`` over B problems, the naive double-vmap leaves the
    scalar-channel arrays shaped (B, N): XLA tiles the trailing (B, N) dims
    onto (8 sublanes, 128 lanes), and N=40 fills only 40 of 128 lanes.
    The batch rule instead flattens (B, N) -> (B*N,) — one full-lane axis —
    runs a single vmap, and unflattens.  Purely a layout change: per-knot
    math is identical."""

    @jax.custom_batching.custom_vmap
    def vdiff_all(refs_run, xs_run, us):
        return jax.vmap(knot.diff)(refs_run, xs_run, us)

    @vdiff_all.def_vmap
    def _rule(axis_size, in_batched, refs_run, xs_run, us):
        N = us.shape[-2]

        def bcast(tree, tb):
            return jax.tree.map(
                lambda l, b: l if b else jnp.broadcast_to(
                    l[None], (axis_size,) + l.shape), tree, tb)

        refs_b = bcast(refs_run, in_batched[0])
        xs_b = bcast(xs_run, in_batched[1])
        us_b = bcast(us, in_batched[2])
        flat = jax.tree.map(
            lambda l: l.reshape((axis_size * N,) + l.shape[2:]),
            (refs_b, xs_b, us_b))
        out = jax.vmap(knot.diff)(*flat)
        out = jax.tree.map(
            lambda l: l.reshape((axis_size, N) + l.shape[1:]), out)
        return out, jax.tree.map(lambda _: True, out)

    return vdiff_all


def solve(knot: KnotModel, refs_run, ref_T, x0, xs_init, us_init,
          settings: FDDPSettings = FDDPSettings(),
          debug_history: bool = False, reg0=None) -> FDDPResult:
    """Solve one shooting problem.  refs_run: pytree with leading dim N.

    ``reg0`` (traced scalar, optional) overrides settings.reg_init — MPC
    loops carry the previous solve's final regularization here so a stiff
    contact problem doesn't re-climb the whole regularization ladder every
    tick (measured: 12 of 10 budgeted iterations wasted at reg_init=1e-9 in
    the classical contact loop).

    With ``debug_history=True`` additionally returns a dict of
    (max_iters,)-shaped per-iteration telemetry arrays (accepted step
    lengths, costs, regularization, expected-improvement pieces)."""
    S = settings
    nx, nu = knot.nx, knot.nu
    N = us_init.shape[0]
    dtype = xs_init.dtype

    u_lb = jnp.asarray(knot.u_lb, dtype)
    u_ub = jnp.asarray(knot.u_ub, dtype)
    alphas = 0.5 ** jnp.arange(S.n_alphas, dtype=dtype)

    vcalc = jax.vmap(knot.calc)
    if S.diff_mode == "pallas" and knot.diff_all is not None:
        vdiff = knot.diff_all
    elif S.flat_diff:
        vdiff = make_flat_vdiff(knot)
    else:
        vdiff = jax.vmap(knot.diff)

    def total_calc(xs, us):
        xnexts, costs = vcalc(refs_run, xs[:-1], us)
        cost = jnp.sum(costs) + knot.term_calc(ref_T, xs[-1])
        return xnexts, cost

    # ---------------- backward pass (emits the expected-improvement
    # weights w[t] = gapw * Vxx[t] @ fs[t] — the only downstream use of
    # Vxx, so the full (N+1, nx, nx) stack never leaves the sweep) --------
    def backward_store(derivs, LxT, LxxT, fs, us, xreg, ureg, feasible):
        eye_x = jnp.eye(nx, dtype=dtype)
        gapw = jnp.where(feasible, 0.0, 1.0)
        VxxT = LxxT + xreg * eye_x
        wT = gapw * (VxxT @ fs[-1])
        VxT = LxT + wT

        def step(carry, inp):
            Vx, Vxx = carry
            d, fs_t, u_t = inp
            Qxx = d.Lxx + d.Fx.T @ Vxx @ d.Fx
            Qxu = d.Lxu + d.Fx.T @ Vxx @ d.Fu
            Quu = d.Luu + d.Fu.T @ Vxx @ d.Fu + ureg * jnp.eye(nu, dtype=dtype)
            Qx = d.Lx + d.Fx.T @ Vx
            Qu = d.Lu + d.Fu.T @ Vx

            if S.use_box:
                sol = boxqp(Quu, Qu, u_lb - u_t, u_ub - u_t,
                            jnp.zeros(nu, dtype), iters=S.boxqp_iters)
                kff = -sol.x
                K = _masked_solve(Quu, Qxu.T * sol.free.astype(dtype)[:, None],
                                  sol.free, 1e-12)
                bad = jnp.any(~jnp.isfinite(kff)) | jnp.any(~jnp.isfinite(K))
            else:
                L = chol_factor(Quu)
                kff = chol_solve(L, Qu)
                K = chol_solve(L, Qxu.T)
                bad = jnp.any(~jnp.isfinite(L))

            Quuk = Quu @ kff
            Vx_new = Qx + K.T @ (Quuk - 2.0 * Qu)
            Vxx_new = Qxx - Qxu @ K
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T) + xreg * eye_x
            w_t = gapw * (Vxx_new @ fs_t)
            Vx_new = Vx_new + w_t

            dg_t = Qu @ kff - gapw * (Vx_new @ fs_t)
            dq_t = -kff @ Quuk + gapw * (fs_t @ (Vxx_new @ fs_t))
            out = (K, kff, jnp.sum(Qu * Qu), dg_t, dq_t, bad, w_t)
            return (Vx_new, Vxx_new), out

        (_, _), outs = jax.lax.scan(
            step, (VxT, VxxT), (derivs, fs[:-1], us), reverse=True,
            unroll=S.scan_unroll)
        K, kff, qu2, dg_t, dq_t, bad, w_run = outs
        dg = jnp.sum(dg_t) - gapw * (VxT @ fs[-1])
        dq = jnp.sum(dq_t) + gapw * (fs[-1] @ (VxxT @ fs[-1]))
        w_all = jnp.concatenate([w_run, wT[None]], axis=0)  # (N+1, nx)
        return K, kff, jnp.sum(qu2), dg, dq, jnp.any(bad), w_all

    def backward_parallel(derivs, LxT, LxxT, fs, us, xreg, ureg, feasible):
        """O(log N)-depth backward via the associative-scan Riccati
        (solver/riccati_scan.py); exact for the unconstrained subproblem,
        frozen-active-set refinement for the box-constrained one.
        Selected by settings.riccati_mode="parallel"."""
        from .riccati_scan import parallel_riccati, parallel_riccati_box
        gapw = jnp.where(feasible, 0.0, 1.0)
        fs_next = gapw * fs[1:]
        if S.use_box:
            K, kff, Vx, Vxx, Qu, Quu = parallel_riccati_box(
                derivs.Fx, derivs.Fu, derivs.Lx, derivs.Lu, derivs.Lxx,
                derivs.Lxu, derivs.Luu, fs_next, LxT, LxxT,
                u_lb[None] - us, u_ub[None] - us, ureg=ureg,
                boxqp_iters=S.boxqp_iters,
                refinements=S.parallel_box_refinements)
        else:
            K, kff, Vx, Vxx = parallel_riccati(
                derivs.Fx, derivs.Fu, derivs.Lx, derivs.Lu, derivs.Lxx,
                derivs.Lxu, derivs.Luu, fs_next, LxT, LxxT, ureg=ureg)
            Vp = Vx[1:] + jnp.einsum("tij,tj->ti", Vxx[1:], fs_next)
            Qu = derivs.Lu + jnp.einsum("tiu,ti->tu", derivs.Fu, Vp)
            Quu = derivs.Luu + ureg * jnp.eye(nu, dtype=dtype)[None] + jnp.einsum(
                "tiu,tij,tjv->tuv", derivs.Fu, Vxx[1:], derivs.Fu)
        # deflected value gradients (sequential-path convention)
        w_all = gapw * jnp.einsum("tij,tj->ti", Vxx, fs)      # (N+1, nx)
        Vx_d = Vx + w_all
        Quuk = jnp.einsum("tuv,tv->tu", Quu, kff)
        dg = jnp.sum(jnp.einsum("tu,tu->t", Qu, kff)) - jnp.sum(
            gapw * jnp.einsum("ti,ti->t", Vx_d, fs))
        dq = -jnp.sum(jnp.einsum("tu,tu->t", kff, Quuk)) + jnp.sum(
            gapw * jnp.einsum("ti,tij,tj->t", fs, Vxx, fs))
        stop = jnp.sum(Qu * Qu)
        bad = jnp.any(~jnp.isfinite(K)) | jnp.any(~jnp.isfinite(kff))
        return K, kff, stop, dg, dq, bad, w_all

    # ---------------- forward pass (feasibility-prone rollout) ----------------
    def forward(xs, us, K, kff, fs, alpha, feasible):
        gap_scale = jnp.where(feasible, 0.0, alpha - 1.0)

        def step(x, inp):
            ref, x_nom, u_nom, K_t, k_t, fs_next = inp
            dx = x - x_nom
            u = u_nom - alpha * k_t - K_t @ dx
            if S.use_box:
                u = jnp.clip(u, u_lb, u_ub)
            xnext, cost = knot.calc(ref, x, u)
            xnext = xnext + gap_scale * fs_next
            return xnext, (x, u, cost)

        xN, (xs_run, us_try, costs) = jax.lax.scan(
            step, x0, (refs_run, xs[:-1], us, K, kff, fs[1:]),
            unroll=S.scan_unroll)
        cost_T = knot.term_calc(ref_T, xN)
        xs_try = jnp.concatenate([xs_run, xN[None]], axis=0)
        cost_try = jnp.sum(costs) + cost_T
        return xs_try, us_try, cost_try

    # ---------------- one FDDP iteration ----------------
    def iteration(c: _Carry) -> _Carry:
        derivs = vdiff(refs_run, c.xs[:-1], c.us)
        cost_T, LxT, LxxT = knot.term_diff(ref_T, c.xs[-1])
        cost_cur = jnp.sum(derivs.cost) + cost_T
        fs = _compute_gaps(x0, c.xs, derivs.xnext)
        gap_norm = jnp.max(jnp.abs(fs))
        feasible = c.feasible | (gap_norm < 1e-9)

        # backward pass with regularization retry on indefinite Quu
        if S.riccati_mode == "parallel":
            bw_fn = backward_parallel
        elif S.backward_mode == "pallas" and S.use_box:
            bw_box = make_backward_box(nx, nu, S.boxqp_iters)

            def bw_fn(derivs, LxT, LxxT, fs, us, xreg, ureg, feasible):
                gapw = jnp.where(feasible, 0.0, 1.0)
                return bw_box(derivs.Fx, derivs.Fu, derivs.Lx, derivs.Lu,
                              derivs.Lxx, derivs.Lxu, derivs.Luu,
                              gapw * fs, LxT, LxxT,
                              u_lb[None] - us, u_ub[None] - us,
                              jnp.asarray(xreg, dtype),
                              jnp.asarray(ureg, dtype))
        else:
            bw_fn = backward_store

        def bw(reg_pair):
            xreg, ureg = reg_pair
            return bw_fn(derivs, LxT, LxxT, fs, c.us, xreg, ureg, feasible)

        def bw_cond(st):
            (_, _, _, _, _, bad, _), (xreg, _) = st
            return bad & (xreg < S.reg_max)

        def bw_body(st):
            _, (xreg, ureg) = st
            xreg = jnp.minimum(xreg * S.reg_inc, S.reg_max)
            ureg = xreg
            return bw((xreg, ureg)), (xreg, ureg)

        st0 = (bw((c.xreg, c.ureg)), (c.xreg, c.ureg))
        (K, kff, stop, dg, dq, bw_bad, w_all), (xreg, ureg) = jax.lax.while_loop(
            bw_cond, bw_body, st0)

        # Line search: ALL step lengths roll out in one batched scan (vmap
        # over alpha), then the largest acceptable alpha is selected.
        # Equivalent to Crocoddyl's first-acceptable descending sweep, but
        # with fixed one-pass cost — crucial under vmap(solve), where a
        # while_loop line search would run worst-case trips for the whole
        # batch of problems.
        def accept_alpha(alpha, xs_try, us_try, cost_try):
            dV = cost_cur - cost_try
            # gap-aware expected improvement (crocoddyl
            # FDDP::expectedImprovement); the gap weight and Vxx are folded
            # into w_all = gapw * Vxx @ fs by the backward pass
            dx_all = c.xs - xs_try
            dv = -jnp.sum(w_all * dx_all)
            d1 = dg + dv
            d2 = dq - 2.0 * dv
            dVexp = alpha * (d1 + 0.5 * alpha * d2)
            finite = jnp.isfinite(cost_try)
            if S.crocoddyl_semantics:
                # SolverFDDP::solve acceptance, verbatim: Goldstein on the
                # gap-corrected model, cost increases unbounded.
                ok_pos = (dVexp >= 0) & (dV > S.th_acceptstep * dVexp)
                ok_neg = (dVexp < 0) & (dV > S.th_acceptnegstep * dVexp)
                return (xs_try, us_try, cost_try, finite & (ok_pos | ok_neg),
                        d1, dVexp)
            cost_guard = S.neg_step_cost_factor * cost_cur + S.neg_step_cost_slack
            # The th_grad escape hatch means "expected gradient negligible,
            # accept to avoid stalling".  Crocoddyl tests d1 < th_grad, which
            # a strongly NEGATIVE d1 (gap-corrected model pointing uphill,
            # with d2 > 0 making dVexp >= 0) also satisfies — an
            # unconditional acceptance of arbitrarily worse rollouts.
            # Require the gradient to actually be small and bound the cost.
            ok_pos = (dVexp >= 0) & (
                ((jnp.abs(d1) < S.th_grad) & (cost_try < cost_guard))
                | (dV > S.th_acceptstep * dVexp))
            # Negative-improvement (gap-contraction) acceptance, with a
            # robustness clamp beyond Crocoddyl's th_acceptnegstep.  The
            # positive branch only ever decreases cost; all increases flow
            # through here.  With a stiff contact-force Hessian the dv gap
            # correction can drive dVexp to -inf and the bare Goldstein test
            # accepts arbitrarily worse trajectories — compounding 10x per
            # iteration into 1e10 blowups observed in closed loop.  Gap
            # contraction legitimately costs a few percent, not orders of
            # magnitude: bound each accepted increase multiplicatively.
            ok_neg = ((dVexp < 0) & (dV > S.th_acceptnegstep * dVexp)
                      & (cost_try < cost_guard))
            return (xs_try, us_try, cost_try, finite & (ok_pos | ok_neg),
                    d1, dVexp)

        def try_alpha(alpha):
            xs_try, us_try, cost_try = forward(c.xs, c.us, K, kff, fs,
                                               alpha, feasible)
            return accept_alpha(alpha, xs_try, us_try, cost_try)

        if S.linesearch_mode == "while":
            def ls_cond(st):
                idx, ok = st[0], st[1]
                return (~ok) & (idx < S.n_alphas)

            def ls_body(st):
                idx, _, xs_a, us_a, cost_a, alpha_a, d1_a, dve_a = st
                alpha = alphas[idx]
                xs_t, us_t, cost_t, ok, d1_t, dve_t = try_alpha(alpha)
                return (idx + 1, ok,
                        jnp.where(ok, xs_t, xs_a), jnp.where(ok, us_t, us_a),
                        jnp.where(ok, cost_t, cost_a),
                        jnp.where(ok, alpha, alpha_a),
                        jnp.where(ok, d1_t, d1_a),
                        jnp.where(ok, dve_t, dve_a))

            st0 = (jnp.int32(0), jnp.asarray(False),
                   c.xs, c.us, cost_cur, alphas[-1],
                   jnp.asarray(jnp.inf, dtype), jnp.asarray(0.0, dtype))
            (_, accepted, xs_try, us_try, cost_try, alpha_f, d1_sel,
             dvexp_sel) = jax.lax.while_loop(ls_cond, ls_body, st0)
        elif S.rollout_mode == "pallas":
            fused = make_fused_rollout(knot, S.n_alphas, S.use_box)
            xs_ts, us_ts, cost_ts = fused(x0, c.xs, c.us, K, kff, fs,
                                          feasible, refs_run, ref_T)
            xs_tries, us_tries, cost_tries, ok_flags, d1s, dves = jax.vmap(
                accept_alpha)(alphas, xs_ts, us_ts, cost_ts)
            accepted = jnp.any(ok_flags)
            sel = jnp.argmax(ok_flags)
            xs_try = xs_tries[sel]
            us_try = us_tries[sel]
            cost_try = cost_tries[sel]
            alpha_f = alphas[sel]
            d1_sel = d1s[sel]
            dvexp_sel = dves[sel]
        else:
            (xs_tries, us_tries, cost_tries, ok_flags, d1s,
             dves) = jax.vmap(try_alpha)(alphas)
            accepted = jnp.any(ok_flags)
            sel = jnp.argmax(ok_flags)        # first True == largest alpha
            xs_try = xs_tries[sel]
            us_try = us_tries[sel]
            cost_try = cost_tries[sel]
            alpha_f = alphas[sel]
            d1_sel = d1s[sel]
            dvexp_sel = dves[sel]

        xs_new = jnp.where(accepted, xs_try, c.xs)
        us_new = jnp.where(accepted, us_try, c.us)
        cost_new = jnp.where(accepted, cost_try, cost_cur)
        feasible_new = feasible | (accepted & (alpha_f >= 1.0 - 1e-12))

        # regularization schedule (crocoddyl solve loop)
        dec = accepted & (alpha_f > S.th_stepdec)
        inc = (~accepted) | (alpha_f <= S.th_stepinc)
        xreg_new = jnp.where(dec, jnp.maximum(xreg / S.reg_dec, S.reg_min), xreg)
        xreg_new = jnp.where(inc, jnp.minimum(xreg_new * S.reg_inc, S.reg_max), xreg_new)
        diverged = (inc & (xreg >= S.reg_max)) | bw_bad & (xreg >= S.reg_max)
        converged = feasible_new & (stop < S.th_stop)
        if S.crocoddyl_semantics:
            # Crocoddyl stops when the expected gradient is negligible
            converged = converged | (accepted & (jnp.abs(d1_sel) < S.th_grad))

        aux = {
            "cost_cur": cost_cur, "cost_try": cost_try, "accepted": accepted,
            "alpha": alpha_f, "stop": stop, "xreg": xreg,
            "dg": dg, "dq": dq, "d1": d1_sel, "dVexp": dvexp_sel,
            "gap_norm": gap_norm,
            "feasible": feasible, "bw_bad": bw_bad,
        }
        improved = cost_new < c.best_cost

        def pick(new, old):
            return jnp.where(improved, new, old)

        new_c = _Carry(xs=xs_new, us=us_new, cost=cost_new, feasible=feasible_new,
                       xreg=xreg_new, ureg=xreg_new, it=c.it + 1,
                       converged=converged, diverged=diverged, K=K, kff=kff,
                       stop=stop,
                       best_xs=pick(xs_new, c.best_xs),
                       best_us=pick(us_new, c.best_us),
                       best_K=pick(K, c.best_K),
                       best_kff=pick(kff, c.best_kff),
                       best_cost=pick(cost_new, c.best_cost))
        return new_c, aux

    def loop_cond(c: _Carry):
        return (c.it < S.max_iters) & (~c.converged) & (~c.diverged)

    reg_start = (jnp.asarray(S.reg_init, dtype) if reg0 is None
                 else jnp.clip(jnp.asarray(reg0, dtype), S.reg_min, 1e4))
    c0 = _Carry(
        xs=xs_init, us=us_init,
        cost=jnp.asarray(jnp.inf, dtype),
        feasible=jnp.asarray(False),
        xreg=reg_start, ureg=reg_start,
        it=jnp.int32(0),
        converged=jnp.asarray(False), diverged=jnp.asarray(False),
        K=jnp.zeros((N, nu, nx), dtype), kff=jnp.zeros((N, nu), dtype),
        stop=jnp.asarray(jnp.inf, dtype),
        best_xs=xs_init, best_us=us_init,
        best_K=jnp.zeros((N, nu, nx), dtype),
        best_kff=jnp.zeros((N, nu), dtype),
        best_cost=jnp.asarray(jnp.inf, dtype),
    )
    if debug_history:
        # fixed-trip scan collecting per-iteration telemetry (the
        # CallbackVerbose equivalent; reference crocoddyl_classical.py:352)
        def scan_body(c, _):
            new_c, aux = iteration(c)
            live = loop_cond(c)
            c_out = jax.tree.map(
                lambda new, old: jnp.where(live, new, old), new_c, c)
            return c_out, aux
        cF, history = jax.lax.scan(scan_body, c0, None, length=S.max_iters)
    else:
        cF = jax.lax.while_loop(lambda c: loop_cond(c), lambda c: iteration(c)[0], c0)
        history = None

    if S.return_best:
        out_xs, out_us, out_K, out_k = (cF.best_xs, cF.best_us, cF.best_K,
                                        cF.best_kff)
    else:
        out_xs, out_us, out_K, out_k = cF.xs, cF.us, cF.K, cF.kff
    # final cost of the returned trajectory (carry cost is inf if 0 iterations)
    _, cost_final = total_calc(out_xs, out_us)

    res = FDDPResult(
        xs=out_xs, us=out_us, K=out_K, k=out_k,
        cost=cost_final, stop=cF.stop, iters=cF.it,
        converged=cF.converged, diverged=cF.diverged,
        feasible=cF.feasible, xreg=cF.xreg,
    )
    if debug_history:
        return res, history
    return res
