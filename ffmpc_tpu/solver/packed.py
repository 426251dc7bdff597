"""Packed-carry batched BoxFDDP: the whole iteration in kernel layout.

``fddp.solve`` under ``vmap`` pays a layout tax: each of the three Pallas
kernels (diff, backward, rollout) unpacks its output to batch-leading
``(B, N, ...)`` arrays and the next kernel re-packs them to channel-major
``(N, C, B)`` — at B=256 those transposes plus the expected-improvement /
selection glue on lane-hostile ``(..., 21, 21)`` layouts are ~1/3 of each
solver iteration (round-4 profiler accounting: 18.8 ms kernels, ~10.7 ms
glue per 29.5 ms device solve).

This module runs the SAME algorithm — identical math, identical
acceptance semantics to ``fddp.solve`` with the all-Pallas configuration —
but keeps every per-knot array in the packed channel-major layout
``(N, C_pad8, Bp)`` (batch on lanes) across the entire iteration loop:

  - references are packed ONCE per solve (they are loop-invariant; the
    vmap path re-packed them every iteration inside both the diff and
    rollout kernels);
  - the packed diff kernel (diff_pallas.make_diff_packed) emits the GN
    block directly in the backward kernel's strided scr layout;
  - the backward kernel emits gains and the expected-improvement weights
    w[t] = Vxx[t] @ fs_scaled[t] packed;
  - the rollout kernel consumes the plan stream packed and leaves its
    per-alpha trajectories packed;
  - acceptance, step selection and the carry update are elementwise /
    contraction ops with batch on the minor (lane) axis — no transposes.

Feature scope: the hot path only — use_box, sequential Riccati, batched
line search, no debug history, no return_best, no crocoddyl_semantics
(assert-guarded).  ``FDDPResult.cost`` is the accepted-trajectory cost
from the final iteration (identical data, different summation order than
``fddp.solve``'s final re-evaluation — equal to float rounding).

Reference semantics: Crocoddyl SolverBoxFDDP solve loop
(/root/reference/src/mpc/crocoddyl_classical.py:442-445), as re-derived in
solver/fddp.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ocp.action import KnotModel
from .fddp import FDDPSettings, FDDPResult
from .platform import resolve_interpret
from .backward_pallas import _backward_core, _pack_term, _pad8
from .rollout_pallas import _rollout_core, _pack_glob


def _leaf_meta(tree, strip):
    leaves, treedef = jax.tree.flatten(tree)
    shapes = [l.shape[strip:] for l in leaves]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    return leaves, treedef, shapes, sizes


def solve_packed(knot: KnotModel, refs_run, ref_T, x0, xs_init, us_init,
                 settings: FDDPSettings = FDDPSettings(),
                 reg0=None) -> FDDPResult:
    """Batched solve with a packed carry.  All array args batch-leading:
    refs_run pytree (B, N, ...), ref_T pytree (B, ...), x0 (B, nx),
    xs_init (B, N+1, nx), us_init (B, N, nu), reg0 optional (B,)."""
    S = settings
    assert not S.crocoddyl_semantics and not S.return_best, (
        "packed solve covers the hot path only; use fddp.solve for the "
        "parity/debug configurations")
    assert S.use_box and S.riccati_mode == "sequential", (
        "packed solve: use_box + sequential Riccati only")
    assert S.max_iters >= 1
    assert knot.diff_packed is not None, (
        "packed solve needs the packed diff kernel (nc==1 families)")

    nx, nu = knot.nx, knot.nu
    sx, su = _pad8(nx), _pad8(nu)
    pK = _pad8(nu * nx)
    B, Np1 = xs_init.shape[0], xs_init.shape[1]
    N = Np1 - 1
    A = S.n_alphas
    dtype = xs_init.dtype
    interpret = resolve_interpret()
    Bt = 128 if not interpret else max(8, 1 << (B - 1).bit_length())
    Bp = ((B + Bt - 1) // Bt) * Bt

    lim_lb = jnp.asarray(knot.u_lb, dtype)
    lim_ub = jnp.asarray(knot.u_ub, dtype)
    alphas_col = jnp.asarray(0.5 ** np.arange(A), dtype)[:, None]  # (A, 1)

    # ---------------- packing helpers (entry only) ----------------------
    def pad_b(a):
        if a.shape[0] == Bp:
            return a
        reps = jnp.broadcast_to(a[-1:], (Bp - a.shape[0],) + a.shape[1:])
        return jnp.concatenate([a, reps], axis=0)

    def pack_kn(a, n, stride):     # (B, N?, n) -> (N?, stride, Bp)
        Nk = a.shape[1]
        p = jnp.moveaxis(pad_b(a).reshape(Bp, Nk, n), 0, -1)
        if stride != n:
            p = jnp.concatenate(
                [p, jnp.zeros((Nk, stride - n, Bp), dtype)], axis=1)
        return p

    def pack_g(a, n):              # (B, ...) -> (n, Bp)
        return jnp.moveaxis(pad_b(a).reshape(Bp, n), 0, -1)

    # loop-invariant packs
    ref_leaves, ref_treedef, ref_shapes, ref_sizes = _leaf_meta(refs_run, 2)
    refs_p = jnp.concatenate(
        [pack_kn(l.reshape(l.shape[:2] + (sz,)), sz, sz)
         for l, sz in zip(ref_leaves, ref_sizes)], axis=1)
    CR = _pad8(refs_p.shape[1])
    if CR != refs_p.shape[1]:
        refs_p = jnp.concatenate(
            [refs_p, jnp.zeros((N, CR - refs_p.shape[1], Bp), dtype)],
            axis=1)
    refT_leaves, refT_treedef, refT_shapes, refT_sizes = _leaf_meta(ref_T, 1)
    refT_rows = [pack_g(l.reshape((l.shape[0], sz)), sz)
                 for l, sz in zip(refT_leaves, refT_sizes)]
    ref_meta = (ref_treedef, ref_shapes, ref_sizes,
                refT_treedef, refT_shapes, refT_sizes)
    ref_T_pad = jax.tree.map(pad_b, ref_T)

    x0_p = pack_kn(x0[:, None, :], nx, sx)[0]                # (sx, Bp)
    xs_p0 = pack_kn(xs_init, nx, sx)                         # (N+1, sx, Bp)
    us_p0 = pack_kn(us_init, nu, su)                         # (N, su, Bp)

    vterm_diff = jax.vmap(knot.term_diff, in_axes=(0, 0))

    def bw_call(gn_p, dyn_p, LxT_p, LxxT_p, fsN_p, xreg, ureg):
        term = _pack_term(LxT_p, LxxT_p, fsN_p, xreg[None], ureg[None])
        return _backward_core(
            gn_p, dyn_p, term, nx=nx, nu=nu, N=N, Bt=Bt,
            boxqp_iters=S.boxqp_iters, kgain_reg=1e-12, interpret=interpret)

    def iteration(c):
        (xs_p, us_p, cost, feasible, xreg, ureg, it, converged, diverged,
         K_p, kff_p, stop) = c

        gn_p, aux_p = knot.diff_packed(refs_p, xs_p[:N], us_p, interpret)
        xnext_p = aux_p[:, :nx, :]                           # (N, nx, Bp)
        cost_kn = aux_p[:, nx, :]                            # (N, Bp)

        # terminal derivatives (one knot: XLA, small transposes)
        xT = jnp.moveaxis(xs_p[N, :nx, :], 0, -1)            # (Bp, nx)
        cost_T, LxT, LxxT = vterm_diff(ref_T_pad, xT)
        cost_cur = jnp.sum(cost_kn, axis=0) + cost_T         # (Bp,)
        LxT_p = jnp.moveaxis(LxT, 0, -1)                     # (nx, Bp)
        LxxT_p = jnp.moveaxis(LxxT.reshape(Bp, nx * nx), 0, -1)

        # gaps fs[0] = x0 - xs[0]; fs[t+1] = f(xs[t], us[t]) - xs[t+1]
        fs_run = xnext_p - xs_p[1:, :nx, :]                  # (N, nx, Bp)
        fs0 = (x0_p[:nx] - xs_p[0, :nx, :])[None]
        fs = jnp.concatenate([fs0, fs_run], axis=0)          # (N+1, nx, Bp)
        gap_norm = jnp.max(jnp.abs(fs), axis=(0, 1))         # (Bp,)
        feasible = feasible | (gap_norm < 1e-9)
        gapw = jnp.where(feasible, 0.0, 1.0).astype(dtype)
        fs_sc = gapw[None, None, :] * fs

        def pad_rows(a, stride):
            n = a.shape[1]
            if n == stride:
                return a
            return jnp.concatenate(
                [a, jnp.zeros(a.shape[:1] + (stride - n,) + a.shape[2:],
                              dtype)], axis=1)

        lb_rel = lim_lb[None, :, None] - us_p[:, :nu, :]
        ub_rel = lim_ub[None, :, None] - us_p[:, :nu, :]
        dyn_p = jnp.concatenate(
            [pad_rows(fs_sc[:N], sx), pad_rows(lb_rel, su),
             pad_rows(ub_rel, su)], axis=1)                  # (N, sx+2su, Bp)
        fsN_p = fs_sc[N]                                     # (nx, Bp)

        # backward with per-lane regularization retry (mirrors the batched
        # while_loop semantics of the vmapped fddp.solve: body applies to
        # all lanes, select keeps old values where the retry pred is False)
        st0_out = bw_call(gn_p, dyn_p, LxT_p, LxxT_p, fsN_p, xreg, ureg)
        st0 = (st0_out, xreg, ureg)

        def bw_bad(out):
            return out[3][3] > 0.5                           # scal row 3

        def bw_cond(st):
            out, xr, _ = st
            return jnp.any(bw_bad(out) & (xr < S.reg_max))

        def bw_body(st):
            out, xr, ur = st
            pred = bw_bad(out) & (xr < S.reg_max)            # (Bp,)
            xr_n = jnp.minimum(xr * S.reg_inc, S.reg_max)
            out_n = bw_call(gn_p, dyn_p, LxT_p, LxxT_p, fsN_p, xr_n, xr_n)

            def sel(new, old):
                p = pred.reshape((1,) * (new.ndim - 1) + (-1,))
                return jnp.where(p, new, old)
            out_m = tuple(sel(n, o) for n, o in zip(out_n, out))
            return (out_m, jnp.where(pred, xr_n, xr),
                    jnp.where(pred, xr_n, ur))

        (K_f, kff_f, w_f, scal), xreg, ureg = jax.lax.while_loop(
            bw_cond, bw_body, st0)
        dg, dq, stop_new = scal[0], scal[1], scal[2]
        bw_badf = scal[3] > 0.5

        # line-search rollout (all alphas, packed)
        plan = jnp.concatenate(
            [xs_p[:N], us_p, K_f, kff_f, pad_rows(fs[1:], sx)], axis=1)
        glob = _pack_glob(x0_p[:nx], (1.0 - gapw)[None],
                          refT_rows)
        xs_f, us_f, cost_f = _rollout_core(
            refs_p, plan, glob, calc=knot.calc, term_calc=knot.term_calc,
            ref_meta=ref_meta, nx=nx, nu=nu, N=N, A=A, Bt=Bt,
            u_lb=knot.u_lb, u_ub=knot.u_ub, use_box=S.use_box,
            interpret=interpret)
        xs_t4 = xs_f[:, :nx * A, :].reshape(Np1, nx, A, Bp)
        us_t4 = us_f[:, :nu * A, :].reshape(N, nu, A, Bp)
        cost_tries = cost_f[:A]                              # (A, Bp)

        # acceptance (identical formulas to fddp.accept_alpha)
        dx = xs_p[:, :nx, None, :] - xs_t4                   # (N+1,nx,A,Bp)
        dv = -jnp.einsum("tib,tiab->ab", w_f[:, :nx, :], dx)  # (A, Bp)
        dV = cost_cur[None] - cost_tries
        d1 = dg[None] + dv
        d2 = dq[None] - 2.0 * dv
        dVexp = alphas_col * (d1 + 0.5 * alphas_col * d2)
        finite = jnp.isfinite(cost_tries)
        cost_guard = S.neg_step_cost_factor * cost_cur + S.neg_step_cost_slack
        ok_pos = (dVexp >= 0) & (
            ((jnp.abs(d1) < S.th_grad) & (cost_tries < cost_guard[None]))
            | (dV > S.th_acceptstep * dVexp))
        ok_neg = ((dVexp < 0) & (dV > S.th_acceptnegstep * dVexp)
                  & (cost_tries < cost_guard[None]))
        ok = finite & (ok_pos | ok_neg)                      # (A, Bp)

        accepted = jnp.any(ok, axis=0)                       # (Bp,)
        first = ok & (jnp.cumsum(ok.astype(jnp.int32), axis=0) == 1)
        onehot = first.astype(dtype)
        alpha_f = jnp.sum(onehot * alphas_col, axis=0)
        # selection by masked sum, NOT onehot-weighted sum: rejected alpha
        # rollouts can carry inf/nan (diverging step lengths) and
        # 0 * nan = nan would contaminate the selected trajectory — the
        # vmap path's gather never touches unselected alphas
        cost_sel = jnp.sum(jnp.where(first, cost_tries, 0.0), axis=0)
        m4 = first[None, None, :, :]
        xs_sel = jnp.sum(jnp.where(m4, xs_t4, 0.0), axis=2)
        us_sel = jnp.sum(jnp.where(m4, us_t4, 0.0), axis=2)

        acc_b = accepted[None, None, :]
        xs_new = xs_p.at[:, :nx, :].set(
            jnp.where(acc_b, xs_sel, xs_p[:, :nx, :]))
        us_new = us_p.at[:, :nu, :].set(
            jnp.where(acc_b, us_sel, us_p[:, :nu, :]))
        cost_new = jnp.where(accepted, cost_sel, cost_cur)
        feasible_new = feasible | (accepted & (alpha_f >= 1.0 - 1e-12))

        dec = accepted & (alpha_f > S.th_stepdec)
        inc = (~accepted) | (alpha_f <= S.th_stepinc)
        xreg_new = jnp.where(dec, jnp.maximum(xreg / S.reg_dec, S.reg_min),
                             xreg)
        xreg_new = jnp.where(inc, jnp.minimum(xreg_new * S.reg_inc,
                                              S.reg_max), xreg_new)
        diverged_new = ((inc & (xreg >= S.reg_max))
                        | (bw_badf & (xreg >= S.reg_max)))
        converged_new = feasible_new & (stop_new < S.th_stop)

        return (xs_new, us_new, cost_new, feasible_new, xreg_new, xreg_new,
                it + 1, converged_new, diverged_new, K_f, kff_f, stop_new)

    reg_start = (jnp.full((Bp,), S.reg_init, dtype) if reg0 is None
                 else jnp.clip(pad_b(jnp.asarray(reg0, dtype)),
                               S.reg_min, 1e4))
    c0 = (xs_p0, us_p0,
          jnp.full((Bp,), jnp.inf, dtype),                   # cost
          jnp.zeros((Bp,), bool),                            # feasible
          reg_start, reg_start,
          jnp.zeros((Bp,), jnp.int32),                       # it
          jnp.zeros((Bp,), bool), jnp.zeros((Bp,), bool),    # conv/div
          jnp.zeros((N, pK, Bp), dtype),                     # K
          jnp.zeros((N, su, Bp), dtype),                     # kff
          jnp.full((Bp,), jnp.inf, dtype))                   # stop

    def live(c):
        return (c[6] < S.max_iters) & (~c[7]) & (~c[8])

    def loop_body(c):
        pred = live(c)                                       # (Bp,)
        c_new = iteration(c)

        def sel(new, old):
            p = pred.reshape((1,) * (new.ndim - 1) + (-1,))
            return jnp.where(p, new, old)
        return tuple(sel(n, o) for n, o in zip(c_new, c))

    cF = jax.lax.while_loop(lambda c: jnp.any(live(c)), loop_body, c0)
    (xs_p, us_p, cost, feasible, xreg, ureg, it, converged, diverged,
     K_p, kff_p, stop) = cF

    # ---------------- unpack (exit only) --------------------------------
    xs = jnp.moveaxis(xs_p[:, :nx, :], -1, 0)[:B]            # (B, N+1, nx)
    us = jnp.moveaxis(us_p[:, :nu, :], -1, 0)[:B]
    K = jnp.moveaxis(K_p[:, :nu * nx, :], -1, 0)[:B].reshape(B, N, nu, nx)
    kff = jnp.moveaxis(kff_p[:, :nu, :], -1, 0)[:B]
    return FDDPResult(
        xs=xs, us=us, K=K, k=kff,
        cost=cost[:B], stop=stop[:B], iters=it[:B],
        converged=converged[:B], diverged=diverged[:B],
        feasible=feasible[:B], xreg=xreg[:B])
