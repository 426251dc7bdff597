"""Parallel-in-time Riccati backward sweep via associative scan.

The sequential DDP backward pass is a composition of per-knot value-function
updates; for affine dynamics with quadratic cost those updates form an
associative monoid, so the whole sweep runs in O(log N) depth with
``jax.lax.associative_scan`` (Sarkka & Garcia-Fernandez, "Temporal
Parallelization of Bayesian Smoothers"/LQT parallelization, 2021).  On TPU
the scan's combine steps lower to batched small matmuls and, when the knot
axis is sharded over a mesh, the reduction rides ICI collectives — the
long-horizon mode called for by the project brief (SURVEY.md section 5,
"long-context" analog).

Scope: exact for the unconstrained (no control-bound) Gauss-Newton
subproblem that FDDP solves each iteration around the current trajectory,
including feasibility-gap affine terms.  For BoxFDDP, whose clamped
per-knot QP makes the exact backward sequential, ``parallel_riccati_box``
runs a frozen-active-set refinement: an unconstrained parallel sweep
proposes active sets via per-knot box-QPs (all knots concurrently), then
the sweep repeats with clamped control components frozen as affine
offsets.  When no bounds are active it coincides with the exact sweep in
one pass; with active bounds it converges to the sequential active-set
solution as refinements increase (tests pin both behaviors).

Element parameterization (conditional value function between knots):
    V(x_t | x_s) realized by (A, b, C, eta, J):
      x_s* = A x_t + b + C * (dual),   value ~ 0.5 x^T J x - eta^T x
with the standard combine rule; leaves eliminate u via the per-knot QP.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class _Elem(NamedTuple):
    A: jnp.ndarray    # (N, nx, nx)
    b: jnp.ndarray    # (N, nx)
    C: jnp.ndarray    # (N, nx, nx)
    eta: jnp.ndarray  # (N, nx)
    J: jnp.ndarray    # (N, nx, nx)


def equilibration_scale(Lxx, LxxT):
    """Diagonal state-space scaling D for the parallel value recursion.

    The flagship augmented OCP mixes cost curvatures across ~7 decades
    (contact tangent ~3e4 vs tau-channel ~1e-3 on the diagonal of Lxx):
    the combine's (I + C J) solves then mix entries of wildly different
    magnitude and lose most of the f32 mantissa (measured: max|K| error
    0.49 plain vs 0.05 equilibrated vs 0.08 for the sequential f32 sweep
    on the gate problem).  Working in x~ = D x with D_i ~ sqrt(typ
    diag(Lxx)_i) (unit geometric mean so the overall scale is unchanged)
    equilibrates J and C and restores sequential-sweep accuracy.  The
    transform is exact (undone on the outputs); only float roundoff
    changes.
    """
    diag = jnp.mean(jnp.diagonal(Lxx, axis1=-2, axis2=-1), axis=0) + \
        jnp.diagonal(LxxT)
    D = jnp.sqrt(jnp.maximum(diag, 1e-8))
    D = D / jnp.exp(jnp.mean(jnp.log(D)))
    return D, 1.0 / D


def equilibrate_inputs(D, Di, Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next,
                       LxT, LxxT):
    """Transform per-knot GN blocks into the scaled state space x~ = D x."""
    return (D[:, None] * Fx * Di[None, :], D[:, None] * Fu,
            Di * Lx, Lu, Di[:, None] * Lxx * Di[None, :],
            Di[:, None] * Lxu, Luu, D * fs_next,
            Di * LxT, Di[:, None] * LxxT * Di[None, :])


def _combine(e1: _Elem, e2: _Elem) -> _Elem:
    """Associative combination of conditional-value elements.

    e1 spans [s, m), e2 spans [m, t): result spans [s, t).
    (Equations (54)-(58) of Sarkka & Garcia-Fernandez 2021.)
    """
    nx = e1.A.shape[-1]
    I = jnp.eye(nx, dtype=e1.A.dtype)
    # solve (I + C1 J2) X = ... batched
    M = I + jnp.einsum("...ij,...jk->...ik", e1.C, e2.J)
    Minv_A1 = jnp.linalg.solve(M, e1.A)
    Minv_bC = jnp.linalg.solve(
        M, (e1.b + jnp.einsum("...ij,...j->...i", e1.C, e2.eta))[..., None])[..., 0]
    Minv_C1 = jnp.linalg.solve(M, e1.C)

    Mt = I + jnp.einsum("...ij,...jk->...ik", e2.J, e1.C)
    Mt_inv_term = jnp.linalg.solve(
        Mt, (e2.eta - jnp.einsum("...ij,...j->...i", e2.J, e1.b))[..., None])[..., 0]
    Mt_inv_J2A1 = jnp.linalg.solve(Mt, jnp.einsum("...ij,...jk->...ik", e2.J, e1.A))

    A = jnp.einsum("...ij,...jk->...ik", e2.A, Minv_A1)
    b = jnp.einsum("...ij,...j->...i", e2.A, Minv_bC) + e2.b
    C = jnp.einsum("...ij,...jk,...lk->...il", e2.A, Minv_C1, e2.A) + e2.C
    eta = jnp.einsum("...ji,...j->...i", e1.A, Mt_inv_term) + e1.eta
    J = jnp.einsum("...ji,...jk->...ik", e1.A, Mt_inv_J2A1) + e1.J
    return _Elem(A, b, C, eta, J)


def _suffix_scan(elems: _Elem) -> _Elem:
    """Reverse associative scan: result[t] spans [t, N].  With reverse=True
    jax feeds operands as (later, earlier), so flip them into _combine's
    (earlier, later) convention."""
    return jax.lax.associative_scan(lambda a, b: _combine(b, a), elems,
                                    reverse=True)


def parallel_riccati(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next, LxT, LxxT,
                     ureg: float = 0.0, equilibrate: bool = True):
    """All-knot value functions + gains in O(log N) depth.

    Inputs are per-knot arrays with leading dim N (as produced by the
    solver's vmapped calcDiff), fs_next = gaps fs[1:], terminal (LxT, LxxT).

    Returns (K, k, Vx, Vxx) with the same conventions as the sequential
    sweep: u_try = u_nom - alpha*k - K (x - x_nom); Vx/Vxx include the gap
    deflection Vx_t += Vxx_t fs_t is NOT applied here (the caller handles
    deflection, as in the sequential path).

    ``equilibrate`` (default on) runs the scan in a diagonally-rescaled
    state space (see ``equilibration_scale``) — required for f32 accuracy
    on the stiff-contact flagship problem, exact up to roundoff.
    """
    if equilibrate:
        D, Di = equilibration_scale(Lxx, LxxT)
        (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next, LxT, LxxT) = \
            equilibrate_inputs(D, Di, Fx, Fu, Lx, Lu, Lxx, Lxu, Luu,
                               fs_next, LxT, LxxT)
        K, k, Vx, Vxx = parallel_riccati(
            Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next, LxT, LxxT,
            ureg=ureg, equilibrate=False)
        # x~ = D x, V(x) = V~(Dx):  Vx = D Vx~,  Vxx = D Vxx~ D,  K = K~ D
        return (K * D[None, None, :], k, Vx * D[None, :],
                D[None, :, None] * Vxx * D[None, None, :])
    N, nx = Fx.shape[0], Fx.shape[-1]
    nu = Fu.shape[-1]
    dtype = Fx.dtype
    eyeu = jnp.eye(nu, dtype=dtype)

    # leaf elements: eliminate u from the per-knot quadratic
    Luu_r = Luu + ureg * eyeu
    Luu_chol = jnp.linalg.cholesky(Luu_r)

    def solve_u(rhs):
        return jax.vmap(lambda L, r: jax.scipy.linalg.cho_solve((L, True), r))(
            Luu_chol, rhs)

    Kuu_inv_Lu = solve_u(Lu)                       # (N, nu)
    Kuu_inv_Lxu = solve_u(jnp.swapaxes(Lxu, -1, -2))  # (N, nu, nx)
    Kuu_inv_Fu = solve_u(jnp.swapaxes(Fu, -1, -2))    # (N, nu, nx)

    # A = Fx - Fu Luu^-1 Lxu^T ; affine term carries the gap + feedforward
    A = Fx - jnp.einsum("...iu,...uj->...ij", Fu, Kuu_inv_Lxu)
    b = fs_next - jnp.einsum("...iu,...u->...i", Fu, Kuu_inv_Lu)
    C = jnp.einsum("...iu,...uj->...ij", Fu, Kuu_inv_Fu)
    eta = -(Lx - jnp.einsum("...iu,...u->...i", Lxu, Kuu_inv_Lu))
    J = Lxx - jnp.einsum("...iu,...uj->...ij", Lxu, Kuu_inv_Lxu)

    # terminal element
    A_T = jnp.zeros((1, nx, nx), dtype)
    b_T = jnp.zeros((1, nx), dtype)
    C_T = jnp.zeros((1, nx, nx), dtype)
    eta_T = -LxT[None]
    J_T = LxxT[None]

    elems = _Elem(
        A=jnp.concatenate([A, A_T], axis=0),
        b=jnp.concatenate([b, b_T], axis=0),
        C=jnp.concatenate([C, C_T], axis=0),
        eta=jnp.concatenate([eta, eta_T], axis=0),
        J=jnp.concatenate([J, J_T], axis=0),
    )

    acc = _suffix_scan(elems)
    Vx = -acc.eta          # (N+1, nx): gradient of value at each knot
    Vxx = acc.J            # (N+1, nx, nx)

    # gains from the (gap-deflected) V_{t+1}
    Vx1, Vxx1 = Vx[1:], Vxx[1:]
    Qu = Lu + jnp.einsum("...iu,...i->...u", Fu,
                         Vx1 + jnp.einsum("...ij,...j->...i", Vxx1, fs_next))
    Qxu = Lxu + jnp.einsum("...ik,...kl,...lu->...iu", jnp.swapaxes(Fx, -1, -2), Vxx1, Fu)
    Quu = Luu_r + jnp.einsum("...iu,...ij,...jv->...uv", Fu, Vxx1, Fu)

    Quu_chol = jnp.linalg.cholesky(Quu)
    k = jax.vmap(lambda L, r: jax.scipy.linalg.cho_solve((L, True), r))(Quu_chol, Qu)
    K = jax.vmap(lambda L, r: jax.scipy.linalg.cho_solve((L, True), r))(
        Quu_chol, jnp.swapaxes(Qxu, -1, -2))
    return K, k, Vx, Vxx


def parallel_riccati_box(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next, LxT, LxxT,
                         lb, ub, ureg: float = 0.0, boxqp_iters: int = 8,
                         refinements: int = 1, equilibrate: bool = True):
    """Box-constrained parallel backward: frozen-active-set refinement.

    lb/ub: per-knot (N, nu) control bounds RELATIVE to the nominal control
    (the box-QP solves for the control delta, as in the sequential BoxFDDP
    backward).  Returns (K, kff, Vx, Vxx, Qu, Quu) with the sequential-path
    conventions (u_try = u_nom - alpha*kff - K dx; K rows of clamped
    components are zero).

    Each refinement round: (1) parallel value sweep with the currently
    clamped control components frozen as affine offsets, (2) per-knot
    box-QPs against the resulting local quadratics — all N knots run their
    QPs concurrently, which is what makes the backward parallelizable at
    all.  Round 0 starts all-free, so bound-free problems finish exactly in
    one round.
    """
    from .boxqp import boxqp, _masked_solve

    if equilibrate:
        # u-space quantities (kff, Qu, Quu, lb/ub) are invariant under the
        # state rescaling; K/Vx/Vxx transform as in parallel_riccati.
        D, Di = equilibration_scale(Lxx, LxxT)
        (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next, LxT, LxxT) = \
            equilibrate_inputs(D, Di, Fx, Fu, Lx, Lu, Lxx, Lxu, Luu,
                               fs_next, LxT, LxxT)
        K, kff, Vx, Vxx, Qu, Quu = parallel_riccati_box(
            Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next, LxT, LxxT, lb, ub,
            ureg=ureg, boxqp_iters=boxqp_iters, refinements=refinements,
            equilibrate=False)
        return (K * D[None, None, :], kff, Vx * D[None, :],
                D[None, :, None] * Vxx * D[None, None, :], Qu, Quu)

    N, nx = Fx.shape[0], Fx.shape[-1]
    nu = Fu.shape[-1]
    dtype = Fx.dtype
    eyeu = jnp.eye(nu, dtype=dtype)
    Luu_r = Luu + ureg * eyeu

    vs_vec = jax.vmap(_masked_solve, in_axes=(0, 0, 0, None))

    A_T = jnp.zeros((1, nx, nx), dtype)
    b_T = jnp.zeros((1, nx), dtype)
    C_T = jnp.zeros((1, nx, nx), dtype)
    eta_T = -LxT[None]
    J_T = LxxT[None]

    def sweep(m, s):
        """One masked parallel value sweep.

        m: (N, nu) free mask; s: (N, nu) frozen control delta on clamped
        components (zero on free ones).
        """
        Lu_eff = Lu + jnp.einsum("tuv,tv->tu", Luu_r, s)
        Lx_eff = Lx + jnp.einsum("tiu,tu->ti", Lxu, s)
        fs_eff = fs_next + jnp.einsum("tiu,tu->ti", Fu, s)

        iLu = vs_vec(Luu_r, Lu_eff, m, 1e-12)                    # (N, nu)
        iLxu = vs_vec(Luu_r, jnp.swapaxes(Lxu, -1, -2), m, 1e-12)  # (N, nu, nx)
        iFu = vs_vec(Luu_r, jnp.swapaxes(Fu, -1, -2), m, 1e-12)    # (N, nu, nx)

        A = Fx - jnp.einsum("tiu,tuj->tij", Fu, iLxu)
        b = fs_eff - jnp.einsum("tiu,tu->ti", Fu, iLu)
        C = jnp.einsum("tiu,tuj->tij", Fu, iFu)
        eta = -(Lx_eff - jnp.einsum("tiu,tu->ti", Lxu, iLu))
        J = Lxx - jnp.einsum("tiu,tuj->tij", Lxu, iLxu)

        elems = _Elem(
            A=jnp.concatenate([A, A_T], axis=0),
            b=jnp.concatenate([b, b_T], axis=0),
            C=jnp.concatenate([C, C_T], axis=0),
            eta=jnp.concatenate([eta, eta_T], axis=0),
            J=jnp.concatenate([J, J_T], axis=0),
        )
        acc = _suffix_scan(elems)
        return -acc.eta, acc.J            # Vx, Vxx at all N+1 knots

    def local_qp(Vx, Vxx, x0):
        """Per-knot box-QP against the (gap-deflected) V' quadratics."""
        Vx1 = Vx[1:] + jnp.einsum("tij,tj->ti", Vxx[1:], fs_next)
        Qu = Lu + jnp.einsum("tiu,ti->tu", Fu, Vx1)
        Qxu = Lxu + jnp.einsum("tik,tkl,tlu->tiu",
                               jnp.swapaxes(Fx, -1, -2), Vxx[1:], Fu)
        Quu = Luu_r + jnp.einsum("tiu,tij,tjv->tuv", Fu, Vxx[1:], Fu)
        sol = jax.vmap(lambda Q, q, l, u, x: boxqp(Q, q, l, u, x,
                                                   iters=boxqp_iters))(
            Quu, Qu, lb, ub, x0)
        return sol, Qu, Qxu, Quu

    m = jnp.ones((N, nu), bool)
    s = jnp.zeros((N, nu), dtype)
    x_prev = jnp.zeros((N, nu), dtype)
    for _ in range(refinements + 1):
        Vx, Vxx = sweep(m, s)
        sol, Qu, Qxu, Quu = local_qp(Vx, Vxx, x_prev)
        m = sol.free
        s = jnp.where(m, 0.0, sol.x)
        x_prev = sol.x

    kff = -sol.x
    K = vs_vec(Quu, jnp.swapaxes(Qxu, -1, -2)
               * m.astype(dtype)[:, :, None], m, 1e-12)
    return K, kff, Vx, Vxx, Qu, Quu
