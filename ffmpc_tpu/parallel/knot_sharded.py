"""Knot-axis (horizon) sharded Riccati backward sweep.

The sequence-parallel mode named by BASELINE.md ("per-knot Riccati/QP
blocks reduced via ICI collectives"): the associative-scan Riccati
(solver/riccati_scan.py) distributed over a device mesh axis that shards
the KNOT dimension.  Each device runs the suffix scan over its local chunk
of knots, the per-chunk aggregate elements are exchanged with one
``all_gather`` (P elements of ~3 nx^2 floats — trivial ICI traffic), every
device folds in the aggregates of the chunks after it, and local prefixes
are patched.  Depth: O(log n_local) + O(P) tiny combines instead of O(N)
sequential knot steps.

This is the distributed counterpart of ``parallel_riccati`` — exact for the
unconstrained Gauss-Newton subproblem including feasibility-gap affine
terms; tests pin sharded == single-device to float tolerance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver.riccati_scan import (_Elem, _combine, _suffix_scan,
                                   equilibration_scale, equilibrate_inputs)


def _identity_elem(nx: int, n: int, dtype) -> _Elem:
    I = jnp.broadcast_to(jnp.eye(nx, dtype=dtype), (n, nx, nx))
    Z = jnp.zeros((n, nx, nx), dtype)
    z = jnp.zeros((n, nx), dtype)
    return _Elem(A=I, b=z, C=Z, eta=z, J=Z)


def _leaves(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next, ureg):
    """Per-knot conditional-value elements (u eliminated); local math."""
    nu = Fu.shape[-1]
    Luu_r = Luu + ureg * jnp.eye(nu, dtype=Fx.dtype)
    Luu_chol = jnp.linalg.cholesky(Luu_r)
    solve_u = jax.vmap(lambda L, r: jax.scipy.linalg.cho_solve((L, True), r))
    iLu = solve_u(Luu_chol, Lu)
    iLxu = solve_u(Luu_chol, jnp.swapaxes(Lxu, -1, -2))
    iFu = solve_u(Luu_chol, jnp.swapaxes(Fu, -1, -2))
    A = Fx - jnp.einsum("tiu,tuj->tij", Fu, iLxu)
    b = fs_next - jnp.einsum("tiu,tu->ti", Fu, iLu)
    C = jnp.einsum("tiu,tuj->tij", Fu, iFu)
    eta = -(Lx - jnp.einsum("tiu,tu->ti", Lxu, iLu))
    J = Lxx - jnp.einsum("tiu,tuj->tij", Lxu, iLxu)
    return _Elem(A, b, C, eta, J)


def knot_sharded_riccati(mesh: Mesh, Fx, Fu, Lx, Lu, Lxx, Lxu, Luu,
                         fs_next, LxT, LxxT, ureg: float = 0.0,
                         axis: str = "knot"):
    """Distributed-backward gains: returns (K, kff), knot-sharded.

    Inputs: per-knot arrays with leading dim N (divisible by the mesh axis
    size), terminal (LxT, LxxT) replicated.  Call from the host; shard_map
    and the collective layout live inside.
    """
    nproc = mesh.shape[axis]
    N, nx = Fx.shape[0], Fx.shape[-1]
    assert N % nproc == 0, (N, nproc)
    dtype = Fx.dtype

    # diagonal state equilibration (riccati_scan.equilibration_scale): the
    # combine's solves otherwise lose most of the f32 mantissa on the
    # stiff-contact flagship curvatures.  Computed from the global arrays
    # (host level, before sharding) so every shard sees the same D.
    D, Di = equilibration_scale(Lxx, LxxT)
    (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next, LxT, LxxT) = \
        equilibrate_inputs(D, Di, Fx, Fu, Lx, Lu, Lxx, Lxu, Luu,
                           fs_next, LxT, LxxT)

    sh_knot = NamedSharding(mesh, P(axis))
    sh_rep = NamedSharding(mesh, P())

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis),) * 8 + (P(), P()),
             out_specs=(P(axis), P(axis)))
    def run(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next, LxT, LxxT):
        n_local = Fx.shape[0]
        elems = _leaves(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next, ureg)
        local = _suffix_scan(elems)                 # local[k] spans [k, b)
        chunk_total = jax.tree.map(lambda a: a[0], local)

        # exchange per-chunk aggregates; fold in every chunk after mine,
        # then the terminal element
        totals = jax.lax.all_gather(chunk_total, axis)   # (P, ...)
        idx = jax.lax.axis_index(axis)
        acc = jax.tree.map(lambda a: a[0], _identity_elem(nx, 1, dtype))
        for j in range(1, nproc):
            t_j = jax.tree.map(lambda a: a[j], totals)
            folded = _combine(acc, t_j)
            take = j > idx
            acc = jax.tree.map(
                lambda f, a: jnp.where(take, f, a), folded, acc)
        e_T = _Elem(A=jnp.zeros((nx, nx), dtype), b=jnp.zeros(nx, dtype),
                    C=jnp.zeros((nx, nx), dtype), eta=-LxT, J=LxxT)
        suffix_after = _combine(acc, e_T)            # spans [b, N]

        # patch local suffixes: full[k] spans [k, N]
        full = jax.vmap(lambda e: _combine(e, suffix_after))(local)
        Vx_loc = -full.eta                           # V at local knots
        Vxx_loc = full.J
        # V at knot k+1: shift; the last local knot's successor is the
        # suffix aggregate itself
        Vx1 = jnp.concatenate([Vx_loc[1:], (-suffix_after.eta)[None]], axis=0)
        Vxx1 = jnp.concatenate([Vxx_loc[1:], suffix_after.J[None]], axis=0)

        nu = Fu.shape[-1]
        Qu = Lu + jnp.einsum("tiu,ti->tu", Fu,
                             Vx1 + jnp.einsum("tij,tj->ti", Vxx1, fs_next))
        Qxu = Lxu + jnp.einsum("tik,tkl,tlu->tiu",
                               jnp.swapaxes(Fx, -1, -2), Vxx1, Fu)
        Quu = (Luu + ureg * jnp.eye(nu, dtype=dtype)[None]
               + jnp.einsum("tiu,tij,tjv->tuv", Fu, Vxx1, Fu))
        ch = jnp.linalg.cholesky(Quu)
        k = jax.vmap(lambda L, r: jax.scipy.linalg.cho_solve((L, True), r))(ch, Qu)
        K = jax.vmap(lambda L, r: jax.scipy.linalg.cho_solve((L, True), r))(
            ch, jnp.swapaxes(Qxu, -1, -2))
        return K, k

    put = lambda a: jax.device_put(a, sh_knot)
    rep = lambda a: jax.device_put(a, sh_rep)
    K, k = run(put(Fx), put(Fu), put(Lx), put(Lu), put(Lxx), put(Lxu),
               put(Luu), put(fs_next), rep(LxT), rep(LxxT))
    # undo the equilibration: u = -k - K~ dx~ = -k - (K~ D) dx
    return K * D[None, None, :], k


def knot_sharded_riccati_box(mesh: Mesh, Fx, Fu, Lx, Lu, Lxx, Lxu, Luu,
                             fs_next, LxT, LxxT, lb, ub, ureg: float = 0.0,
                             boxqp_iters: int = 8, refinements: int = 1,
                             axis: str = "knot"):
    """Distributed BOX-constrained backward: the frozen-active-set
    refinement of ``riccati_scan.parallel_riccati_box`` with every value
    sweep running as the knot-sharded suffix scan + all_gather reduction.

    This is the sharded counterpart of the SHIPPED solver semantics
    (BoxFDDP — reference crocoddyl SolverBoxFDDP,
    src/mpc/crocoddyl_classical.py:442-445): control clamping is preserved
    across the distributed sweep instead of silently dropped (VERDICT r3
    item 4).  lb/ub: (N, nu) bounds RELATIVE to the nominal controls.
    Per refinement round: a sharded masked value sweep, then per-knot
    box-QPs run locally on each shard's knots.  Returns (K, kff),
    knot-sharded, with clamped gain rows zeroed.
    """
    from ..solver.boxqp import boxqp, _masked_solve

    nproc = mesh.shape[axis]
    N, nx = Fx.shape[0], Fx.shape[-1]
    nu = Fu.shape[-1]
    assert N % nproc == 0, (N, nproc)
    dtype = Fx.dtype

    # u-space quantities (kff, lb/ub, Quu) are invariant under the state
    # equilibration; K transforms as K~ D (undone on return).
    D, Di = equilibration_scale(Lxx, LxxT)
    (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next, LxT, LxxT) = \
        equilibrate_inputs(D, Di, Fx, Fu, Lx, Lu, Lxx, Lxu, Luu,
                           fs_next, LxT, LxxT)

    sh_knot = NamedSharding(mesh, P(axis))
    sh_rep = NamedSharding(mesh, P())

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis),) * 10 + (P(), P()),
             out_specs=(P(axis), P(axis)))
    def run(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_next, lb, ub, LxT, LxxT):
        eyeu = jnp.eye(nu, dtype=dtype)
        Luu_r = Luu + ureg * eyeu
        vs_vec = jax.vmap(_masked_solve, in_axes=(0, 0, 0, None))
        idx = jax.lax.axis_index(axis)

        def sweep(m, s):
            """Sharded masked value sweep: returns the local knots'
            (Vx1, Vxx1) — the successor-knot value quadratics, gap-deflected
            by the caller."""
            Lu_eff = Lu + jnp.einsum("tuv,tv->tu", Luu_r, s)
            Lx_eff = Lx + jnp.einsum("tiu,tu->ti", Lxu, s)
            fs_eff = fs_next + jnp.einsum("tiu,tu->ti", Fu, s)

            iLu = vs_vec(Luu_r, Lu_eff, m, 1e-12)
            iLxu = vs_vec(Luu_r, jnp.swapaxes(Lxu, -1, -2), m, 1e-12)
            iFu = vs_vec(Luu_r, jnp.swapaxes(Fu, -1, -2), m, 1e-12)

            elems = _Elem(
                A=Fx - jnp.einsum("tiu,tuj->tij", Fu, iLxu),
                b=fs_eff - jnp.einsum("tiu,tu->ti", Fu, iLu),
                C=jnp.einsum("tiu,tuj->tij", Fu, iFu),
                eta=-(Lx_eff - jnp.einsum("tiu,tu->ti", Lxu, iLu)),
                J=Lxx - jnp.einsum("tiu,tuj->tij", Lxu, iLxu))
            local = _suffix_scan(elems)
            chunk_total = jax.tree.map(lambda a: a[0], local)
            totals = jax.lax.all_gather(chunk_total, axis)
            acc = jax.tree.map(lambda a: a[0],
                               _identity_elem(nx, 1, dtype))
            for j in range(1, nproc):
                t_j = jax.tree.map(lambda a: a[j], totals)
                folded = _combine(acc, t_j)
                take = j > idx
                acc = jax.tree.map(
                    lambda f, a: jnp.where(take, f, a), folded, acc)
            e_T = _Elem(A=jnp.zeros((nx, nx), dtype),
                        b=jnp.zeros(nx, dtype),
                        C=jnp.zeros((nx, nx), dtype), eta=-LxT, J=LxxT)
            suffix_after = _combine(acc, e_T)
            full = jax.vmap(lambda e: _combine(e, suffix_after))(local)
            Vx_loc = -full.eta
            Vxx_loc = full.J
            Vx1 = jnp.concatenate(
                [Vx_loc[1:], (-suffix_after.eta)[None]], axis=0)
            Vxx1 = jnp.concatenate(
                [Vxx_loc[1:], suffix_after.J[None]], axis=0)
            return Vx1, Vxx1

        def local_qp(Vx1, Vxx1, x0):
            Vp = Vx1 + jnp.einsum("tij,tj->ti", Vxx1, fs_next)
            Qu = Lu + jnp.einsum("tiu,ti->tu", Fu, Vp)
            Qxu = Lxu + jnp.einsum("tik,tkl,tlu->tiu",
                                   jnp.swapaxes(Fx, -1, -2), Vxx1, Fu)
            Quu = Luu_r + jnp.einsum("tiu,tij,tjv->tuv", Fu, Vxx1, Fu)
            sol = jax.vmap(lambda Q, q, l, u, x: boxqp(
                Q, q, l, u, x, iters=boxqp_iters))(Quu, Qu, lb, ub, x0)
            return sol, Qxu, Quu

        n_local = Fx.shape[0]
        m = jnp.ones((n_local, nu), bool)
        s = jnp.zeros((n_local, nu), dtype)
        x_prev = jnp.zeros((n_local, nu), dtype)
        for _ in range(refinements + 1):
            Vx1, Vxx1 = sweep(m, s)
            sol, Qxu, Quu = local_qp(Vx1, Vxx1, x_prev)
            m = sol.free
            s = jnp.where(m, 0.0, sol.x)
            x_prev = sol.x

        kff = -sol.x
        K = vs_vec(Quu, jnp.swapaxes(Qxu, -1, -2)
                   * m.astype(dtype)[:, :, None], m, 1e-12)
        return K, kff

    put = lambda a: jax.device_put(a, sh_knot)
    rep = lambda a: jax.device_put(a, sh_rep)
    K, kff = run(put(Fx), put(Fu), put(Lx), put(Lu), put(Lxx), put(Lxu),
                 put(Luu), put(fs_next), put(jnp.asarray(lb, dtype)),
                 put(jnp.asarray(ub, dtype)), rep(LxT), rep(LxxT))
    return K * D[None, None, :], kff
