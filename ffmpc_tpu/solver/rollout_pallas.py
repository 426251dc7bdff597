"""Fused Pallas TPU kernel for the FDDP line-search rollout.

The forward pass — for every step length alpha: the policy update
u = u_nom - alpha*k - K dx, the control clip, the full knot dynamics+cost
(``knot.calc``) and the gap-keeping state update — fused into ONE kernel
launch for the whole N-knot horizon and ALL alphas, instead of the
XLA scan's hundreds of fusion launches per knot step.

Layout: channels on sublanes, (alpha, batch-tile) on the (sublane, lane)
grid of each channel: every logical scalar of the knot chain is an
(n_alphas, 128) block.  The scalar-channel knot calc
(``ocp.scalar_knot``) is reused VERBATIM inside the kernel — its ops are
plain jnp on channel-indexable arrays, which Mosaic lowers like any
kernel body.  Per-knot operands (trajectory refs, nominal plan, gains,
gaps) stream HBM -> VMEM inside the knot loop.

Integration mirrors backward_pallas: a ``custom_vmap`` function — the
plain per-problem alpha-vmapped scan unbatched, the kernel under
``jax.vmap`` (the batched-solve path) — behind
``FDDPSettings.rollout_mode="pallas"`` (requires calc_mode="scalar"
knots, the TPU default).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad8(n: int) -> int:
    """DMA slice shapes must be sublane-aligned (multiples of 8 for f32)."""
    return ((n + 7) // 8) * 8


def _leaf_sizes(tree):
    leaves, treedef = jax.tree.flatten(tree)
    shapes = [l.shape for l in leaves]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    return leaves, treedef, shapes, sizes


from .platform import resolve_interpret as _resolve_interpret


def _plan_offsets(nx, nu):
    """Row offsets of the plan stream (N, C_plan, Bp): x_nom, u_nom, K,
    kff, fs_next — all 8-aligned so the K region can be DMA'd/read
    directly from the backward kernel's packed output."""
    sx, su, pK = _pad8(nx), _pad8(nu), _pad8(nu * nx)
    o_xs = 0
    o_us = sx
    o_K = sx + su
    o_kff = o_K + pK
    o_fs = o_kff + su
    return o_xs, o_us, o_K, o_kff, o_fs, o_fs + sx


def _rollout_kernel(refs_hbm, plan_hbm, glob_ref, xs_hbm, us_hbm, cost_ref,
                    scr_r, scr_p, xstage, ustage, sems, *,
                    calc, term_calc, ref_treedef, ref_shapes, ref_sizes,
                    refT_treedef, refT_shapes, refT_sizes,
                    nx, nu, N, A, Bt, alphas, u_lb, u_ub, use_box):
    dtype = glob_ref.dtype
    o_xs, o_us, o_K, o_kff, o_fs, _ = _plan_offsets(nx, nu)
    ib = pl.program_id(0)
    b0 = pl.multiple_of(ib * Bt, Bt)

    # ---- global block: x0 (nx), feasible (1), ref_T leaves ----
    x0 = glob_ref[0:nx, :]                           # (nx, Bt)
    feasible = glob_ref[nx:nx + 1, :]                # (1, Bt) 0/1 — keep
    off = nx + 1                                     # per-lane scalars 2-D
    refT_leaves = []
    for shp, size in zip(refT_shapes, refT_sizes):
        v = glob_ref[off:off + size, :]
        refT_leaves.append(v.reshape(shp + (Bt,)))
        off += size
    ref_T = jax.tree.unflatten(refT_treedef, refT_leaves)

    # alpha-dependent rows built per-alpha from float literals — pallas
    # kernels cannot materialize non-literal array constants
    one = 1.0 - feasible                                       # (1, Bt)
    gap_scale = jnp.concatenate(
        [one * (a - 1.0) for a in alphas], axis=0)             # (A, Bt)

    x = jnp.broadcast_to(x0[:, None, :], (nx, A, Bt))
    cost_acc = jnp.zeros((A, Bt), dtype)
    # zero the stage padding rows once (8-row-aligned DMA blocks)
    xstage[:, :] = jnp.zeros_like(xstage)
    ustage[:, :] = jnp.zeros_like(ustage)

    def unpack_knot(ref_arr, plan_arr):
        o = 0
        leaves = []
        for shp, size in zip(ref_shapes, ref_sizes):
            leaves.append(ref_arr[o:o + size, :].reshape(shp + (Bt,)))
            o += size
        ref = jax.tree.unflatten(ref_treedef, leaves)
        x_nom = plan_arr[o_xs:o_xs + nx, :]
        u_nom = plan_arr[o_us:o_us + nu, :]
        K = plan_arr[o_K:o_K + nu * nx, :].reshape(nu, nx, Bt)
        kff = plan_arr[o_kff:o_kff + nu, :]
        fs_next = plan_arr[o_fs:o_fs + nx, :]
        return ref, x_nom, u_nom, K, kff, fs_next

    # double-buffered input streaming (same pattern as the backward
    # kernel): knot t computes from buffer A while knot t+1 streams into
    # buffer B; the loop runs pairs so buffer bases / DMA semaphores
    # stay static
    CR = scr_r.shape[0] // 2
    CPl = scr_p.shape[0] // 2

    def start_in(t, base_r, base_p, sr, sp):
        pltpu.make_async_copy(
            refs_hbm.at[t, :, pl.ds(b0, Bt)],
            scr_r.at[pl.ds(base_r, CR)], sems.at[sr]).start()
        pltpu.make_async_copy(
            plan_hbm.at[t, :, pl.ds(b0, Bt)],
            scr_p.at[pl.ds(base_p, CPl)], sems.at[sp]).start()

    def wait_in(t, base_r, base_p, sr, sp):
        pltpu.make_async_copy(
            refs_hbm.at[t, :, pl.ds(b0, Bt)],
            scr_r.at[pl.ds(base_r, CR)], sems.at[sr]).wait()
        pltpu.make_async_copy(
            plan_hbm.at[t, :, pl.ds(b0, Bt)],
            scr_p.at[pl.ds(base_p, CPl)], sems.at[sp]).wait()

    def compute(t, carry, base_r, base_p):
        x, cost_acc = carry
        ref, x_nom, u_nom, K, kff, fs_next = unpack_knot(
            scr_r[base_r:base_r + CR, :], scr_p[base_p:base_p + CPl, :])

        # stash the pre-step state: xs_try[t] = x
        xstage[0:nx * A, :] = x.reshape(nx * A, Bt)
        cx = pltpu.make_async_copy(
            xstage, xs_hbm.at[t, :, pl.ds(b0, Bt)], sems.at[1])
        cx.start()

        dx = x - x_nom[:, None, :]                           # (nx, A, Bt)
        # K[:, i] via true slices — mixed int/None indexing lowers through
        # gather, which Mosaic supports only in 2D
        Kdx = sum(jax.lax.slice_in_dim(K, i, i + 1, axis=1)
                  * dx[i][None, :, :] for i in range(nx))
        # u[j, a, :] = u_nom[j] - alpha_a * kff[j] - Kdx[j, a]
        u = jnp.stack([
            jnp.stack([u_nom[j] - a * kff[j] - Kdx[j, ai]
                       for ai, a in enumerate(alphas)])
            for j in range(nu)])
        if use_box:
            u = jnp.stack([jnp.clip(u[j], float(u_lb[j]), float(u_ub[j]))
                           for j in range(nu)])

        xnext, cost = calc(ref, x, u)                        # scalar chain
        xnext = xnext + gap_scale[None, :, :] * fs_next[:, None, :]

        ustage[0:nu * A, :] = u.reshape(nu * A, Bt)
        cu = pltpu.make_async_copy(
            ustage, us_hbm.at[t, :, pl.ds(b0, Bt)], sems.at[2])
        cu.start()
        cx.wait()
        cu.wait()
        return (xnext, cost_acc + cost)

    def pair(j, carry):
        tA = 2 * j
        start_in(tA + 1, CR, CPl, 4, 5)      # prefetch knot B
        wait_in(tA, 0, 0, 0, 3)
        carry = compute(tA, carry, 0, 0)
        nxtA = tA + 2

        @pl.when(nxtA < N)
        def _():
            start_in(nxtA, 0, 0, 0, 3)       # prefetch next pair's knot A
        wait_in(tA + 1, CR, CPl, 4, 5)
        carry = compute(tA + 1, carry, CR, CPl)
        return carry

    if N >= 1:
        start_in(0, 0, 0, 0, 3)
    x, cost_acc = jax.lax.fori_loop(0, N // 2, pair, (x, cost_acc))
    if N % 2:
        # odd N: the last knot (t=N-1, buffer A) was prefetched by the
        # final pair (or by the pre-loop start when N == 1)
        wait_in(N - 1, 0, 0, 0, 3)
        x, cost_acc = compute(N - 1, (x, cost_acc), 0, 0)

    xstage[0:nx * A, :] = x.reshape(nx * A, Bt)
    cx = pltpu.make_async_copy(
        xstage, xs_hbm.at[N, :, pl.ds(b0, Bt)], sems.at[1])
    cx.start()
    cx.wait()

    cost_T = term_calc(ref_T, x)                             # (A, Bt)
    cost_ref[:, :] = jnp.zeros_like(cost_ref)
    cost_ref[0:A, :] = cost_acc + cost_T


def _pallas_rollout_batched(x0, xs, us, K, kff, fs, feasible, refs_run,
                            ref_T, *, calc, term_calc, n_alphas, u_lb, u_ub,
                            use_box, interpret):
    """Batch-leading inputs: x0 (B,nx), xs (B,N+1,nx), us (B,N,nu),
    K (B,N,nu,nx), kff (B,N,nu), fs (B,N+1,nx), feasible (B,),
    refs_run pytree (B,N,...), ref_T pytree (B,...)."""
    B, Np1, nx = xs.shape
    N = Np1 - 1
    nu = us.shape[2]
    dtype = xs.dtype
    A = n_alphas
    alphas = tuple(float(a) for a in 0.5 ** np.arange(A))

    Bt = 128 if not interpret else max(8, 1 << (B - 1).bit_length())
    Bp = ((B + Bt - 1) // Bt) * Bt

    def pad(a):
        if a.shape[0] == Bp:
            return a
        reps = jnp.broadcast_to(a[-1:], (Bp - a.shape[0],) + a.shape[1:])
        return jnp.concatenate([a, reps], axis=0)

    def flat2s(a, n):    # (B, N, ...) -> (N, pad8(n), Bp)
        p = jnp.moveaxis(pad(a).reshape(Bp, N, n), 0, -1)
        if _pad8(n) != n:
            p = jnp.concatenate(
                [p, jnp.zeros((N, _pad8(n) - n, Bp), dtype)], axis=1)
        return p

    ref_leaves, ref_treedef, ref_shapes_bn, ref_sizes = _leaf_sizes(refs_run)
    # leaf shapes minus the (B, N) leading dims
    ref_shapes = [s[2:] for s in ref_shapes_bn]
    ref_sizes = [int(np.prod(s)) if s else 1 for s in ref_shapes]
    packed = [jnp.moveaxis(pad(l).reshape(Bp, N, sz), 0, -1)
              for l, sz in zip(ref_leaves, ref_sizes)]
    refs_p = jnp.concatenate(packed, axis=1)
    if _pad8(refs_p.shape[1]) != refs_p.shape[1]:
        refs_p = jnp.concatenate(
            [refs_p, jnp.zeros((N, _pad8(refs_p.shape[1]) - refs_p.shape[1],
                                Bp), dtype)], axis=1)
    plan = jnp.concatenate(
        [flat2s(xs[:, :N], nx), flat2s(us, nu), flat2s(K, nu * nx),
         flat2s(kff, nu), flat2s(fs[:, 1:], nx)], axis=1)

    refT_leaves, refT_treedef, refT_shapes_b, refT_sizes = _leaf_sizes(ref_T)
    refT_shapes = [s[1:] for s in refT_shapes_b]
    refT_sizes = [int(np.prod(s)) if s else 1 for s in refT_shapes]

    def gflat(a, n):     # (B, ...) -> (n, Bp)
        return jnp.moveaxis(pad(a).reshape(Bp, n), 0, -1)

    glob = _pack_glob(
        gflat(x0, nx), gflat(feasible.astype(dtype)[:, None], 1),
        [gflat(l, sz) for l, sz in zip(refT_leaves, refT_sizes)])

    ref_meta = (ref_treedef, ref_shapes, ref_sizes,
                refT_treedef, refT_shapes, refT_sizes)
    xs_f, us_f, costs = _rollout_core(
        refs_p, plan, glob, calc=calc, term_calc=term_calc,
        ref_meta=ref_meta, nx=nx, nu=nu, N=N, A=A, Bt=Bt,
        u_lb=u_lb, u_ub=u_ub, use_box=use_box, interpret=interpret)

    # (N+1, nx*A, Bp) -> (B, A, N+1, nx)
    xs_tries = jnp.moveaxis(xs_f[:, :nx * A], -1, 0)[:B].reshape(
        B, N + 1, nx, A)
    xs_tries = jnp.moveaxis(xs_tries, 3, 1)
    us_tries = jnp.moveaxis(us_f[:, :nu * A], -1, 0)[:B].reshape(
        B, N, nu, A)
    us_tries = jnp.moveaxis(us_tries, 3, 1)
    cost_tries = jnp.moveaxis(costs[:A], -1, 0)[:B]          # (B, A)
    return xs_tries, us_tries, cost_tries


def _pack_glob(x0_p, feas_p, refT_rows):
    """Global VMEM block from channel-major pieces (rows, Bp)."""
    glob = jnp.concatenate([x0_p, feas_p] + refT_rows, axis=0)
    if _pad8(glob.shape[0]) != glob.shape[0]:
        glob = jnp.concatenate(
            [glob, jnp.zeros((_pad8(glob.shape[0]) - glob.shape[0],
                              glob.shape[1]), glob.dtype)], axis=0)
    return glob


def _rollout_core(refs_p, plan, glob, *, calc, term_calc, ref_meta,
                  nx, nu, N, A, Bt, u_lb, u_ub, use_box, interpret):
    """Run the line-search rollout kernel on packed channel-major inputs;
    outputs stay packed: xs_f (N+1, pad8(nx*A), Bp), us_f (N, pad8(nu*A),
    Bp), costs (pad8(A), Bp).  The packed-carry solve (solver/packed.py)
    calls this directly with a loop-invariant refs_p."""
    (ref_treedef, ref_shapes, ref_sizes,
     refT_treedef, refT_shapes, refT_sizes) = ref_meta
    dtype = plan.dtype
    Bp = plan.shape[-1]
    alphas = tuple(float(a) for a in 0.5 ** np.arange(A))
    CG = glob.shape[0]
    CR = refs_p.shape[1]
    CPl = plan.shape[1]
    assert CPl == _plan_offsets(nx, nu)[-1], (CPl, _plan_offsets(nx, nu))

    kernel = functools.partial(
        _rollout_kernel, calc=calc, term_calc=term_calc,
        ref_treedef=ref_treedef, ref_shapes=ref_shapes, ref_sizes=ref_sizes,
        refT_treedef=refT_treedef, refT_shapes=refT_shapes,
        refT_sizes=refT_sizes, nx=nx, nu=nu, N=N, A=A, Bt=Bt,
        alphas=alphas, u_lb=u_lb, u_ub=u_ub, use_box=use_box)

    return pl.pallas_call(
        kernel,
        grid=(Bp // Bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((CG, Bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((_pad8(A), Bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N + 1, _pad8(nx * A), Bp), dtype),
            jax.ShapeDtypeStruct((N, _pad8(nu * A), Bp), dtype),
            jax.ShapeDtypeStruct((_pad8(A), Bp), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * CR, Bt), dtype),     # double-buffered refs
            pltpu.VMEM((2 * CPl, Bt), dtype),    # double-buffered plan
            pltpu.VMEM((_pad8(nx * A), Bt), dtype),
            pltpu.VMEM((_pad8(nu * A), Bt), dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )(refs_p, plan, glob)


def make_fused_rollout(knot, n_alphas: int, use_box: bool):
    """custom_vmap'd line-search rollout for a scalar-calc knot.

    fn(x0, xs, us, K, kff, fs, feasible, refs_run, ref_T) ->
      (xs_tries (A,N+1,nx), us_tries (A,N,nu), cost_tries (A,))
    Unbatched: alpha-vmapped XLA scan (identical math to fddp.forward);
    under vmap: the fused Pallas kernel."""
    nx, nu = knot.nx, knot.nu
    alphas_arr = 0.5 ** np.arange(n_alphas)

    def _forward_one(alpha, x0, xs, us, K, kff, fs, feasible, refs_run,
                     ref_T):
        dtype = xs.dtype
        u_lb = jnp.asarray(knot.u_lb, dtype)
        u_ub = jnp.asarray(knot.u_ub, dtype)
        gap_scale = jnp.where(feasible, 0.0, alpha - 1.0)

        def step(x, inp):
            ref, x_nom, u_nom, K_t, k_t, fs_next = inp
            dx = x - x_nom
            u = u_nom - alpha * k_t - K_t @ dx
            if use_box:
                u = jnp.clip(u, u_lb, u_ub)
            xnext, cost = knot.calc(ref, x, u)
            xnext = xnext + gap_scale * fs_next
            return xnext, (x, u, cost)

        xN, (xs_run, us_try, costs) = jax.lax.scan(
            step, x0, (refs_run, xs[:-1], us, K, kff, fs[1:]))
        cost_T = knot.term_calc(ref_T, xN)
        xs_try = jnp.concatenate([xs_run, xN[None]], axis=0)
        return xs_try, us_try, jnp.sum(costs) + cost_T

    @jax.custom_batching.custom_vmap
    def rollout(x0, xs, us, K, kff, fs, feasible, refs_run, ref_T):
        al = jnp.asarray(alphas_arr, xs.dtype)
        return jax.vmap(
            _forward_one,
            in_axes=(0, None, None, None, None, None, None, None, None,
                     None))(al, x0, xs, us, K, kff, fs, feasible,
                            refs_run, ref_T)

    @rollout.def_vmap
    def _rule(axis_size, in_batched, x0, xs, us, K, kff, fs, feasible,
              refs_run, ref_T):
        def bcast(a, b):
            return jax.tree.map(
                lambda l, lb: l if lb else jnp.broadcast_to(
                    l[None], (axis_size,) + l.shape), a, b)

        args = [bcast(a, b) for a, b in zip(
            (x0, xs, us, K, kff, fs, feasible, refs_run, ref_T),
            in_batched)]
        out = _pallas_rollout_batched(
            *args, calc=knot.calc, term_calc=knot.term_calc,
            n_alphas=n_alphas, u_lb=knot.u_lb, u_ub=knot.u_ub,
            use_box=use_box, interpret=_resolve_interpret())
        return out, (True, True, True)

    return rollout
