"""Fused Pallas TPU kernel for the BoxFDDP backward sweep.

The sequential backward Riccati sweep is the largest solver stage at
benchmark batch sizes and the dominant one at B=1 (tools/bench_latency.py:
410 of 414 ms p50 trace against ~100 ms with the O(log N) scan) — not
because of FLOPs (~30k per knot) but because XLA emits the per-knot chain
as hundreds of small fusions, each a separate launch inside the scan.
This kernel runs the ENTIRE N-knot sweep — Q-block assembly, projected
-Newton box-QP, masked gain solve, value-function recursion, expected
-improvement bookkeeping — as ONE kernel launch.

Layout: channel-major.  Every small-matrix entry is a row of a
(channels, B_tile) VMEM block, batch on the 128 lanes, channels on
sublanes; matrix products are unrolled broadcast-FMAs over (n, m, Bt)
blocks.  Per-knot inputs stream HBM -> VMEM with an async copy inside the
knot loop.  The math mirrors ``fddp.solve``'s ``backward_store`` exactly
(reference semantics: Crocoddyl SolverBoxFDDP::backwardPass +
expectedImprovement; crocoddyl_classical.py:442-445).

Integration: ``make_backward_box(...)`` returns a ``custom_vmap`` function
— unbatched calls run the plain sequential scan; under ``jax.vmap`` (the
batched-solve path) the whole batch drops into the kernel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .boxqp import boxqp, _masked_solve


# ---------------------------------------------------------------------------
# channel-major small linear algebra (arrays shaped (n, m, Bt) / (n, Bt))
# ---------------------------------------------------------------------------

def _col(A, k):
    """A[:, k, :] as (i, 1, Bt) via a true slice — mixed int/None indexing
    lowers through gather, which Mosaic supports only in 2D."""
    return jax.lax.slice_in_dim(A, k, k + 1, axis=1)


def _row(A, k):
    """A[k] as (1, j, Bt) via a true slice."""
    return jax.lax.slice_in_dim(A, k, k + 1, axis=0)


# Static-slice contractions (traced size ~ 4 ops per k): used for the
# small nu-wide contractions and everything inside the box-QP loop body.
# Fully unrolling the nx-wide (21^3) chains as well made the traced body
# large enough that the Mosaic remote compiler timed out — those run as
# ref-reading fori_loops inside the kernel instead (dynamic slicing is
# supported on REFS, not on values).
def _mm(A, B):
    """C[i,j] = sum_k A[i,k] B[k,j];  A: (i,k,Bt), B: (k,j,Bt)."""
    return sum(_col(A, k) * _row(B, k) for k in range(A.shape[1]))


def _mmT(A, B):
    """C[i,j] = sum_k A[k,i] B[k,j];  A: (k,i,Bt), B: (k,j,Bt)."""
    ni, Bt = A.shape[1], A.shape[2]
    return sum(_row(A, k).reshape(ni, 1, Bt) * _row(B, k)
               for k in range(A.shape[0]))


def _mv(A, x):
    """y[i] = sum_k A[i,k] x[k];  A: (i,k,Bt), x: (k,Bt)."""
    ni, Bt = A.shape[0], A.shape[2]
    return sum(_col(A, k).reshape(ni, Bt) * _row(x, k)
               for k in range(A.shape[1]))


def _mvT(A, x):
    """y[i] = sum_k A[k,i] x[k]."""
    ni, Bt = A.shape[1], A.shape[2]
    return sum(_row(A, k).reshape(ni, Bt) * _row(x, k)
               for k in range(A.shape[0]))


def _chol(Q):
    """Lower Cholesky of (n,n,Bt) as a list-of-lists of (Bt,) channels."""
    n = Q.shape[0]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = Q[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, n):
            s = Q[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    return L


def _chol_solve_vec(L, b):
    """Solve L L^T x = b;  b: (n,Bt) -> (n,Bt)."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def _chol_solve_mat(L, B):
    """Solve L L^T X = B;  B: (n,m,Bt) -> (n,m,Bt) (block rows as rhs)."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = B[i]
        for k in range(i):
            s = s - L[i][k][None, :] * y[k]
        y[i] = s / L[i][i][None, :]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i][None, :] * x[k]
        x[i] = s / L[i][i][None, :]
    return jnp.stack(x)


def _diag_mask(n, dtype):
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    return (ii == jj).astype(dtype)


def _masked_spd(Q, free, reg):
    """Clamped rows/cols replaced by identity (+reg): one dense solve for
    any active set (mirror of boxqp._masked_solve)."""
    n = Q.shape[0]
    dm = _diag_mask(n, Q.dtype)
    m2 = free[:, None, :] * free[None, :, :]
    return Q * m2 + dm * ((1.0 - free)[:, None, :] + reg)


def _boxqp_channels(Q, q, lb, ub, iters, reg):
    """Projected-Newton box QP, channel layout (mirror of boxqp.boxqp).
    Q: (n,n,Bt), q/lb/ub: (n,Bt).  Returns (x, free).

    The Newton iterations run under lax.fori_loop (body traced once) —
    unrolling 8 of them made the kernel body large enough to break the
    Mosaic remote compiler."""
    dtype = Q.dtype
    eps = jnp.asarray(1e-9, dtype)

    def obj(c):
        return 0.5 * jnp.sum(c * _mv(Q, c), axis=0) + jnp.sum(q * c, axis=0)

    def body(_, x):
        g = q + _mv(Q, x)
        lo = (x <= lb + eps) & (g > 0)
        hi = (x >= ub - eps) & (g < 0)
        free = (~(lo | hi)).astype(dtype)
        Qm = _masked_spd(Q, free, reg)
        dx = -_chol_solve_vec(_chol(Qm), g * free)
        cands = [x, jnp.clip(x + dx, lb, ub), jnp.clip(x + 0.5 * dx, lb, ub),
                 jnp.clip(x + 0.25 * dx, lb, ub)]
        vals = jnp.stack([obj(c) for c in cands])          # (4, Bt)
        best = jnp.argmin(vals, axis=0)                    # (Bt,)
        xn = cands[0]
        for i in range(1, 4):
            xn = jnp.where(best == i, cands[i], xn)
        return xn

    x = jax.lax.fori_loop(0, iters, body,
                          jnp.clip(jnp.zeros_like(q), lb, ub))
    g = q + _mv(Q, x)
    lo = (x <= lb + eps) & (g > 0)
    hi = (x >= ub - eps) & (g < 0)
    free = (~(lo | hi)).astype(dtype)
    return x, free


# ---------------------------------------------------------------------------
# channel packing
# ---------------------------------------------------------------------------

class _Off(NamedTuple):
    Fx: int
    Fu: int
    Lx: int
    Lu: int
    Lxx: int
    Lxu: int
    Luu: int
    fs: int
    lb: int
    ub: int
    total: int


def _pad8(n: int) -> int:
    """DMA slice shapes must be sublane-aligned (multiples of 8 for f32)."""
    return ((n + 7) // 8) * 8


def _offsets(nx, nu) -> _Off:
    """Channel layout with 8-aligned row strides: matrices are packed with
    their last axis padded to a multiple of 8 so in-kernel dynamic row
    reads (ref[pl.ds(off + k*stride, stride)]) land on sublane-aligned
    offsets — unaligned dynamic VMEM reads return garbage silently."""
    sx, su = _pad8(nx), _pad8(nu)
    o = {}
    c = 0
    for name, size in (("Fx", nx * sx), ("Fu", nx * su), ("Lx", sx),
                       ("Lu", su), ("Lxx", nx * sx), ("Lxu", nx * su),
                       ("Luu", nu * su), ("fs", sx), ("lb", su), ("ub", su)):
        o[name] = c
        c += size
    return _Off(total=c, **o)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _backward_kernel(gn_hbm, dyn_hbm, term_ref, kout_hbm, kffout_hbm,
                     wout_hbm, scal_ref, scr, kstage, kffstage, wfs_stage,
                     wstage, u2stage, vsym, sems,
                     *, nx, nu, N, Bt, boxqp_iters, kgain_reg):
    """Per-knot inputs arrive as TWO HBM streams sharing the _offsets scr
    layout: ``gn_hbm`` (N, C_gn, Bp) carries the GN derivative block
    (Fx..Luu — emitted directly by the packed diff kernel), ``dyn_hbm``
    (N, sx+2su, Bp) the per-iteration fs/lb/ub rows."""
    off = _offsets(nx, nu)
    sx, su = _pad8(nx), _pad8(nu)
    C_gn = off.fs
    C_dyn = off.total - C_gn
    dtype = term_ref.dtype
    ib = pl.program_id(0)
    b0 = pl.multiple_of(ib * Bt, Bt)

    # terminal block: LxT (nx), LxxT (nx*nx), fsN (nx), xreg (1), ureg (1)
    LxT = term_ref[0:nx, :]
    LxxT = term_ref[nx:nx + nx * nx, :].reshape(nx, nx, Bt)
    fsN = term_ref[nx + nx * nx:2 * nx + nx * nx, :]
    # scalars kept 2-D (1, Bt): 1-D (Bt,) fori carries / accumulators are
    # the one pattern the bisection never cleared with the remote compiler
    xreg = term_ref[2 * nx + nx * nx:2 * nx + nx * nx + 1, :]
    ureg = term_ref[2 * nx + nx * nx + 1:2 * nx + nx * nx + 2, :]

    dm_x = _diag_mask(nx, dtype)
    dm_u = _diag_mask(nu, dtype)

    Vxx = LxxT + dm_x * xreg
    Vx = LxT + _mv(Vxx, fsN)

    # zero the stage padding rows once (stages are 8-row-aligned; DMA
    # copies whole blocks, padding sliced off outside the kernel)
    kstage[:, :] = jnp.zeros_like(kstage)
    kffstage[:, :] = jnp.zeros_like(kffstage)
    wfs_stage[:, :] = jnp.zeros_like(wfs_stage)
    vsym[:, :] = jnp.zeros_like(vsym)

    def _pad_cols(M, n_to):
        n_from = M.shape[1]
        if n_from == n_to:
            return M
        return jnp.concatenate(
            [M, jnp.zeros((M.shape[0], n_to - n_from, Bt), dtype)], axis=1)

    # Vxx lives in the `vsym` scratch across knot steps with an 8-aligned
    # row stride: the nx-wide (21^3) contractions read rows under
    # fori_loop (dynamic slicing works on refs, not values; UNALIGNED
    # dynamic VMEM reads return garbage silently, hence the stride).
    # Vxx is symmetric, so "column k" reads are row-k reads.
    vsym[:, :] = _pad_cols(Vxx, sx).reshape(nx * sx, Bt)
    # expected-improvement weights w[t] = Vxx[t] @ fs_scaled[t] — the only
    # consumer of Vxx outside this sweep (fddp accept_alpha's dv term), so
    # the kernel emits w (nx rows/knot) instead of the full Vxx (nx^2)
    wfsN = _mv(Vxx, fsN)
    wfs_stage[0:nx, :] = wfsN
    cp = pltpu.make_async_copy(
        wfs_stage, wout_hbm.at[N, :, pl.ds(b0, Bt)], sems.at[2])
    cp.start()
    cp.wait()

    dg0 = -jnp.sum(Vx * fsN, axis=0, keepdims=True)
    dq0 = jnp.sum(fsN * wfsN, axis=0, keepdims=True)

    def _mm_vsym_scr(x_off, xstride):
        """Cp[i,j] = sum_k Vxx[i,k] X[k,j]; Vxx rows from vsym (symmetric),
        X rows from scr; result PADDED (sx, xstride, Bt)."""
        def body(k, C):
            vrow = vsym[pl.ds(k * sx, sx), :]
            xrow = scr[pl.ds(x_off + k * xstride, xstride), :]
            return C + vrow[:, None, :] * xrow[None, :, :]
        return jax.lax.fori_loop(
            0, nx, body, jnp.zeros((sx, xstride, Bt), dtype))

    def _mmT_scr_stage(a_off, astride, s_ref, sstride):
        """Cp[i,j] = sum_k A[k,i] S[k,j]; A rows from scr, S rows from a
        stage ref; result PADDED (astride, sstride, Bt)."""
        def body(k, C):
            ar = scr[pl.ds(a_off + k * astride, astride), :]
            sr = s_ref[pl.ds(k * sstride, sstride), :]
            return C + ar[:, None, :] * sr[None, :, :]
        return jax.lax.fori_loop(
            0, nx, body, jnp.zeros((astride, sstride, Bt), dtype))

    # -------- double-buffered input streaming --------------------------
    # The sweep is DMA-latency-bound: one knot's GN block (C_gn rows) must
    # land in VMEM before its ~30k-FLOP compute.  Two scr buffers
    # alternate: while knot t computes from buffer A, knot t-1 streams
    # into buffer B.  The knot loop runs PAIRS with static buffer bases
    # (and static DMA semaphores) so no dynamic scratch indexing is
    # needed.
    BASE1 = off.total

    def start_in(t, base, sg, sd):
        pltpu.make_async_copy(
            gn_hbm.at[t, :, pl.ds(b0, Bt)], scr.at[pl.ds(base, C_gn)],
            sems.at[sg]).start()
        pltpu.make_async_copy(
            dyn_hbm.at[t, :, pl.ds(b0, Bt)],
            scr.at[pl.ds(base + C_gn, C_dyn)], sems.at[sd]).start()

    def wait_in(t, base, sg, sd):
        pltpu.make_async_copy(
            gn_hbm.at[t, :, pl.ds(b0, Bt)], scr.at[pl.ds(base, C_gn)],
            sems.at[sg]).wait()
        pltpu.make_async_copy(
            dyn_hbm.at[t, :, pl.ds(b0, Bt)],
            scr.at[pl.ds(base + C_gn, C_dyn)], sems.at[sd]).wait()

    def compute(carry, t, base):
        Vx, dg, dq, qu2, bad = carry
        o_Fx, o_Fu = base + off.Fx, base + off.Fu
        Fx = scr[o_Fx:o_Fx + nx * sx, :].reshape(nx, sx, Bt)[:, :nx, :]
        Fu = scr[o_Fu:o_Fu + nx * su, :].reshape(nx, su, Bt)[:, :nu, :]
        Lx = scr[base + off.Lx:base + off.Lx + nx, :]
        Lu = scr[base + off.Lu:base + off.Lu + nu, :]
        Lxx = scr[base + off.Lxx:base + off.Lxx + nx * sx, :].reshape(
            nx, sx, Bt)[:, :nx, :]
        Lxu = scr[base + off.Lxu:base + off.Lxu + nx * su, :].reshape(
            nx, su, Bt)[:, :nu, :]
        Luu = scr[base + off.Luu:base + off.Luu + nu * su, :].reshape(
            nu, su, Bt)[:, :nu, :]
        fs_t = scr[base + off.fs:base + off.fs + nx, :]
        lb = scr[base + off.lb:base + off.lb + nu, :]
        ub = scr[base + off.ub:base + off.ub + nu, :]

        W = _mm_vsym_scr(o_Fx, sx)            # Vxx @ Fx  padded (sx,sx,Bt)
        U = _mm_vsym_scr(o_Fu, su)            # Vxx @ Fu  padded (sx,su,Bt)
        wstage[:, :] = W[:nx].reshape(nx * sx, Bt)
        u2stage[:, :] = U[:nx].reshape(nx * su, Bt)
        Qxx = Lxx + _mmT_scr_stage(o_Fx, sx, wstage, sx)[:nx, :nx, :]
        Qxu = Lxu + _mmT_scr_stage(o_Fx, sx, u2stage, su)[:nx, :nu, :]
        Quu = (Luu + _mmT_scr_stage(o_Fu, su, u2stage, su)[:nu, :nu, :]
               + dm_u * ureg)
        # vector-sized contractions: static slices on values compile fine
        Qx = Lx + _mvT(Fx, Vx)
        Qu = Lu + _mvT(Fu, Vx)

        xq, free = _boxqp_channels(Quu, Qu, lb, ub, boxqp_iters, 1e-9)
        kff = -xq
        # K = masked_solve(Quu, Qxu^T * free_rows, free, kgain_reg).
        # Transpose via column-slices: Mosaic lowers leading-dim
        # transposes/mixed indexing through gather (2D-only).
        QxuT = jnp.concatenate([_col(Qxu, u).reshape(1, nx, Bt)
                                for u in range(nu)])         # (nu, nx, Bt)
        rhs = QxuT * free[:, None, :]
        Qm = _masked_spd(Quu, free, kgain_reg)
        K = _chol_solve_mat(_chol(Qm), rhs)           # (nu, nx, Bt)

        finite = (jnp.isfinite(jnp.sum(kff, axis=0, keepdims=True))
                  & jnp.isfinite(jnp.sum(K.reshape(nu * nx, Bt), axis=0,
                                         keepdims=True)))
        bad = jnp.maximum(bad, 1.0 - finite.astype(dtype))

        Quuk = _mv(Quu, kff)
        Vx_new = Qx + _mvT(K, Quuk - 2.0 * Qu)
        Vxx_new = Qxx - _mm(Qxu, K)           # nu-contraction: static
        Vxx_newT = jnp.concatenate([_col(Vxx_new, i).reshape(1, nx, Bt)
                                    for i in range(nx)])
        Vxx_new = 0.5 * (Vxx_new + Vxx_newT) + dm_x * xreg

        Vfs = _mv(Vxx_new, fs_t)              # static: nx^2 ops only
        Vx_new = Vx_new + Vfs
        vsym[:, :] = _pad_cols(Vxx_new, sx).reshape(nx * sx, Bt)
        wfs_stage[0:nx, :] = Vfs

        dg = dg + jnp.sum(Qu * kff, axis=0, keepdims=True) - jnp.sum(
            Vx_new * fs_t, axis=0, keepdims=True)
        dq = dq - jnp.sum(kff * Quuk, axis=0, keepdims=True) + jnp.sum(
            fs_t * Vfs, axis=0, keepdims=True)
        qu2 = qu2 + jnp.sum(Qu * Qu, axis=0, keepdims=True)

        kstage[0:nu * nx, :] = K.reshape(nu * nx, Bt)
        kffstage[0:nu, :] = kff
        c1 = pltpu.make_async_copy(
            kstage, kout_hbm.at[t, :, pl.ds(b0, Bt)], sems.at[1])
        c2 = pltpu.make_async_copy(
            kffstage, kffout_hbm.at[t, :, pl.ds(b0, Bt)], sems.at[3])
        c3 = pltpu.make_async_copy(
            wfs_stage, wout_hbm.at[t, :, pl.ds(b0, Bt)], sems.at[2])
        c1.start()
        c2.start()
        c3.start()
        c1.wait()
        c2.wait()
        c3.wait()
        return (Vx_new, dg, dq, qu2, bad)

    def pair(j, carry):
        tA = N - 1 - 2 * j
        start_in(tA - 1, BASE1, 5, 6)        # prefetch knot B
        wait_in(tA, 0, 0, 4)
        carry = compute(carry, tA, 0)
        nxtA = tA - 2

        @pl.when(nxtA >= 0)
        def _():
            start_in(nxtA, 0, 0, 4)          # prefetch next pair's knot A
        wait_in(tA - 1, BASE1, 5, 6)
        carry = compute(carry, tA - 1, BASE1)
        return carry

    zero = jnp.zeros((1, Bt), dtype)
    carry0 = (Vx, dg0, dq0, zero, zero)
    if N >= 1:
        start_in(N - 1, 0, 0, 4)
    carry = jax.lax.fori_loop(0, N // 2, pair, carry0)
    if N % 2:
        # odd N: the last knot (t=0, buffer A) was prefetched by the final
        # pair (or by the pre-loop start when N == 1)
        wait_in(0, 0, 0, 4)
        carry = compute(carry, 0, 0)
    _, dg, dq, qu2, bad = carry

    scal_ref[:, :] = jnp.zeros_like(scal_ref)
    scal_ref[0:1, :] = dg
    scal_ref[1:2, :] = dq
    scal_ref[2:3, :] = qu2
    scal_ref[3:4, :] = bad


def _pallas_backward_batched(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_scaled,
                             LxT, LxxT, lb, ub, xreg, ureg, *,
                             boxqp_iters, kgain_reg, interpret):
    """All inputs batch-leading: Fx (B,N,nx,nx) ... fs_scaled (B,N+1,nx),
    lb/ub (B,N,nu), xreg/ureg (B,).  Returns (K, kff, qu2, dg, dq, bad,
    w_all) batch-leading, with w_all[t] = Vxx[t] @ fs_scaled[t] — the
    expected-improvement weights (the only downstream use of Vxx)."""
    B, N = Fx.shape[0], Fx.shape[1]
    nx, nu = Fx.shape[2], Fu.shape[3]
    dtype = Fx.dtype
    off = _offsets(nx, nu)

    Bt = 128 if not interpret else max(8, 1 << (B - 1).bit_length())
    Bp = ((B + Bt - 1) // Bt) * Bt

    def pad(a):
        if a.shape[0] == Bp:
            return a
        reps = jnp.broadcast_to(a[-1:], (Bp - a.shape[0],) + a.shape[1:])
        return jnp.concatenate([a, reps], axis=0)

    # pack per-knot channels: (N, C, Bp), matrices with their last axis
    # padded to a multiple of 8 (aligned in-kernel dynamic row reads)
    sx, su = _pad8(nx), _pad8(nu)

    def flat2(a, n):     # (B,N,...) -> (N, n, Bp)
        return jnp.moveaxis(pad(a).reshape(Bp, N, n), 0, -1)

    def flat2s(a, rows, cols):   # (B,N,rows,cols) -> strided (N, rows*pad8(cols), Bp)
        sc = _pad8(cols)
        ap = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, sc - cols)))
        return jnp.moveaxis(pad(ap).reshape(Bp, N, rows * sc), 0, -1)

    def flat1s(a, cols):         # (B,N,cols) vector -> (N, pad8(cols), Bp)
        sc = _pad8(cols)
        ap = jnp.pad(a, ((0, 0), (0, 0), (0, sc - cols)))
        return jnp.moveaxis(pad(ap).reshape(Bp, N, sc), 0, -1)

    gn = jnp.concatenate([
        flat2s(Fx, nx, nx), flat2s(Fu, nx, nu), flat1s(Lx, nx),
        flat1s(Lu, nu), flat2s(Lxx, nx, nx), flat2s(Lxu, nx, nu),
        flat2s(Luu, nu, nu)], axis=1)
    dyn = jnp.concatenate([
        flat1s(fs_scaled[:, :N], nx), flat1s(lb, nu), flat1s(ub, nu)],
        axis=1)
    term = _pack_term(
        jnp.moveaxis(pad(LxT), 0, -1),
        jnp.moveaxis(pad(LxxT).reshape(Bp, nx * nx), 0, -1),
        jnp.moveaxis(pad(fs_scaled[:, N]), 0, -1),
        jnp.moveaxis(pad(xreg)[:, None], 0, -1),
        jnp.moveaxis(pad(ureg)[:, None], 0, -1))

    K_f, kff_f, w_f, scal = _backward_core(
        gn, dyn, term, nx=nx, nu=nu, N=N, Bt=Bt,
        boxqp_iters=boxqp_iters, kgain_reg=kgain_reg, interpret=interpret)

    K = jnp.moveaxis(K_f[:, :nu * nx], -1, 0)[:B].reshape(B, N, nu, nx)
    kff = jnp.moveaxis(kff_f[:, :nu], -1, 0)[:B]
    w_all = jnp.moveaxis(w_f[:, :nx], -1, 0)[:B]             # (B, N+1, nx)
    dg, dq, qu2, badf = scal[0, :B], scal[1, :B], scal[2, :B], scal[3, :B]
    return K, kff, qu2, dg, dq, badf > 0.5, w_all


def _pack_term(LxT_p, LxxT_p, fsN_p, xreg_p, ureg_p):
    """Terminal VMEM block from channel-major pieces (rows, Bp)."""
    term = jnp.concatenate([LxT_p, LxxT_p, fsN_p, xreg_p, ureg_p], axis=0)
    if _pad8(term.shape[0]) != term.shape[0]:
        term = jnp.concatenate(
            [term, jnp.zeros((_pad8(term.shape[0]) - term.shape[0],
                              term.shape[1]), term.dtype)], axis=0)
    return term


def _backward_core(gn, dyn, term, *, nx, nu, N, Bt, boxqp_iters, kgain_reg,
                   interpret):
    """Run the backward kernel on packed channel-major inputs; outputs stay
    packed: K_f (N, pad8(nu*nx), Bp), kff_f (N, pad8(nu), Bp),
    w_f (N+1, sx, Bp), scal (8, Bp).  The packed-carry solve
    (solver/packed.py) calls this directly; _pallas_backward_batched wraps
    it with the batch-leading pack/unpack for the custom_vmap path."""
    dtype = gn.dtype
    Bp = gn.shape[-1]
    sx, su = _pad8(nx), _pad8(nu)
    off = _offsets(nx, nu)
    assert gn.shape[1] == off.fs and dyn.shape[1] == off.total - off.fs, (
        gn.shape, dyn.shape)
    C2 = term.shape[0]

    kernel = functools.partial(
        _backward_kernel, nx=nx, nu=nu, N=N, Bt=Bt,
        boxqp_iters=boxqp_iters, kgain_reg=kgain_reg)

    return pl.pallas_call(
        kernel,
        grid=(Bp // Bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # gn stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),         # dyn stays in HBM
            pl.BlockSpec((C2, Bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),     # terminal block
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, _pad8(nu * nx), Bp), dtype),
            jax.ShapeDtypeStruct((N, _pad8(nu), Bp), dtype),
            jax.ShapeDtypeStruct((N + 1, sx, Bp), dtype),
            jax.ShapeDtypeStruct((8, Bp), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * off.total, Bt), dtype),  # double-buffered in
            pltpu.VMEM((_pad8(nu * nx), Bt), dtype),
            pltpu.VMEM((_pad8(nu), Bt), dtype),
            pltpu.VMEM((sx, Bt), dtype),            # wfs_stage (w rows)
            pltpu.VMEM((nx * sx, Bt), dtype),       # wstage (strided W)
            pltpu.VMEM((nx * su, Bt), dtype),       # u2stage (strided U)
            pltpu.VMEM((nx * sx, Bt), dtype),       # vsym (strided Vxx)
            pltpu.SemaphoreType.DMA((7,)),
        ],
        interpret=interpret,
    )(gn, dyn, term)


# ---------------------------------------------------------------------------
# sequential single-problem reference (the custom_vmap fallback)
# ---------------------------------------------------------------------------

def _backward_seq(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_scaled, LxT, LxxT,
                  lb, ub, xreg, ureg, *, boxqp_iters, kgain_reg):
    """Unbatched mirror of fddp.backward_store (box path), gap terms
    pre-scaled into fs_scaled."""
    nx, nu = Fx.shape[1], Fu.shape[2]
    N = Fx.shape[0]
    dtype = Fx.dtype
    eye_x = jnp.eye(nx, dtype=dtype)
    VxxT = LxxT + xreg * eye_x
    VxT = LxT + VxxT @ fs_scaled[N]

    def step(carry, inp):
        Vx, Vxx = carry
        fx, fu, lx, lu, lxx, lxu, luu, fs_t, lb_t, ub_t = inp
        Qxx = lxx + fx.T @ Vxx @ fx
        Qxu = lxu + fx.T @ Vxx @ fu
        Quu = luu + fu.T @ Vxx @ fu + ureg * jnp.eye(nu, dtype=dtype)
        Qx = lx + fx.T @ Vx
        Qu = lu + fu.T @ Vx
        sol = boxqp(Quu, Qu, lb_t, ub_t, jnp.zeros(nu, dtype),
                    iters=boxqp_iters)
        kff = -sol.x
        K = _masked_solve(Quu, Qxu.T * sol.free.astype(dtype)[:, None],
                          sol.free, kgain_reg)
        bad = jnp.any(~jnp.isfinite(kff)) | jnp.any(~jnp.isfinite(K))
        Quuk = Quu @ kff
        Vx_new = Qx + K.T @ (Quuk - 2.0 * Qu)
        Vxx_new = Qxx - Qxu @ K
        Vxx_new = 0.5 * (Vxx_new + Vxx_new.T) + xreg * eye_x
        w_t = Vxx_new @ fs_t
        Vx_new = Vx_new + w_t
        dg_t = Qu @ kff - Vx_new @ fs_t
        dq_t = -kff @ Quuk + fs_t @ w_t
        return (Vx_new, Vxx_new), (K, kff, jnp.sum(Qu * Qu), dg_t, dq_t,
                                   bad, w_t)

    (_, _), outs = jax.lax.scan(
        step, (VxT, VxxT),
        (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_scaled[:N], lb, ub), reverse=True)
    K, kff, qu2, dg_t, dq_t, bad, w_run = outs
    wT = VxxT @ fs_scaled[N]
    dg = jnp.sum(dg_t) - VxT @ fs_scaled[N]
    dq = jnp.sum(dq_t) + fs_scaled[N] @ wT
    w_all = jnp.concatenate([w_run, wT[None]], axis=0)
    return (K, kff, jnp.sum(qu2), dg, dq, jnp.any(bad), w_all)


@functools.cache
def make_backward_box(nx: int, nu: int, boxqp_iters: int = 8,
                      kgain_reg: float = 1e-12):
    """custom_vmap'd backward: sequential scan unbatched, the fused Pallas
    kernel under vmap.  Args (unbatched shapes):
      Fx (N,nx,nx), Fu (N,nx,nu), Lx (N,nx), Lu (N,nu), Lxx, Lxu, Luu,
      fs_scaled (N+1,nx)  [gap rows pre-multiplied by the infeasibility
      weight], LxT (nx), LxxT (nx,nx), lb/ub (N,nu) [bounds relative to
      the current controls], xreg (), ureg ().
    Returns (K, kff, qu2, dg, dq, bad, w_all) with
    w_all[t] = Vxx[t] @ fs_scaled[t] (N+1, nx) — the gap-corrected
    expected-improvement weights consumed by fddp.accept_alpha."""

    @jax.custom_batching.custom_vmap
    def backward(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_scaled, LxT, LxxT,
                 lb, ub, xreg, ureg):
        return _backward_seq(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs_scaled,
                             LxT, LxxT, lb, ub, xreg, ureg,
                             boxqp_iters=boxqp_iters, kgain_reg=kgain_reg)

    @backward.def_vmap
    def _rule(axis_size, in_batched, *args):
        names = ("Fx", "Fu", "Lx", "Lu", "Lxx", "Lxu", "Luu", "fs_scaled",
                 "LxT", "LxxT", "lb", "ub", "xreg", "ureg")
        bargs = []
        for a, b, n in zip(args, in_batched, names):
            if not b:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            bargs.append(a)
        # interpret unless the computation targets a real TPU (the
        # configured default device wins over the highest-priority
        # backend — tests pin CPU under a TPU-registered process)
        from .platform import resolve_interpret
        interpret = resolve_interpret()
        out = _pallas_backward_batched(
            *bargs, boxqp_iters=boxqp_iters, kgain_reg=kgain_reg,
            interpret=interpret)
        return out, tuple(True for _ in out)

    return backward
