"""Fused Pallas TPU kernel for the knot-derivative (calcDiff) pass.

The last solver stage to get the kernel treatment (after
backward_pallas.py and rollout_pallas.py): the whole per-knot GN
derivative computation — primal contact-dynamics chain, vmap-of-jvp
tangent sweeps, implicit-function contact derivatives and the
shared-group Gauss-Newton assembly (``ocp.channel_diff``) — runs as ONE
kernel launch over all (B x N) knots, instead of XLA's per-fusion HBM
round trips.

Layout: the (B, N) problem/knot axes flatten into one lane axis tiled at
128; every logical scalar of the diff chain is a (128,)-lane channel, and
the 7-direction tangent sweeps carry a leading direction axis that lands
on TPU sublanes ((7, 128) tangent ops — 7/8 sublane occupancy).

Integration mirrors the other kernels: a ``custom_vmap`` function — the
plain per-knot vmap unbatched (single solve), the kernel under
``jax.vmap`` (the batched-solve path) — selected by
``FDDPSettings.diff_mode="pallas"`` via ``KnotModel.diff_all``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.scalarops import is_const

# channel layout of one packed input column (per knot):
#   p_ref 3 | v_ref 3 | x_reg_ref 14 | tau_ref 7 | R_des 9 | y_ref 21
#   | x nx | u 7
_REF_SIZES = (("p_ref", 3), ("v_ref", 3), ("x_reg_ref", 14),
              ("tau_ref", 7), ("R_des", 9), ("y_ref", 21))


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


from .platform import resolve_interpret as _resolve_interpret


def _out_layout(nx: int, nu: int):
    """(name, rows) blocks of the packed output, in order."""
    return (("xnext", nx), ("cost", 1), ("Fx", nx * nx), ("Fu", nx * nu),
            ("Lx", nx), ("Lu", nu), ("Lxx", nx * nx), ("Lxu", nx * nu),
            ("Luu", nu * nu))


def _diff_kernel(in_ref, out_ref, *, diff_ch, nx, nu, Bt):
    """One tile: the channel diff on 128 lanes of flattened (b, n) knots."""
    off = 0
    ref_ch = {}
    for name, size in _REF_SIZES:
        rows = [in_ref[off + i, :] for i in range(size)]
        off += size
        if name == "R_des":
            ref_ch[name] = [rows[3 * r:3 * r + 3] for r in range(3)]
        else:
            ref_ch[name] = rows
    x = [in_ref[off + i, :] for i in range(nx)]
    off += nx
    u = [in_ref[off + i, :] for i in range(nu)]

    out = diff_ch(ref_ch, x, u)
    zero = x[0] * 0.0

    def cv(v):
        return zero + v if is_const(v) else v

    def flat(entry, n_expected):
        if isinstance(entry, list) and entry and isinstance(entry[0], list):
            vals = [cv(v) for row in entry for v in row]
        elif isinstance(entry, list):
            vals = [cv(v) for v in entry]
        else:
            vals = [cv(entry)]
        assert len(vals) == n_expected, (len(vals), n_expected)
        return jnp.stack(vals)

    o = 0
    for name, rows in _out_layout(nx, nu):
        out_ref[o:o + rows, :] = flat(out[name], rows)
        o += rows
    total = o
    pad = _pad8(total) - total
    if pad:
        out_ref[total:total + pad, :] = jnp.zeros((pad, Bt), zero.dtype)


def _pallas_diff_batched(refs_run, xs_run, us, *, diff_ch, nx, nu,
                         interpret):
    """Batch-leading inputs: refs_run pytree (B, N, ...), xs_run
    (B, N, nx), us (B, N, nu) -> KnotDeriv pytree with (B, N, ...)."""
    from ..ocp.action import KnotDeriv

    B, N = us.shape[0], us.shape[1]
    dtype = xs_run.dtype
    M = B * N
    Bt = 128 if not interpret else max(8, 1 << (M - 1).bit_length())
    Mp = ((M + Bt - 1) // Bt) * Bt

    ref_leaves = [refs_run.p_ref, refs_run.v_ref, refs_run.x_reg_ref,
                  refs_run.tau_ref,
                  refs_run.R_des.reshape(B, N, 9), refs_run.y_ref]

    def pack(a, n):
        flat = a.reshape(M, n)
        if Mp != M:
            flat = jnp.concatenate(
                [flat, jnp.broadcast_to(flat[-1:], (Mp - M, n))], axis=0)
        return flat.T                                     # (n, Mp)

    cols = [pack(l, s) for l, (_, s) in zip(ref_leaves, _REF_SIZES)]
    cols += [pack(xs_run, nx), pack(us, nu)]
    packed = jnp.concatenate(cols, axis=0)
    C_in = packed.shape[0]
    if _pad8(C_in) != C_in:
        packed = jnp.concatenate(
            [packed, jnp.zeros((_pad8(C_in) - C_in, Mp), dtype)], axis=0)

    layout = _out_layout(nx, nu)
    C_out = _pad8(sum(r for _, r in layout))

    kernel = functools.partial(_diff_kernel, diff_ch=diff_ch, nx=nx, nu=nu,
                               Bt=Bt)
    out = pl.pallas_call(
        kernel,
        grid=(Mp // Bt,),
        in_specs=[pl.BlockSpec((packed.shape[0], Bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C_out, Bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C_out, Mp), dtype),
        interpret=interpret,
    )(packed)

    pieces = {}
    o = 0
    for name, rows in layout:
        block = out[o:o + rows, :M]                      # (rows, M)
        o += rows
        pieces[name] = block
    shapes = dict(xnext=(nx,), cost=(), Fx=(nx, nx), Fu=(nx, nu),
                  Lx=(nx,), Lu=(nu,), Lxx=(nx, nx), Lxu=(nx, nu),
                  Luu=(nu, nu))
    kw = {}
    for name, shp in shapes.items():
        a = jnp.moveaxis(pieces[name], -1, 0).reshape((B, N) + shp)
        kw[name] = a
    return KnotDeriv(**kw)


def _diff_kernel_packed(refs_ref, xs_ref, us_ref, gn_ref, aux_ref, *,
                        diff_ch, nx, nu, Bt):
    """Packed-layout variant: one (knot, lane-tile) grid step; the GN
    output rows land directly in backward_pallas._offsets strided layout
    (Fx..Luu), so the backward kernel consumes them with zero transposes.
    aux rows: xnext (nx) + cost (1)."""
    sx, su = _pad8(nx), _pad8(nu)
    off = 0
    ref_ch = {}
    for name, size in _REF_SIZES:
        rows = [refs_ref[0, off + i, :] for i in range(size)]
        off += size
        if name == "R_des":
            ref_ch[name] = [rows[3 * r:3 * r + 3] for r in range(3)]
        else:
            ref_ch[name] = rows
    x = [xs_ref[0, i, :] for i in range(nx)]
    u = [us_ref[0, i, :] for i in range(nu)]

    out = diff_ch(ref_ch, x, u)
    zero = x[0] * 0.0

    def cv(v):
        return zero + v if is_const(v) else v

    chans = []

    def put_mat(M, ncols, stride):
        for row in M:
            chans.extend(cv(v) for v in row)
            chans.extend([zero] * (stride - ncols))

    def put_vec(vec, n, stride):
        chans.extend(cv(v) for v in vec)
        chans.extend([zero] * (stride - n))

    put_mat(out["Fx"], nx, sx)
    put_mat(out["Fu"], nu, su)
    put_vec(out["Lx"], nx, sx)
    put_vec(out["Lu"], nu, su)
    put_mat(out["Lxx"], nx, sx)
    put_mat(out["Lxu"], nu, su)
    put_mat(out["Luu"], nu, su)
    gn_ref[0, :, :] = jnp.stack(chans)

    aux = [cv(v) for v in out["xnext"]] + [cv(out["cost"])]
    aux += [zero] * (aux_ref.shape[1] - len(aux))
    aux_ref[0, :, :] = jnp.stack(aux)


def make_diff_packed(model, W, surface: bool, family: str):
    """Packed-layout fused diff pass for the packed-carry batched solve
    (solver/packed.py): channel-major in, channel-major out, batch on
    lanes — no transposes at either kernel boundary.

    fn(refs_p (N, CR, Bp), xs_run_p (N, sx, Bp), us_p (N, su, Bp),
       interpret) ->
      (gn_p (N, C_gn, Bp) in backward_pallas._offsets strided layout
       [Fx..Luu], aux_p (N, pad8(nx+1), Bp) [xnext rows 0..nx-1, cost at
       row nx]).
    """
    from ..ocp.channel_diff import make_channel_diff
    from .backward_pallas import _offsets

    nx = 21 if family == "augmented" else 14
    nu = 7
    sx, su = _pad8(nx), _pad8(nu)
    diff_ch = make_channel_diff(model, W, surface, family)
    C_gn = _offsets(nx, nu).fs
    CA = _pad8(nx + 1)

    def fn(refs_p, xs_run_p, us_p, interpret):
        N, CR, Bp = refs_p.shape
        dtype = xs_run_p.dtype
        Bt = 128 if not interpret else Bp
        kernel = functools.partial(_diff_kernel_packed, diff_ch=diff_ch,
                                   nx=nx, nu=nu, Bt=Bt)
        return pl.pallas_call(
            kernel,
            grid=(N, Bp // Bt),
            in_specs=[
                pl.BlockSpec((1, CR, Bt), lambda t, i: (t, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sx, Bt), lambda t, i: (t, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, su, Bt), lambda t, i: (t, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, C_gn, Bt), lambda t, i: (t, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CA, Bt), lambda t, i: (t, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, C_gn, Bp), dtype),
                jax.ShapeDtypeStruct((N, CA, Bp), dtype),
            ],
            interpret=interpret,
        )(refs_p, xs_run_p, us_p)

    return fn


def make_diff_all(model, W, surface: bool, family: str, knot_diff):
    """custom_vmap'd all-knot derivative pass.

    fn(refs_run, xs_run, us) -> KnotDeriv with leading N.
    Unbatched: ``vmap(knot.diff)`` (identical to the solver's default
    path); under vmap(solve): the fused Pallas kernel over (B*N) lanes.
    """
    from ..ocp.channel_diff import make_channel_diff

    nx = 21 if family == "augmented" else 14
    nu = 7
    diff_ch = make_channel_diff(model, W, surface, family)

    @jax.custom_batching.custom_vmap
    def diff_all(refs_run, xs_run, us):
        return jax.vmap(knot_diff)(refs_run, xs_run, us)

    @diff_all.def_vmap
    def _rule(axis_size, in_batched, refs_run, xs_run, us):
        def bcast(tree, tb):
            return jax.tree.map(
                lambda l, b: l if b else jnp.broadcast_to(
                    l[None], (axis_size,) + l.shape), tree, tb)

        refs_b = bcast(refs_run, in_batched[0])
        xs_b = bcast(xs_run, in_batched[1])
        us_b = bcast(us, in_batched[2])
        out = _pallas_diff_batched(refs_b, xs_b, us_b, diff_ch=diff_ch,
                                   nx=nx, nu=nu,
                                   interpret=_resolve_interpret())
        return out, jax.tree.map(lambda _: True, out)

    return diff_all
