"""A/B the backward sweep in isolation: XLA scan vs fused Pallas kernel.

Builds one realistic batch of knot derivatives (the FF augmented contact
knot at the benchmark shape) and times just the backward stage.

Usage: python -m tools.bench_backward [B ...]   (default 256 1024)
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ffmpc_tpu.core import gravity_torque
    from ffmpc_tpu.ocp.action import make_augmented_knot
    from ffmpc_tpu.ocp.problem import build_problem_refs
    from ffmpc_tpu.mpc.controllers import make_vertical_down_R
    from ffmpc_tpu.solver.backward_pallas import (make_backward_box,
                                                  _backward_seq)
    from __graft_entry__ import _common

    Bs = [int(b) for b in sys.argv[1:]] or [256, 1024]
    dtype = jnp.float32
    model, W, _, traj, ep0, q0 = _common(dtype, horizon=40, max_iters=10)
    N = 40
    knot = make_augmented_knot(model, W, surface=True)
    nx, nu = knot.nx, knot.nu
    u_lb = jnp.asarray(knot.u_lb, dtype)
    u_ub = jnp.asarray(knot.u_ub, dtype)

    q0j = jnp.asarray(q0, dtype)
    tau_g = gravity_torque(model, q0j)
    y0 = jnp.concatenate([q0j, jnp.zeros(7, dtype), tau_g])
    x_reg = jnp.concatenate([q0j, jnp.zeros(7, dtype)])
    refs_run, ref_T = build_problem_refs(
        traj, jnp.asarray(1.2, dtype), N, W.dt_ocp, x_reg, tau_g,
        jnp.asarray(make_vertical_down_R(), dtype), y_ref=y0, dtype=dtype)

    def derive(y0p):
        # dynamics-consistent warm start (small gaps): tiled-state warm
        # starts make the f32 value recursion overflow over 40 knots
        us = jnp.tile(tau_g, (N, 1))

        def roll(x, inp):
            ref, u = inp
            xn, _ = knot.calc(ref, x, u)
            return xn, x
        xN, xs_run = jax.lax.scan(roll, y0p, (refs_run, us))
        xs = jnp.concatenate([xs_run, xN[None]])
        derivs = jax.vmap(knot.diff)(refs_run, xs[:-1], us)
        _, LxT, LxxT = knot.term_diff(ref_T, xs[-1])
        fs = jnp.concatenate([(y0p - xs[0])[None], derivs.xnext - xs[1:]])
        return derivs, LxT, LxxT, fs, us

    backward = make_backward_box(nx, nu, 8)

    def xla_bw(derivs, LxT, LxxT, fs, us, xreg, ureg):
        return _backward_seq(derivs.Fx, derivs.Fu, derivs.Lx, derivs.Lu,
                             derivs.Lxx, derivs.Lxu, derivs.Luu, fs,
                             LxT, LxxT, u_lb[None] - us, u_ub[None] - us,
                             xreg, ureg, boxqp_iters=8, kgain_reg=1e-12)

    def pallas_bw(derivs, LxT, LxxT, fs, us, xreg, ureg):
        return backward(derivs.Fx, derivs.Fu, derivs.Lx, derivs.Lu,
                        derivs.Lxx, derivs.Lxu, derivs.Luu, fs,
                        LxT, LxxT, u_lb[None] - us, u_ub[None] - us,
                        xreg, ureg)

    out = {}
    for B in Bs:
        rng = np.random.default_rng(0)
        y0s = y0[None] + 0.02 * jnp.asarray(
            rng.normal(size=(B, 21)), dtype)
        prep = jax.jit(jax.vmap(derive))
        args = prep(y0s)
        jax.block_until_ready(args)
        # heavy regularization: the cold synthetic problem's f32 value
        # recursion sits at the edge of overflow (the XLA scan produces
        # NaN gains at 1e-3 where the kernel's summation order survives)
        # — 1e-1 keeps BOTH paths finite so the agreement check means
        # something.  Timing is insensitive to the value.
        regs = jnp.full((B,), 1e-1, dtype)

        for name, fn in (("xla", xla_bw), ("pallas", pallas_bw)):
            f = jax.jit(jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0, 0)))
            r = f(*args, regs, regs)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            reps = 10
            for _ in range(reps):
                r = f(*args, regs, regs)
            jax.block_until_ready(r)
            ms = (time.perf_counter() - t0) / reps * 1e3
            out[f"{name}_B{B}"] = round(ms, 3)
            print(f"{name} B={B}: {ms:.3f} ms/sweep "
                  f"(K[0,0,0,0]={float(r[0][0,0,0,0]):.4f})", flush=True)
        # numerical agreement on this batch
        ra = jax.jit(jax.vmap(xla_bw, in_axes=(0, 0, 0, 0, 0, 0, 0)))(*args, regs, regs)
        rp = jax.jit(jax.vmap(pallas_bw, in_axes=(0, 0, 0, 0, 0, 0, 0)))(*args, regs, regs)
        err = max(float(jnp.max(jnp.abs(a - b.astype(a.dtype))))
                  for a, b in zip(ra[:2], rp[:2]))
        out[f"maxerr_B{B}"] = err
        print(f"  max |K,kff| err vs xla: {err:.2e}", flush=True)
    print("SUMMARY", json.dumps(out))


if __name__ == "__main__":
    main()
