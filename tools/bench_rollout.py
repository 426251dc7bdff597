"""A/B the line-search rollout in isolation: XLA alpha-vmapped scan vs
fused Pallas kernel, at the benchmark shape.

Usage: python -m tools.bench_rollout [B ...]   (default 256)
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
    from ffmpc_tpu.solver.rollout_pallas import (make_fused_rollout,
                                                 _pallas_rollout_batched)
    from __graft_entry__ import _common

    Bs = [int(b) for b in sys.argv[1:]] or [256]
    dtype = jnp.float32
    model, W, _, traj, ep0, q0 = _common(dtype, horizon=40, max_iters=10)
    N, NA = 40, 10
    knot = make_augmented_knot(model, W, surface=True)
    nx, nu = knot.nx, knot.nu

    q0j = jnp.asarray(q0, dtype)
    tau_g = gravity_torque(model, q0j)
    y0 = jnp.concatenate([q0j, jnp.zeros(7, dtype), tau_g])
    x_reg = jnp.concatenate([q0j, jnp.zeros(7, dtype)])
    refs_run, ref_T = build_problem_refs(
        traj, jnp.asarray(1.2, dtype), N, W.dt_ocp, x_reg, tau_g,
        jnp.asarray(make_vertical_down_R(), dtype), y_ref=y0, dtype=dtype)

    rollout = make_fused_rollout(knot, NA, use_box=True)

    out = {}
    for B in Bs:
        rng = np.random.default_rng(0)
        x0s = y0[None] + 0.02 * jnp.asarray(rng.normal(size=(B, nx)), dtype)
        xss = jnp.tile(x0s[:, None, :], (1, N + 1, 1))
        uss = jnp.tile(tau_g, (B, N, 1))
        Ks = 0.05 * jnp.asarray(rng.normal(size=(B, N, nu, nx)), dtype)
        kffs = 0.5 * jnp.asarray(rng.normal(size=(B, N, nu)), dtype)
        fss = 0.05 * jnp.asarray(rng.normal(size=(B, N + 1, nx)), dtype)
        feas = jnp.zeros((B,), bool)

        vmapped = jax.vmap(rollout,
                           in_axes=(0, 0, 0, 0, 0, 0, 0, None, None))
        # the custom_vmap rule = the pallas kernel; the XLA reference is
        # vmap of the underlying impl (spelled via the scan directly)
        def xla_version(x0, xs, us, K, kff, fs, f):
            import functools
            # re-derive the impl by calling rollout's fallback:
            # vmap-of-unbatched triggers the rule, so instead rebuild the
            # per-problem scan here (same math as fddp.forward)
            alphas = jnp.asarray(0.5 ** np.arange(NA), dtype)
            u_lb = jnp.asarray(knot.u_lb, dtype)
            u_ub = jnp.asarray(knot.u_ub, dtype)

            def one_alpha(alpha):
                gap_scale = jnp.where(f, 0.0, alpha - 1.0)

                def step(x, inp):
                    ref, x_nom, u_nom, K_t, k_t, fs_next = inp
                    dx = x - x_nom
                    u = jnp.clip(u_nom - alpha * k_t - K_t @ dx, u_lb, u_ub)
                    xnext, cost = knot.calc(ref, x, u)
                    return xnext + gap_scale * fs_next, (x, u, cost)

                xN, (xs_run, us_try, costs) = jax.lax.scan(
                    step, x0, (refs_run, xs[:-1], us, K, kff, fs[1:]))
                return (jnp.concatenate([xs_run, xN[None]]), us_try,
                        jnp.sum(costs) + knot.term_calc(ref_T, xN))

            return jax.vmap(one_alpha)(alphas)

        xla_b = jax.jit(jax.vmap(xla_version, in_axes=(0, 0, 0, 0, 0, 0, 0)))
        pal_b = jax.jit(lambda *a: vmapped(*a, refs_run, ref_T))

        for name, fn in (("xla", xla_b), ("pallas", pal_b)):
            r = fn(x0s, xss, uss, Ks, kffs, fss, feas)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            reps = 10
            for _ in range(reps):
                r = fn(x0s, xss, uss, Ks, kffs, fss, feas)
            jax.block_until_ready(r)
            ms = (time.perf_counter() - t0) / reps * 1e3
            out[f"{name}_B{B}"] = round(ms, 3)
            print(f"{name} B={B}: {ms:.3f} ms/linesearch-rollout "
                  f"(cost[0,0]={float(r[2][0, 0]):.3f})", flush=True)
        ra = xla_b(x0s, xss, uss, Ks, kffs, fss, feas)
        rp = pal_b(x0s, xss, uss, Ks, kffs, fss, feas)
        # xla axes: (B, A, ...) vs pallas (B, A, ...) — same
        err = float(jnp.max(jnp.abs(ra[2] - rp[2])))
        rel = err / float(jnp.max(jnp.abs(ra[2])))
        out[f"cost_relerr_B{B}"] = rel
        print(f"  max rel cost err vs xla: {rel:.2e}", flush=True)
    print("SUMMARY", json.dumps(out))


if __name__ == "__main__":
    main()
