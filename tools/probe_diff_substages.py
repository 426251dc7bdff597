"""Split the knot-derivative stage into substages on the chip.

knot.diff = (a) the scalar-chain derivative sweeps (FK/RNEA/KKT tangents
-> acc, da_dx, da_du, df_*, residual Jacobians) + (b) the structured GN
assembly (cost gradients/Hessians from the residual stacks).  This probe
times (a) alone vs the full diff, so the remaining optimization target is
identified by measurement instead of guesswork (VERDICT r2 #4 / ROADMAP
round-3 lead 1).

Usage: python tools/probe_diff_substages.py [B]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, argsets, reps=5):
    out = fn(*argsets[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*argsets[i % len(argsets)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main(B=256):
    from ffmpc_tpu.core import gravity_torque
    from ffmpc_tpu.core.scalar_chain import (chain_consts,
                                             contact_dynamics_derivs_chain)
    from ffmpc_tpu.ocp.problem import build_problem_refs
    from ffmpc_tpu.ocp.action import make_augmented_knot
    from ffmpc_tpu.mpc.controllers import make_vertical_down_R
    from __graft_entry__ import _common

    dtype = jnp.float32
    model, W, _, traj, ep0, q0 = _common(dtype, horizon=40, max_iters=10)
    N = 40
    mc = chain_consts(model)

    tau_g = np.asarray(gravity_torque(model, jnp.asarray(q0, dtype)))
    y0 = np.concatenate([q0, np.zeros(7), tau_g]).astype(np.float32)
    rng = np.random.default_rng(0)

    def make_inputs():
        ys = jnp.asarray(
            y0[None, None] + 0.01 * rng.normal(size=(B, N, 21)), dtype)
        ws = jnp.asarray(np.tile(tau_g[None, None], (B, N, 1))
                         + 0.01 * rng.normal(size=(B, N, 7)), dtype)
        return ys, ws

    x_reg = jnp.asarray(np.concatenate([q0, np.zeros(7)]), dtype)
    refs_run, _ = build_problem_refs(
        traj, 1.2, N, W.dt_ocp, x_reg, jnp.asarray(tau_g, dtype),
        make_vertical_down_R(), dtype=dtype)
    refs_bn = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), refs_run)
    argsets = [make_inputs() for _ in range(3)]
    jax.block_until_ready(argsets)

    # (a) bare derivative sweeps: contact KKT chain with analytic tangents,
    # no cost-Jacobian extras, no GN assembly
    def chain_only(y, w):
        dd = contact_dynamics_derivs_chain(
            mc, y[:7], y[7:14], [y[14 + i] for i in range(7)],
            ref_pos=0.335, nc1=True,
            baumgarte_kp=float(W.contact_gains[0]),
            baumgarte_kd=float(W.contact_gains[1]),
            damping_c=float(W.contact_inv_damping))
        return dd.acc, dd.force, dd.da_dx, dd.df_dx, dd.da_du, dd.df_du

    f_chain = jax.jit(lambda ys, ws: jax.vmap(jax.vmap(chain_only))(ys, ws))
    t_chain = timeit(f_chain, argsets)
    print(f"derivs chain only (no extras/GN): {t_chain:7.2f} ms", flush=True)

    # (b) full knot.diff (sweeps + residual-Jacobian extras + GN assembly)
    knot = make_augmented_knot(model, W, surface=True, deriv_mode="scalar")
    f_full = jax.jit(lambda r, ys, ws: jax.vmap(jax.vmap(knot.diff))(
        r, ys, ws))
    f_full = functools.partial(f_full, refs_bn)
    t_full = timeit(f_full, argsets)
    print(f"full knot.diff:                   {t_full:7.2f} ms", flush=True)
    print(f"=> extras + GN assembly:          {t_full - t_chain:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
