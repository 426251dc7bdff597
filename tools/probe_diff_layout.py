"""A/B the knot-derivative stage's batch layout / tangent handling on TPU.

The diff stage is the largest unfused solver stage (10.0 ms of the ~8.4 ms
amortized iteration at B=256 — microbench r3).  Two orthogonal layout
levers:

  nested vs flat   vmap(vmap(diff)) leaves channels (B, N)-shaped: XLA
                   tiles the trailing (B, N=40) dims onto (8, 128) so 40 of
                   128 lanes are active.  "flat" reshapes to one (B*N,)
                   axis (fddp.make_flat_vdiff's rule).
  jacfwd vs unroll jacfwd's tangent vmap adds a trailing 7-wide axis to
                   every sweep intermediate; "unroll" (deriv_mode
                   "scalar_unroll") makes the 7 one-hot jvp sweeps separate
                   full-lane op sets (core.scalar_chain._jacfwd7).

Usage: python tools/probe_diff_layout.py [B] [variants...]
variants in {nested-scalar, flat-scalar, nested-unroll, flat-unroll}
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
    """Returns (avg_ms, reps) so callers can reconstruct total timed
    seconds without hardcoding the rep count."""
    out = fn(*argsets[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*argsets[i % len(argsets)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3, reps


def main(B=256, variants=None):
    from ffmpc_tpu.core import gravity_torque
    from ffmpc_tpu.ocp.problem import build_problem_refs
    from ffmpc_tpu.ocp.action import make_augmented_knot
    from ffmpc_tpu.mpc.controllers import make_vertical_down_R
    from __graft_entry__ import _common

    dtype = jnp.float32
    model, W, _, traj, ep0, q0 = _common(dtype, horizon=40, max_iters=10)
    N = 40

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
    refs_flat = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape).reshape(
            (B * N,) + a.shape[1:]), refs_run)

    knots = {}

    def get_knot(deriv):
        if deriv not in knots:
            knots[deriv] = make_augmented_knot(model, W, surface=True,
                                               deriv_mode=deriv)
        return knots[deriv]

    avail = {
        "nested-scalar": ("scalar", False),
        "flat-scalar": ("scalar", True),
        "nested-unroll": ("scalar_unroll", False),
        "flat-unroll": ("scalar_unroll", True),
    }
    variants = variants or list(avail)
    argsets = [make_inputs() for _ in range(3)]
    jax.block_until_ready(argsets)
    for name in variants:
        deriv, flat = avail[name]
        knot = get_knot(deriv)
        # refs passed as ARGS (closing over them bakes (B, N, ...) literal
        # constants into the HLO — pathological compile)
        if flat:
            f = jax.jit(lambda r, ys, ws, k=knot: jax.vmap(k.diff)(
                r, ys.reshape(B * N, 21), ws.reshape(B * N, 7)))
            f = functools.partial(f, refs_flat)
        else:
            f = jax.jit(lambda r, ys, ws, k=knot: jax.vmap(jax.vmap(k.diff))(
                r, ys, ws))
            f = functools.partial(f, refs_bn)
        t0 = time.perf_counter()
        ms, reps = timeit(f, argsets)
        print(f"{name:16s} {ms:7.2f} ms   (compile+run1 "
              f"{time.perf_counter() - t0 - ms * reps * 1e-3:.0f}s)",
              flush=True)


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    main(B, sys.argv[2:] or None)
