"""Capture a jax profiler trace of the batched solver for kernel analysis.

Usage:  python tools/profile_solver.py [outdir]
Writes a TensorBoard-compatible trace under outdir (default /tmp/ffmpc_trace)
covering 2 warm batched solves; inspect with `tensorboard --logdir` or the
trace-viewer JSON in the plugin directory.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(outdir="/tmp/ffmpc_trace", B=256):
    from ffmpc_tpu.core import gravity_torque
    from ffmpc_tpu.run.batch_runner import make_batched_solve_fn, EpisodeConfig
    from ffmpc_tpu.solver.fddp import FDDPSettings
    from __graft_entry__ import _common

    dtype = jnp.float32
    model, W, _, traj, ep0, q0 = _common(dtype, horizon=40, max_iters=10)
    settings = FDDPSettings(max_iters=10, use_box=True)
    ep = EpisodeConfig(controller="force_feedback", horizon=40,
                       ff_alpha_ocp=ep0.ff_alpha_ocp,
                       ff_alpha_ctrl=ep0.ff_alpha_ctrl)
    solve = jax.jit(make_batched_solve_fn(model, W, settings, traj, ep, q0,
                                          surface=True, dtype=dtype))
    tau_g = np.asarray(gravity_torque(model, jnp.asarray(q0, dtype)))
    y0 = np.concatenate([q0, np.zeros(7), tau_g]).astype(np.float32)
    y0s = jnp.asarray(np.tile(y0, (B, 1)))
    ts = jnp.full((B,), 1.2, jnp.float32)
    xs = jnp.tile(y0s[:, None], (1, 41, 1))
    us = jnp.tile(jnp.asarray(tau_g, jnp.float32)[None, None], (B, 40, 1))

    out = solve(ts, y0s, xs, us)      # compile + warm
    jax.block_until_ready(out)

    with jax.profiler.trace(outdir):
        for _ in range(2):
            out = solve(ts, y0s, xs, us)
        jax.block_until_ready(out)
    print("trace written to", outdir)


if __name__ == "__main__":
    main(*sys.argv[1:2])
