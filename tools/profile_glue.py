"""Op-level accounting of the batched solve: where do the 38 ms go?

Captures a perfetto trace of 2 warm batched solves (bench configuration,
all Pallas kernels default), then aggregates device-track event durations
by op name — separating the three fused kernels from XLA glue ops.

Usage: python tools/profile_glue.py [B] [outdir]
"""
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def capture(B=256, outdir="/tmp/ffmpc_glue_trace", impl="vmap"):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ffmpc_tpu.core import gravity_torque
    from ffmpc_tpu.run.batch_runner import make_batched_solve_fn, EpisodeConfig
    from ffmpc_tpu.solver.fddp import FDDPSettings
    from __graft_entry__ import _common

    dtype = jnp.float32
    model, W, _, traj, ep0, q0 = _common(dtype, horizon=40, max_iters=10)
    settings = FDDPSettings(max_iters=10, use_box=True,
                            backward_mode="pallas", rollout_mode="pallas",
                            diff_mode="pallas")
    ep = EpisodeConfig(controller="force_feedback", horizon=40,
                       ff_alpha_ocp=ep0.ff_alpha_ocp,
                       ff_alpha_ctrl=ep0.ff_alpha_ctrl)
    solve = jax.jit(make_batched_solve_fn(model, W, settings, traj, ep, q0,
                                          surface=True, dtype=dtype,
                                          solve_impl=impl))
    tau_g = np.asarray(gravity_torque(model, jnp.asarray(q0, dtype)))
    y0 = np.concatenate([q0, np.zeros(7), tau_g]).astype(np.float32)
    rng = np.random.default_rng(0)
    y0s = jnp.asarray(y0[None] + 0.01 * rng.normal(size=(B, 21)), dtype)
    ts = jnp.full((B,), 1.2, jnp.float32)
    xs = jnp.tile(y0s[:, None], (1, 41, 1))
    us = jnp.tile(jnp.asarray(tau_g, jnp.float32)[None, None], (B, 40, 1))
    jax.block_until_ready(solve(ts, y0s, xs, us))
    with jax.profiler.trace(outdir, create_perfetto_trace=True):
        for _ in range(2):
            out = solve(ts, y0s, xs, us)
        jax.block_until_ready(out)
    return outdir


def analyze(outdir):
    traces = sorted(Path(outdir).rglob("*.json.gz"))
    assert traces, f"no perfetto trace under {outdir}"
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    # find TPU device track pids (names like "/device:TPU:0" or "TPU:0")
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n.upper() or "device" in n.lower()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        tot[name] += e.get("dur", 0.0)
        cnt[name] += 1
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    total = sum(tot.values())
    print(f"device tracks: {[pid_names[p] for p in dev_pids]}")
    print(f"total device-op time (2 solves): {total/1e3:.2f} ms")
    print(f"{'op':60s} {'ms':>9s} {'%':>6s} {'n':>5s}")
    for name, us_ in rows[:40]:
        print(f"{name[:60]:60s} {us_/1e3:9.3f} {100*us_/total:6.2f} "
              f"{cnt[name]:5d}")


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ffmpc_glue_trace"
    impl = sys.argv[3] if len(sys.argv) > 3 else "vmap"
    analyze(capture(B, outdir, impl))
