"""B=1 replan-latency sweep: which solver/knot configuration minimizes the
single-solve latency against the 5 ms replan budget (BASELINE.md:33)?

The throughput layout (scalar channels, batched line search) is built for
B>=256 lane occupancy; at B=1 it runs thousands of 1-lane ops.  This tool
A/Bs latency-oriented configurations on the real chip:

  scalar-10      the throughput program at B=1 (baseline)
  vector-10      vector calc + analytic derivs
  vecpar-10      + parallel (associative-scan) Riccati backward
  vecwhile-10    + while-loop line search (first acceptance stops)
  rti-1          vector/parallel, max_iters=1 — the real-time-iteration
                 per-tick latency (200 Hz MPC pipelining mode)

Usage: python -m tools.bench_latency [n_samples]
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
    from ffmpc_tpu.solver.fddp import solve, FDDPSettings
    from ffmpc_tpu.run.batch_runner import EpisodeConfig
    from __graft_entry__ import _common

    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    dtype = jnp.float32
    model, W, _, traj, ep0, q0 = _common(dtype, horizon=40, max_iters=10)
    N = 40
    q0j = jnp.asarray(q0, dtype)
    tau_g = gravity_torque(model, q0j)
    y0 = jnp.concatenate([q0j, jnp.zeros(7, dtype), tau_g])
    R_des = jnp.asarray(make_vertical_down_R(), dtype)
    x_reg = jnp.concatenate([q0j, jnp.zeros(7, dtype)])

    rng = np.random.default_rng(0)

    def make_problem():
        # distinct inputs per timed sample: guards against remote-execution
        # result-memoization in the tunnel path (see bench.py, r3 hardening)
        y0p_ = y0 + 0.02 * jnp.asarray(rng.normal(size=21), dtype)
        return y0p_, jnp.tile(y0p_, (N + 1, 1)), jnp.tile(tau_g, (N, 1))

    y0p, xs_w, us_w = make_problem()

    def make_fn(calc_mode, deriv_mode, settings, batch1=False):
        knot = make_augmented_knot(model, W, surface=True,
                                   deriv_mode=deriv_mode, calc_mode=calc_mode)

        def f(t, x0, xs, us):
            refs_run, ref_T = build_problem_refs(
                traj, t, N, W.dt_ocp, x_reg, tau_g, R_des, y_ref=x0,
                dtype=dtype)
            return solve(knot, refs_run, ref_T, x0, xs, us, settings)

        if not batch1:
            return jax.jit(f)
        # the fused Pallas kernels engage under vmap (custom_vmap rule):
        # wrap the single solve as a B=1 batch so the backward/rollout run
        # as one-kernel-launch sweeps padded to one 128-lane tile
        fv = jax.vmap(f, in_axes=(None, 0, 0, 0))

        def f1(t, x0, xs, us):
            res = fv(t, x0[None], xs[None], us[None])
            return jax.tree.map(lambda a: a[0], res)

        return jax.jit(f1)

    configs = {
        "scalar-10": ("scalar", "scalar",
                      FDDPSettings(max_iters=10, use_box=True), False),
        "vector-10": ("vector", "analytic",
                      FDDPSettings(max_iters=10, use_box=True), False),
        "vecpar-10": ("vector", "analytic",
                      FDDPSettings(max_iters=10, use_box=True,
                                   riccati_mode="parallel"), False),
        "vecwhile-10": ("vector", "analytic",
                        FDDPSettings(max_iters=10, use_box=True,
                                     linesearch_mode="while"), False),
        "rti-1": ("vector", "analytic",
                  FDDPSettings(max_iters=1, use_box=True,
                               riccati_mode="parallel"), False),
        # fused-kernel configurations at B=1 (VERDICT r3 item 3): the whole
        # backward sweep (and, for kern-10, the line-search rollout) run as
        # single Pallas launches instead of per-knot scan fusions
        "kernvec-10": ("vector", "analytic",
                       FDDPSettings(max_iters=10, use_box=True,
                                    backward_mode="pallas"), True),
        "kern-10": ("scalar", "scalar",
                    FDDPSettings(max_iters=10, use_box=True,
                                 backward_mode="pallas",
                                 rollout_mode="pallas"), True),
        "kern-rti-1": ("vector", "analytic",
                       FDDPSettings(max_iters=1, use_box=True,
                                    backward_mode="pallas"), True),
    }
    only = [a for a in sys.argv[2:] if not a.startswith("-")]
    if only:
        configs = {k: v for k, v in configs.items() if k in only}

    out = {}
    t_arg = jnp.asarray(1.2, dtype)
    for name, (cm, dm, st, b1) in configs.items():
        fn = make_fn(cm, dm, st, batch1=b1)
        t_c0 = time.perf_counter()
        res = fn(t_arg, y0p, xs_w, us_w)
        jax.block_until_ready(res)
        compile_s = time.perf_counter() - t_c0
        probs = [make_problem() for _ in range(n_samples)]
        jax.block_until_ready(probs)
        samples = []
        for y0_i, xs_i, us_i in probs:
            t0 = time.perf_counter()
            res = fn(t_arg, y0_i, xs_i, us_i)
            jax.block_until_ready(res)
            samples.append((time.perf_counter() - t0) * 1e3)
        s = np.asarray(samples)
        out[name] = dict(p50=float(np.percentile(s, 50)),
                         p99=float(np.percentile(s, 99)),
                         cost=float(res.cost), iters=int(res.iters),
                         compile_s=round(compile_s, 1))
        print(name, json.dumps(out[name]), flush=True)
    print("SUMMARY", json.dumps(out))


if __name__ == "__main__":
    main()
