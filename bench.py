"""Benchmark: batched full-horizon BoxFDDP solves/s on the accelerator.

Measures the BASELINE.json headline metric — warm-started full-horizon
force-feedback (augmented contact OCP, N=40) BoxFDDP solves per second at
the benchmark iteration budget (10) — swept over batch sizes, plus the
per-solve replan latency vs the 5 ms budget.

Prints ONE JSON line:
  {"metric": "fddp_solves_per_s", "value": ..., "unit": "solves/s",
   "vs_baseline": value / 2000.0, ...aux fields...}
(vs_baseline is against the 2000 solves/s north-star target on v5e.)
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ffmpc_tpu.core import gravity_torque
    from ffmpc_tpu.run.batch_runner import make_batched_solve_fn, EpisodeConfig
    from __graft_entry__ import _common

    dtype = jnp.float32
    model, W, _, traj, ep0, q0 = _common(dtype, horizon=40, max_iters=10)
    import os as _os
    from ffmpc_tpu.solver.fddp import FDDPSettings
    settings = FDDPSettings(
        max_iters=10, use_box=True,
        scan_unroll=int(_os.environ.get("FFMPC_SCAN_UNROLL", "1")),
        riccati_mode=_os.environ.get("FFMPC_RICCATI_MODE", "sequential"),
        # fused Pallas backward sweep: 1836 vs 780 solves/s at B=256.
        # Kernel == interpreter == sequential scan in the equality tests,
        # and Mosaic == interpreter on-chip (tools/bench_backward.py).
        backward_mode=_os.environ.get("FFMPC_BACKWARD_MODE", "pallas"),
        # fused Pallas line-search rollout: 2.54 vs 6.84 ms/rollout at
        # B=256, cost agreement 2.8e-5 rel (tools/bench_rollout.py)
        rollout_mode=_os.environ.get("FFMPC_ROLLOUT_MODE", "pallas"),
        # fused Pallas derivative pass (solver/diff_pallas.py): 6580 vs
        # 3014 solves/s at B=256 (the r4 A/B, /tmp bench logs -> RESULTS.md)
        diff_mode=_os.environ.get("FFMPC_DIFF_MODE", "pallas"),
        linesearch_mode=_os.environ.get("FFMPC_LS_MODE", "batched"))
    ep = EpisodeConfig(controller="force_feedback", horizon=40,
                       ff_alpha_ocp=ep0.ff_alpha_ocp,
                       ff_alpha_ctrl=ep0.ff_alpha_ctrl,
                       # "auto" resolves to the scalar-channel analytic
                       # derivatives on TPU; "scalar_unroll" additionally
                       # unrolls the 7 one-hot tangent sweeps (full-lane)
                       deriv_mode=_os.environ.get("FFMPC_DERIV_MODE", "auto"))
    # packed-carry batched solve (solver/packed.py): bitwise-identical
    # trajectories to vmap(fddp.solve) with the all-Pallas configuration
    # (tools/verify_packed_tpu.py: 256/256 same iters, max|du|=0), ~1.3x
    # faster by keeping every per-knot array in kernel layout across the
    # iteration loop (no pack/unpack transposes between kernels)
    solve = make_batched_solve_fn(
        model, W, settings, traj, ep, q0, surface=True, dtype=dtype,
        solve_impl=_os.environ.get("FFMPC_SOLVE_IMPL", "packed"))
    solve_j = jax.jit(solve)

    tau_g = np.asarray(gravity_torque(model, jnp.asarray(q0, dtype)))
    y0 = np.concatenate([q0, np.zeros(7), tau_g]).astype(np.float32)
    rng = np.random.default_rng(0)

    def make_args(B):
        y0s = y0[None] + 0.02 * rng.normal(size=(B, 21)).astype(np.float32)
        ts = np.full((B,), 1.2, np.float32)
        xs = np.tile(y0s[:, None, :], (1, ep.horizon + 1, 1))
        us = np.tile(tau_g.astype(np.float32)[None, None], (B, ep.horizon, 1))
        return (jnp.asarray(ts), jnp.asarray(y0s), jnp.asarray(xs), jnp.asarray(us))

    import os
    # Each batch size is a separate XLA executable; compiles through the
    # axon tunnel are expensive, so the default run measures one batch size
    # (override with FFMPC_BENCH_BATCHES="64,256,512").
    batches = tuple(int(b) for b in
                    os.environ.get("FFMPC_BENCH_BATCHES", "256,1024").split(","))
    best = 0.0
    best_B = 0
    lat_ms = mean_iters = float("nan")
    reps = 3
    for B in batches:
        # distinct inputs per rep and a block on EVERY output: guards the
        # measurement against any result-memoization / lazy-materialization
        # in the remote-device path (a r3 run once reported a physically
        # impossible 0.17 ms batch latency with identical repeated inputs)
        argsets = [make_args(B) for _ in range(reps)]
        out = solve_j(*argsets[0])      # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [solve_j(*a) for a in argsets]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / reps
        rate = B / dt
        import sys as _sys
        print(f"B={B}: {rate:.1f} solves/s ({dt * 1e3:.2f} ms/batch)",
              file=_sys.stderr, flush=True)
        if rate > best:
            best, best_B, lat_ms = rate, B, dt * 1e3
            # iteration-count honesty: solves/s is only comparable at the
            # full budget; report how many iterations actually ran
            mean_iters = float(np.mean(np.asarray(outs[-1].iters)))
    # ---- B=1 replan latency vs the 5 ms budget (BASELINE.md:33) --------
    # Two views: (a) host-dispatched single solve — includes the host->device
    # dispatch path, the honest number for a host-driven 200 Hz loop;
    # (b) per-tick time inside an on-device closed loop (solve+policy+plant
    # fused in one scan) — the TPU-native real-time deployment shape, where
    # dispatch cost amortizes over the episode.
    if os.environ.get("FFMPC_BENCH_B1", "1") != "0":
        # Low-latency configuration (measured winner, tools/bench_latency.py
        # r4 sweep): the fused Pallas backward + rollout kernels at B=1 —
        # each sweep is ONE kernel launch padded to a 128-lane tile, vs the
        # XLA scan's hundreds of launches.  Measured 36.4 ms p50 / 40.5 p99
        # for the full 10-iteration replan (vs 104.7/123.5 for the r3
        # vector+parallel-Riccati config, and vs r3's shipped 119.5/216.2).
        from ffmpc_tpu.run.batch_runner import make_batched_solve_fn as _mk
        settings_lat = FDDPSettings(max_iters=10, use_box=True,
                                    backward_mode="pallas",
                                    rollout_mode="pallas",
                                    diff_mode="pallas")
        ep_lat = EpisodeConfig(controller="force_feedback", horizon=40,
                               ff_alpha_ocp=ep0.ff_alpha_ocp,
                               ff_alpha_ctrl=ep0.ff_alpha_ctrl,
                               deriv_mode="scalar")
        solve_lat = jax.jit(_mk(model, W, settings_lat, traj, ep_lat, q0,
                                surface=True, dtype=dtype,
                                calc_mode="scalar"))

        def sample_ms(fn, argsets):
            # distinct inputs per sample + block on every output (same
            # memoization guard as the batch loop above)
            out = fn(*argsets[0])
            jax.block_until_ready(out)
            s = []
            for a in argsets[1:]:
                t0 = time.perf_counter()
                out = fn(*a)
                jax.block_until_ready(out)
                s.append((time.perf_counter() - t0) * 1e3)
            return np.asarray(s)

        argsets1 = [make_args(1) for _ in range(51)]
        jax.block_until_ready(argsets1)
        samples = sample_ms(solve_lat, argsets1)
        replan_p50 = float(np.percentile(samples, 50))
        replan_p99 = float(np.percentile(samples, 99))
        # RTI mode: one solver iteration per tick (warm start + reg carry
        # does the converging across ticks) — the 200 Hz pipelining story.
        settings_rti = FDDPSettings(max_iters=1, use_box=True,
                                    backward_mode="pallas",
                                    rollout_mode="pallas",
                                    diff_mode="pallas")
        solve_rti = jax.jit(_mk(model, W, settings_rti, traj, ep_lat, q0,
                                surface=True, dtype=dtype,
                                calc_mode="scalar"))
        rti_samples = sample_ms(solve_rti, argsets1)
        rti_p50 = float(np.percentile(rti_samples, 50))
        # estimated on-device per-iteration time with the host->device
        # dispatch roundtrip removed (dispatch ~= the B=0-work floor; the
        # 10-iter and 1-iter programs share it, so the difference isolates
        # 9 iterations of device time)
        iter_ms_device = max(replan_p50 - rti_p50, 0.0) / 9.0

        from ffmpc_tpu.run.batch_runner import make_episode_fn
        from ffmpc_tpu.sim.device_plant import make_table_params
        ep_cl = EpisodeConfig(
            controller="force_feedback", horizon=40, n_ticks=40,
            ff_alpha_ocp=ep0.ff_alpha_ocp, ff_alpha_ctrl=ep0.ff_alpha_ctrl,
            deriv_mode="analytic")
        episode = jax.jit(jax.vmap(make_episode_fn(
            model, W, settings_lat, traj, make_table_params(0.0, dtype=dtype),
            ep_cl, q0, dtype=dtype)))
        q0b = jnp.asarray(q0[None].astype(np.float32))
        telem = episode(q0b)
        jax.block_until_ready(telem)
        t0 = time.perf_counter()
        for _ in range(3):
            telem = episode(q0b)
        jax.block_until_ready(telem)
        ondevice_tick_ms = (time.perf_counter() - t0) / 3 / ep_cl.n_ticks * 1e3
    else:
        replan_p50 = replan_p99 = ondevice_tick_ms = float("nan")
        rti_p50 = iter_ms_device = float("nan")

    # north-star: >=2000 solves/s on a v5e-8 => 250/chip; this container has
    # one chip, so vs_baseline is measured against the per-chip share and
    # vs_northstar_8chip against the full-pod target.
    n_chips = max(1, len([d for d in jax.devices()
                          if d.platform != "cpu"])) if jax.default_backend() != "cpu" else 1
    per_chip_target = 2000.0 / 8.0

    def _r(x, nd=2):
        # NaN-safe rounding: json.dump emits a bare NaN token (non-strict
        # JSON) — emit null instead (ADVICE r3)
        return round(float(x), nd) if np.isfinite(x) else None

    # hardware-normalized accounting (VERDICT r3 item 6): analytic FLOPs per
    # solve at the flagship shapes -> achieved FLOP/s and % of v5e peak
    from ffmpc_tpu.utils.flops import flops_per_solve, PEAK_FLOPS
    fps = flops_per_solve(N=ep.horizon, iters=10, nx=21, nu=7,
                          n_alphas=settings.n_alphas,
                          boxqp_iters=settings.boxqp_iters)
    achieved_flops = best * fps
    print(json.dumps({
        "metric": "fddp_solves_per_s",
        "value": round(best, 1),
        "unit": "solves/s",
        "vs_baseline": round(best / (per_chip_target * n_chips), 3),
        "vs_northstar_8chip": round(best / 2000.0, 3),
        "n_chips": n_chips,
        "batch": best_B,
        "batch_latency_ms": _r(lat_ms),
        "mean_iters": _r(mean_iters),
        "flops_per_solve": round(fps),
        "achieved_gflops": _r(achieved_flops / 1e9, 1),
        "mfu_vs_bf16_peak": _r(achieved_flops / PEAK_FLOPS["tpu_v5e_bf16"], 6),
        "mfu_vs_fp32_vpu_peak": _r(
            achieved_flops / PEAK_FLOPS["tpu_v5e_fp32_vpu"], 5),
        "replan_latency_ms_b1": _r(replan_p50),
        "replan_latency_ms_b1_p99": _r(replan_p99),
        "rti_tick_latency_ms_b1": _r(rti_p50),
        "solver_iter_ms_device_b1": _r(iter_ms_device),
        "ondevice_closedloop_tick_ms_b1": _r(ondevice_tick_ms),
        "replan_budget_ms": 5.0,
        "horizon": ep.horizon,
        "max_iters": 10,
        "controller": "force_feedback_augmented_contact",
        "backend": jax.default_backend(),
    }))


def multichip():
    """--multichip: the multi-chip readiness switch (VERDICT r4 item 9).

    With >1 real devices: runs the dp-mesh sharded batched solve (the
    BASELINE scaling-efficiency leg) and prints the 8-chip-style BENCH
    row unattended.  With 1 device (this dev container): falls back to
    the virtual-8-device dryrun gate in a CPU subprocess, so the command
    always produces a machine-readable readiness line."""
    import jax
    n = jax.device_count()
    if n > 1:
        import time
        import jax.numpy as jnp
        from ffmpc_tpu.core import gravity_torque
        from ffmpc_tpu.run.batch_runner import (make_batched_solve_fn,
                                                EpisodeConfig)
        from ffmpc_tpu.parallel.mesh import make_dp_mesh, shard_batch
        from ffmpc_tpu.solver.fddp import FDDPSettings
        from __graft_entry__ import _common

        dtype = jnp.float32
        model, W, _, traj, ep0, q0 = _common(dtype, horizon=40, max_iters=10)
        settings = FDDPSettings(max_iters=10, use_box=True,
                                backward_mode="pallas",
                                rollout_mode="pallas", diff_mode="pallas")
        ep = EpisodeConfig(controller="force_feedback", horizon=40,
                           ff_alpha_ocp=ep0.ff_alpha_ocp,
                           ff_alpha_ctrl=ep0.ff_alpha_ctrl)
        # vmap path for the sharded run: batch-leading arrays shard on the
        # dp axis without resharding (the packed path keeps batch on the
        # minor axis; evaluate its multi-chip layout when hardware exists)
        solve = make_batched_solve_fn(model, W, settings, traj, ep, q0,
                                      surface=True, dtype=dtype,
                                      solve_impl="vmap")
        mesh = make_dp_mesh(n)
        bs = shard_batch(mesh)
        fn = jax.jit(solve, in_shardings=(bs, bs, bs, bs),
                     out_shardings=bs)
        B = 256 * n
        tau_g = np.asarray(gravity_torque(model, jnp.asarray(q0, dtype)))
        y0 = np.concatenate([q0, np.zeros(7), tau_g]).astype(np.float32)
        rng = np.random.default_rng(0)

        def args_():
            y0s = jnp.asarray(y0[None] + 0.02 * rng.normal(size=(B, 21)),
                              dtype)
            return (jnp.full((B,), 1.2, jnp.float32), y0s,
                    jnp.tile(y0s[:, None], (1, 41, 1)),
                    jnp.tile(jnp.asarray(tau_g, jnp.float32)[None, None],
                             (B, 40, 1)))

        sets = [args_() for _ in range(3)]
        out = fn(*sets[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(*s) for s in sets]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / len(sets)
        print(json.dumps({
            "metric": "fddp_solves_per_s_multichip",
            "value": round(B / dt, 1), "unit": "solves/s",
            "vs_baseline": round(B / dt / 2000.0, 3), "n_chips": n,
            "batch": B, "batch_latency_ms": round(dt * 1e3, 2),
            "per_chip_solves_per_s": round(B / dt / n, 1)}))
        return
    import os
    import subprocess
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    p = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        env=env, capture_output=True, text=True, timeout=3600)
    print(json.dumps({
        "metric": "multichip_dryrun_ok", "value": float(p.returncode == 0),
        "unit": "bool", "vs_baseline": float(p.returncode == 0),
        "n_devices_virtual": 8,
        "note": "1 real chip present; sharded paths validated on the "
                "virtual 8-device mesh; rerun with real devices for the "
                "scaling row"}))
    if p.returncode != 0:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])


if __name__ == "__main__":
    import sys
    if "--multichip" in sys.argv:
        multichip()
        sys.exit(0)
    main()
