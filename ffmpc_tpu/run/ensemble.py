"""Batched on-device MPC ensembles: N perturbed closed-loop episodes in one
compiled program, sharded over the device mesh.

The BASELINE "512-way batched perturbed-rollout MPC ensemble on one host"
configuration: perturbed initial states (and optionally the
actuation-uncertainty protocol) roll out in parallel on the JAX device
plant, with per-episode metrics reduced on device.

Usage:
    python -m ffmpc_tpu.run.ensemble --batch 512 --ticks 400 \
        --controller force_feedback --scenario flat
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run_ensemble(controller: str = "force_feedback", scenario: str = "flat",
                 batch: int = 512, ticks: int = 400, horizon: int = 40,
                 max_iters: int = 10, seed: int = 0, perturb_q: float = 0.01,
                 n_devices: int | None = None, dtype_name: str = "float32",
                 checkpoint_path: str | None = None, verbose: bool = True,
                 chunk_ticks: int | None = None):
    import jax
    import jax.numpy as jnp
    from ..core import make_panda_model, KEYFRAMES
    from ..ocp.weights import (flagship_weights, flagship_trajectory,
                               flagship_ff_alpha, FLAGSHIP_DT_MPC)
    from ..solver.fddp import FDDPSettings
    from ..sim.device_plant import make_table_params
    from ..parallel.mesh import make_dp_mesh, shard_batch
    from ..run.batch_runner import (make_episode_fn, EpisodeConfig,
                                    DeviceUncertainty)
    from ..run.scenarios import scenario_settings, scenario_seed
    from ..utils.checkpoint import save_checkpoint

    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64
    settings_sc = scenario_settings(scenario)

    model = make_panda_model("plant", dtype=dtype)
    W = flagship_weights()
    traj = flagship_trajectory()
    table = make_table_params(settings_sc.tilt_deg, dtype=dtype)
    # fused Pallas sweeps on TPU (the bench defaults; measured 6767
    # open-loop solves/s at B=256).  On CPU (tests/virtual meshes) the
    # kernels run interpret-mode and the scalar graphs compile
    # pathologically — keep the XLA paths there.
    from ..solver.fddp import resolve_platform_mode
    kern = resolve_platform_mode("auto", scalar="pallas", vector="xla")
    solver = FDDPSettings(max_iters=max_iters, use_box=True,
                          backward_mode=kern, rollout_mode=kern,
                          diff_mode=kern)
    ep = EpisodeConfig(
        controller=controller, horizon=horizon, n_ticks=ticks,
        ff_alpha_ocp=W.ff_alpha,
        ff_alpha_ctrl=flagship_ff_alpha(FLAGSHIP_DT_MPC))

    unc = None
    if scenario == "actuation_uncertainty":
        rng = np.random.default_rng(scenario_seed(scenario))
        unc = DeviceUncertainty(
            a=float(rng.uniform(0.95, 1.05)), b=float(rng.uniform(-0.1, 0.1)),
            sigma_q=5e-4, sigma_dq=2e-3, sigma_tau=5e-2,
            seed=scenario_seed(scenario))
    torque_scale = None
    if np.any(settings_sc.torque_scale != 1.0) and unc is None:
        torque_scale = settings_sc.torque_scale

    q0 = np.asarray(KEYFRAMES["neutral"])
    episode = make_episode_fn(model, W, solver, traj, table, ep, q0,
                              torque_scale=torque_scale, uncertainty=unc,
                              dtype=dtype)

    devices = jax.devices()
    if n_devices and len(devices) < n_devices:
        devices = jax.devices("cpu")
    mesh = make_dp_mesh(n_devices, devices=devices)
    bs = shard_batch(mesh)

    rng = np.random.default_rng(seed)
    q0s = (q0[None] + perturb_q * rng.normal(size=(batch, 7))).astype(
        np.float32 if dtype_name == "float32" else np.float64)
    q0s_dev = jax.device_put(jnp.asarray(q0s), bs)

    if chunk_ticks is None or chunk_ticks >= ticks:
        run = jax.jit(jax.vmap(episode), in_shardings=bs, out_shardings=bs)
        telem = run(q0s_dev)            # compile + warm
        jax.block_until_ready(telem)
        t0 = time.perf_counter()
        telem = run(q0s_dev)
        jax.block_until_ready(telem)
        wall = time.perf_counter() - t0
    else:
        # Chunked execution: one device call per chunk_ticks so a long
        # episode never exceeds the device execution window; the episode
        # carry (plant + warm start + reg) round-trips as sharded device
        # arrays, and each completed chunk can checkpoint to host.
        n_chunks = (ticks + chunk_ticks - 1) // chunk_ticks
        init = jax.jit(jax.vmap(episode.init),
                       in_shardings=bs, out_shardings=bs)
        step = jax.jit(
            jax.vmap(lambda c, t: episode.chunk(c, t, chunk_ticks),
                     in_axes=(0, None)),
            in_shardings=(bs, None), out_shardings=bs)
        carry = init(q0s_dev)
        jax.block_until_ready(carry)
        parts = []
        wall = 0.0
        for ci in range(n_chunks):
            t_start = jnp.asarray(ci * chunk_ticks * 0.005, dtype)
            t0 = time.perf_counter()
            carry, tl = step(carry, t_start)
            jax.block_until_ready(tl)
            wall += time.perf_counter() - t0
            parts.append(jax.tree.map(np.asarray, tl))
            if checkpoint_path:
                save_checkpoint(f"{checkpoint_path}.chunk{ci:03d}", tl,
                                meta={"chunk": ci, "t_start": float(t_start)})
            if verbose:
                print(f"chunk {ci + 1}/{n_chunks}: "
                      f"{chunk_ticks * batch / (time.perf_counter() - t0):.0f} "
                      "solves/s")
        telem = jax.tree.map(
            lambda *xs: np.concatenate(xs, axis=1), *parts)
        telem = {k: v[:, :ticks] for k, v in telem.items()}

    err = np.asarray(telem["err_tan"])      # (B, ticks)
    fn = np.asarray(telem["fn_meas"])
    out = {
        "controller": controller, "scenario": scenario,
        "batch": batch, "ticks": ticks,
        "wall_s": round(wall, 2),
        "episodes_per_s": round(batch / wall, 2),
        "solves_per_s": round(batch * ticks / wall, 1),
        "rms_tan_mean": float(np.sqrt((err ** 2).mean())),
        "rms_tan_p95": float(np.quantile(np.sqrt((err ** 2).mean(axis=1)), 0.95)),
        "fn_final_mean": float(fn[:, -1].mean()),
        "mesh": str(dict(mesh.shape)),
    }
    if checkpoint_path:
        save_checkpoint(checkpoint_path, telem, meta=out)
    if verbose:
        print(json.dumps(out))
    return out, telem


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--controller", choices=("classical", "force_feedback"),
                    default="force_feedback")
    ap.add_argument("--scenario", default="flat")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--ticks", type=int, default=400)
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--max-iters", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--perturb-q", type=float, default=0.01)
    ap.add_argument("--n-devices", type=int, default=None)
    ap.add_argument("--dtype", choices=("float32", "float64"), default="float32")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--chunk-ticks", type=int, default=None,
                    help="Split the episode into device calls of this many "
                         "ticks (execution-window-safe long runs).")
    a = ap.parse_args(argv)
    run_ensemble(controller=a.controller, scenario=a.scenario, batch=a.batch,
                 ticks=a.ticks, horizon=a.horizon, max_iters=a.max_iters,
                 seed=a.seed, perturb_q=a.perturb_q, n_devices=a.n_devices,
                 dtype_name=a.dtype, checkpoint_path=a.checkpoint,
                 chunk_ticks=a.chunk_ticks)


if __name__ == "__main__":
    main()
