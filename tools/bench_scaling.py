"""SPMD scaling-efficiency sweep on the virtual device mesh.

Measures batched flagship solves/s vs n_devices on a dp (batch-sharded)
mesh — the BASELINE.md "scaling efficiency" leg, produced on the 8-virtual-
device CPU mesh since real multi-chip hardware is not attached to this
container.  CPU absolute rates are meaningless next to the TPU headline;
the *ratio* rate(n) / (n * rate(1)) with fixed per-device batch (weak
scaling) isolates the SPMD partition/compile/dispatch overhead, which is
the transferable number: on real chips the same program layout applies and
collectives ride ICI instead of shared memory.

Usage: python tools/bench_scaling.py [--devices 1,2,4,8] [--bpd 8]
Writes a JSON summary to results_scaling.json and prints a table.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--bpd", type=int, default=8,
                    help="batch per device (weak scaling)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="results_scaling.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import jax.numpy as jnp
    from ffmpc_tpu.core import gravity_torque
    from ffmpc_tpu.parallel.mesh import make_dp_mesh, shard_batch
    from ffmpc_tpu.run.batch_runner import make_batched_solve_fn, EpisodeConfig
    from ffmpc_tpu.solver.fddp import FDDPSettings
    from __graft_entry__ import _common

    dtype = jnp.float32
    model, W, _, traj, ep0, q0 = _common(dtype, horizon=40,
                                         max_iters=args.iters)
    settings = FDDPSettings(max_iters=args.iters, use_box=True)
    ep = EpisodeConfig(controller="force_feedback", horizon=40,
                       ff_alpha_ocp=ep0.ff_alpha_ocp,
                       ff_alpha_ctrl=ep0.ff_alpha_ctrl,
                       deriv_mode="analytic")
    solve = make_batched_solve_fn(model, W, settings, traj, ep, q0,
                                  surface=True, dtype=dtype,
                                  calc_mode="vector")

    tau_g = np.asarray(gravity_torque(model, jnp.asarray(q0, dtype)))
    y0 = np.concatenate([q0, np.zeros(7), tau_g]).astype(np.float32)
    rng = np.random.default_rng(0)
    devices = jax.devices("cpu")
    rows = []
    for nd in (int(d) for d in args.devices.split(",")):
        if nd > len(devices):
            print(f"skip n={nd}: only {len(devices)} devices")
            continue
        mesh = make_dp_mesh(nd, devices=devices[:nd])
        bs = shard_batch(mesh)
        B = args.bpd * nd
        y0s = y0[None] + 0.02 * rng.normal(size=(B, 21)).astype(np.float32)
        ts = np.full((B,), 1.2, np.float32)
        xs = np.tile(y0s[:, None, :], (1, 41, 1))
        us = np.tile(tau_g.astype(np.float32)[None, None], (B, 40, 1))
        fn = jax.jit(solve, in_shardings=(bs,) * 4, out_shardings=bs)
        argsd = tuple(jax.device_put(jnp.asarray(a), bs)
                      for a in (ts, y0s, xs, us))
        t0 = time.perf_counter()
        out = fn(*argsd)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*argsd)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps
        rate = B / dt
        rows.append({"n_devices": nd, "batch": B, "solves_per_s": rate,
                     "batch_latency_s": dt, "compile_s": t_compile})
        print(f"n={nd} B={B}: {rate:8.2f} solves/s "
              f"({dt * 1e3:.1f} ms/batch, compile {t_compile:.0f}s)",
              flush=True)

    base = rows[0]["solves_per_s"] / rows[0]["n_devices"]
    for r in rows:
        r["weak_scaling_efficiency"] = (
            r["solves_per_s"] / (r["n_devices"] * base))
    print("\nweak-scaling efficiency vs 1 device:")
    for r in rows:
        print(f"  n={r['n_devices']}: {r['weak_scaling_efficiency']:.3f}")
    with open(args.out, "w") as f:
        json.dump({"mode": "weak", "bpd": args.bpd, "platform": "cpu-virtual",
                   "rows": rows}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
