"""Run the BASELINE >=2-hosts sweep at flagship shapes and record results.

Launches 2 worker processes (4 virtual CPU devices each -> one 8-device dp
mesh over the distributed runtime), solving the 4096-problem flagship
force-feedback sweep (N=40 augmented contact OCP) with a cross-process
metric reduction, plus the knot-sharded BOX Riccati reduction collective
across all 8 devices.  Writes results_multihost.json.

On a real pod slice the same worker runs with --platform tpu and no
explicit coordinator (the TPU runtime wires the processes).

Usage: python -m tools.run_multihost [--batch-per-process 2048]
           [--max-iters 2] [--horizon 40] [--out results_multihost.json]
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-process", type=int, default=2048)
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--max-iters", type=int, default=2)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--controller", default="force_feedback")
    ap.add_argument("--timeout", type=int, default=7200)
    ap.add_argument("--out", default="results_multihost.json")
    args = ap.parse_args()

    port = free_port()
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices_per_process}")
    env["PYTHONPATH"] = str(REPO)

    procs = []
    jsons = []
    t0 = time.time()
    for pid in range(args.num_processes):
        jout = f"/tmp/mh_proc{pid}.json"
        jsons.append(jout)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "ffmpc_tpu.parallel.multihost_worker",
             "--coordinator", f"localhost:{port}",
             "--num-processes", str(args.num_processes),
             "--process-id", str(pid),
             "--batch-per-process", str(args.batch_per_process),
             "--horizon", str(args.horizon),
             "--max-iters", str(args.max_iters),
             "--controller", args.controller,
             "--flagship", "--knot-sharded",
             "--json-out", jout],
            cwd=str(REPO), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    rc = 0
    for p in procs:
        out, _ = p.communicate(timeout=args.timeout)
        outs.append(out)
        rc |= p.returncode
    wall = time.time() - t0
    for pid, out in enumerate(outs):
        print(f"--- proc {pid} ---")
        print("\n".join(out.strip().splitlines()[-6:]))
    if rc != 0:
        print("FAILED")
        return rc

    per_proc = [json.load(open(j)) for j in jsons]
    # cross-process agreement on the collective-reduced metric
    costs = [d["mean_cost"] for d in per_proc]
    agree = abs(costs[0] - costs[-1]) <= 1e-6 * max(1.0, abs(costs[0]))
    result = dict(
        config="baseline_ge2hosts_4096_sweep",
        num_processes=args.num_processes,
        devices_per_process=args.devices_per_process,
        batch_global=per_proc[0]["batch_global"],
        horizon=args.horizon, max_iters=args.max_iters,
        controller=args.controller,
        mean_cost=costs[0], cross_process_metric_agreement=bool(agree),
        solves_per_s=per_proc[0]["solves_per_s"],
        sweep_s=per_proc[0]["sweep_s"],
        knot_sharded_ok=per_proc[0]["knot_sharded_ok"],
        knot_sharded_rel_err=per_proc[0]["knot_sharded_rel_err"],
        wall_s=wall,
        note=("CPU virtual-device measurement: XLA:CPU on a 2-core "
              "container measures the collective/sharding CODE PATH, not "
              "TPU throughput; solves_per_s here is not comparable to the "
              "single-chip TPU bench."),
        per_process=per_proc,
    )
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", args.out, "agreement:", agree)
    return 0 if agree else 1


if __name__ == "__main__":
    raise SystemExit(main())
