"""RTI closed-loop quality at the shipped kernel configuration.

VERDICT r4 item 3: the "200 Hz met on device" headline paired round-4
latency with round-2 quality data (flat scenario, host plant, pre-kernel
code).  This tool refreshes the study: ALL 5 scenarios x BOTH controllers
x iteration budgets {1, 2, 10}, fully on-device closed loop
(batch_runner episodes — solve + Riccati policy + device plant in one
scan, Pallas kernels default on TPU), canonical metrics over the contact
phase (reference metric definitions: run_classical.py:524-534, mirrored
in run/experiment.py:340-351).

The table geometry rides as a TRACED episode argument, so the four
geometric scenarios (flat + tilted_*) share one compiled executable per
(controller, budget); only actuation_uncertainty (different RNG graph)
compiles separately.

Usage: python -m tools.rti_quality [--batch 32] [--ticks 400]
       [--budgets 1,2,10] [--out results_rti_quality.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

SCENARIOS = ("flat", "tilted_5", "tilted_10", "tilted_15",
             "actuation_uncertainty")
CONTACT_THRESHOLD = 0.5     # N (run_classical.py:413)
FN_DES = 22.0               # N benchmark (run_classical.py:296)


def metrics(telem, t_contact):
    t = np.asarray(telem["t"])[0]                    # (ticks,)
    err_tan = np.asarray(telem["err_tan"])           # (B, ticks)
    err_3d = np.asarray(telem["err_3d"])
    fn = np.asarray(telem["fn_meas"])
    phase = t >= t_contact
    fn_p = fn[:, phase]
    return dict(
        rms_tan=float(np.sqrt((err_tan ** 2).mean())),
        rms_tan_phase=float(np.sqrt((err_tan[:, phase] ** 2).mean())),
        rms_3d=float(np.sqrt((err_3d ** 2).mean())),
        avg_abs_force_err=float(np.abs(fn_p - FN_DES).mean()),
        max_fn=float(fn_p.max()),
        contact_loss_phase_pct=float(
            100.0 * (fn_p < CONTACT_THRESHOLD).mean()),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ticks", type=int, default=400)
    ap.add_argument("--budgets", default="1,2,10")
    ap.add_argument("--controllers", default="classical,force_feedback")
    ap.add_argument("--scenarios", default=",".join(SCENARIOS))
    ap.add_argument("--out", default="results_rti_quality.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ffmpc_tpu.core import make_panda_model, KEYFRAMES
    from ffmpc_tpu.ocp.weights import (flagship_weights, flagship_trajectory,
                                       flagship_ff_alpha, FLAGSHIP_DT_MPC)
    from ffmpc_tpu.solver.fddp import FDDPSettings
    from ffmpc_tpu.sim.device_plant import make_table_params
    from ffmpc_tpu.run.batch_runner import (make_episode_fn, EpisodeConfig,
                                            DeviceUncertainty)
    from ffmpc_tpu.run.scenarios import scenario_settings, scenario_seed

    dtype = jnp.float32
    model = make_panda_model("plant", dtype=dtype)
    W = flagship_weights()
    traj = flagship_trajectory()
    t_contact = float(traj.t_pre) + float(traj.t_approach)
    q0 = np.asarray(KEYFRAMES["neutral"])
    rng = np.random.default_rng(0)
    q0s = jnp.asarray(q0[None] + 0.01 * rng.normal(size=(args.batch, 7)),
                      dtype)

    results = {}
    for budget in (int(b) for b in args.budgets.split(",")):
        solver = FDDPSettings(max_iters=budget, use_box=True,
                              backward_mode="pallas", rollout_mode="pallas",
                              diff_mode="pallas")
        for controller in args.controllers.split(","):
            ep = EpisodeConfig(
                controller=controller, horizon=40, n_ticks=args.ticks,
                ff_alpha_ocp=W.ff_alpha,
                ff_alpha_ctrl=flagship_ff_alpha(FLAGSHIP_DT_MPC))
            run_geo = None
            for scenario in args.scenarios.split(","):
                sc = scenario_settings(scenario)
                table = make_table_params(sc.tilt_deg, dtype=dtype)
                if scenario == "actuation_uncertainty":
                    srng = np.random.default_rng(scenario_seed(scenario))
                    unc = DeviceUncertainty(
                        a=float(srng.uniform(0.95, 1.05)),
                        b=float(srng.uniform(-0.1, 0.1)),
                        sigma_q=5e-4, sigma_dq=2e-3, sigma_tau=5e-2,
                        seed=scenario_seed(scenario))
                    episode = make_episode_fn(model, W, solver, traj, table,
                                              ep, q0, uncertainty=unc,
                                              dtype=dtype)
                    run = jax.jit(jax.vmap(episode, in_axes=(0, None)))
                else:
                    if run_geo is None:
                        episode = make_episode_fn(model, W, solver, traj,
                                                  table, ep, q0, dtype=dtype)
                        run_geo = jax.jit(
                            jax.vmap(episode, in_axes=(0, None)))
                    run = run_geo
                telem = run(q0s, table)
                jax.block_until_ready(telem)
                t0 = time.perf_counter()
                telem = run(q0s, table)
                jax.block_until_ready(telem)
                wall = time.perf_counter() - t0
                row = metrics(telem, t_contact)
                row["solves_per_s"] = round(args.batch * args.ticks / wall, 1)
                key = f"{controller}/{scenario}/iters{budget}"
                results[key] = row
                print(f"{key}: " + json.dumps(row), flush=True)
                with open(args.out, "w") as f:
                    json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
