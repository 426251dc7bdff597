"""Ensemble-metric sensitivity to the device-plant contact-force law.

VERDICT r4 item 5: the device plant's STATE-MATCHED force law matches
MuJoCo to <1% (tests/test_device_plant.py, compile-time diagA
regularizer), but transient/margin-zone single-step errors during
closed-loop replay reach tens of percent at contact onset.  This tool
bounds the practical impact: it perturbs the contact-force law by a
KNOWN factor (scaling the constraint regularizer — in the stiff-contact
regime force scales ~inversely) and measures how the closed-loop
ensemble headline metrics move.  If +/-20% force-law error moves the
metrics by <<20%, the fidelity chain is insensitive at the observed
error scale.

Usage: python -m tools.fidelity_sensitivity [--batch 32] [--ticks 400]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ticks", type=int, default=400)
    ap.add_argument("--scales", default="0.8,1.0,1.25")
    ap.add_argument("--out", default="results_fidelity_sensitivity.json")
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
    from ffmpc_tpu.run.batch_runner import make_episode_fn, EpisodeConfig
    from tools.rti_quality import metrics

    dtype = jnp.float32
    model = make_panda_model("plant", dtype=dtype)
    W = flagship_weights()
    traj = flagship_trajectory()
    t_contact = float(traj.t_pre) + float(traj.t_approach)
    solver = FDDPSettings(max_iters=10, use_box=True,
                          backward_mode="pallas", rollout_mode="pallas",
                          diff_mode="pallas")
    q0 = np.asarray(KEYFRAMES["neutral"])
    rng = np.random.default_rng(0)
    q0s = jnp.asarray(q0[None] + 0.01 * rng.normal(size=(args.batch, 7)),
                      dtype)

    results = {}
    for controller in ("force_feedback", "classical"):
        ep = EpisodeConfig(controller=controller, horizon=40,
                           n_ticks=args.ticks, ff_alpha_ocp=W.ff_alpha,
                           ff_alpha_ctrl=flagship_ff_alpha(FLAGSHIP_DT_MPC))
        table0 = make_table_params(0.0, dtype=dtype)
        run = jax.jit(jax.vmap(make_episode_fn(
            model, W, solver, traj, table0, ep, q0, dtype=dtype),
            in_axes=(0, None)))
        for s in (float(x) for x in args.scales.split(",")):
            # scale the soft-constraint regularizer: R' = R / s scales the
            # transmitted force by ~s in the regularized (margin/transient)
            # regime where the replay errors live.  The table rides as a
            # traced argument, so all scales share one executable.
            table = table0._replace(
                diag_approx=table0.diag_approx / jnp.asarray(s, dtype))
            telem = run(q0s, table)
            jax.block_until_ready(telem)
            row = metrics(telem, t_contact)
            key = f"{controller}/force_scale_{s:g}"
            results[key] = row
            print(key + ": " + json.dumps(row), flush=True)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
