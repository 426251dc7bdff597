"""Device-plant fidelity vs the host MuJoCo arbiter (VERDICT r2 item 6).

The on-device ensemble throughput headline rests on sim/device_plant.py
standing in for the MuJoCo plant (reference arbiter role:
/root/reference/src/sim/franka_sim.py:39-355).  Round 2 validated free
motion, the state-matched force law and a self-consistent press; this tool
quantifies CLOSED-LOOP fidelity:

Leg A (open-loop torque replay — isolates the PLANT):
  Run the host FF benchmark on the flat scenario, record the exact applied
  torque sequence, replay it tick-for-tick through plant_step (f32 and
  f64), and report the state/force divergence curve q/ee/fn(t).

Leg B (closed-loop metric comparison, --closedloop):
  Run the full on-device episode (solve + Riccati policy + plant per tick,
  batch_runner.make_episode_fn) for the same duration and compare the
  canonical contact-phase metrics against the host run.

Usage: python -m tools.fidelity_device_plant [--time 2.0] [--closedloop]
Writes results_fidelity.json.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def host_leg(total_time: float):
    """Host FF flat benchmark; records per-tick applied torque + telemetry."""
    from tools.parity_scenarios import _setup
    sim, obs, traj, cfg, mpc, _, settings = _setup("force_feedback", "flat")
    steps = int(total_time / sim.dt)
    rec = dict(t=[], tau=[], q=[], v=[], ee=[], fn=[])
    t = 0.0
    for _ in range(steps):
        tau_cmd = mpc.compute_control(obs, t)
        obs = sim.step(tau_cmd)
        t += sim.dt
        rec["t"].append(t)
        rec["tau"].append(np.asarray(tau_cmd, float).copy())
        rec["q"].append(np.asarray(obs.q, float).copy())
        rec["v"].append(np.asarray(obs.dq, float).copy())
        rec["ee"].append(np.asarray(obs.ee_pos, float).copy())
        rec["fn"].append(float(obs.f_contact_normal))
    return {k: np.asarray(v) for k, v in rec.items()}, sim, traj, cfg, mpc


def replay_leg(rec, mpc, dtype_name: str):
    """Replay the recorded torques through the device plant."""
    import jax
    import jax.numpy as jnp
    from ffmpc_tpu.sim.device_plant import (plant_step, init_plant_state,
                                            make_table_params)
    from ffmpc_tpu.core import make_panda_model
    dtype = jnp.float64 if dtype_name == "f64" else jnp.float32
    model = make_panda_model("plant", dtype=dtype)
    table = make_table_params(0.0, dtype=dtype)
    taus = jnp.asarray(rec["tau"], dtype)

    def roll(q0):
        st0 = init_plant_state(jnp.asarray(q0, dtype), dtype=dtype)

        def step(st, tau):
            st2, obs = plant_step(model, table, st, tau,
                                  timestep=0.001, n_substeps=5)
            return st2, (obs.q, obs.ee_pos, obs.f_contact_normal)
        _, (qs, ees, fns) = jax.lax.scan(step, st0, taus)
        return qs, ees, fns

    from ffmpc_tpu.core import KEYFRAMES
    qs, ees, fns = jax.jit(roll)(np.asarray(KEYFRAMES["neutral"]))
    return np.asarray(qs), np.asarray(ees), np.asarray(fns)


def contact_metrics(t, ee, fn, traj, t_start=0.9):
    """Canonical contact-phase metrics (run/experiment.py definitions)."""
    refs = np.asarray([traj.numpy(tt)[0] for tt in t])
    err = ee - refs
    m = t >= t_start
    tan = np.linalg.norm(err[:, :2], axis=1)
    return dict(
        rms_tan_phase=float(np.sqrt(np.mean(tan[m] ** 2))),
        mean_fn_phase=float(np.mean(fn[m])),
        max_fn=float(np.max(fn)),
        contact_loss_phase_pct=float(100.0 * np.mean(fn[m] < 0.5)),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", type=float, default=2.0)
    ap.add_argument("--closedloop", action="store_true")
    ap.add_argument("--out", default="results_fidelity.json")
    ap.add_argument("--save-fixture", default=None,
                    help="npz path to dump the host recording (torques + "
                         "telemetry) for the regression test")
    args = ap.parse_args()

    rec, sim, traj, cfg, mpc = host_leg(args.time)
    if args.save_fixture:
        np.savez_compressed(args.save_fixture, **rec)
        print("fixture:", args.save_fixture, flush=True)
    out = {"time_s": args.time}
    host_m = contact_metrics(rec["t"], rec["ee"], rec["fn"], traj)
    out["host_metrics"] = host_m
    print("host:", json.dumps(host_m), flush=True)

    for dtype_name in ("f64", "f32"):
        qs, ees, fns = replay_leg(rec, mpc, dtype_name)
        dq = np.abs(qs - rec["q"]).max(axis=1)
        dee = np.linalg.norm(ees - rec["ee"], axis=1)
        dfn = fns - rec["fn"]
        # divergence curve at coarse timestamps
        pick = np.linspace(0, len(dq) - 1, 11).astype(int)
        curve = [dict(t=float(rec["t"][i]), dq_inf=float(dq[i]),
                      dee=float(dee[i]), dfn=float(dfn[i])) for i in pick]
        dev_m = contact_metrics(rec["t"], ees, fns, traj)
        out[f"replay_{dtype_name}"] = dict(
            divergence_curve=curve, metrics=dev_m,
            dq_at_1s=float(dq[min(int(1.0 / sim.dt), len(dq) - 1)]),
            dee_at_1s=float(dee[min(int(1.0 / sim.dt), len(dq) - 1)]),
            mean_abs_dfn_phase=float(np.mean(np.abs(
                dfn[rec["t"] >= 0.9]))))
        print(f"replay {dtype_name}: dq@1s={out[f'replay_{dtype_name}']['dq_at_1s']:.4f} "
              f"dee@1s={out[f'replay_{dtype_name}']['dee_at_1s']*1e3:.2f}mm "
              f"|dfn|_phase={out[f'replay_{dtype_name}']['mean_abs_dfn_phase']:.2f}N "
              f"metrics={json.dumps(dev_m)}", flush=True)

    if args.closedloop:
        import jax
        import jax.numpy as jnp
        from ffmpc_tpu.run.batch_runner import make_episode_fn, EpisodeConfig
        from ffmpc_tpu.sim.device_plant import make_table_params
        from ffmpc_tpu.solver.fddp import FDDPSettings
        from ffmpc_tpu.core import KEYFRAMES
        W = mpc._W
        n_ticks = int(args.time / sim.dt)
        ep = EpisodeConfig(controller="force_feedback", horizon=cfg.horizon,
                           n_ticks=n_ticks,
                           ff_alpha_ocp=float(W.ff_alpha),
                           ff_alpha_ctrl=float(mpc._ff_alpha_ctrl()),
                           deriv_mode="analytic")
        dtype = jnp.float32
        episode = make_episode_fn(
            mpc.model, W, FDDPSettings(max_iters=10, use_box=True), traj,
            make_table_params(0.0, dtype=dtype), ep,
            np.asarray(KEYFRAMES["neutral"]), dtype=dtype)
        telem = jax.jit(episode)(np.asarray(KEYFRAMES["neutral"],
                                            np.float32))
        jax.block_until_ready(telem)
        t_dev = np.asarray(telem["t"], float)
        cl_m = contact_metrics(t_dev, np.asarray(telem["ee_pos"], float),
                               np.asarray(telem["fn_meas"], float), traj)
        out["device_closedloop_metrics"] = cl_m
        print("device closed loop:", json.dumps(cl_m), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
