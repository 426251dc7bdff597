"""Measure the parity cost of each deliberate solver/controller deviation
(PARITY.md deviations 2-4) instead of asserting it.

Open-loop: capture (t, x0, warm start) problems along a benchmark flat run,
then solve each under default vs Crocoddyl-exact acceptance semantics at
the 10-iteration budget and report the tau-trajectory difference.

Closed-loop: rerun the flat benchmark with each deviation toggled to its
reference behavior and report the canonical metrics.

Usage: python -m tools.parity_deviations [out.json] [--quick]
"""
from __future__ import annotations

import json
import sys

import numpy as np


def _setup(max_iters=10):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    import mujoco
    from ffmpc_tpu.mpc.controllers import ClassicalMPC
    from ffmpc_tpu.sim.mujoco_sim import PandaMujocoSim
    from ffmpc_tpu.sim.paths import SCENE_XML
    from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj
    from ffmpc_tpu.run.experiment import benchmark_classical_config
    from ffmpc_tpu.run.scenarios import table_geometry_world

    sim = PandaMujocoSim(SCENE_XML, command_type="torque", n_substeps=5)
    sim.model.opt.timestep = 0.001
    mujoco.mj_forward(sim.model, sim.data)
    obs = sim.reset("neutral")
    _, tc, _, z_top = table_geometry_world(sim)
    r_tool = float(sim.model.geom_size[sim.ee_geom_id][0])
    z_contact = z_top + r_tool - 8e-3
    traj = ApproachCircleTraj(
        center=(float(tc[0]), float(tc[1]), z_contact), radius=0.1, omega=1.5,
        z_contact=z_contact, t_approach=0.55, z_pre=z_contact + 0.05,
        t_pre=0.25, ee_start=tuple(float(v) for v in obs.ee_pos),
        t_stabilize=0.2)
    cfg = benchmark_classical_config(z_contact, sim.dt, "normal_1d",
                                     "trajectory", max_iters)
    return sim, obs, traj, cfg, z_contact


def capture_problems(n_free=4, n_contact=8):
    """Closed-loop flat run capturing solver problems at fixed ticks."""
    import jax.numpy as jnp
    from ffmpc_tpu.mpc.controllers import ClassicalMPC
    sim, obs, traj, cfg, _ = _setup()
    mpc = ClassicalMPC(sim, traj, cfg, model_variant="plant")
    capture_at = ([int(0.3 / sim.dt) + 13 * i for i in range(n_free)]
                  + [int(1.0 / sim.dt) + 29 * i for i in range(n_contact)])
    problems = []
    t = 0.0
    for k in range(max(capture_at) + 1):
        if k in capture_at:
            x0 = np.concatenate([np.asarray(obs.q), np.asarray(obs.dq)])
            xs_w, us_w = mpc._shift_guess(x0, cfg.horizon, mpc._tau_prev)
            problems.append(dict(
                t=t, x0=x0, xs=xs_w.copy(), us=us_w.copy(),
                tau_ref=mpc._tau_reference(x0[:7]),
                x_reg_ref=mpc._posture_reference(x0),
                surface=bool(mpc._surface_now(obs, t)),
                reg=float(mpc._reg_carry)))
        tau = mpc.compute_control(obs, t)
        obs = sim.step(tau)
        t += sim.dt
    return problems, mpc, traj, cfg


def openloop_comparison(problems, mpc, traj, cfg):
    import jax
    import jax.numpy as jnp
    from ffmpc_tpu.ocp.problem import build_problem_refs
    from ffmpc_tpu.solver.fddp import solve, FDDPSettings

    W = mpc._W
    rows = []
    for variant, st in [
        ("default", FDDPSettings(max_iters=10, use_box=True)),
        ("crocoddyl_semantics", FDDPSettings(max_iters=10, use_box=True,
                                             crocoddyl_semantics=True)),
    ]:
        for i, pb in enumerate(problems):
            knot = mpc._knots[pb["surface"]]
            refs_run, ref_T = build_problem_refs(
                traj, jnp.float64(pb["t"]), cfg.horizon, W.dt_ocp,
                jnp.asarray(pb["x_reg_ref"]), jnp.asarray(pb["tau_ref"]),
                jnp.asarray(mpc.R_des, jnp.float64), dtype=jnp.float64)
            res = solve(knot, refs_run, ref_T, jnp.asarray(pb["x0"]),
                        jnp.asarray(pb["xs"]), jnp.asarray(pb["us"]), st,
                        reg0=jnp.float64(pb["reg"]))
            rows.append(dict(variant=variant, idx=i, surface=pb["surface"],
                             cost=float(res.cost),
                             us=np.asarray(res.us)))
    # pair up
    out = []
    n = len(problems)
    for i in range(n):
        a = next(r for r in rows if r["variant"] == "default" and r["idx"] == i)
        b = next(r for r in rows if r["variant"] == "crocoddyl_semantics" and r["idx"] == i)
        dtau0 = float(np.max(np.abs(a["us"][0] - b["us"][0])))
        dtau = float(np.max(np.abs(a["us"] - b["us"])))
        out.append(dict(idx=i, surface=a["surface"], cost_default=a["cost"],
                        cost_croco=b["cost"], dtau0_inf=dtau0, dtau_inf=dtau))
    return out


def closedloop_variants(total_time=4.0):
    from ffmpc_tpu.run.experiment import run_single

    def patch_croco(cfg):
        cfg.crocoddyl_solver_semantics = True
        return cfg

    def patch_refshift(cfg):
        cfg.warmstart_shift = "reference"
        return cfg

    def patch_nogate(cfg):
        cfg.solve_reject_factor = 0.0
        return cfg

    def patch_all_reference(cfg):
        cfg.crocoddyl_solver_semantics = True
        cfg.warmstart_shift = "reference"
        cfg.solve_reject_factor = 0.0
        cfg.reset_warmstart_on_mode_switch = True
        return cfg

    out = {}
    for name, patch in [("default", None), ("crocoddyl_semantics", patch_croco),
                        ("reference_shift", patch_refshift),
                        ("no_reject_gate", patch_nogate),
                        ("all_reference_behaviors", patch_all_reference)]:
        m = run_single("classical", "flat", total_time=total_time,
                       results_dir="/tmp/r2/parity_dev", save_plots=False,
                       verbose=False, config_patch=patch)
        out[name] = {k: m[k] for k in ("rms_tan", "rms_tan_phase",
                                       "avg_abs_force_err", "max_fn",
                                       "contact_loss_phase_pct")}
        print(name, json.dumps(out[name]))
    return out


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r2/parity_deviations.json"
    quick = "--quick" in sys.argv
    problems, mpc, traj, cfg = capture_problems()
    ol = openloop_comparison(problems, mpc, traj, cfg)
    print("open-loop default-vs-crocoddyl-semantics (10 iters):")
    for r in ol:
        print(f"  t#{r['idx']} surf={int(r['surface'])} "
              f"cost {r['cost_default']:.2f} vs {r['cost_croco']:.2f} "
              f"|dtau0|={r['dtau0_inf']:.3e} |dtau|={r['dtau_inf']:.3e}")
    result = {"openloop": ol}
    if not quick:
        result["closedloop"] = closedloop_variants()
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2, default=float)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
