"""Oracle tau-parity across ALL benchmark scenarios for BOTH controllers.

The BASELINE.md north star asks for tau-trajectory parity vs Crocoddyl on
all 5 scenarios at the same horizon + iteration budget.  Round 2 evidenced
the flat classical case only; this tool closes the scope gap:

For every (controller, scenario) pair it runs the closed-loop host
benchmark (hidden tilt / actuation-uncertainty injectors exactly as
run/experiment.py wires them), captures solver problems (t, state, warm
start, references, surface flag) at sampled control ticks, then solves each
problem twice —
  - the JAX solver in Crocoddyl-semantics mode (the parity configuration),
  - the independent C++ BoxFDDP oracle (native/ffmpc_oracle.cpp: FD
    derivatives, own rigid-body recursion; classical 14-state or augmented
    21-state family per controller)
— and reports the torque-trajectory disagreement.

Note the capture happens on the SCENARIO plant (tilted / corrupted
observations), but both solvers see the identical OCP, so this pins parity
on the actual state distribution each scenario visits.

Usage:
  python -m tools.parity_scenarios [--controllers classical,force_feedback]
      [--scenarios flat,tilted_5,...] [--out results_parity_scenarios.json]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _setup(controller: str, scenario: str, max_iters=10):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    import mujoco
    from ffmpc_tpu.mpc.controllers import ClassicalMPC, ForceFeedbackMPC
    from ffmpc_tpu.sim.mujoco_sim import PandaMujocoSim
    from ffmpc_tpu.sim.paths import SCENE_XML
    from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj
    from ffmpc_tpu.run.experiment import (benchmark_classical_config,
                                          benchmark_ff_config)
    from ffmpc_tpu.run.scenarios import (scenario_settings, scenario_seed,
                                         table_geometry_world,
                                         apply_table_tilt)
    from ffmpc_tpu.run.uncertainty import (config_for_scenario,
                                           ScenarioUncertaintyInjector)

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
    if controller == "classical":
        cfg = benchmark_classical_config(z_contact, sim.dt, "normal_1d",
                                         "trajectory", max_iters)
        mpc = ClassicalMPC(sim, traj, cfg, model_variant="plant")
    else:
        cfg = benchmark_ff_config(z_contact, sim.dt, "normal_1d",
                                  "trajectory", max_iters,
                                  "tau_meas_act_filt")
        mpc = ForceFeedbackMPC(sim, traj, cfg, model_variant="plant")

    settings = scenario_settings(scenario)
    if abs(settings.tilt_deg) > 1e-12:
        apply_table_tilt(sim, settings.tilt_deg)
        obs = sim.get_observation(with_ee=True, with_jacobian=True)
    uncertainty = None
    unc_cfg = config_for_scenario(scenario, seed=scenario_seed(scenario))
    if unc_cfg is not None:
        uncertainty = ScenarioUncertaintyInjector(
            dt=sim.dt, nu=7, config=unc_cfg,
            tau_lpf_alpha=sim.tau_meas_lpf_alpha)
    return sim, obs, traj, cfg, mpc, uncertainty, settings


def capture_problems(controller: str, scenario: str, n_free=2, n_contact=4):
    """Closed-loop run on the scenario plant, capturing solver problems."""
    sim, obs, traj, cfg, mpc, uncertainty, settings = _setup(
        controller, scenario)
    capture_at = sorted(
        [int(0.3 / sim.dt) + 17 * i for i in range(n_free)]
        + [int(1.0 / sim.dt) + 31 * i for i in range(n_contact)])
    problems = []
    t = 0.0
    for k in range(max(capture_at) + 1):
        ctrl_obs = (uncertainty.observation_for_controller(obs)
                    if uncertainty is not None else obs)
        if k in capture_at:
            q = np.asarray(ctrl_obs.q, float)
            v = np.asarray(ctrl_obs.dq, float)
            if controller == "classical":
                x0 = np.concatenate([q, v])
                u_hold = mpc._tau_prev
            else:
                tau_hat = mpc._tau_state_from_obs(ctrl_obs)
                x0 = np.concatenate([q, v, tau_hat])
                u_hold = tau_hat
            xs_w, us_w = mpc._shift_guess(x0, cfg.horizon, u_hold)
            problems.append(dict(
                t=t, x0=x0, xs=np.asarray(xs_w).copy(),
                us=np.asarray(us_w).copy(),
                tau_ref=np.asarray(mpc._tau_reference(q)),
                x_reg_ref=np.asarray(mpc._posture_reference(x0)),
                surface=bool(mpc._surface_now(ctrl_obs, t))))
        tau_cmd = mpc.compute_control(ctrl_obs, t)
        tau_applied = (uncertainty.command_for_plant(tau_cmd)
                       if uncertainty is not None
                       else tau_cmd * settings.torque_scale)
        obs = sim.step(tau_applied)
        t += sim.dt
    return problems, mpc, traj, cfg


def compare(controller, problems, mpc, traj, cfg):
    import jax
    import jax.numpy as jnp
    from ffmpc_tpu.ocp.problem import build_problem_refs
    from ffmpc_tpu.solver.fddp import solve, FDDPSettings
    from ffmpc_tpu.utils.native import (
        oracle_weights_flat, oracle_solve, oracle_weights_flat_aug,
        oracle_solve_aug)

    W = mpc._W
    aug = controller == "force_feedback"
    wf = (oracle_weights_flat_aug(W, mpc.model) if aug
          else oracle_weights_flat(W, mpc.model))
    st = FDDPSettings(max_iters=10, use_box=True, crocoddyl_semantics=True)
    R_des = np.asarray(mpc.R_des, float)
    N = cfg.horizon

    solvers = {}

    def jax_solve(surface, t, x0, xs, us, x_reg_ref, tau_ref):
        knot = mpc._knots[surface]
        if surface not in solvers:
            def fn(t_, x0_, xs_, us_, x_reg_, tau_ref_):
                refs_run, ref_T = build_problem_refs(
                    traj, t_, N, W.dt_ocp, x_reg_[:14], tau_ref_,
                    jnp.asarray(R_des, jnp.float64),
                    y_ref=(x0_ if aug else None), dtype=jnp.float64)
                return solve(knot, refs_run, ref_T, x0_, xs_, us_, st)
            solvers[surface] = jax.jit(fn)
        return solvers[surface](
            jnp.float64(t), jnp.asarray(x0), jnp.asarray(xs),
            jnp.asarray(us), jnp.asarray(x_reg_ref), jnp.asarray(tau_ref))

    rows = []
    for i, pb in enumerate(problems):
        pv = np.zeros((N + 1, 6))
        for k in range(N + 1):
            p, vv, _ = traj.numpy(pb["t"] + k * W.dt_ocp)
            pv[k, :3] = p
            pv[k, 3:] = vv
        surf = np.full(N, int(pb["surface"]), np.int32)
        res = jax_solve(pb["surface"], pb["t"], pb["x0"], pb["xs"],
                        pb["us"], pb["x_reg_ref"], pb["tau_ref"])
        if aug:
            ys_o, ws_o, cost_o, _ = oracle_solve_aug(
                wf, pv, surf, pb["x_reg_ref"][:14], pb["tau_ref"],
                R_des.ravel(), pb["x0"], pb["x0"], pb["xs"], pb["us"],
                max_iters=10, use_box=True)
            dtau = float(np.abs(ys_o[:, 14:]
                                - np.asarray(res.xs)[:, 14:]).max())
            du = float(np.abs(ws_o - np.asarray(res.us)).max())
            # knot-0 delta on the first CONTROL (w in the FF family) — the
            # quantity the closed loop consumes first
            du_k0 = float(np.abs(ws_o[0] - np.asarray(res.us)[0]).max())
        else:
            xs_o, us_o, cost_o, _ = oracle_solve(
                wf, pv, surf, pb["x_reg_ref"], pb["tau_ref"], R_des.ravel(),
                pb["x0"], pb["xs"], pb["us"], max_iters=10, use_box=True)
            dtau = float(np.abs(us_o - np.asarray(res.us)).max())
            du = dtau
            du_k0 = float(np.abs(us_o[0] - np.asarray(res.us)[0]).max())
        rows.append(dict(idx=i, t=pb["t"], surface=pb["surface"],
                         dtau_inf=dtau, du_inf=du, du_k0_inf=du_k0,
                         cost_jax=float(res.cost), cost_oracle=cost_o))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--controllers", default="classical,force_feedback")
    ap.add_argument("--scenarios",
                    default="flat,tilted_5,tilted_10,tilted_15,"
                            "actuation_uncertainty")
    ap.add_argument("--out", default="results_parity_scenarios.json")
    args = ap.parse_args()

    out = {}
    for controller in args.controllers.split(","):
        for scenario in args.scenarios.split(","):
            key = f"{controller}/{scenario}"
            print(f"== {key}", flush=True)
            problems, mpc, traj, cfg = capture_problems(controller, scenario)
            rows = compare(controller, problems, mpc, traj, cfg)
            for r in rows:
                print(f"  t={r['t']:.3f} surf={int(r['surface'])} "
                      f"dtau={r['dtau_inf']:.3e} du={r['du_inf']:.3e} "
                      f"cost {r['cost_jax']:.4f} vs {r['cost_oracle']:.4f}",
                      flush=True)
            out[key] = rows
            with open(args.out, "w") as f:
                json.dump(out, f, indent=1, default=float)
    print("wrote", args.out)



if __name__ == "__main__":
    main()
