"""Single-scenario experiment runner shared by both controllers.

Equivalent of the reference's _run_single/main pair (run_classical.py:181-763
and the isomorphic run_force_feedback.py): scene setup, 1 kHz benchmark
timestep, contact-height geometry, trajectory construction, controller
presets, the 200 Hz control loop with uncertainty injection, metric
aggregation and artifact writing.  One parameterized implementation replaces
the reference's duplicated pair.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ..mpc.config import ClassicalMPCConfig, ForceFeedbackMPCConfig
from ..mpc.controllers import ClassicalMPC, ForceFeedbackMPC
from ..sim.mujoco_sim import PandaMujocoSim
from ..sim.paths import SCENE_XML
from ..tasks.trajectories import ApproachCircleTraj
from ..utils.logging import RunLogger
from ..utils.evaluation_plots import save_evaluation_plots
from .scenarios import (SCENARIOS, scenario_settings, scenario_seed,
                        apply_table_tilt, table_geometry_world)
from .uncertainty import ScenarioUncertaintyInjector, config_for_scenario
from .alignment import check_model_sim_alignment

CONTACT_THRESHOLD = 0.5  # N, in-contact definition (run_classical.py:413)


def benchmark_classical_config(z_contact, dt, contact_model, phase_source,
                               max_iters) -> ClassicalMPCConfig:
    """The benchmark preset (reference run_classical.py:270-315)."""
    return ClassicalMPCConfig(
        horizon=36, dt=dt, dt_ocp=0.01, z_contact=z_contact, z_press=0.0065,
        w_ee_pos=1.2e3, w_ee_ori=5.0e1, ori_weights=np.array([2.4, 2.4, 0.3]),
        w_posture=1.5e-1, w_v=8.0e-2, posture_ref_mode="q_nom",
        w_tau=8.0e-4, torque_ref_mode="gravity_x0",
        w_tau_soft_limits=2.0, w_q_soft_limits=8.0, q_soft_limit_margin=0.05,
        w_tau_smooth=0.0, w_tangent_pos=2.6e3, w_tangent_vel=7.0e2,
        w_plane_z=1.2e3, w_vz=5.0e2, w_friction_cone=0.0, w_unilateral=3.0e1,
        mu=1.0, contact_gains=np.array([140.0, 80.0]), fn_des=22.0, w_fn=2.8e1,
        w_wdamp=6.0e1, w_wdamp_weights=np.array([1.8, 1.8, 0.3]),
        fn_contact_on=1.0, fn_contact_off=0.1, z_contact_band=0.012,
        max_iters=max_iters, mpc_update_steps=1, use_feedback_policy=True,
        feedback_gain_scale=0.55, max_solver_cost=1.0e8, max_tau_raw_inf=3.0e2,
        contact_release_steps=60, contact_model=contact_model,
        phase_source=phase_source, apply_command_filter=False, debug_every=100,
    )


def dev_classical_config(z_contact, dt, contact_model, phase_source,
                         max_iters, use_command_filter) -> ClassicalMPCConfig:
    """The dev preset (reference run_classical.py:317-361)."""
    return ClassicalMPCConfig(
        horizon=50, dt=dt, dt_ocp=0.01, z_contact=z_contact, z_press=0.0075,
        w_ee_pos=1.3e3, w_ee_ori=6.0e1, ori_weights=np.array([2.4, 2.4, 0.2]),
        w_posture=1.5e-1, w_v=8.0e-2, posture_ref_mode="q_nom",
        w_tau=2.0e-3, torque_ref_mode="gravity_x0",
        w_tau_soft_limits=4.0, w_q_soft_limits=10.0, q_soft_limit_margin=0.10,
        w_tau_smooth=5.0e-2, w_tangent_pos=3.5e3, w_tangent_vel=1.3e3,
        w_plane_z=6.0e2, w_vz=2.5e2, w_friction_cone=0.0, w_unilateral=4.0e1,
        mu=1.0, contact_gains=np.array([150.0, 85.0]), fn_des=30.0, w_fn=5.5e1,
        w_wdamp=8.0e1, w_wdamp_weights=np.array([2.0, 2.0, 0.3]),
        fn_contact_on=1.0, fn_contact_off=0.05, z_contact_band=0.012,
        max_iters=max_iters, mpc_update_steps=1, use_feedback_policy=True,
        feedback_gain_scale=0.60, max_tau_raw_inf=2.0e2,
        contact_release_steps=80, contact_model=contact_model,
        phase_source=phase_source, apply_command_filter=use_command_filter,
        debug_every=100,
    )


def benchmark_ff_config(z_contact, dt, contact_model, phase_source, max_iters,
                        ff_tau_state_source) -> ForceFeedbackMPCConfig:
    """The FF benchmark preset (reference run_force_feedback.py:272-330)."""
    return ForceFeedbackMPCConfig(
        horizon=40, dt=dt, dt_ocp=0.01, z_contact=z_contact, z_press=0.0065,
        w_ee_pos=1.2e3, w_ee_ori=4.5e1, ori_weights=np.array([2.2, 2.2, 0.3]),
        w_posture=1.0e-1, w_v=5.0e-2, posture_ref_mode="q_nom",
        w_tau=8.0e-4, w_w=6.0e-4, w_w_soft_limits=2.0, w_y=8.0e-4,
        y_q_weights=np.array([0.15] * 4 + [0.08] * 3),
        y_v_weights=np.array([0.05] * 4 + [0.03] * 3),
        y_tau_weights=np.array([0.12] * 4 + [0.08] * 3),
        use_inner_state_reg=True, use_inner_tau_reg=True,
        torque_ref_mode="gravity_x0", w_tau_soft_limits=1.5,
        w_q_soft_limits=8.0, q_soft_limit_margin=0.05, w_tau_smooth=0.0,
        w_tangent_pos=3.6e3, w_tangent_vel=1.2e3, w_plane_z=9.0e2, w_vz=3.0e2,
        w_friction_cone=0.0, w_unilateral=3.0e1, mu=1.0,
        contact_gains=np.array([145.0, 85.0]), fn_des=22.0, w_fn=3.0e1,
        w_wdamp=7.0e1, w_wdamp_weights=np.array([1.8, 1.8, 0.3]),
        fn_contact_on=1.0, fn_contact_off=0.1, z_contact_band=0.012,
        max_iters=max_iters, mpc_update_steps=1, use_feedback_policy=True,
        feedback_gain_scale=0.55, max_solver_cost=1.0e8, max_tau_raw_inf=3.0e2,
        contact_release_steps=80, contact_model=contact_model,
        phase_source=phase_source, apply_command_filter=False,
        ff_tau_state_source=ff_tau_state_source, ff_cutoff_hz=25.0,
        ff_inverse_actuation_model=True, ff_tau_feedback_gain=1.0,
        debug_every=500,
    )


def dev_ff_config(z_contact, dt, contact_model, phase_source, max_iters,
                  use_command_filter, ff_tau_state_source) -> ForceFeedbackMPCConfig:
    """The FF dev preset (reference run_force_feedback.py:332-387)."""
    return ForceFeedbackMPCConfig(
        horizon=50, dt=dt, dt_ocp=0.01, z_contact=z_contact, z_press=0.0080,
        w_ee_pos=1.8e3, w_ee_ori=5.5e1, ori_weights=np.array([2.4, 2.4, 0.2]),
        w_posture=6.0e-2, w_v=2.0e-2, posture_ref_mode="q_nom",
        w_tau=2.0e-3, w_w=3.0e-4, w_w_soft_limits=3.0, w_y=5.0e-4,
        y_q_weights=np.array([0.2] * 4 + [0.1] * 3),
        y_v_weights=np.array([0.08] * 4 + [0.05] * 3),
        y_tau_weights=np.array([0.10] * 4 + [0.06] * 3),
        torque_ref_mode="gravity_x0", w_tau_soft_limits=1.5,
        w_q_soft_limits=10.0, q_soft_limit_margin=0.10, w_tau_smooth=5.0e-2,
        w_tangent_pos=4.8e3, w_tangent_vel=1.9e3, w_plane_z=5.0e2, w_vz=2.0e2,
        w_friction_cone=0.0, w_unilateral=3.0e1, mu=1.0,
        contact_gains=np.array([150.0, 90.0]), fn_des=26.0, w_fn=4.0e1,
        w_wdamp=8.0e1, w_wdamp_weights=np.array([2.0, 2.0, 0.3]),
        fn_contact_on=1.0, fn_contact_off=0.05, z_contact_band=0.012,
        max_iters=max_iters, mpc_update_steps=1, use_feedback_policy=True,
        feedback_gain_scale=0.60, max_tau_raw_inf=2.2e2,
        contact_release_steps=80, contact_model=contact_model,
        phase_source=phase_source, apply_command_filter=use_command_filter,
        ff_tau_state_source=ff_tau_state_source, ff_cutoff_hz=90.0,
        ff_inverse_actuation_model=True, debug_every=500,
    )


def run_single(
    controller: str,                  # "classical" | "force_feedback"
    scenario: str,
    total_time: float = 12.0,
    results_dir: Path | str = Path("results"),
    save_plots: bool = True,
    contact_model: str = "normal_1d",
    low_budget: bool = False,
    mpc_iters: Optional[int] = None,
    use_command_filter: bool = False,
    align_check_samples: int = 16,
    circle_radius: float = 0.10,
    circle_omega: float = 1.5,
    phase_source: str = "trajectory",
    benchmark_mode: bool = True,
    ff_tau_state_source: str = "tau_meas_act_filt",
    model_variant: str = "plant",
    dtype=None,
    verbose: bool = True,
    progress_every: int = 100,
    z_contact_offset: Optional[float] = None,   # None -> protocol value
    config_patch=None,                          # callable(cfg) -> cfg override
    device: str = "cpu",                        # "cpu" | "default"
) -> dict:
    import jax
    import jax.numpy as jnp
    if device == "cpu":
        # The host-loop runner dispatches one small solve per control tick;
        # on remote-TPU (tunnel) setups that is latency-bound and every
        # controller variant needs a fresh multi-minute compile.  The CPU
        # backend with float64 is the right default for this runner; batched
        # device execution lives in run/ensemble.py and run/batch_runner.py.
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    settings = scenario_settings(scenario)
    say = print if verbose else (lambda *a, **k: None)
    say("=" * 80)
    say(f"{controller} Panda MPC (ffmpc_tpu) - Scenario: {settings.label}")
    say("=" * 80)

    sim = PandaMujocoSim(SCENE_XML, command_type="torque", n_substeps=5)
    if benchmark_mode:
        sim.model.opt.timestep = 0.001   # 1 kHz physics protocol
        import mujoco
        mujoco.mj_forward(sim.model, sim.data)
    obs = sim.reset("neutral")

    _, table_center, table_half, z_table_top = table_geometry_world(sim)
    r_tool = float(sim.model.geom_size[sim.ee_geom_id][0])
    if z_contact_offset is None:
        z_contact_offset = -8.0e-3 if benchmark_mode else 2.0e-4
    z_contact = z_table_top + r_tool + z_contact_offset
    z_pre = z_contact + (0.05 if benchmark_mode else 0.08)
    say(f"dt={sim.dt:.4f}s z_contact={z_contact:.4f}  EE0={obs.ee_pos}")

    t_approach = 0.55 if benchmark_mode else 1.4
    t_pre = 0.25 if benchmark_mode else 1.4
    t_stab = 0.2 if benchmark_mode else 0.0
    traj = ApproachCircleTraj(
        center=(float(table_center[0]), float(table_center[1]), z_contact),
        radius=float(circle_radius), omega=float(circle_omega),
        z_contact=z_contact, t_approach=t_approach, z_pre=z_pre, t_pre=t_pre,
        ee_start=tuple(float(v) for v in obs.ee_pos), t_stabilize=t_stab)
    t_contact_phase = t_pre + t_approach

    if mpc_iters is not None:
        max_iters = int(mpc_iters)
    elif benchmark_mode:
        max_iters = 10
    else:
        max_iters = 3 if low_budget else 10

    if controller == "classical":
        cfg = (benchmark_classical_config(z_contact, sim.dt, contact_model,
                                          phase_source, max_iters)
               if benchmark_mode else
               dev_classical_config(z_contact, sim.dt, contact_model,
                                    phase_source, max_iters, use_command_filter))
        if config_patch is not None:
            cfg = config_patch(cfg) or cfg
        mpc = ClassicalMPC(sim, traj, cfg, model_variant=model_variant, dtype=dtype)
    elif controller == "force_feedback":
        cfg = (benchmark_ff_config(z_contact, sim.dt, contact_model,
                                   phase_source, max_iters, ff_tau_state_source)
               if benchmark_mode else
               dev_ff_config(z_contact, sim.dt, contact_model, phase_source,
                             max_iters, use_command_filter, ff_tau_state_source))
        if config_patch is not None:
            cfg = config_patch(cfg) or cfg
        mpc = ForceFeedbackMPC(sim, traj, cfg, model_variant=model_variant, dtype=dtype)
    else:
        raise ValueError(f"unknown controller '{controller}'")

    align_stats = check_model_sim_alignment(sim, mpc.model, samples=align_check_samples)
    if align_stats["samples"] > 0:
        say(f"alignment: rms_pos={align_stats['rms_pos_m']*1e3:.3f}mm "
            f"max_rot={align_stats['max_rot_deg']:.4f}deg")

    if abs(settings.tilt_deg) > 1e-12:
        apply_table_tilt(sim, settings.tilt_deg)
        obs = sim.get_observation(with_ee=True, with_jacobian=True)
        say(f"Applied hidden table tilt: {settings.tilt_deg:.1f} deg")

    uncertainty = None
    uncertainty_meta = None
    if benchmark_mode:
        unc_cfg = config_for_scenario(scenario, seed=scenario_seed(scenario))
        if unc_cfg is not None:
            uncertainty = ScenarioUncertaintyInjector(
                dt=sim.dt, nu=7, config=unc_cfg,
                tau_lpf_alpha=sim.tau_meas_lpf_alpha)
            uncertainty_meta = uncertainty.meta()
            say(f"Uncertainty profile enabled: a={uncertainty.a:.3f} b={uncertainty.b:.3f}")

    logger = RunLogger(run_name=f"{controller}_{scenario}",
                       results_dir=results_dir,
                       notes={"scenario": scenario, "scene": str(SCENE_XML)})

    steps = int(total_time / sim.dt)
    torque_scale = settings.torque_scale
    summary = {k: [] for k in ("t", "err_tan", "err_3d", "fn_meas", "fn_pred", "contact")}

    t = 0.0
    say(f"Running {total_time:.1f}s ({steps} steps)...")
    for k in range(steps):
        ctrl_obs = (uncertainty.observation_for_controller(obs)
                    if uncertainty is not None else obs)
        tau_cmd = mpc.compute_control(ctrl_obs, t)
        tau_applied = (uncertainty.command_for_plant(tau_cmd)
                       if uncertainty is not None else tau_cmd * torque_scale)
        obs = sim.step(tau_applied)
        t += sim.dt

        p_ref, v_ref, surf_ref = traj.numpy(t)
        err = np.asarray(obs.ee_pos) - p_ref
        err_tan = float(np.linalg.norm(err[:2]))
        err_3d = float(np.linalg.norm(err))
        fn_meas = float(obs.f_contact_normal)
        in_contact = fn_meas > CONTACT_THRESHOLD
        info = dict(mpc.last_info)
        fn_pred = float(info.get("fn_pred", np.nan))
        ff_extra = {}
        if controller == "force_feedback":
            # FF-specific channels (reference run_force_feedback.py:485-519)
            ff_extra = dict(
                fn_pred_raw=float(info.get("fn_pred_raw", np.nan)),
                tau_des_inf=float(info.get("tau_des_inf", np.nan)),
                tau_meas_state_inf=float(info.get("tau_meas_state_inf", np.nan)),
                tau_meas_act=np.asarray(obs.tau_meas_act).copy(),
                tau_meas_act_filt=np.asarray(obs.tau_meas_act_filt).copy(),
            )

        summary["t"].append(t)
        summary["err_tan"].append(err_tan)
        summary["err_3d"].append(err_3d)
        summary["fn_meas"].append(fn_meas)
        summary["fn_pred"].append(fn_pred)
        summary["contact"].append(1.0 if in_contact else 0.0)

        logger.log(
            t=t,
            q=np.asarray(obs.q).copy(),
            dq=np.asarray(obs.dq).copy(),
            ee_pos=np.asarray(obs.ee_pos).copy(),
            ee_ref=p_ref.copy(),
            ee_vel=np.asarray(obs.ee_vel).copy(),
            ee_vel_ref=v_ref.copy(),
            err_tan=err_tan, err_3d=err_3d,
            fn_meas=fn_meas, fn_pred=fn_pred, fn_des=float(cfg.fn_des),
            tau_cmd=np.asarray(tau_cmd).copy(),
            tau_meas=np.asarray(obs.tau_meas).copy(),
            tau_meas_filt=np.asarray(obs.tau_meas_filt).copy(),
            tau_cmd_sim=np.asarray(obs.tau_cmd).copy(),
            tau_act=np.asarray(obs.tau_act).copy(),
            tau_constraint=np.asarray(obs.tau_constraint).copy(),
            tau_total=np.asarray(obs.tau_total).copy(),
            tau_applied=np.asarray(tau_applied).copy(),
            contact=int(in_contact), surface_ref=int(surf_ref),
            solver_iters=int(info.get("iters", -1)),
            solver_cost=float(info.get("cost", np.nan)),
            solver_success=int(bool(info.get("ok", False))),
            solver_unstable=int(bool(info.get("unstable", False))),
            solver_solved_now=int(bool(info.get("solved_now", False))),
            solver_policy_idx=int(info.get("policy_idx", -1)),
            tau_raw_inf=float(info.get("tau_raw_inf", np.nan)),
            tau_cmd_inf=float(info.get("tau_cmd_inf", np.nan)),
            **ff_extra,
        )
        if verbose and (k % progress_every == 0):
            say(f"k={k:5d} t={t:6.3f}s err_tan={err_tan:.4f} err3d={err_3d:.4f} "
                f"fn={fn_meas:6.2f} fn_pred={fn_pred:6.2f} contact={int(in_contact)} "
                f"cost={info.get('cost', np.nan):.2e}")

    # ---- metric aggregation (reference run_classical.py:513-579) ----
    t_arr = np.asarray(summary["t"])
    err_tan_arr = np.asarray(summary["err_tan"])
    err_3d_arr = np.asarray(summary["err_3d"])
    fn_arr = np.asarray(summary["fn_meas"])
    contact_arr = np.asarray(summary["contact"])
    phase = t_arr >= t_contact_phase

    def rms(a):
        return float(np.sqrt(np.mean(a ** 2))) if a.size else np.nan

    metrics = {
        "scenario": scenario,
        "rms_tan": rms(err_tan_arr),
        "rms_tan_phase": rms(err_tan_arr[phase]),
        "rms_3d": rms(err_3d_arr),
        "avg_abs_pos_err": float(np.mean(np.abs(err_tan_arr))) if err_tan_arr.size else np.nan,
        "avg_abs_force_err": float(np.mean(np.abs(fn_arr - cfg.fn_des))) if fn_arr.size else np.nan,
        "max_fn": float(np.max(fn_arr)) if fn_arr.size else np.nan,
        "fn_mean_phase": float(np.mean(fn_arr[phase])) if phase.any() else np.nan,
        "contact_loss_pct": float((1 - np.mean(contact_arr)) * 100) if contact_arr.size else np.nan,
        "contact_loss_phase_pct": float((1 - np.mean(contact_arr[phase])) * 100) if phase.any() else np.nan,
    }

    logger.set_meta(
        total_time=total_time, dt=sim.dt, controller=controller,
        scenario_label=settings.label, scenario_tilt_deg=settings.tilt_deg,
        benchmark_mode=benchmark_mode, uncertainty_profile=uncertainty_meta,
        torque_scale=np.asarray(torque_scale), fn_des=float(cfg.fn_des),
        contact_phase_start_s=t_contact_phase, frame_alignment=align_stats,
        cfg_summary={
            "horizon": int(cfg.horizon), "dt": float(cfg.dt),
            "dt_ocp": cfg.dt_ocp_eff, "z_contact": float(cfg.z_contact),
            "z_press": float(cfg.z_press), "w_fn": float(cfg.w_fn),
            "fn_des": float(cfg.fn_des), "circle_radius": circle_radius,
            "circle_omega": circle_omega, "contact_model": cfg.contact_model,
            "max_iters": int(cfg.max_iters), "phase_source": cfg.phase_source,
            "apply_command_filter": bool(cfg.apply_command_filter),
        },
        **metrics,
    )
    logger.save()
    # zero-step runs (e.g. --time 0) produce no npz; nothing to plot
    if save_plots and logger.path_npz.exists():
        save_evaluation_plots(logger.path_npz, logger.run_dir, cfg.fn_des)

    say(f"RMS tangential error: {metrics['rms_tan']:.4f} m | "
        f"avg |Fn err|: {metrics['avg_abs_force_err']:.2f} N | "
        f"contact loss (phase): {metrics['contact_loss_phase_pct']:.1f}%")
    metrics["run_dir"] = str(logger.run_dir)
    return metrics
