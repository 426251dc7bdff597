"""MPC controller configurations.

Field-compatible with the reference's ClassicalMPCConfig
(crocoddyl_classical.py:12-110) and ForceFeedbackMPCConfig
(crocoddyl_force_feedback.py:12-147) so reference users can carry their
tunings across.  OCP cost weights are split out into ``OCPWeights``
(the jit-static part); controller-loop knobs live here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..ocp.weights import OCPWeights


@dataclass
class ClassicalMPCConfig:
    # timing
    horizon: int = 20
    dt: float = 0.01                       # control period (dt_mpc)
    dt_ocp: Optional[float] = None         # OCP step; defaults to dt

    # free-space tracking
    w_ee_pos: float = 2.0e2
    w_ee_ori: float = 1.0e1
    ori_weights: np.ndarray = field(default_factory=lambda: np.array([2.0, 2.0, 0.15]))

    # regularization
    w_posture: float = 5.0e-1
    w_v: float = 2.5e-1
    w_tau: float = 1.0e-3
    w_tau_smooth: float = 5.0e-2
    posture_ref_mode: str = "x0"           # "x0" | "q_nom"
    torque_ref_mode: str = "gravity_x0"    # "gravity_x0" | "gravity_qnom" | "zero"
    w_tau_soft_limits: float = 0.0
    tau_soft_limit_margin: float = 0.2
    w_q_soft_limits: float = 0.0
    q_soft_limit_margin: float = 0.05

    # contact phase objectives
    z_contact: float = 0.35
    z_press: float = 0.0020
    w_plane_z: float = 0.0
    w_vz: float = 0.0
    w_tangent_pos: float = 2.0e2
    w_tangent_vel: float = 1.0e2

    # contact modeling
    contact_name: str = "ee_contact"
    contact_model: str = "normal_1d"       # "normal_1d" | "point3d"
    mu: float = 0.6
    friction_margin: float = 1e-3
    w_friction_cone: float = 2.0e2
    w_unilateral: float = 5.0e1
    contact_gains: np.ndarray = field(default_factory=lambda: np.array([0.0, 60.0]))
    contact_inv_damping: float = 1.0e-8

    # desired normal force
    fn_des: float = 8.0
    w_fn: float = 2.0e1

    # orientation damping
    w_wdamp: float = 2.0e1
    w_wdamp_weights: np.ndarray = field(default_factory=lambda: np.array([1.5, 1.5, 0.2]))

    # surface detection
    phase_source: str = "trajectory"       # "trajectory" | "force_latch"
    fn_contact_on: float = 2.0
    fn_contact_off: float = 0.5
    z_contact_band: float = 0.01

    # command safety filter
    tau_limits: np.ndarray = field(default_factory=lambda: np.array([87.0] * 4 + [12.0] * 3))
    tau_rate_limit: np.ndarray = field(default_factory=lambda: np.array([450.0] * 4 + [180.0] * 3))
    tau_trust_inf: float = 40.0
    tau_smoothing_alpha: float = 0.35
    apply_command_filter: bool = False

    v_damp_weights: np.ndarray = field(default_factory=lambda: np.array([1, 1, 1, 1, 0.4, 0.4, 0.4], dtype=float))

    # solver
    max_iters: int = 20
    # Optional one-off budget for cold-started solves (init / mode switch /
    # guard reset); <= 0 means "use max_iters" (the benchmark protocol).
    # NOTE: larger cold budgets are NOT automatically better — this OCP is
    # multimodal from pressed states, and fully-converged cold solutions can
    # be aggressive bang-bang plans; the 10-iteration budget doubles as
    # implicit regularization keeping the plan near the gentle warm start.
    cold_start_iters: int = 0
    use_box_fddp: bool = True
    # Backward-sweep mode: "sequential" (Crocoddyl-style scan) or
    # "parallel" (O(log N) associative-scan Riccati) — the latter is the
    # latency-oriented choice for B=1 replans / RTI ticks (measured 414 ->
    # 103 ms p50 through the tunnel at 10 iters; ROADMAP round-2 table).
    riccati_mode: str = "sequential"
    mpc_update_steps: int = 1
    use_feedback_policy: bool = True
    feedback_gain_scale: float = 1.0
    verbose: bool = False
    debug_every: int = 25
    max_solver_cost: float = 1.0e8
    max_tau_raw_inf: float = 3.0e2
    fallback_dq_damping: float = 5.0
    contact_release_steps: int = 25

    # Solution-acceptance gate (robustness addition beyond the reference):
    # a warm-started resolve whose cost exceeds solve_reject_factor x the
    # last accepted cost is treated as non-converged chatter — the stored
    # plan's Riccati policy keeps executing instead of applying the junk
    # solution.  After max_bad_solves consecutive rejections the reference's
    # hard-reset guard path takes over.  Set factor <= 0 to disable
    # (reference behavior: every solve is applied).
    solve_reject_factor: float = 50.0
    max_bad_solves: int = 40

    # Warm-start shift style: "consistent" shifts states AND controls one
    # knot (gaps stay at one-step prediction error); "reference" mirrors
    # the reference _shift_guess (crocoddyl_classical.py:733-757): controls
    # shift, states keep their old positions (manufactures O(1) gaps).
    # Used by the parity harness to measure PARITY.md deviation 2.
    warmstart_shift: str = "consistent"
    # Run the solver with Crocoddyl's exact acceptance/stopping semantics
    # (FDDPSettings.crocoddyl_semantics) — parity harness toggle for
    # PARITY.md deviation 3.
    crocoddyl_solver_semantics: bool = False

    # Keep the warm start across free<->contact mode switches (the knot
    # state space is identical; the incumbent smooth plan is a far better
    # initialization than the reference's cold reset
    # (crocoddyl_classical.py:320-329), whose half-converged first contact
    # solve jerks the arm).  Set True to mirror the reference exactly.
    reset_warmstart_on_mode_switch: bool = False

    @property
    def dt_ocp_eff(self) -> float:
        return float(max(self.dt if self.dt_ocp is None else self.dt_ocp, 1e-6))

    def ocp_weights(self, ff_alpha: float = 0.0) -> OCPWeights:
        """Project the controller config onto the static OCP weight spec."""
        kw = dict(
            dt_ocp=self.dt_ocp_eff,
            w_ee_pos=float(self.w_ee_pos),
            w_ee_ori=float(self.w_ee_ori),
            ori_weights=tuple(np.asarray(self.ori_weights, dtype=float)),
            w_posture=float(self.w_posture),
            w_v=float(self.w_v),
            v_damp_weights=tuple(np.asarray(self.v_damp_weights, dtype=float)),
            w_tau=float(self.w_tau),
            w_tau_soft_limits=float(self.w_tau_soft_limits),
            tau_soft_limit_margin=float(self.tau_soft_limit_margin),
            w_q_soft_limits=float(self.w_q_soft_limits),
            q_soft_limit_margin=float(self.q_soft_limit_margin),
            w_wdamp=float(self.w_wdamp),
            w_wdamp_weights=tuple(np.asarray(self.w_wdamp_weights, dtype=float)),
            z_press=float(self.z_press),
            w_plane_z=float(self.w_plane_z),
            w_vz=float(self.w_vz),
            w_tangent_pos=float(self.w_tangent_pos),
            w_tangent_vel=float(self.w_tangent_vel),
            contact_model=str(self.contact_model),
            mu=float(self.mu),
            friction_margin=float(self.friction_margin),
            w_friction_cone=float(self.w_friction_cone),
            w_unilateral=float(self.w_unilateral),
            contact_gains=tuple(np.asarray(self.contact_gains, dtype=float)),
            contact_inv_damping=float(self.contact_inv_damping),
            fn_des=float(self.fn_des),
            w_fn=float(self.w_fn),
            tau_limits=tuple(np.asarray(self.tau_limits, dtype=float)),
            ff_alpha=float(ff_alpha),
        )
        ff = getattr(self, "_ff_ocp_fields", None)
        if ff:
            kw.update(ff())
        return OCPWeights(**kw)


@dataclass
class ForceFeedbackMPCConfig(ClassicalMPCConfig):
    """Superset config for the augmented (q, v, tau_hat)/w controller
    (reference crocoddyl_force_feedback.py:12-147)."""

    # augmented-model costs (Eq. 20)
    w_w: float = 8.0e-4
    w_y: float = 3.0e-3
    y_q_weights: np.ndarray = field(default_factory=lambda: np.array([0.2] * 4 + [0.1] * 3))
    y_v_weights: np.ndarray = field(default_factory=lambda: np.array([0.08] * 4 + [0.05] * 3))
    y_tau_weights: np.ndarray = field(default_factory=lambda: np.array([0.35] * 4 + [0.2] * 3))
    use_inner_state_reg: bool = True
    use_inner_tau_reg: bool = True
    w_w_soft_limits: float = 2.0

    # LPF augmentation
    ff_cutoff_hz: float = 18.0
    ff_alpha_override: Optional[float] = None
    ff_use_tau_meas_filt: bool = True
    ff_tau_state_source: str = "tau_meas_act_filt"
    ff_use_tau_interpolation: bool = True
    # prediction-alignment logging aids
    ff_align_force_prediction: bool = True
    ff_align_window: int = 240
    ff_align_min_samples: int = 80
    ff_align_corr_threshold: float = 0.05
    ff_align_max_lag: int = 8
    ff_inverse_actuation_model: bool = False
    ff_tau_feedback_gain: float = 1.0

    # FF benchmark preset default differs from classical
    feedback_gain_scale: float = 0.35

    def _ff_ocp_fields(self):
        return dict(
            w_w=float(self.w_w),
            w_w_soft_limits=float(self.w_w_soft_limits),
            w_y=float(self.w_y),
            y_weights=tuple(np.concatenate([
                np.asarray(self.y_q_weights, dtype=float),
                np.asarray(self.y_v_weights, dtype=float),
                np.asarray(self.y_tau_weights, dtype=float)])),
            use_inner_state_reg=bool(self.use_inner_state_reg),
            use_inner_tau_reg=bool(self.use_inner_tau_reg),
        )

    def ff_alpha_at(self, dt: float) -> float:
        """LPF pole at sample time dt (reference _ff_alpha_ocp/_ctrl,
        crocoddyl_force_feedback.py:493-504)."""
        if self.ff_alpha_override is not None:
            return float(np.clip(self.ff_alpha_override, 0.0, 0.999999))
        wc = 2.0 * np.pi * max(float(self.ff_cutoff_hz), 0.0)
        return float(np.clip(np.exp(-wc * float(dt)), 0.0, 0.999999))
