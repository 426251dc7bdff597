"""Host-loop MPC controllers: classical and force-feedback.

Equivalents of the reference's ClassicalCrocoddylMPC
(crocoddyl_classical.py:113-1018) and ForceFeedbackCrocoddylMPC
(crocoddyl_force_feedback.py:293-1448).  The per-tick flow mirrors the
reference: phase latch -> warm-start shift -> (re)solve -> Riccati policy ->
divergence guard -> safety filter; but problem construction + solve is one
jitted device program per (mode, config) pair — no per-knot Python objects,
no C++->Python callbacks.

Frame handling: the controller model is built in the MuJoCo world frame
(see core.panda), so the reference's MuJoCo<->Pinocchio calibration chain
(R_mj_from_pin, site offsets; crocoddyl_classical.py:149-258) is identity by
construction and trajectory references feed the OCP directly.

A note on feedback sign: our solver returns Riccati gains K with the
rollout convention u = u_nom - K (x - x_nom); the policy applies the
stabilizing sign u = u_ff - scale*K dx.  (The reference's classical policy
adds +K dx (crocoddyl_classical.py:777), which is inert in benchmark mode —
it solves every tick so dx == 0 — and its FF policy uses the stabilizing
(nom - now) error form, Eq. 15-18.)
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import make_panda_model, gravity_torque
from ..core.dynamics import fwd_dynamics_contact
from ..ocp.action import make_classical_knot, make_augmented_knot
from ..ocp.problem import build_problem_refs
from ..solver.fddp import solve as fddp_solve, FDDPSettings
from .config import ClassicalMPCConfig, ForceFeedbackMPCConfig

_NEG_INF_STEP = -1_000_000_000


def make_vertical_down_R() -> np.ndarray:
    """Desired ee orientation: tool z pointing down, x along world +x
    (reference _make_vertical_down_rotation_mj, crocoddyl_classical.py:241)."""
    z = np.array([0.0, 0.0, -1.0])
    x = np.array([1.0, 0.0, 0.0])
    y = np.cross(z, x)
    y /= np.linalg.norm(y) + 1e-12
    x = np.cross(y, z)
    x /= np.linalg.norm(x) + 1e-12
    return np.column_stack([x, y, z])


class _MPCBase:
    """Shared controller machinery (latch, safety filter, warm-start shift)."""

    def __init__(self, sim, traj_fn, cfg: ClassicalMPCConfig,
                 model_variant: str = "plant", dtype=jnp.float64):
        self.sim = sim
        self.traj_fn = traj_fn
        self.cfg = cfg
        self.dtype = dtype
        self.model = make_panda_model(model_variant, dtype=dtype)
        self._k = 0

        obs0 = sim.get_observation(with_ee=True, with_jacobian=False)
        self.q_nom = np.asarray(obs0.q, dtype=float).copy()
        self.R_des = make_vertical_down_R()

        self.xs: Optional[np.ndarray] = None   # (N+1, nx)
        self.us: Optional[np.ndarray] = None   # (N, nu)
        self.Ks: Optional[np.ndarray] = None   # (N, nu, nx)
        self._last_solve_step = _NEG_INF_STEP
        self._last_solve_ok = False
        self._last_solve_cost = np.nan
        self._last_solve_iters = -1
        self._surface_latched = False
        self._contact_loss_count = 0
        self._prev_surface_mode: Optional[bool] = None
        self._last_good_cost: Optional[float] = None
        self._bad_streak = 0
        self.last_info: dict = {"ok": False, "cost": np.nan, "iters": -1,
                                "tau_raw_inf": np.nan, "tau_cmd_inf": np.nan,
                                "surface_mode": False, "unstable": False,
                                "fn_pred": np.nan}

        croco = bool(getattr(cfg, "crocoddyl_solver_semantics", False))
        riccati = str(getattr(cfg, "riccati_mode", "sequential"))
        self._settings = FDDPSettings(
            max_iters=int(cfg.max_iters), use_box=bool(cfg.use_box_fddp),
            riccati_mode=riccati, crocoddyl_semantics=croco)
        # Cold starts (init / mode switch / divergence reset) may get their
        # own budget (see config note: bigger is not automatically better).
        cold_iters = int(getattr(cfg, "cold_start_iters", 0))
        self._settings_cold = FDDPSettings(
            max_iters=cold_iters if cold_iters > 0 else int(cfg.max_iters),
            use_box=bool(cfg.use_box_fddp), riccati_mode=riccati,
            crocoddyl_semantics=croco)
        # regularization carried across ticks (see fddp.solve reg0); reset
        # alongside the warm start
        self._reg_carry = float(self._settings.reg_init)

    # -- helpers mirroring the reference loop ------------------------------

    @property
    def _dt_ocp(self) -> float:
        return self.cfg.dt_ocp_eff

    def _detect_surface(self, obs, t: float, surf_hint: bool) -> bool:
        """Hysteresis force latch (reference _detect_surface,
        crocoddyl_classical.py:286-303)."""
        cfg = self.cfg
        fn = float(getattr(obs, "f_contact_normal", 0.0))
        ee_z = float(obs.ee_pos[2]) if obs.ee_pos is not None else float("inf")
        near = np.isfinite(ee_z) and (ee_z <= float(cfg.z_contact) + float(cfg.z_contact_band))
        if self._surface_latched:
            lost = fn < cfg.fn_contact_off
            self._contact_loss_count = self._contact_loss_count + 1 if lost else 0
            if self._contact_loss_count >= int(cfg.contact_release_steps):
                self._surface_latched = False
                self._contact_loss_count = 0
        else:
            if (fn > cfg.fn_contact_on) or (surf_hint and near):
                self._surface_latched = True
                self._contact_loss_count = 0
        return self._surface_latched

    def _surface_now(self, obs, t: float) -> bool:
        _, _, surf_hint = self.traj_fn.numpy(t) if hasattr(self.traj_fn, "numpy") \
            else self.traj_fn(t)
        if str(self.cfg.phase_source).strip().lower() == "force_latch":
            return self._detect_surface(obs, t, bool(surf_hint))
        return bool(surf_hint)

    def _handle_mode_switch(self, surface_now: bool):
        if self._prev_surface_mode is None:
            self._prev_surface_mode = bool(surface_now)
        elif bool(surface_now) != self._prev_surface_mode:
            if bool(getattr(self.cfg, "reset_warmstart_on_mode_switch", True)):
                self.xs = self.us = self.Ks = None
                self._last_solve_step = _NEG_INF_STEP
            self._prev_surface_mode = bool(surface_now)
            # the cost scale changes across modes: re-anchor the gate
            self._last_good_cost = None
            self._bad_streak = 0

    def _safe_tau(self, tau_target: np.ndarray) -> np.ndarray:
        """Hard clip + optional trust/slew/EMA filter (reference _safe_tau,
        crocoddyl_classical.py:260-284)."""
        cfg = self.cfg
        tau_target = np.asarray(tau_target, dtype=float).copy()
        if not np.all(np.isfinite(tau_target)):
            tau_target = self._tau_prev.copy()
        tau_target = np.clip(tau_target, -cfg.tau_limits, cfg.tau_limits)
        if not bool(cfg.apply_command_filter):
            self._tau_prev = tau_target.copy()
            return tau_target
        d = np.clip(tau_target - self._tau_prev, -cfg.tau_trust_inf, cfg.tau_trust_inf)
        dt = float(getattr(self.sim, "dt", cfg.dt))
        max_step = np.asarray(cfg.tau_rate_limit, dtype=float) * dt
        d = np.clip(d, -max_step, max_step)
        alpha = float(np.clip(cfg.tau_smoothing_alpha, 0.0, 1.0))
        tau_cmd = (1.0 - alpha) * self._tau_prev + alpha * (self._tau_prev + d)
        tau_cmd = np.clip(tau_cmd, -cfg.tau_limits, cfg.tau_limits)
        self._tau_prev = tau_cmd.copy()
        return tau_cmd

    def _shift_guess(self, x0: np.ndarray, N: int, u_hold: np.ndarray):
        """Receding-horizon warm start: time-consistent shift of BOTH states
        and controls (xs[k] <- xs_prev[k+1], us[k] <- us_prev[k+1]).

        Deliberate deviation from the reference _shift_guess
        (crocoddyl_classical.py:733-757), which shifts controls but keeps
        states unshifted — that mismatch creates O(1) dynamics gaps whenever
        the previous solution's controls vary along the horizon, and FDDP's
        gap-contraction acceptance (th_acceptnegstep) can then legally take
        a large cost-increasing step, destabilizing the MPC loop.  The
        consistent shift keeps gaps at the one-step prediction error.
        """
        if self.xs is None or self.us is None or len(self.us) < N:
            xs = np.tile(x0, (N + 1, 1))
            us = np.tile(u_hold, (N, 1))
            return xs, us
        xs_prev, us_prev = self.xs, self.us
        if str(getattr(self.cfg, "warmstart_shift", "consistent")) == "reference":
            # reference semantics: xs = [x0] + xs_prev[1:], us shifted
            xs = np.empty((N + 1, x0.shape[0]))
            xs[0] = x0
            n_keep = min(len(xs_prev) - 1, N)
            xs[1:1 + n_keep] = xs_prev[1:1 + n_keep]
            xs[1 + n_keep:] = xs_prev[-1]
            us = np.empty((N, us_prev.shape[1]))
            n_u = min(len(us_prev) - 1, N)
            us[:n_u] = us_prev[1:1 + n_u]
            us[n_u:] = us_prev[-1]
            return xs, us
        xs = np.empty((N + 1, x0.shape[0]))
        xs[0] = x0
        n_tail = min(len(xs_prev) - 2, N)
        xs[1:1 + n_tail] = xs_prev[2:2 + n_tail]
        xs[1 + n_tail:] = xs_prev[-1]
        us = np.empty((N, us_prev.shape[1]))
        n_tail_u = min(len(us_prev) - 1, N)
        us[:n_tail_u] = us_prev[1:1 + n_tail_u]
        us[n_tail_u:] = us_prev[-1]
        return xs, us

    def _shift_stored_policy(self):
        """Between solves, advance stored policy one knot
        (reference compute_control tail, crocoddyl_classical.py:431-438)."""
        if self.us is not None and len(self.us) > 1:
            self.us = np.concatenate([self.us[1:], self.us[-1:]], axis=0)
        if self.xs is not None and len(self.xs) > 1:
            self.xs = np.concatenate([self.xs[1:], self.xs[-1:]], axis=0)
        if self.Ks is not None and len(self.Ks) > 1:
            self.Ks = np.concatenate([self.Ks[1:], self.Ks[-1:]], axis=0)

    def _accept_solution(self, res) -> bool:
        """Solution-acceptance gate (see config.solve_reject_factor)."""
        cost = float(res.cost)
        us0 = np.asarray(res.us[0], dtype=float)
        if not (np.isfinite(cost) and np.all(np.isfinite(us0))):
            return False
        factor = float(getattr(self.cfg, "solve_reject_factor", 0.0))
        if factor <= 0.0 or self._last_good_cost is None:
            return True
        return cost <= factor * max(self._last_good_cost, 1.0)

    def _register_solution(self, res) -> bool:
        if self._accept_solution(res):
            self.xs = np.asarray(res.xs)
            self.us = np.asarray(res.us)
            self.Ks = np.asarray(res.K)
            self._last_good_cost = float(res.cost)
            self._bad_streak = 0
            return True
        self._bad_streak += 1
        if self._bad_streak > int(getattr(self.cfg, "max_bad_solves", 40)):
            # prolonged failure: fall back to the reference's hard reset
            self.xs = self.us = self.Ks = None
            self._last_solve_step = _NEG_INF_STEP
            self._last_good_cost = None
            self._bad_streak = 0
        return False

    def _tau_reference(self, q_now: np.ndarray) -> np.ndarray:
        mode = str(self.cfg.torque_ref_mode).strip().lower()
        if mode == "zero":
            return np.zeros(7)
        q = self.q_nom if mode == "gravity_qnom" else q_now
        return np.asarray(gravity_torque(self.model, jnp.asarray(q, self.dtype)))

    def _posture_reference(self, x0: np.ndarray) -> np.ndarray:
        if str(self.cfg.posture_ref_mode).strip().lower() == "q_nom":
            return np.concatenate([self.q_nom, np.zeros(7)])
        return np.asarray(x0[:14], dtype=float).copy()


class ClassicalMPC(_MPCBase):
    """Classical torque MPC on x = (q, v), control tau."""

    def __init__(self, sim, traj_fn, cfg: Optional[ClassicalMPCConfig] = None,
                 model_variant: str = "plant", dtype=jnp.float64):
        cfg = cfg or ClassicalMPCConfig()
        super().__init__(sim, traj_fn, cfg, model_variant, dtype)
        obs0 = sim.get_observation(with_ee=True, with_jacobian=False)
        self._tau_prev = np.asarray(obs0.tau_bias, dtype=float).copy()

        W_free = cfg.ocp_weights()
        self._knots = {
            False: make_classical_knot(self.model, W_free, surface=False),
            True: make_classical_knot(self.model, W_free, surface=True),
        }
        self._W = W_free
        self._solve_fns = {
            (surf, cold): self._build_solve_fn(surf, cold)
            for surf in (False, True) for cold in (False, True)}

    def _build_solve_fn(self, surface: bool, cold: bool):
        knot = self._knots[surface]
        N = int(self.cfg.horizon)
        W = self._W
        traj = self.traj_fn
        R_des = jnp.asarray(self.R_des, self.dtype)
        settings = self._settings_cold if cold else self._settings
        model = self.model

        @jax.jit
        def run(t0, x0, xs_init, us_init, x_reg_ref, tau_ref, reg0):
            refs_run, ref_T = build_problem_refs(
                traj, t0, N, W.dt_ocp, x_reg_ref, tau_ref, R_des,
                dtype=xs_init.dtype)
            res = fddp_solve(knot, refs_run, ref_T, x0, xs_init, us_init,
                             settings, reg0=reg0)
            if surface:
                # predicted normal force at knot 0 (reference
                # _extract_predicted_normal_force, crocoddyl_classical.py:905)
                ref0 = jax.tree.map(lambda a: a[0], refs_run)
                z_t = ref0.p_ref[2] - W.z_press
                nc1 = W.contact_model != "point3d"
                ref_pos = z_t if nc1 else ref0.p_ref.at[2].set(z_t)
                dyn = fwd_dynamics_contact(
                    model, res.xs[0, :7], res.xs[0, 7:14], res.us[0],
                    ref_pos=ref_pos, nc1=nc1,
                    baumgarte_kp=W.contact_gains[0], baumgarte_kd=W.contact_gains[1],
                    damping_c=W.contact_inv_damping)
                fn_pred = jnp.abs(dyn.force[0]) if nc1 else jnp.abs(dyn.force[2])
            else:
                fn_pred = jnp.nan
            return res, fn_pred

        return run

    def compute_control(self, obs, t: float) -> np.ndarray:
        cfg = self.cfg
        self._k += 1
        q = np.asarray(obs.q, dtype=float)
        v = np.asarray(obs.dq, dtype=float)
        x0 = np.concatenate([q, v])

        surface_now = self._surface_now(obs, t)
        self._handle_mode_switch(surface_now)

        solve_period = max(1, int(cfg.mpc_update_steps))
        need_solve = (self.us is None or self.xs is None
                      or (self._k - self._last_solve_step) >= solve_period)

        solved_now = False
        ok = self._last_solve_ok
        cost = float(self._last_solve_cost)
        iters = int(self._last_solve_iters)
        fn_pred = float(self.last_info.get("fn_pred", np.nan))

        if need_solve:
            is_cold = self.us is None or self.xs is None
            xs_init, us_init = self._shift_guess(x0, cfg.horizon, self._tau_prev)
            tau_ref = self._tau_reference(q)
            x_reg_ref = self._posture_reference(x0)
            res, fn_pred_dev = self._solve_fns[(surface_now, is_cold)](
                jnp.asarray(t, self.dtype), jnp.asarray(x0, self.dtype),
                jnp.asarray(xs_init, self.dtype), jnp.asarray(us_init, self.dtype),
                jnp.asarray(x_reg_ref, self.dtype), jnp.asarray(tau_ref, self.dtype),
                jnp.asarray(self._reg_carry, self.dtype))
            self._reg_carry = float(res.xreg)
            ok = bool(res.feasible) and not bool(res.diverged)
            cost = float(res.cost)
            iters = int(res.iters)
            fn_pred = float(fn_pred_dev) if surface_now else np.nan
            solved_now = True
            self._last_solve_step = self._k
            self._last_solve_ok = ok
            self._last_solve_cost = cost
            self._last_solve_iters = iters
            accepted = self._register_solution(res)
            if not accepted:
                # keep executing the stored plan's policy this tick
                solved_now = False
                cost = self._last_good_cost if self._last_good_cost is not None else cost

        tau_raw, policy_idx = self._policy_control(x0)

        tau_raw_inf = float(np.max(np.abs(tau_raw)))
        unstable = ((not np.isfinite(cost)) or cost > float(cfg.max_solver_cost)
                    or tau_raw_inf > float(cfg.max_tau_raw_inf))
        if unstable:
            tau_raw = np.asarray(obs.tau_bias, dtype=float) - float(cfg.fallback_dq_damping) * v
            self.xs = self.us = self.Ks = None
            self._last_solve_step = _NEG_INF_STEP

        tau_cmd = self._safe_tau(tau_raw)
        self.last_info = {
            "ok": bool(ok), "cost": float(cost), "iters": iters,
            "tau_raw_inf": tau_raw_inf,
            "tau_cmd_inf": float(np.max(np.abs(tau_cmd))),
            "surface_mode": bool(surface_now), "unstable": bool(unstable),
            "fn_pred": float(fn_pred) if np.isfinite(fn_pred) else np.nan,
            "solved_now": bool(solved_now), "policy_idx": int(policy_idx),
        }

        if (self._k % cfg.debug_every) == 0 and cfg.verbose:
            print(f"[MPC] t={t:6.3f} ok={ok} cost={cost:.2e} iters={iters:2d} "
                  f"|tau|inf={tau_raw_inf:.2f} surf={int(surface_now)} fn_pred={fn_pred:.2f}")

        if (not solved_now) and self.us is not None and self.xs is not None:
            self._shift_stored_policy()
        return tau_cmd

    def _policy_control(self, x_now: np.ndarray) -> Tuple[np.ndarray, int]:
        if self.us is None or len(self.us) == 0:
            return self._tau_prev.copy(), -1
        u = np.asarray(self.us[0], dtype=float).copy()
        if (self.cfg.use_feedback_policy and self.Ks is not None
                and len(self.Ks) > 0 and self.xs is not None):
            dx = x_now - np.asarray(self.xs[0], dtype=float)
            # stabilizing sign with rollout-convention gains (see module doc)
            u -= float(self.cfg.feedback_gain_scale) * (self.Ks[0] @ dx)
        return u, 0


class ForceFeedbackMPC(_MPCBase):
    """Force-feedback MPC on the augmented state y = (q, v, tau_hat),
    control w, with the interpolated filtered-torque policy (Eq. 14-18)."""

    def __init__(self, sim, traj_fn, cfg: Optional[ForceFeedbackMPCConfig] = None,
                 model_variant: str = "plant", dtype=jnp.float64):
        cfg = cfg or ForceFeedbackMPCConfig()
        super().__init__(sim, traj_fn, cfg, model_variant, dtype)
        obs0 = sim.get_observation(with_ee=True, with_jacobian=False)
        self._tau_prev = np.asarray(obs0.tau_cmd, dtype=float).copy()

        self._alpha_ocp = cfg.ff_alpha_at(self._dt_ocp)
        W = cfg.ocp_weights(ff_alpha=self._alpha_ocp)
        self._W = W
        self._knots = {
            False: make_augmented_knot(self.model, W, surface=False),
            True: make_augmented_knot(self.model, W, surface=True),
        }
        self._solve_fns = {
            (surf, cold): self._build_solve_fn(surf, cold)
            for surf in (False, True) for cold in (False, True)}
        self._fn_pred_hist_raw: list = []
        self._fn_pred_hist_meas: list = []
        self._fn_pred_corr = np.nan

    # -- FF-specific helpers ----------------------------------------------

    def _ff_alpha_ctrl(self) -> float:
        dt_mpc = float(getattr(self.sim, "dt", self.cfg.dt))
        return self.cfg.ff_alpha_at(dt_mpc)

    def _policy_epsilon(self) -> float:
        dt_mpc = float(getattr(self.sim, "dt", self.cfg.dt))
        return float(np.clip(dt_mpc / self._dt_ocp, 0.0, 1.0))

    def _tau_state_from_obs(self, obs) -> np.ndarray:
        """tau_hat source with fallback chain (reference _tau_state_from_obs,
        crocoddyl_force_feedback.py:512-536)."""
        src = str(self.cfg.ff_tau_state_source).strip().lower()
        if src == "auto":
            src = "tau_meas_filt" if self.cfg.ff_use_tau_meas_filt else "tau_meas"
        chains = {
            "tau_meas_act_filt": ("tau_meas_act_filt", "tau_meas_act", "tau_cmd"),
            "tau_meas_act": ("tau_meas_act", "tau_cmd"),
            "tau_cmd": ("tau_cmd",),
            "tau_meas_filt": ("tau_meas_filt", "tau_meas"),
            "tau_meas": ("tau_meas",),
            "tau_total": ("tau_total", "tau_meas"),
        }
        for key in chains.get(src, ("tau_meas_act_filt", "tau_meas_act", "tau_cmd", "tau_meas")):
            tau = getattr(obs, key, None)
            if tau is None:
                continue
            tau = np.asarray(tau, dtype=float).reshape(7)
            if np.all(np.isfinite(tau)):
                return tau
        tau = np.asarray(getattr(obs, "tau_cmd", np.zeros(7)), dtype=float).reshape(7)
        return tau if np.all(np.isfinite(tau)) else np.zeros(7)

    def _build_solve_fn(self, surface: bool, cold: bool):
        knot = self._knots[surface]
        N = int(self.cfg.horizon)
        W = self._W
        traj = self.traj_fn
        R_des = jnp.asarray(self.R_des, self.dtype)
        settings = self._settings_cold if cold else self._settings
        model = self.model
        eps = self._policy_epsilon()

        @jax.jit
        def run(t0, y0, xs_init, us_init, x_reg_ref, tau_ref, reg0):
            refs_run, ref_T = build_problem_refs(
                traj, t0, N, W.dt_ocp, x_reg_ref, tau_ref, R_des,
                y_ref=y0, dtype=xs_init.dtype)
            res = fddp_solve(knot, refs_run, ref_T, y0, xs_init, us_init,
                             settings, reg0=reg0)
            if surface:
                # interpolated next-step force prediction (reference
                # _extract_predicted_normal_force_next_step, ff:1219-1243)
                def fn_at(kidx):
                    ref_k = jax.tree.map(lambda a: a[kidx], refs_run)
                    z_t = ref_k.p_ref[2] - W.z_press
                    nc1 = W.contact_model != "point3d"
                    ref_pos = z_t if nc1 else ref_k.p_ref.at[2].set(z_t)
                    dyn = fwd_dynamics_contact(
                        model, res.xs[kidx, :7], res.xs[kidx, 7:14],
                        res.xs[kidx, 14:21],
                        ref_pos=ref_pos, nc1=nc1,
                        baumgarte_kp=W.contact_gains[0],
                        baumgarte_kd=W.contact_gains[1],
                        damping_c=W.contact_inv_damping)
                    return jnp.abs(dyn.force[0]) if nc1 else jnp.abs(dyn.force[2])
                f0, f1 = fn_at(0), fn_at(1)
                fn_pred = (1.0 - eps) * f0 + eps * f1
            else:
                fn_pred = jnp.nan
            return res, fn_pred

        return run

    def compute_control(self, obs, t: float) -> np.ndarray:
        cfg = self.cfg
        self._k += 1
        q = np.asarray(obs.q, dtype=float)
        v = np.asarray(obs.dq, dtype=float)
        tau_hat = self._tau_state_from_obs(obs)
        y0 = np.concatenate([q, v, tau_hat])

        surface_now = self._surface_now(obs, t)
        self._handle_mode_switch(surface_now)

        solve_period = max(1, int(cfg.mpc_update_steps))
        need_solve = (self.us is None or self.xs is None
                      or (self._k - self._last_solve_step) >= solve_period)

        solved_now = False
        ok = self._last_solve_ok
        cost = float(self._last_solve_cost)
        iters = int(self._last_solve_iters)
        fn_pred_raw = float(self.last_info.get("fn_pred_raw", np.nan))

        if need_solve:
            is_cold = self.us is None or self.xs is None
            xs_init, us_init = self._shift_guess(y0, cfg.horizon, tau_hat)
            tau_ref = self._tau_reference(q)
            x_reg_ref = self._posture_reference(y0)
            res, fn_pred_dev = self._solve_fns[(surface_now, is_cold)](
                jnp.asarray(t, self.dtype), jnp.asarray(y0, self.dtype),
                jnp.asarray(xs_init, self.dtype), jnp.asarray(us_init, self.dtype),
                jnp.asarray(x_reg_ref, self.dtype), jnp.asarray(tau_ref, self.dtype),
                jnp.asarray(self._reg_carry, self.dtype))
            self._reg_carry = float(res.xreg)
            ok = bool(res.feasible) and not bool(res.diverged)
            cost = float(res.cost)
            iters = int(res.iters)
            fn_pred_raw = float(fn_pred_dev) if surface_now else np.nan
            solved_now = True
            self._last_solve_step = self._k
            self._last_solve_ok = ok
            self._last_solve_cost = cost
            self._last_solve_iters = iters
            accepted = self._register_solution(res)
            if not accepted:
                solved_now = False
                cost = self._last_good_cost if self._last_good_cost is not None else cost

        tau_des, policy_idx = self._policy_control(y0)
        tau_raw = np.asarray(tau_des, dtype=float).copy()
        if bool(cfg.ff_inverse_actuation_model):
            # inverse LPF actuation map (reference ff:632-635)
            alpha_c = self._ff_alpha_ctrl()
            beta_c = max(1e-6, 1.0 - alpha_c)
            tau_raw = (tau_raw - alpha_c * tau_hat) / beta_c

        tau_raw_inf = float(np.max(np.abs(tau_raw)))
        unstable = ((not np.isfinite(cost)) or cost > float(cfg.max_solver_cost)
                    or tau_raw_inf > float(cfg.max_tau_raw_inf))
        if unstable:
            tau_raw = np.asarray(obs.tau_bias, dtype=float) - float(cfg.fallback_dq_damping) * v
            self.xs = self.us = self.Ks = None
            self._last_solve_step = _NEG_INF_STEP

        tau_cmd = self._safe_tau(tau_raw)
        fn_meas_now = float(getattr(obs, "f_contact_normal", np.nan))
        fn_pred = self._align_logged_force_prediction(fn_pred_raw, fn_meas_now, surface_now)
        self.last_info = {
            "ok": bool(ok), "cost": float(cost), "iters": iters,
            "tau_des_inf": float(np.max(np.abs(tau_des))),
            "tau_meas_state_inf": float(np.max(np.abs(tau_hat))),
            "tau_raw_inf": tau_raw_inf,
            "tau_cmd_inf": float(np.max(np.abs(tau_cmd))),
            "surface_mode": bool(surface_now), "unstable": bool(unstable),
            "fn_pred": float(fn_pred) if np.isfinite(fn_pred) else np.nan,
            "fn_pred_raw": float(fn_pred_raw) if np.isfinite(fn_pred_raw) else np.nan,
            "fn_pred_corr": float(self._fn_pred_corr) if np.isfinite(self._fn_pred_corr) else np.nan,
            "solved_now": bool(solved_now), "policy_idx": int(policy_idx),
        }

        if (not solved_now) and self.us is not None and self.xs is not None:
            self._shift_stored_policy()
        return tau_cmd

    def _policy_control(self, y_now: np.ndarray) -> Tuple[np.ndarray, int]:
        """Interpolated filtered-torque policy with reshaped Riccati gains
        (reference _policy_control, ff:1041-1093; Kleff et al. Eq. 14-18)."""
        nu = 7
        if self.us is None or self.xs is None or len(self.us) == 0:
            return y_now[14:21].copy(), -1
        alpha = self._alpha_ocp
        eps = self._policy_epsilon() if bool(self.cfg.ff_use_tau_interpolation) else 0.0

        y0_nom = np.asarray(self.xs[0], dtype=float)
        tau0 = y0_nom[14:21]
        if len(self.xs) > 1:
            tau1 = np.asarray(self.xs[1], dtype=float)[14:21]
        else:
            w0 = np.asarray(self.us[0], dtype=float)
            tau1 = alpha * tau0 + (1.0 - alpha) * w0

        tau_tilde = tau0 + eps * (tau1 - tau0)          # Eq. 14
        tau_cmd = tau_tilde.copy()

        if self.cfg.use_feedback_policy and self.Ks is not None and len(self.Ks) > 0:
            K0 = np.asarray(self.Ks[0], dtype=float)    # (7, 21), rollout sign
            Kx = K0[:, :14]
            Ktau = K0[:, 14:21]
            x_err = y0_nom[:14] - y_now[:14]            # (nom - now)
            tau_err = tau0 - y_now[14:21]
            K_tilde_x = eps * (1.0 - alpha) * Kx        # Eq. 15-18
            K_tilde_tau = np.eye(nu) + eps * (1.0 - alpha) * (Ktau - np.eye(nu))
            tau_cmd += float(self.cfg.feedback_gain_scale) * (
                K_tilde_x @ x_err + K_tilde_tau @ tau_err)
        return tau_cmd, 0

    def _align_logged_force_prediction(self, fn_pred_raw: float, fn_meas: float,
                                       surface_now: bool) -> float:
        """Rolling lagged affine fit of raw prediction to measured force, for
        comparable logging under model mismatch (reference
        _align_logged_force_prediction, ff:1301-1371)."""
        cfg = self.cfg
        if not np.isfinite(fn_pred_raw):
            return np.nan
        if (not surface_now) or (not bool(cfg.ff_align_force_prediction)):
            self._fn_pred_corr = np.nan
            return float(fn_pred_raw)
        if np.isfinite(fn_meas):
            self._fn_pred_hist_raw.append(float(fn_pred_raw))
            self._fn_pred_hist_meas.append(float(fn_meas))
            win = int(max(cfg.ff_align_window, 16))
            self._fn_pred_hist_raw = self._fn_pred_hist_raw[-win:]
            self._fn_pred_hist_meas = self._fn_pred_hist_meas[-win:]
        min_n = int(max(cfg.ff_align_min_samples, 8))
        raw = np.asarray(self._fn_pred_hist_raw)
        meas = np.asarray(self._fn_pred_hist_meas)
        n = int(min(raw.size, meas.size))
        if n < min_n:
            self._fn_pred_corr = np.nan
            return float(fn_pred_raw)
        max_lag = min(int(max(cfg.ff_align_max_lag, 0)), n - min_n)
        corr_min = float(max(cfg.ff_align_corr_threshold, 0.0))
        best = None
        for lag in range(max_lag + 1):
            x = raw[:-lag] if lag > 0 else raw
            y = meas[lag:] if lag > 0 else meas
            if x.size < min_n:
                continue
            xc = x - x.mean()
            yc = y - y.mean()
            denom = float(np.linalg.norm(xc) * np.linalg.norm(yc))
            if denom < 1e-9:
                continue
            corr = float(xc @ yc / denom)
            if abs(corr) < corr_min:
                continue
            A = np.column_stack([x, np.ones_like(x)])
            try:
                a, b = np.linalg.lstsq(A, y, rcond=None)[0]
            except np.linalg.LinAlgError:
                continue
            rmse = float(np.sqrt(np.mean((a * x + b - y) ** 2)))
            if best is None or rmse < best[0]:
                best = (rmse, lag, corr, float(a), float(b))
        if best is None:
            self._fn_pred_corr = np.nan
            return float(fn_pred_raw)
        _, lag, corr, a, b = best
        self._fn_pred_corr = corr
        x_cur = float(raw[max(0, raw.size - 1 - lag)])
        return float(max(a * x_cur + b, 0.0))
