"""Benchmark uncertainty-injection protocol.

Equivalent of the reference ScenarioUncertaintyInjector
(src/run/uncertainty_profiles.py:12-161): actuation gain/bias applied to the
*delayed* command, Gaussian sensor noise on q/dq, delayed observations, and
the tau_meas* channels replaced by the corrupted-command model.  Doubles as
a deterministic fault-injection fixture (seeded).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, replace
from typing import Optional

import numpy as np

from ..sim.observation import Observation


@dataclass
class UncertaintyProfileConfig:
    a_min: float = 0.95
    a_max: float = 1.05
    b_min: float = -0.1
    b_max: float = 0.1
    sigma_q: float = 5.0e-4
    sigma_dq: float = 2.0e-3
    sigma_tau: float = 5.0e-2
    delta_obs_cycles: int = 2       # at the 1 kHz physics rate
    delta_cmd_s: float = 1.0e-3
    seed: int = 0


def config_for_scenario(scenario: str, seed: int = 0) -> Optional[UncertaintyProfileConfig]:
    if str(scenario).strip().lower() == "actuation_uncertainty":
        return UncertaintyProfileConfig(seed=int(seed))
    return None


def _copy_obs(obs: Observation) -> Observation:
    def cp(a):
        return None if a is None else np.asarray(a, dtype=float).copy()
    return replace(
        obs,
        q=cp(obs.q), dq=cp(obs.dq),
        tau_meas=cp(obs.tau_meas), tau_meas_filt=cp(obs.tau_meas_filt),
        tau_meas_act=cp(obs.tau_meas_act), tau_meas_act_filt=cp(obs.tau_meas_act_filt),
        tau_cmd=cp(obs.tau_cmd), tau_act=cp(obs.tau_act),
        tau_constraint=cp(obs.tau_constraint), tau_total=cp(obs.tau_total),
        tau_bias=cp(obs.tau_bias), f_contact_world=cp(obs.f_contact_world),
        ee_pos=cp(obs.ee_pos), ee_quat=cp(obs.ee_quat),
        J_pos=cp(obs.J_pos), J_rot=cp(obs.J_rot), ee_vel=cp(obs.ee_vel),
    )


class ScenarioUncertaintyInjector:
    def __init__(self, dt: float, nu: int, config: UncertaintyProfileConfig,
                 tau_lpf_alpha: float = 0.2):
        self.dt = float(max(dt, 1e-9))
        self.nu = int(nu)
        self.cfg = config
        self.rng = np.random.default_rng(int(config.seed))
        self.a = float(self.rng.uniform(config.a_min, config.a_max))
        self.b = float(self.rng.uniform(config.b_min, config.b_max))
        self.obs_delay_cycles_1khz = int(max(config.delta_obs_cycles, 0))
        obs_delay_s = self.obs_delay_cycles_1khz * 1.0e-3
        self.obs_delay_steps = int(max(round(obs_delay_s / self.dt), 0))
        self.cmd_delay_steps = int(max(round(config.delta_cmd_s / self.dt), 0))
        self._obs_hist: deque = deque(maxlen=self.obs_delay_steps + 1)
        self._cmd_hist: deque = deque(maxlen=self.cmd_delay_steps + 1)
        for _ in range(self.cmd_delay_steps + 1):
            self._cmd_hist.append(np.zeros(self.nu))
        self._tau_hat_filt = np.zeros(self.nu)
        self._tau_lpf_alpha = float(np.clip(tau_lpf_alpha, 0.0, 1.0))

    def meta(self) -> dict:
        return {
            "a": self.a, "b": self.b,
            "sigma_q": self.cfg.sigma_q, "sigma_dq": self.cfg.sigma_dq,
            "sigma_tau": self.cfg.sigma_tau,
            "delta_obs_cycles_1khz": self.obs_delay_cycles_1khz,
            "delta_obs_steps": self.obs_delay_steps,
            "delta_cmd_steps": self.cmd_delay_steps,
            "delta_cmd_s": self.cfg.delta_cmd_s,
            "seed": int(self.cfg.seed),
        }

    def _delayed_command(self) -> np.ndarray:
        return np.asarray(self._cmd_hist[0]).reshape(self.nu)

    def _sample_tau_hat(self) -> np.ndarray:
        noise = self.rng.normal(0.0, self.cfg.sigma_tau, size=self.nu)
        return self.a * self._delayed_command() + self.b + noise

    def observation_for_controller(self, obs: Observation) -> Observation:
        obs_copy = _copy_obs(obs)
        if len(self._obs_hist) == 0:
            for _ in range(self.obs_delay_steps + 1):
                self._obs_hist.append(_copy_obs(obs_copy))
        else:
            self._obs_hist.append(obs_copy)
        delayed = _copy_obs(self._obs_hist[0])
        delayed.q = delayed.q + self.rng.normal(0.0, self.cfg.sigma_q, size=self.nu)
        delayed.dq = delayed.dq + self.rng.normal(0.0, self.cfg.sigma_dq, size=self.nu)
        tau_hat = self._sample_tau_hat()
        self._tau_hat_filt = ((1.0 - self._tau_lpf_alpha) * self._tau_hat_filt
                              + self._tau_lpf_alpha * tau_hat)
        delayed.tau_meas = tau_hat.copy()
        delayed.tau_meas_filt = self._tau_hat_filt.copy()
        delayed.tau_meas_act = tau_hat.copy()
        delayed.tau_meas_act_filt = self._tau_hat_filt.copy()
        return delayed

    def command_for_plant(self, tau_cmd_nominal: np.ndarray) -> np.ndarray:
        tau_cmd_nominal = np.asarray(tau_cmd_nominal, dtype=float).reshape(self.nu)
        self._cmd_hist.append(tau_cmd_nominal.copy())
        return self._sample_tau_hat()
