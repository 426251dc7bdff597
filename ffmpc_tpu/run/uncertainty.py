"""Benchmark uncertainty-injection protocol (host side).

Implements the reference benchmark's actuation-uncertainty protocol
(src/run/uncertainty_profiles.py:12-161, *protocol* semantics only):

* one episode-constant actuation gain ``a ~ U[a_min,a_max]`` and bias
  ``b ~ U[b_min,b_max]``,
* the plant receives ``a * cmd(t - delta_cmd) + b + N(0, sigma_tau)``,
* the controller sees the observation from ``delta_obs`` 1 kHz cycles ago
  with Gaussian noise on q/dq, and its torque-measurement channels replaced
  by the corrupted-command model (fresh noise draw + injector-owned LPF).

The *seeded draw order* is part of the benchmark definition and is pinned by
``tests/test_harness.py`` (per tick: q-noise(7), dq-noise(7), tau-noise(7)
on the observation side, then tau-noise(7) on the command side; a then b at
episode start).  The mechanics here are original: fixed-capacity ring
buffers instead of deques, and corruption as a pure function via
``dataclasses.replace`` — the on-device scan-carried twin of this protocol
lives in run/batch_runner.py (DeviceUncertainty).
"""

from __future__ import annotations

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
    """Only the actuation_uncertainty scenario carries a profile."""
    if str(scenario).strip().lower() == "actuation_uncertainty":
        return UncertaintyProfileConfig(seed=int(seed))
    return None


class _Ring:
    """Fixed-capacity FIFO: push() appends, oldest() reads the head.

    Capacity ``delay + 1`` makes oldest() the item from ``delay`` pushes ago
    once full; until full, oldest() clamps to the earliest push.
    """

    def __init__(self, capacity: int):
        self.cap = max(int(capacity), 1)
        self._items: list = [None] * self.cap
        self._head = 0      # index of oldest
        self._size = 0

    def __len__(self) -> int:
        return self._size

    def push(self, item) -> None:
        if self._size < self.cap:
            self._items[(self._head + self._size) % self.cap] = item
            self._size += 1
        else:
            self._items[self._head] = item
            self._head = (self._head + 1) % self.cap

    def oldest(self):
        return self._items[self._head]


def _frozen(obs: Observation) -> Observation:
    """Snapshot an observation: copy every array field so later in-place
    mutation by the sim cannot retroactively edit the delay line."""
    fields = {}
    for name, val in vars(obs).items():
        if isinstance(val, np.ndarray):
            fields[name] = np.array(val, dtype=float)
    return replace(obs, **fields)


class ScenarioUncertaintyInjector:
    def __init__(self, dt: float, nu: int, config: UncertaintyProfileConfig,
                 tau_lpf_alpha: float = 0.2):
        self.dt = float(max(dt, 1e-9))
        self.nu = int(nu)
        self.cfg = config
        self.rng = np.random.default_rng(int(config.seed))
        # episode-constant actuation corruption (draws #1 and #2)
        self.a = float(self.rng.uniform(config.a_min, config.a_max))
        self.b = float(self.rng.uniform(config.b_min, config.b_max))
        # delays are specified at the 1 kHz physics rate / in seconds;
        # quantize to control steps
        self.obs_delay_cycles_1khz = max(int(config.delta_obs_cycles), 0)
        self.obs_delay_steps = int(max(
            round(self.obs_delay_cycles_1khz * 1.0e-3 / self.dt), 0))
        self.cmd_delay_steps = int(max(
            round(config.delta_cmd_s / self.dt), 0))
        self._obs_ring = _Ring(self.obs_delay_steps + 1)
        self._cmd_ring = _Ring(self.cmd_delay_steps + 1)
        # the command line starts saturated with zeros (protocol: the first
        # delta_cmd of plant input sees gain*0 + b + noise)
        for _ in range(self.cmd_delay_steps + 1):
            self._cmd_ring.push(np.zeros(self.nu))
        self._tau_hat_filt = np.zeros(self.nu)
        self._alpha = float(np.clip(tau_lpf_alpha, 0.0, 1.0))

    def meta(self) -> dict:
        c = self.cfg
        return {
            "a": self.a, "b": self.b,
            "sigma_q": c.sigma_q, "sigma_dq": c.sigma_dq,
            "sigma_tau": c.sigma_tau,
            "delta_obs_cycles_1khz": self.obs_delay_cycles_1khz,
            "delta_obs_steps": self.obs_delay_steps,
            "delta_cmd_steps": self.cmd_delay_steps,
            "delta_cmd_s": c.delta_cmd_s,
            "seed": int(c.seed),
        }

    def _corrupted_torque(self) -> np.ndarray:
        """a * (delayed command) + b + N(0, sigma_tau) — one rng draw."""
        delayed = np.asarray(self._cmd_ring.oldest()).reshape(self.nu)
        return (self.a * delayed + self.b
                + self.rng.normal(0.0, self.cfg.sigma_tau, size=self.nu))

    def observation_for_controller(self, obs: Observation) -> Observation:
        snap = _frozen(obs)
        if len(self._obs_ring) == 0:
            # saturate so the first ticks replay obs0 rather than nothing
            while len(self._obs_ring) < self._obs_ring.cap:
                self._obs_ring.push(snap)
        else:
            self._obs_ring.push(snap)
        stale = self._obs_ring.oldest()

        q_noisy = stale.q + self.rng.normal(0.0, self.cfg.sigma_q, self.nu)
        dq_noisy = stale.dq + self.rng.normal(0.0, self.cfg.sigma_dq, self.nu)
        tau_hat = self._corrupted_torque()
        self._tau_hat_filt = (self._alpha * tau_hat
                              + (1.0 - self._alpha) * self._tau_hat_filt)
        return replace(
            stale, q=q_noisy, dq=dq_noisy,
            tau_meas=tau_hat.copy(), tau_meas_act=tau_hat.copy(),
            tau_meas_filt=self._tau_hat_filt.copy(),
            tau_meas_act_filt=self._tau_hat_filt.copy(),
        )

    def command_for_plant(self, tau_cmd_nominal: np.ndarray) -> np.ndarray:
        self._cmd_ring.push(
            np.array(tau_cmd_nominal, dtype=float).reshape(self.nu))
        return self._corrupted_torque()
