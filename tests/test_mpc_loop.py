"""Unit tests for controller-loop machinery: surface latch, safety filter,
warm-start shift, solution-acceptance gate.  No solves — a stub sim provides
observations."""

import numpy as np
import jax.numpy as jnp
import pytest

from ffmpc_tpu.mpc.config import ClassicalMPCConfig
from ffmpc_tpu.mpc import controllers as C
from ffmpc_tpu.sim.observation import Observation


class _StubSim:
    dt = 0.005

    def get_observation(self, **kw):
        z = np.zeros(7)
        return Observation(
            q=np.array([0, -0.758, 0, -2.22, 0, 1.43, 0.0]), dq=z.copy(),
            tau_meas=z.copy(), tau_meas_filt=z.copy(), tau_meas_act=z.copy(),
            tau_meas_act_filt=z.copy(), tau_cmd=z.copy(), tau_act=z.copy(),
            tau_constraint=z.copy(), tau_total=z.copy(),
            tau_bias=np.arange(7.0),
            f_contact_world=np.zeros(3), f_contact_normal=0.0,
            f_contact_normal_world_z=0.0, f_contact_tangent=0.0,
            contact_count_ee=0, contact_count_table=0,
            table_normal_world=np.array([0.0, 0.0, 1.0]),
            ee_pos=np.array([0.4, 0.0, 0.5]), ee_vel=np.zeros(3))


def _traj(t):
    return np.zeros(3), np.zeros(3), t >= 1.0


class _Base(C._MPCBase):
    """Expose the base machinery without building jitted solvers."""
    def __init__(self, cfg):
        sim = _StubSim()
        self.sim = sim
        self.traj_fn = _traj
        self.cfg = cfg
        self.dtype = jnp.float64
        self._k = 0
        obs0 = sim.get_observation()
        self.q_nom = obs0.q.copy()
        self.xs = self.us = self.Ks = None
        self._last_solve_step = C._NEG_INF_STEP
        self._surface_latched = False
        self._contact_loss_count = 0
        self._prev_surface_mode = None
        self._last_good_cost = None
        self._bad_streak = 0
        self._tau_prev = np.zeros(7)


def _obs(fn=0.0, ee_z=0.5):
    o = _StubSim().get_observation()
    o.f_contact_normal = fn
    o.ee_pos = np.array([0.4, 0.0, ee_z])
    return o


def test_force_latch_hysteresis():
    cfg = ClassicalMPCConfig(phase_source="force_latch", fn_contact_on=2.0,
                             fn_contact_off=0.5, contact_release_steps=3,
                             z_contact=0.35, z_contact_band=0.01)
    m = _Base(cfg)
    assert not m._detect_surface(_obs(fn=1.0), 0.0, False)
    assert m._detect_surface(_obs(fn=2.5), 0.0, False)      # latch on force
    # stays latched above release threshold
    assert m._detect_surface(_obs(fn=1.0), 0.0, False)
    # needs contact_release_steps consecutive losses to unlatch
    assert m._detect_surface(_obs(fn=0.1), 0.0, False)
    assert m._detect_surface(_obs(fn=0.1), 0.0, False)
    assert not m._detect_surface(_obs(fn=0.1), 0.0, False)  # 3rd loss releases
    # proximity + hint latches too
    assert m._detect_surface(_obs(fn=0.0, ee_z=0.355), 0.0, True)


def test_safe_tau_clip_and_filter():
    cfg = ClassicalMPCConfig(apply_command_filter=False)
    m = _Base(cfg)
    out = m._safe_tau(np.array([100.0, -100, 5, 0, 50, -50, 0]))
    assert np.allclose(out, [87, -87, 5, 0, 12, -12, 0])
    # nan -> hold previous
    prev = out.copy()
    out2 = m._safe_tau(np.full(7, np.nan))
    assert np.allclose(out2, prev)
    # with filter: trust region bounds the step
    cfg2 = ClassicalMPCConfig(apply_command_filter=True, tau_trust_inf=10.0,
                              tau_smoothing_alpha=1.0)
    m2 = _Base(cfg2)
    m2._tau_prev = np.zeros(7)
    out3 = m2._safe_tau(np.full(7, 80.0))
    # step limited by min(trust=10, rate*dt=450*0.005=2.25)
    assert np.allclose(out3[:4], 2.25)


def test_shift_guess_consistent():
    cfg = ClassicalMPCConfig(horizon=4)
    m = _Base(cfg)
    x0 = np.zeros(14)
    xs, us = m._shift_guess(x0, 4, np.ones(7))
    assert xs.shape == (5, 14) and us.shape == (4, 7)
    assert np.allclose(us, 1.0)          # cold: hold u
    # warm: time-consistent shift
    m.xs = np.arange(5)[:, None] * np.ones((5, 14))
    m.us = np.arange(4)[:, None] * np.ones((4, 7))
    xs, us = m._shift_guess(x0, 4, np.ones(7))
    assert np.allclose(xs[0], x0)
    assert np.allclose(xs[1], 2.0) and np.allclose(xs[2], 3.0)
    assert np.allclose(xs[3], 4.0) and np.allclose(xs[4], 4.0)
    assert np.allclose(us[:3].ravel(), np.repeat([1, 2, 3], 7))
    assert np.allclose(us[3], 3.0)


class _Res:
    def __init__(self, cost, us0=0.0):
        self.cost = cost
        self.us = np.full((4, 7), us0)
        self.xs = np.zeros((5, 14))
        self.K = np.zeros((4, 7, 14))


def test_solution_acceptance_gate():
    cfg = ClassicalMPCConfig(solve_reject_factor=50.0, max_bad_solves=2)
    m = _Base(cfg)
    assert m._register_solution(_Res(100.0))          # first: anchor
    assert m._last_good_cost == 100.0
    assert m._register_solution(_Res(4000.0))         # < 50x anchor
    assert not m._register_solution(_Res(4000.0 * 51))  # rejected
    assert m._bad_streak == 1
    assert not m._register_solution(_Res(np.nan))     # rejected
    assert m._bad_streak == 2
    # third consecutive rejection triggers the hard reset
    assert not m._register_solution(_Res(1e12))
    assert m.xs is None and m._last_good_cost is None and m._bad_streak == 0


def test_mode_switch_keeps_warmstart_by_default():
    cfg = ClassicalMPCConfig()
    m = _Base(cfg)
    m.xs = np.zeros((5, 14)); m.us = np.zeros((4, 7)); m.Ks = np.zeros((4, 7, 14))
    m._handle_mode_switch(False)
    m._handle_mode_switch(True)   # switch
    assert m.xs is not None       # warm start carried
    cfg2 = ClassicalMPCConfig(reset_warmstart_on_mode_switch=True)
    m2 = _Base(cfg2)
    m2.xs = np.zeros((5, 14)); m2.us = np.zeros((4, 7))
    m2._handle_mode_switch(False)
    m2._handle_mode_switch(True)
    assert m2.xs is None          # reference behavior
