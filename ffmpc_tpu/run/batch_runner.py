"""Fully on-device closed-loop MPC: solve + policy + plant inside one scan.

This is the TPU-native execution mode the reference cannot express: the
whole receding-horizon loop — problem construction, warm-started BoxFDDP
solve, Riccati/interpolation policy, safety clamp, 1 kHz plant substeps —
is one compiled program per control tick, scanned over an episode and
vmapped/shard_mapped over ensembles (scenarios x perturbed initial states x
configs).  No host round-trips inside the loop; the 5 ms replan budget is
met by construction of a single device dispatch per episode.

Controllers: "classical" (x=(q,v), u=tau) and "force_feedback"
(y=(q,v,tau_hat), u=w with LPF torque dynamics and the Eq. 14-18
interpolated policy).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.panda import PandaModel
from ..core.dynamics import gravity_torque
from ..ocp.action import make_classical_knot, make_augmented_knot
from ..ocp.problem import build_problem_refs
from ..ocp.weights import OCPWeights
from ..solver.fddp import solve as fddp_solve, FDDPSettings
from ..sim.device_plant import (TableParams, PlantState, plant_step,
                                init_plant_state)
from ..mpc.controllers import make_vertical_down_R


@dataclass(frozen=True)
class EpisodeConfig:
    controller: str = "classical"        # "classical" | "force_feedback"
    horizon: int = 36
    dt_mpc: float = 0.005
    plant_timestep: float = 0.001
    n_substeps: int = 5
    n_ticks: int = 400
    ff_alpha_ocp: float = 0.0            # exp(-2 pi fc dt_ocp); FF only
    ff_alpha_ctrl: float = 0.0           # exp(-2 pi fc dt_mpc); FF only
    ff_inverse_actuation: bool = True
    feedback_gain_scale: float = 0.55
    posture_ref_q_nom: bool = True
    # knot derivative backend: "auto" resolves to "scalar" (lane-efficient
    # scalar-channel sweeps) on TPU and "analytic" (vector layout) on CPU —
    # XLA:CPU's compile time explodes on the scalar-swept graph (>40 min vs
    # ~1 min through the TPU toolchain).  Override explicitly when the
    # compute devices differ from the default platform (e.g. a CPU mesh
    # under a TPU-default process).
    deriv_mode: str = "auto"


def resolve_deriv_mode(mode: str) -> str:
    """Resolve EpisodeConfig.deriv_mode "auto" against the platform the
    solve will actually run on (the configured default device if set,
    else the default backend)."""
    from ..solver.fddp import resolve_platform_mode
    return resolve_platform_mode(mode, scalar="scalar", vector="analytic")


@dataclass(frozen=True)
class DeviceUncertainty:
    """On-device benchmark uncertainty protocol (scan-carried equivalent of
    ScenarioUncertaintyInjector, reference uncertainty_profiles.py:84-161).

    At the 200 Hz control loop the reference's 2 ms obs / 1 ms cmd delays
    round to zero control steps (uncertainty_profiles.py:101-105), so the
    device path applies the actuation gain/bias and Gaussian sensor noise;
    delays are reintroduced automatically when dt_mpc < 2 ms.
    """
    a: float = 1.0          # actuation gain
    b: float = 0.0          # actuation bias [Nm]
    sigma_q: float = 0.0
    sigma_dq: float = 0.0
    sigma_tau: float = 0.0
    seed: int = 0


def make_episode_fn(model: PandaModel, W: OCPWeights, settings: FDDPSettings,
                    traj, table: TableParams, ep: EpisodeConfig,
                    q_nom, torque_scale=None,
                    uncertainty: DeviceUncertainty | None = None,
                    dtype=jnp.float32):
    """Build a jittable episode function.

    episode(q0) -> dict of per-tick telemetry arrays.  vmap over q0 for
    ensembles; the contact/free knot family switches per tick via lax.cond
    on the trajectory's surface flag (both branches compiled once).
    """
    N = ep.horizon
    nu = 7
    is_ff = ep.controller == "force_feedback"
    nx = 21 if is_ff else 14
    make_knot = make_augmented_knot if is_ff else make_classical_knot
    deriv = resolve_deriv_mode(ep.deriv_mode)
    knot_free = make_knot(model, W, surface=False, deriv_mode=deriv)
    knot_contact = make_knot(model, W, surface=True, deriv_mode=deriv)
    R_des = jnp.asarray(make_vertical_down_R(), dtype)
    q_nom = jnp.asarray(q_nom, dtype)
    x_reg_nom = jnp.concatenate([q_nom, jnp.zeros(7, dtype)])
    tau_limit = jnp.asarray(model.tau_limit, dtype)
    tscale = (jnp.ones(7, dtype) if torque_scale is None
              else jnp.asarray(torque_scale, dtype))
    eps_pol = float(np.clip(ep.dt_mpc / W.dt_ocp, 0.0, 1.0))
    alpha = ep.ff_alpha_ocp

    def solve_mode(knot, t, x0, xs_w, us_w, tau_ref, reg0):
        refs_run, ref_T = build_problem_refs(
            traj, t, N, W.dt_ocp, x_reg_nom if ep.posture_ref_q_nom else x0[:14],
            tau_ref, R_des, y_ref=(x0 if is_ff else None), dtype=dtype)
        return fddp_solve(knot, refs_run, ref_T, x0, xs_w, us_w, settings,
                          reg0=reg0)

    unc = uncertainty

    def tick(carry, t, table=table):
        plant, xs_w, us_w, tau_prev, reg = carry
        q, v = plant.q, plant.v
        if unc is not None:
            key = jax.random.fold_in(jax.random.PRNGKey(unc.seed),
                                     (t / ep.dt_mpc).astype(jnp.int32))
            kq, kv, kt = jax.random.split(key, 3)
            q = q + unc.sigma_q * jax.random.normal(kq, q.shape, dtype)
            v = v + unc.sigma_dq * jax.random.normal(kv, v.shape, dtype)
        if is_ff:
            tau_hat = plant.tau_meas_act_filt
            if unc is not None:
                tau_hat = (unc.a * tau_hat + unc.b
                           + unc.sigma_tau * jax.random.normal(kt, tau_hat.shape, dtype))
            x0 = jnp.concatenate([q, v, tau_hat])
        else:
            x0 = jnp.concatenate([q, v])

        # warm start: shift previous solution one knot, pin x0
        xs_init = jnp.concatenate([x0[None], xs_w[2:], xs_w[-1:]], axis=0)
        us_init = jnp.concatenate([us_w[1:], us_w[-1:]], axis=0)

        tau_ref = gravity_torque(model, q)
        _, _, surf = traj(t)
        res = jax.lax.cond(
            surf,
            lambda: solve_mode(knot_contact, t, x0, xs_init, us_init, tau_ref, reg),
            lambda: solve_mode(knot_free, t, x0, xs_init, us_init, tau_ref, reg),
        )
        # regularization carry across ticks (same fix as the host
        # controllers: avoids re-climbing the reg ladder on the stiff
        # contact problem every solve)
        reg_next = jnp.clip(res.xreg, settings.reg_min, 1e4)

        if is_ff:
            tau0 = res.xs[0, 14:21]
            tau1 = res.xs[1, 14:21]
            tau_tilde = tau0 + eps_pol * (tau1 - tau0)     # Eq. 14
            # at-solve-point feedback terms vanish (x0 == xs[0]); keep the
            # tau interpolation + inverse actuation map
            tau_des = tau_tilde
            if ep.ff_inverse_actuation:
                beta_c = max(1e-6, 1.0 - ep.ff_alpha_ctrl)
                tau_raw = (tau_des - ep.ff_alpha_ctrl * tau_hat) / beta_c
            else:
                tau_raw = tau_des
        else:
            tau_raw = res.us[0]

        # divergence guard + hard clamp (reference compute_control tail)
        unstable = (~jnp.isfinite(res.cost)) | (res.cost > 1e8) | \
            (jnp.max(jnp.abs(tau_raw)) > 3e2)
        tau_fallback = plant_bias(q, v)
        tau_cmd = jnp.where(unstable, tau_fallback, tau_raw)
        tau_cmd = jnp.clip(tau_cmd, -tau_limit, tau_limit)

        tau_applied = tau_cmd * tscale
        if unc is not None:
            # actuation gain/bias + noise on the plant-side command
            kcmd = jax.random.fold_in(key, 7919)
            tau_applied = (unc.a * tau_cmd + unc.b
                           + unc.sigma_tau * jax.random.normal(kcmd, tau_cmd.shape, dtype))
        plant_new, obs = plant_step(
            model, table, plant, tau_applied,
            timestep=ep.plant_timestep, n_substeps=ep.n_substeps)

        p_ref, _, _ = traj(t + ep.dt_mpc)
        err = obs.ee_pos - p_ref
        telem = {
            "t": t + ep.dt_mpc,
            "err_tan": jnp.linalg.norm(err[:2]),
            "err_3d": jnp.linalg.norm(err),
            "fn_meas": obs.f_contact_normal,
            "cost": res.cost,
            "iters": res.iters,
            "tau_cmd": tau_cmd,
            "ee_pos": obs.ee_pos,
            "q": obs.q,
        }
        return (plant_new, res.xs, res.us, tau_cmd, reg_next), telem

    def plant_bias(q, v):
        return gravity_torque(model, q) - 5.0 * v

    def episode_init(q0):
        q0 = jnp.asarray(q0, dtype)
        plant0 = init_plant_state(q0, dtype=dtype)
        tau_g = gravity_torque(model, q0)
        if is_ff:
            x0 = jnp.concatenate([q0, jnp.zeros(7, dtype), tau_g])
        else:
            x0 = jnp.concatenate([q0, jnp.zeros(7, dtype)])
        xs0 = jnp.tile(x0, (N + 1, 1))
        us0 = jnp.tile(tau_g, (N, 1))
        reg0 = jnp.asarray(settings.reg_init, dtype)
        return (plant0, xs0, us0, tau_g, reg0)

    def episode_chunk(carry, t0, n_ticks, table_v=None):
        """Advance n_ticks (static) from time t0; for chunked long
        episodes that must fit the device execution window, with host
        checkpointing between chunks (utils/checkpoint.py).

        ``table_v`` (optional) overrides the closed-over TableParams as a
        TRACED argument: sweeps over table geometry (tilted scenarios,
        force-law sensitivity) then share ONE compiled executable instead
        of re-embedding the constants per configuration."""
        tbl = table if table_v is None else table_v
        ts = t0 + jnp.arange(n_ticks, dtype=dtype) * ep.dt_mpc
        return jax.lax.scan(lambda c, t: tick(c, t, table=tbl), carry, ts)

    def episode(q0, table_v=None):
        _, telem = episode_chunk(episode_init(q0),
                                 jnp.asarray(0.0, dtype), ep.n_ticks,
                                 table_v=table_v)
        return telem

    episode.init = episode_init
    episode.chunk = episode_chunk
    return episode


def make_batched_solve_fn(model: PandaModel, W: OCPWeights,
                          settings: FDDPSettings, traj, ep: EpisodeConfig,
                          q_nom, surface: bool = True, dtype=jnp.float32,
                          calc_mode: str = "scalar",
                          solve_impl: str = "vmap"):
    """Pure batched-solve benchmark kernel: B independent warm-started
    BoxFDDP solves of the full-horizon problem (the BASELINE.json
    solves/s metric).  ``calc_mode="vector"`` selects the latency-oriented
    knot layout (better at small B; scalar channels win at batch widths).

    ``solve_impl="packed"`` runs the packed-carry batched solve
    (solver/packed.py): same algorithm as vmap(fddp.solve) with the
    all-Pallas configuration, but every per-knot array stays in the
    kernels' channel-major layout across the iteration loop — no
    pack/unpack transposes between kernels."""
    N = ep.horizon
    is_ff = ep.controller == "force_feedback"
    make_knot = make_augmented_knot if is_ff else make_classical_knot
    knot = make_knot(model, W, surface=surface,
                     deriv_mode=resolve_deriv_mode(ep.deriv_mode),
                     calc_mode=calc_mode)
    R_des = jnp.asarray(make_vertical_down_R(), dtype)
    q_nom = jnp.asarray(q_nom, dtype)
    x_reg_nom = jnp.concatenate([q_nom, jnp.zeros(7, dtype)])

    def build_refs(t, tau_ref, x0):
        return build_problem_refs(
            traj, t, N, W.dt_ocp, x_reg_nom, tau_ref, R_des,
            y_ref=(x0 if is_ff else None), dtype=dtype)

    if solve_impl == "packed":
        from ..solver.packed import solve_packed

        def batched(ts, x0s, xs_w, us_w):
            tau_refs = jax.vmap(lambda x: gravity_torque(model, x[:7]))(x0s)
            refs_run, ref_T = jax.vmap(build_refs)(ts, tau_refs, x0s)
            return solve_packed(knot, refs_run, ref_T, x0s, xs_w, us_w,
                                settings)

        return batched

    def one(t, x0, xs_w, us_w):
        tau_ref = gravity_torque(model, x0[:7])
        refs_run, ref_T = build_refs(t, tau_ref, x0)
        return fddp_solve(knot, refs_run, ref_T, x0, xs_w, us_w, settings)

    return jax.vmap(one)
