import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
"""TPU full-solve output A/B: diff_mode pallas vs xla at B=256 f32 —
same distinct inputs, compare us/xs/cost (both executables cached)."""
import os, time
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from ffmpc_tpu.core import gravity_torque
from ffmpc_tpu.run.batch_runner import make_batched_solve_fn, EpisodeConfig
from ffmpc_tpu.solver.fddp import FDDPSettings
from __graft_entry__ import _common

dtype = jnp.float32
model, W, _, traj, ep0, q0 = _common(dtype, horizon=40, max_iters=10)
ep = EpisodeConfig(controller="force_feedback", horizon=40,
                   ff_alpha_ocp=ep0.ff_alpha_ocp,
                   ff_alpha_ctrl=ep0.ff_alpha_ctrl, deriv_mode="auto")
def mk(diff_mode):
    st = FDDPSettings(max_iters=10, use_box=True, backward_mode="pallas",
                      rollout_mode="pallas", diff_mode=diff_mode)
    return jax.jit(make_batched_solve_fn(model, W, st, traj, ep, q0,
                                         surface=True, dtype=dtype))
fa = mk("xla"); fb = mk("pallas")
tau_g = np.asarray(gravity_torque(model, jnp.asarray(q0, dtype)))
y0 = np.concatenate([q0, np.zeros(7), tau_g]).astype(np.float32)
rng = np.random.default_rng(42)
B = 256
y0s = y0[None] + 0.02 * rng.normal(size=(B, 21)).astype(np.float32)
ts = np.full((B,), 1.2, np.float32)
xs = np.tile(y0s[:, None, :], (1, 41, 1))
us = np.tile(tau_g.astype(np.float32)[None, None], (B, 40, 1))
args = tuple(jnp.asarray(a) for a in (ts, y0s, xs, us))
ra = fa(*args); jax.block_until_ready(ra)
rb = fb(*args); jax.block_until_ready(rb)
for name in ("us", "xs", "cost", "K", "iters"):
    a = np.asarray(getattr(ra, name), np.float64)
    b = np.asarray(getattr(rb, name), np.float64)
    scale = max(np.abs(a).max(), 1.0)
    print(f"{name}: rel {np.abs(a-b).max()/scale:.3e} (scale {scale:.1f})")
ca, cb = np.asarray(ra.cost), np.asarray(rb.cost)
print("cost rel per-problem p50/p99:",
      np.percentile(np.abs(ca-cb)/np.maximum(np.abs(ca),1.0), [50, 99]))

# ---- chaos control: same config, 1e-6 input perturbation ----------------
y0s_p = y0s + 1e-6 * rng.normal(size=y0s.shape).astype(np.float32)
xs_p = np.tile(y0s_p[:, None, :], (1, 41, 1))
args_p = (jnp.asarray(ts), jnp.asarray(y0s_p), jnp.asarray(xs_p),
          jnp.asarray(us))
ra_p = fa(*args_p); jax.block_until_ready(ra_p)
ca_p = np.asarray(ra_p.cost)
print("CHAOS CONTROL (xla vs xla, 1e-6 y0 perturbation):")
print("  cost rel per-problem p50/p99:",
      np.percentile(np.abs(ca - ca_p) / np.maximum(np.abs(ca), 1.0),
                    [50, 99]))
print("  us rel:", float(np.abs(np.asarray(ra.us) - np.asarray(ra_p.us)).max()) / 87.0)

# ---- warm-started regime (the MPC operating point) ----------------------
xs_w = np.asarray(ra.xs)
us_w = np.asarray(ra.us)
y0s_w = xs_w[:, 0] + np.concatenate(
    [1e-3 * rng.normal(size=(B, 7)), 1e-2 * rng.normal(size=(B, 7)),
     1e-2 * rng.normal(size=(B, 7))], axis=1).astype(np.float32)
args_w = (jnp.asarray(ts), jnp.asarray(y0s_w), jnp.asarray(xs_w),
          jnp.asarray(us_w))
wa = fa(*args_w); jax.block_until_ready(wa)
wb = fb(*args_w); jax.block_until_ready(wb)
cwa, cwb = np.asarray(wa.cost), np.asarray(wb.cost)
print("WARM-STARTED (xla diff vs pallas diff):")
print("  cost rel per-problem p50/p99:",
      np.percentile(np.abs(cwa - cwb) / np.maximum(np.abs(cwa), 1.0),
                    [50, 99]))
dus = np.abs(np.asarray(wa.us) - np.asarray(wb.us))
print("  dtau p50/p99/max:", np.percentile(dus.max(axis=(1, 2)), [50, 99]),
      dus.max())
