"""On-device closed-loop tick time at B=1, RTI mode (1 BoxFDDP
iteration/tick, warm start + reg carry) with all three fused kernels —
the 200 Hz / 5 ms deployment-shape measurement (BASELINE.md row 3)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from ffmpc_tpu.run.batch_runner import make_episode_fn, EpisodeConfig
from ffmpc_tpu.sim.device_plant import make_table_params
from ffmpc_tpu.solver.fddp import FDDPSettings
from __graft_entry__ import _common

dtype = jnp.float32
model, W, _, traj, ep0, q0 = _common(dtype, horizon=40, max_iters=10)
for iters, label in ((1, "rti-1"), (2, "rti-2")):
    st = FDDPSettings(max_iters=iters, use_box=True,
                      backward_mode="pallas", rollout_mode="pallas",
                      diff_mode="pallas")
    ep = EpisodeConfig(controller="force_feedback", horizon=40, n_ticks=40,
                       ff_alpha_ocp=ep0.ff_alpha_ocp,
                       ff_alpha_ctrl=ep0.ff_alpha_ctrl, deriv_mode="scalar")
    episode = jax.jit(jax.vmap(make_episode_fn(
        model, W, st, traj, make_table_params(0.0, dtype=dtype), ep, q0,
        dtype=dtype)))
    # distinct inputs per rep + block on every output: the tunnel
    # memoizes identical repeated calls (measured 0.00 ms otherwise)
    rng = np.random.default_rng(0)
    q0s = [jnp.asarray((np.asarray(q0) + 1e-3 * rng.normal(size=7))[None]
                       .astype(np.float32)) for _ in range(4)]
    t0 = time.perf_counter()
    telem = episode(q0s[0]); jax.block_until_ready(telem)
    comp = time.perf_counter() - t0
    outs = []
    t0 = time.perf_counter()
    for i in range(3):
        outs.append(episode(q0s[i + 1]))
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / 3 / ep.n_ticks * 1e3
    print(f"{label}: ondevice tick {ms:.2f} ms  (compile {comp:.0f}s, "
          f"err3d[-1]={float(np.asarray(telem['err_3d'])[0,-1]):.4f})",
          flush=True)
