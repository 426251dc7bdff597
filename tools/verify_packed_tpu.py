"""On-TPU A/B: packed-carry solve (solver/packed.py) vs vmapped fddp.solve.

Runs the flagship augmented contact family at f32 with every Pallas kernel
engaged on real hardware, on mildly-perturbed warm-started problems (the
non-chaotic regime: per RESULTS.md, cold bang-bang solves of this OCP are
chaotic and any rounding-scale difference lands within the chaos floor).

Checks: identical iteration counts per problem, torque/state trajectories
within f32 reassociation tolerance, then times both paths.

Usage: python tools/verify_packed_tpu.py [B] [iters]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(B=64, max_iters=10):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ffmpc_tpu.core import gravity_torque
    from ffmpc_tpu.run.batch_runner import make_batched_solve_fn, EpisodeConfig
    from ffmpc_tpu.solver.fddp import FDDPSettings
    from __graft_entry__ import _common

    dtype = jnp.float32
    model, W, _, traj, ep0, q0 = _common(dtype, horizon=40,
                                         max_iters=max_iters)
    settings = FDDPSettings(max_iters=max_iters, use_box=True,
                            backward_mode="pallas", rollout_mode="pallas",
                            diff_mode="pallas")
    ep = EpisodeConfig(controller="force_feedback", horizon=40,
                       ff_alpha_ocp=ep0.ff_alpha_ocp,
                       ff_alpha_ctrl=ep0.ff_alpha_ctrl)
    mk = lambda impl: jax.jit(make_batched_solve_fn(  # noqa: E731
        model, W, settings, traj, ep, q0, surface=True, dtype=dtype,
        solve_impl=impl))
    f_vmap = mk("vmap")
    f_packed = mk("packed")

    tau_g = np.asarray(gravity_torque(model, jnp.asarray(q0, dtype)))
    y0 = np.concatenate([q0, np.zeros(7), tau_g]).astype(np.float32)
    rng = np.random.default_rng(0)
    # warm-regime problems: small perturbations around the nominal state
    y0s = jnp.asarray(y0[None] + 0.002 * rng.normal(size=(B, 21)), dtype)
    ts = jnp.full((B,), 1.2, jnp.float32)
    xs = jnp.tile(y0s[:, None], (1, 41, 1))
    us = jnp.tile(jnp.asarray(tau_g, jnp.float32)[None, None], (B, 40, 1))

    a = f_vmap(ts, y0s, xs, us)
    b = f_packed(ts, y0s, xs, us)
    jax.block_until_ready((a, b))

    it_a = np.asarray(a.iters)
    it_b = np.asarray(b.iters)
    same_iters = int((it_a == it_b).sum())
    du = np.abs(np.asarray(a.us) - np.asarray(b.us)).max()
    dx = np.abs(np.asarray(a.xs) - np.asarray(b.xs)).max()
    dK = np.abs(np.asarray(a.K) - np.asarray(b.K)).max()
    dcost = np.abs(np.asarray(a.cost) - np.asarray(b.cost)).max() / max(
        float(np.abs(np.asarray(a.cost)).max()), 1.0)
    print(f"B={B} iters={max_iters}: same_iters {same_iters}/{B} "
          f"(vmap mean {it_a.mean():.2f}, packed {it_b.mean():.2f})")
    print(f"max|du|={du:.3e} Nm  max|dx|={dx:.3e}  max|dK|={dK:.3e}  "
          f"rel dcost={dcost:.3e}")

    def timeit(fn, reps=3):
        argsets = [(ts, jnp.asarray(
            y0[None] + 0.002 * np.random.default_rng(i).normal(size=(B, 21)),
            dtype), xs, us) for i in range(reps)]
        out = fn(*argsets[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(*s) for s in argsets]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / reps * 1e3

    t_v = timeit(f_vmap)
    t_p = timeit(f_packed)
    print(f"vmap:   {t_v:8.2f} ms/batch  ({B / t_v * 1e3:8.1f} solves/s)")
    print(f"packed: {t_p:8.2f} ms/batch  ({B / t_p * 1e3:8.1f} solves/s)")
    ok = (same_iters == B) and du < 5e-3 and np.isfinite(du)
    print("OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sys.exit(main(B, it))
