"""Per-stage microbenchmark of one solver iteration at batch B.

Times, as separate jitted programs on the accelerator:
  - knot-calc over all (B, N) knots
  - knot-diff over all (B, N) knots
  - backward Riccati sweep (boxqp path)
  - alpha-batched forward rollout (scan over N, vmap over alphas)

Usage: python tools/microbench_stages.py [B] [deriv_mode]
(deriv_mode: scalar | analytic; default scalar — the shipped TPU config)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main(B=256, deriv="scalar"):
    from ffmpc_tpu.core import gravity_torque
    from ffmpc_tpu.ocp.problem import build_problem_refs
    from ffmpc_tpu.ocp.action import make_augmented_knot
    from ffmpc_tpu.mpc.controllers import make_vertical_down_R
    from __graft_entry__ import _common

    dtype = jnp.float32
    model, W, _, traj, ep0, q0 = _common(dtype, horizon=40, max_iters=10)
    N = 40
    knot = make_augmented_knot(model, W, surface=True, deriv_mode=deriv)

    tau_g = np.asarray(gravity_torque(model, jnp.asarray(q0, dtype)))
    y0 = np.concatenate([q0, np.zeros(7), tau_g]).astype(np.float32)
    rng = np.random.default_rng(0)
    ys = jnp.asarray(y0[None, None] + 0.01 * rng.normal(size=(B, N, 21)),
                     dtype)
    ws = jnp.asarray(np.tile(tau_g[None, None], (B, N, 1)), dtype)

    x_reg = jnp.asarray(np.concatenate([q0, np.zeros(7)]), dtype)
    refs_run, _ = build_problem_refs(
        traj, 1.2, N, W.dt_ocp, x_reg, jnp.asarray(tau_g, dtype),
        make_vertical_down_R(), dtype=dtype)
    refs_bn = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), refs_run)

    calc2 = jax.jit(jax.vmap(jax.vmap(knot.calc)))
    diff2 = jax.jit(jax.vmap(jax.vmap(knot.diff)))

    t_calc = timeit(calc2, refs_bn, ys, ws)
    t_diff = timeit(diff2, refs_bn, ys, ws)
    # fused Pallas diff kernel (solver/diff_pallas.py), engaged under vmap
    t_diff_k = float("nan")
    if knot.diff_all is not None:
        diffk = jax.jit(jax.vmap(knot.diff_all))
        try:
            t_diff_k = timeit(diffk, refs_bn, ys, ws)
            dk = diffk(refs_bn, ys, ws)
            dx = diff2(refs_bn, ys, ws)
            rel = max(float(jnp.max(jnp.abs(a - b)) /
                            jnp.maximum(jnp.max(jnp.abs(a)), 1.0))
                      for a, b in zip(dk, dx))
            print(f"diff kernel vs XLA agreement: rel {rel:.2e}")
        except Exception as e:  # noqa: BLE001 — report, keep the others
            print(f"diff kernel FAILED: {type(e).__name__}: {e}")

    # rollout-shaped: sequential scan over N at line-search width B*n_alphas
    n_alphas = 10
    Bw = B * n_alphas
    y0w = jnp.broadcast_to(ys[:1, 0], (Bw, 21))
    refs_w = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (Bw,) + a.shape), refs_run)
    ws_w = jnp.broadcast_to(ws[:1], (Bw, N, 7))

    def rollout(y0_, refs_, ws_):
        def step(y, inp):
            r, w = inp
            ynext, cost = knot.calc(r, y, w)
            return ynext, cost
        yN, costs = jax.lax.scan(step, y0_, (refs_, ws_))
        return yN, jnp.sum(costs)

    roll = jax.jit(jax.vmap(rollout))
    t_roll = timeit(roll, y0w, refs_w, ws_w)

    # backward-shaped: sequential boxqp Riccati sweep at width B
    from ffmpc_tpu.solver.boxqp import boxqp, _masked_solve
    d = diff2(refs_bn, ys, ws)

    def backward(dT):
        def step(carry, inp):
            Vx, Vxx = carry
            (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, u_t) = inp
            Qxx = Lxx + Fx.T @ Vxx @ Fx
            Qxu = Lxu + Fx.T @ Vxx @ Fu
            Quu = Luu + Fu.T @ Vxx @ Fu
            Qx = Lx + Fx.T @ Vx
            Qu = Lu + Fu.T @ Vx
            lb = -jnp.asarray(knot.u_lb, Qu.dtype) * 0 - 87.0 - u_t
            ub = 87.0 - u_t
            sol = boxqp(Quu, Qu, lb, ub, jnp.zeros(7, Qu.dtype), iters=8)
            kff = -sol.x
            K = _masked_solve(Quu, Qxu.T * sol.free.astype(Qu.dtype)[:, None],
                              sol.free, 1e-12)
            Vx_n = Qx + K.T @ (Quu @ kff - 2.0 * Qu)
            Vxx_n = Qxx - Qxu @ K
            return (Vx_n, 0.5 * (Vxx_n + Vxx_n.T)), (K, kff)

        (VxT, VxxT) = (dT.Lx[-1], dT.Lxx[-1])
        (_, _), out = jax.lax.scan(
            step, (VxT, VxxT),
            (dT.Fx, dT.Fu, dT.Lx, dT.Lu, dT.Lxx, dT.Lxu, dT.Luu,
             jnp.zeros((N, 7), dT.Lx.dtype)), reverse=True)
        return out

    bwd = jax.jit(jax.vmap(backward))
    t_bwd = timeit(bwd, d)

    print(f"B={B} N={N}")
    print(f"knot-calc (B*N):          {t_calc:8.2f} ms")
    print(f"knot-diff (B*N):          {t_diff:8.2f} ms")
    print(f"knot-diff pallas (B*N):   {t_diff_k:8.2f} ms")
    print(f"rollout scan (B*{n_alphas} wide): {t_roll:8.2f} ms")
    print(f"backward boxqp sweep (B): {t_bwd:8.2f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256,
         sys.argv[2] if len(sys.argv) > 2 else "scalar")
