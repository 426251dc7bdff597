"""MXU A/B for the backward sweep (VERDICT r4 item 7).

The workload has never touched the MXU (BENCH mfu_vs_bf16_peak ~0.5%);
this tool was written to measure whether a batched-GEMM formulation of
the backward sweep's (B,nx,nx) contractions can beat the channel-major
VPU Pallas kernel.

MEASUREMENT CAVEAT (documented negative result for the method): isolated
sub-ms stage timing is NOT measurable through this dev container's
remote-TPU tunnel — the per-dispatch floor is ~6 ms and several
wall-clock patterns (small rep counts, scalar-returning scans) return
physically impossible sub-0.1 ms readings (async-completion artifacts).
The RELIABLE instrument is the in-context full-solve A/B, which already
exists: `FFMPC_BACKWARD_MODE=xla python bench.py` runs the backward pass
as jnp matmuls — exactly the batched-GEMM formulation, which XLA lowers
to MXU-eligible dot_generals — and measures 3x slower in context than
the channel-major kernel (r4 ladder: 787 vs 2371 solves/s at B=256 with
the other stages XLA; RESULTS.md).  The structural reason: the
recursion is sequential in N, so the largest contraction tile is
(21, 21)x(21, 28) per problem — <5% occupancy of a 128x128 systolic
pass — while the channel kernel keeps the 128-lane VPU fully occupied
with batch.  bf16 MXU inputs would additionally need an error analysis
against the box-QP active-set sensitivity.  Verdict: MXU not profitable
for this solver at Panda dimensions; the VPU formulation stands.

Usage: python tools/mxu_ab.py [B]   (kept for reference; wall numbers
through the tunnel are dispatch-bound, see caveat)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(B=256):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ffmpc_tpu.solver.boxqp import boxqp, _masked_solve
    from ffmpc_tpu.solver.backward_pallas import make_backward_box

    nx, nu, N = 21, 7, 40
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    def r(*s):
        return jnp.asarray(rng.normal(size=s), dtype)

    def problem():
        A_ = 0.1 * r(B, N, nx, nx)
        Fx = jnp.eye(nx, dtype=dtype)[None, None] + A_
        Fu = 0.1 * r(B, N, nx, nu)
        Lx, Lu = r(B, N, nx), r(B, N, nu)
        Bm = 0.3 * r(B, N, nx, nx)
        Lxx = (Bm @ jnp.swapaxes(Bm, -1, -2)
               + 2.0 * jnp.eye(nx, dtype=dtype)[None, None])
        Lxu = 0.1 * r(B, N, nx, nu)
        Cm = 0.3 * r(B, N, nu, nu)
        Luu = (Cm @ jnp.swapaxes(Cm, -1, -2)
               + 1.0 * jnp.eye(nu, dtype=dtype)[None, None])
        fs = 0.1 * r(B, N + 1, nx)
        LxT, At = r(B, nx), 0.3 * r(B, nx, nx)
        LxxT = At @ jnp.swapaxes(At, -1, -2) + jnp.eye(nx, dtype=dtype)[None]
        lb = -50.0 * jnp.ones((B, N, nu), dtype)
        ub = 50.0 * jnp.ones((B, N, nu), dtype)
        xreg = jnp.full((B,), 1e-6, dtype)
        return (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs, LxT, LxxT, lb, ub, xreg)

    # distinct inputs per timed rep: the remote-device path memoizes
    # repeated identical calls (same guard as bench.py)
    probs = [problem() for _ in range(4)]

    def sweep_gemm(mm_dtype):
        """Backward sweep with the Q assembly as fused batched GEMMs."""

        def one(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs, LxT, LxxT, lb, ub, xreg):
            eye_x = jnp.eye(nx, dtype=dtype)
            Vxx = LxxT + xreg * eye_x
            Vx = LxT + Vxx @ fs[N]

            def step(carry, inp):
                Vx, Vxx = carry
                fx, fu, lx, lu, lxx, lxu, luu, fs_t, lb_t, ub_t = inp
                G = jnp.concatenate([fx, fu], axis=1)        # (nx, nx+nu)
                Gm = G.astype(mm_dtype)
                W = (Vxx.astype(mm_dtype) @ Gm).astype(dtype)  # (nx, nx+nu)
                Q = (jnp.swapaxes(Gm, -1, -2)
                     @ W.astype(mm_dtype)).astype(dtype)     # (nx+nu,)^2
                Qxx = lxx + Q[:nx, :nx]
                Qxu = lxu + Q[:nx, nx:]
                Quu = luu + Q[nx:, nx:] + xreg * jnp.eye(nu, dtype=dtype)
                Qx = lx + fx.T @ Vx
                Qu = lu + fu.T @ Vx
                sol = boxqp(Quu, Qu, lb_t, ub_t, jnp.zeros(nu, dtype),
                            iters=8)
                kff = -sol.x
                K = _masked_solve(Quu, Qxu.T * sol.free.astype(dtype)[:, None],
                                  sol.free, 1e-12)
                Vx_n = Qx + K.T @ (Quu @ kff - 2.0 * Qu)
                Vxx_n = Qxx - Qxu @ K
                Vxx_n = 0.5 * (Vxx_n + Vxx_n.T) + xreg * eye_x
                w_t = Vxx_n @ fs_t
                return (Vx_n + w_t, Vxx_n), (K, kff)

            (_, _), out = jax.lax.scan(
                step, (Vx, Vxx),
                (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs[:N], lb, ub),
                reverse=True)
            return out

        return jax.jit(jax.vmap(one))

    REPS = 10

    def timeit(fn, argsets):
        """Wall time of REPS sweeps inside ONE jitted scan: the dev
        tunnel's ~6 ms per-dispatch floor swamps isolated sub-ms ops, so
        each variant runs as a single device program over stacked
        distinct inputs; reported number = wall / REPS (includes one
        dispatch amortized REPS-fold, identical across variants)."""
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *argsets)

        @jax.jit
        def run(stacked):
            def body(acc, inp):
                out = fn(*inp)
                return acc + jnp.sum(out[1][0]), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), dtype), stacked)
            return acc

        out = run(stacked)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(stacked)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / REPS * 1e3

    def mk_sets(xform):
        base = [problem() for _ in range(REPS)]
        return [xform(a) for a in base]

    t_f32 = timeit(sweep_gemm(jnp.float32), mk_sets(lambda a: a))
    t_bf16 = timeit(sweep_gemm(jnp.bfloat16), mk_sets(lambda a: a))

    bw = make_backward_box(nx, nu, 8)
    t_pallas = timeit(
        jax.vmap(bw),
        mk_sets(lambda a: a[:13] + (a[12],)))

    print(f"B={B} N={N} nx={nx}: backward sweep per call")
    print(f"  XLA batched-GEMM f32 assembly:  {t_f32:8.2f} ms")
    print(f"  XLA batched-GEMM bf16 assembly: {t_bf16:8.2f} ms")
    print(f"  channel-major Pallas kernel:    {t_pallas:8.2f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
