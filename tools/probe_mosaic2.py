"""Stage-2 Mosaic probe: isolate which part of the fused backward kernel
breaks the remote compiler — the structural pattern (HBM refs + fori_loop
+ per-knot DMA + grid) or the compute body (chol/boxqp/matmul unrolls).

Usage: python -m tools.probe_mosaic2 [stage]
  stage 1: DMA streaming pattern only
  stage 2: + channel matmuls (Q assembly)
  stage 3: + chol/boxqp
"""
from __future__ import annotations

import functools
import sys

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpc_jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ffmpc_tpu.solver.backward_pallas import (_mm, _mmT, _mv, _mvT,
                                                  _chol, _chol_solve_mat,
                                                  _boxqp_channels,
                                                  _diag_mask)

    stages = [int(s) for s in sys.argv[1:]] or [1, 2, 3]
    nx, nu, N, Bt = 21, 7, 4, 128
    C = 1288  # aligned
    dtype = jnp.float32

    def kernel6(knots_hbm, term_ref, out_ref, big_hbm, k_hbm, kff_hbm,
                scr, ostage, kstage, kffstage, sems):
        """Stage 5 + the full kernel's exact I/O signature: a VMEM-block
        second input, three ANY outputs written per knot, 4 semaphores."""
        from ffmpc_tpu.solver.backward_pallas import _mm, _mmT, _mv, _mvT
        ostage[:, :] = jnp.zeros_like(ostage)
        kstage[:, :] = jnp.zeros_like(kstage)
        kffstage[:, :] = jnp.zeros_like(kffstage)
        base = term_ref[0:nx, :]

        def step(it, acc):
            t = N - 1 - it
            cin = pltpu.make_async_copy(
                knots_hbm.at[t, :, pl.ds(0, Bt)], scr, sems.at[0])
            cin.start()
            cin.wait()
            Fu = scr[nx * nx:nx * nx + nx * nu, :].reshape(nx, nu, Bt) * 0.1
            v = _mvT(Fu, scr[0:nx, :] + base)
            ostage[0:nx * nx, :] = scr[0:nx * nx, :]
            kstage[0:nu * nx, :] = scr[0:nu * nx, :]
            kffstage[0:nu, :] = v
            c1 = pltpu.make_async_copy(
                ostage, big_hbm.at[t, :, pl.ds(0, Bt)], sems.at[1])
            c2 = pltpu.make_async_copy(
                kstage, k_hbm.at[t, :, pl.ds(0, Bt)], sems.at[2])
            c3 = pltpu.make_async_copy(
                kffstage, kff_hbm.at[t, :, pl.ds(0, Bt)], sems.at[3])
            c1.start()
            c2.start()
            c3.start()
            c1.wait()
            c2.wait()
            c3.wait()
            return acc + v[0:1, :] * 0.0 + scr[0:8, :]

        acc = jax.lax.fori_loop(0, N, step, jnp.zeros((8, Bt), dtype))
        out_ref[:, :] = acc

    def kernel5(knots_hbm, out_ref, big_hbm, scr, ostage, sems):
        """The real backward step's heavy structure: (nx,nx,Bt) fori
        carry, the 21^3 matmul chain, masked 21-rhs gain solve, in-loop
        output DMA — no boxqp."""
        from ffmpc_tpu.solver.backward_pallas import (_masked_spd,
                                                      _chol_solve_vec)
        ostage[:, :] = jnp.zeros_like(ostage)
        Vxx0 = scr[0:nx * nx, :].reshape(nx, nx, Bt) * 0.0 + \
            _diag_mask(nx, dtype)
        Vx0 = scr[0:nx, :] * 0.0

        def step(it, carry):
            Vx, Vxx = carry
            t = N - 1 - it
            cin = pltpu.make_async_copy(
                knots_hbm.at[t, :, pl.ds(0, Bt)], scr, sems.at[0])
            cin.start()
            cin.wait()
            Fx = scr[0:nx * nx, :].reshape(nx, nx, Bt) * 0.05 + \
                _diag_mask(nx, dtype) * 0.9
            Fu = scr[nx * nx:nx * nx + nx * nu, :].reshape(nx, nu, Bt) * 0.1
            Lxx = _diag_mask(nx, dtype) * 0.7
            W = _mm(Vxx, Fx)
            U = _mm(Vxx, Fu)
            Qxx = Lxx + _mmT(Fx, W)
            Qxu = _mmT(Fx, U)
            Quu = _mmT(Fu, U) + _diag_mask(nu, dtype)
            Qx = _mvT(Fx, Vx)
            Qu = _mvT(Fu, Vx) + scr[8:8 + nu, :]
            free = (Qu < 1e9).astype(dtype)
            QxuT = jnp.concatenate(
                [jax.lax.slice_in_dim(Qxu, u, u + 1, axis=1).reshape(
                    1, nx, Bt) for u in range(nu)])
            Qm = _masked_spd(Quu, free, 1e-9)
            K = _chol_solve_mat(_chol(Qm), QxuT * free[:, None, :])
            kff = -_chol_solve_vec(_chol(Qm), Qu * free)
            Quuk = _mv(Quu, kff)
            Vx_new = Qx + _mvT(K, Quuk - 2.0 * Qu)
            Vxx_new = Qxx - _mm(Qxu, K)
            Vxx_newT = jnp.concatenate(
                [jax.lax.slice_in_dim(Vxx_new, i, i + 1, axis=1).reshape(
                    1, nx, Bt) for i in range(nx)])
            Vxx_new = 0.5 * (Vxx_new + Vxx_newT) + _diag_mask(nx, dtype) * 1e-6
            ostage[0:nx * nx, :] = Vxx_new.reshape(nx * nx, Bt)
            co = pltpu.make_async_copy(
                ostage, big_hbm.at[t, :, pl.ds(0, Bt)], sems.at[1])
            co.start()
            co.wait()
            return (Vx_new, Vxx_new)

        Vx, Vxx = jax.lax.fori_loop(0, N, step, (Vx0, Vxx0))
        out_ref[:, :] = Vxx.reshape(nx * nx, Bt)[0:8, :]

    def kernel(knots_hbm, out_ref, big_hbm, scr, ostage, sems, *, stage):
        acc = jnp.zeros((8, Bt), dtype)
        ostage[:, :] = jnp.zeros_like(ostage)

        def step(it, acc):
            t = N - 1 - it
            cin = pltpu.make_async_copy(
                knots_hbm.at[t, :, pl.ds(0, Bt)], scr, sems.at[0])
            cin.start()
            cin.wait()
            if stage >= 4:
                # in-loop HBM output DMA (the full kernel's write pattern)
                ostage[0:nx * nx, :] = scr[0:nx * nx, :]
                co = pltpu.make_async_copy(
                    ostage, big_hbm.at[t, :, pl.ds(0, Bt)], sems.at[1])
                co.start()
                co.wait()
            Fx = scr[0:nx * nx, :].reshape(nx, nx, Bt)
            Fu = scr[nx * nx:nx * nx + nx * nu, :].reshape(nx, nu, Bt)
            Lu = scr[1000:1000 + nu, :]
            if stage in (1, 4):
                return acc + scr[0:8, :]
            Vxx = Fx  # stand-in SPD-ish
            U = _mm(Vxx, Fu)
            Quu = _mmT(Fu, U) + _diag_mask(nu, dtype) * 0.5
            Qu = Lu + _mvT(Fu, _mv(Vxx, scr[8:8 + nx, :]))
            def pad8rows(v):      # (nu, Bt) -> (8, Bt)
                return jnp.concatenate(
                    [v, jnp.zeros((8 - v.shape[0],) + v.shape[1:], dtype)])

            if stage == 2:
                return acc + pad8rows(Quu[0]) * 0.0 + pad8rows(Qu)
            x, free = _boxqp_channels(Quu, Qu, -Lu - 5.0, -Lu + 5.0, 4, 1e-9)
            K = _chol_solve_mat(_chol(Quu + _diag_mask(nu, dtype)),
                                _mm(Vxx, Fu)[0:nu])
            return acc + pad8rows(x) + pad8rows(K[0]) * 0.0

        acc = jax.lax.fori_loop(0, N, step, acc)
        out_ref[:, :] = acc

    rng = np.random.default_rng(0)
    knots = jnp.asarray(rng.normal(size=(N, C, Bt)), dtype)
    NXXP = 448
    for stage in stages:
        if stage == 6:
            try:
                f6 = pl.pallas_call(
                    kernel6,
                    grid=(1,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                              pl.BlockSpec((64, Bt), lambda i: (0, i),
                                           memory_space=pltpu.VMEM)],
                    out_specs=[pl.BlockSpec((8, Bt), lambda i: (0, i),
                                            memory_space=pltpu.VMEM),
                               pl.BlockSpec(memory_space=pl.ANY),
                               pl.BlockSpec(memory_space=pl.ANY),
                               pl.BlockSpec(memory_space=pl.ANY)],
                    out_shape=[jax.ShapeDtypeStruct((8, Bt), dtype),
                               jax.ShapeDtypeStruct((N, NXXP, Bt), dtype),
                               jax.ShapeDtypeStruct((N, 152, Bt), dtype),
                               jax.ShapeDtypeStruct((N, 8, Bt), dtype)],
                    scratch_shapes=[pltpu.VMEM((C, Bt), dtype),
                                    pltpu.VMEM((NXXP, Bt), dtype),
                                    pltpu.VMEM((152, Bt), dtype),
                                    pltpu.VMEM((8, Bt), dtype),
                                    pltpu.SemaphoreType.DMA((4,))],
                )
                term = jnp.asarray(rng.normal(size=(64, Bt)), dtype)
                out = jax.jit(f6)(knots, term)
                jax.block_until_ready(out)
                print(f"stage 6: OK sum={float(out[0].sum()):.3f}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                msg = str(e).split("\n")[0][:160]
                print(f"stage 6: FAIL {type(e).__name__}: {msg}", flush=True)
            continue
        try:
            f = pl.pallas_call(
                kernel5 if stage == 5 else functools.partial(kernel,
                                                             stage=stage),
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=[pl.BlockSpec((8, Bt), lambda i: (0, i),
                                        memory_space=pltpu.VMEM),
                           pl.BlockSpec(memory_space=pl.ANY)],
                out_shape=[jax.ShapeDtypeStruct((8, Bt), dtype),
                           jax.ShapeDtypeStruct((N, NXXP, Bt), dtype)],
                scratch_shapes=[pltpu.VMEM((C, Bt), dtype),
                                pltpu.VMEM((NXXP, Bt), dtype),
                                pltpu.SemaphoreType.DMA((2,))],
            )
            out, big = jax.jit(f)(knots)
            jax.block_until_ready(out)
            print(f"stage {stage}: OK sum={float(out.sum()):.3f} "
                  f"big0={float(big[0, 0, 0]):.3f}", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"stage {stage}: FAIL {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
