"""Validate the fused-kernel data path numerically on the TPU: a kernel
using the EXACT input/output DMA pattern of backward_pallas (ANY-space
HBM input, per-knot async copy into VMEM scratch, per-knot async copy
out, grid over batch tiles) that just round-trips the data.  The host
compares byte-for-byte — earlier probes validated only that such kernels
execute, not that the reads return the right values.

Usage: python -m tools.probe_dma_roundtrip
"""
from __future__ import annotations

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpc_jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, C, B, Bt = 4, 64, 256, 128
    dtype = jnp.float32

    def kernel(knots_hbm, out_hbm, acc_ref, scr, ostage, sems):
        ib = pl.program_id(0)
        b0 = pl.multiple_of(ib * Bt, Bt)
        acc = jnp.zeros((8, Bt), dtype)

        def step(it, acc):
            t = N - 1 - it
            cin = pltpu.make_async_copy(
                knots_hbm.at[t, :, pl.ds(b0, Bt)], scr, sems.at[0])
            cin.start()
            cin.wait()
            ostage[:, :] = scr[:, :] * 2.0        # mark the round trip
            cout = pltpu.make_async_copy(
                ostage, out_hbm.at[t, :, pl.ds(b0, Bt)], sems.at[1])
            cout.start()
            cout.wait()
            return acc + scr[0:8, :]

        acc = jax.lax.fori_loop(0, N, step, acc)
        acc_ref[:, :] = acc

    rng = np.random.default_rng(0)
    knots = jnp.asarray(rng.normal(size=(N, C, B)), dtype)
    f = pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec((8, Bt), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((N, C, B), dtype),
                   jax.ShapeDtypeStruct((8, B), dtype)],
        scratch_shapes=[pltpu.VMEM((C, Bt), dtype),
                        pltpu.VMEM((C, Bt), dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    out, acc = jax.jit(f)(knots)
    out = np.asarray(out)
    want = 2.0 * np.asarray(knots)
    err = np.abs(out - want).max()
    acc_want = np.asarray(knots)[:, 0:8, :].sum(axis=0)
    acc_err = np.abs(np.asarray(acc) - acc_want).max()
    print(f"roundtrip maxerr: {err:.3e}   acc maxerr: {acc_err:.3e}")
    print("PASS" if (err == 0.0 and acc_err < 1e-5) else "FAIL")


if __name__ == "__main__":
    main()
