"""Probe Mosaic primitive support on the real TPU: tiny kernels for each
transcendental the knot chain needs, plus a small-shape compile of the
fused backward kernel (isolates remote-compiler failures from size).

Usage: python -m tools.probe_mosaic
"""
from __future__ import annotations

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpc_jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.linspace(-0.9, 0.9, 256, dtype=jnp.float32).reshape(2, 128)

    ops = {
        "sin": lambda v: jnp.sin(v),
        "cos": lambda v: jnp.cos(v),
        "sqrt": lambda v: jnp.sqrt(jnp.abs(v)),
        "arccos": lambda v: jnp.arccos(v),
        "arctan2": lambda v: jnp.arctan2(v, 1.0 + v * v),
        "arctan": lambda v: jnp.arctan(v),
        "exp": lambda v: jnp.exp(v),
    }
    for name, f in ops.items():
        def kern(x_ref, o_ref, f=f):
            o_ref[:] = f(x_ref[:])
        try:
            out = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
            ref = f(x)
            err = float(jnp.max(jnp.abs(out - ref)))
            print(f"{name}: OK maxerr={err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:120]
            print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)

    # small-shape fused backward compile (N=4): separates kernel-size
    # compile failures from semantic ones
    from ffmpc_tpu.solver.backward_pallas import make_backward_box
    rng = np.random.default_rng(0)
    import os as _os
    NX = int(_os.environ.get("PROBE_NX", "21"))
    NU, N, B = 7, 4, 128
    def r(*s):
        return jnp.asarray(rng.normal(size=s), jnp.float32)
    Fx = jnp.eye(NX, dtype=jnp.float32)[None, None] * jnp.ones((B, N, 1, 1), jnp.float32) + 0.05 * r(B, N, NX, NX)
    Fu = 0.1 * r(B, N, NX, NU)
    Lx, Lu = r(B, N, NX), r(B, N, NU)
    A_ = 0.2 * r(B, N, NX, NX)
    Lxx = A_ @ jnp.swapaxes(A_, -1, -2) + 0.5 * jnp.eye(NX, dtype=jnp.float32)[None, None] * jnp.ones((B, N, 1, 1), jnp.float32)
    Lxu = 0.05 * r(B, N, NX, NU)
    Bm = 0.2 * r(B, N, NU, NU)
    Luu = Bm @ jnp.swapaxes(Bm, -1, -2) + 0.8 * jnp.eye(NU, dtype=jnp.float32)[None, None] * jnp.ones((B, N, 1, 1), jnp.float32)
    fs = 0.1 * r(B, N + 1, NX)
    LxT = r(B, NX)
    At = 0.2 * r(B, NX, NX)
    LxxT = At @ jnp.swapaxes(At, -1, -2) + 0.5 * jnp.eye(NX, dtype=jnp.float32)[None] * jnp.ones((B, 1, 1), jnp.float32)
    lb = -50.0 * jnp.abs(r(B, N, NU)) - 1e-3
    ub = 50.0 * jnp.abs(r(B, N, NU)) + 1e-3
    regs = jnp.full((B,), 1e-4, jnp.float32)
    backward = make_backward_box(NX, NU, 8)
    try:
        out = jax.jit(jax.vmap(backward))(Fx, Fu, Lx, Lu, Lxx, Lxu, Luu,
                                          fs, LxT, LxxT, lb, ub, regs, regs)
        jax.block_until_ready(out)
        print(f"backward kernel N=4 B=128: OK K00={float(out[0][0,0,0,0]):.4f}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"backward kernel N=4: FAIL {type(e).__name__}: {msg}",
              flush=True)


if __name__ == "__main__":
    main()
