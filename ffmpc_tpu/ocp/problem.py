"""Shooting-problem construction: per-knot reference arrays from a trajectory.

Equivalent of the reference's _build_problem (crocoddyl_classical.py:521-556;
crocoddyl_force_feedback.py:776-836): sample the task trajectory at
t0 + k*dt_ocp for k = 0..N, bundle regularization references, and emit the
(refs_run, ref_T) pytrees the solver consumes.  Fully traceable under jit —
problem "construction" is just array math, no per-knot Python objects.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .weights import ProblemRefs


def build_problem_refs(
    traj_fn: Callable,
    t0,
    N: int,
    dt_ocp: float,
    x_reg_ref,
    tau_ref,
    R_des,
    y_ref=None,
    dtype=jnp.float32,
) -> Tuple[ProblemRefs, ProblemRefs]:
    """Returns (refs_run with leading dim N, ref_T unbatched)."""
    t0 = jnp.asarray(t0, dtype)
    ts = t0 + jnp.arange(N + 1, dtype=dtype) * jnp.asarray(dt_ocp, dtype)
    p_ref, v_ref, _ = jax.vmap(traj_fn)(ts)

    if y_ref is None:
        y_ref = jnp.zeros(21, dtype)

    def bc(a, shape):
        return jnp.broadcast_to(jnp.asarray(a, dtype), (N + 1,) + shape)

    refs_all = ProblemRefs(
        p_ref=p_ref.astype(dtype),
        v_ref=v_ref.astype(dtype),
        x_reg_ref=bc(x_reg_ref, (14,)),
        tau_ref=bc(tau_ref, (7,)),
        R_des=bc(R_des, (3, 3)),
        y_ref=bc(y_ref, (21,)),
    )
    refs_run = jax.tree.map(lambda a: a[:N], refs_all)
    ref_T = jax.tree.map(lambda a: a[N], refs_all)
    return refs_run, ref_T
