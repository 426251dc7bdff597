"""Activation models: value / gradient / diagonal-Hessian on residuals.

Equivalents of Crocoddyl's ActivationModelQuad / WeightedQuad /
QuadraticBarrier (reference usage: crocoddyl_classical.py:478-519, 567-718).
Each activation is a static spec tuple; Gauss-Newton cost assembly uses
``grad`` and ``hess_diag`` exactly as Crocoddyl does (second derivatives of
the residuals are dropped).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax.numpy as jnp


class Activation(NamedTuple):
    kind: str                                  # "quad" | "wquad" | "barrier"
    weights: Optional[Tuple[float, ...]] = None  # wquad diagonal
    lb: Optional[Tuple[float, ...]] = None       # barrier bounds
    ub: Optional[Tuple[float, ...]] = None


def quad() -> Activation:
    return Activation("quad")


def wquad(weights) -> Activation:
    return Activation("wquad", weights=tuple(float(w) for w in np.asarray(weights).ravel()))


def barrier(lb, ub) -> Activation:
    return Activation(
        "barrier",
        lb=tuple(float(v) for v in np.asarray(lb).ravel()),
        ub=tuple(float(v) for v in np.asarray(ub).ravel()),
    )


def _over(act: Activation, r):
    lb = jnp.asarray(act.lb, r.dtype)
    ub = jnp.asarray(act.ub, r.dtype)
    return jnp.maximum(r - ub, 0.0) + jnp.minimum(r - lb, 0.0)


def value(act: Activation, r):
    if act.kind == "quad":
        return 0.5 * jnp.sum(r * r)
    if act.kind == "wquad":
        w = jnp.asarray(act.weights, r.dtype)
        return 0.5 * jnp.sum(w * r * r)
    o = _over(act, r)
    return 0.5 * jnp.sum(o * o)


def grad(act: Activation, r):
    if act.kind == "quad":
        return r
    if act.kind == "wquad":
        return jnp.asarray(act.weights, r.dtype) * r
    return _over(act, r)


def hess_diag(act: Activation, r):
    if act.kind == "quad":
        return jnp.ones_like(r)
    if act.kind == "wquad":
        return jnp.broadcast_to(jnp.asarray(act.weights, r.dtype), r.shape)
    return (jnp.abs(_over(act, r)) > 0.0).astype(r.dtype)
