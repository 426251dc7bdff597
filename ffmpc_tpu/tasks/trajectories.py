"""Staged approach-then-circle end-effector trajectory, as a pure JAX function.

Equivalent of the reference generator (src/tasks/trajectories.py:8-93) plus
the benchmark runner's contact-stabilize hold wrapper
(run_classical.py:250-255), merged into one branchless function of t so it
can be vmapped across knots, ticks and batches and traced under jit.

traj(t) -> (p_ref(3,), v_ref(3,), surface_mode bool)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax.numpy as jnp


def _smoothstep(s):
    s = jnp.clip(s, 0.0, 1.0)
    return s * s * (3.0 - 2.0 * s)


def _dsmoothstep_ds(s):
    s = jnp.clip(s, 0.0, 1.0)
    return 6.0 * s * (1.0 - s)


@dataclass(frozen=True)
class ApproachCircleTraj:
    """Pre-approach -> descend -> circle at z_contact, with optional
    contact-stabilize hold at the circle start.

    All parameters are static floats; an instance is hashable and can be
    closed over inside jit.
    """

    center: Tuple[float, float, float]
    radius: float
    omega: float
    z_contact: float
    t_approach: float = 2.0
    ee_start: Tuple[float, float, float] | None = None
    z_pre: float | None = None
    t_pre: float = 0.0
    t_stabilize: float = 0.0   # hold at circle start after contact begins

    def _points(self):
        center = np.asarray(self.center, dtype=float)
        p_contact_start = center.copy()
        p_contact_start[0] += self.radius
        p_contact_start[2] = self.z_contact
        if self.ee_start is None:
            p_start = p_contact_start.copy()
            p_start[2] += 0.08
        else:
            p_start = np.asarray(self.ee_start, dtype=float)
        z_pre = self.z_pre
        if z_pre is None:
            z_pre = max(self.z_contact + 0.05, float(p_start[2]))
        p_pre = p_contact_start.copy()
        p_pre[2] = z_pre
        return center, p_start, p_pre, p_contact_start

    def __call__(self, t):
        t = jnp.asarray(t)
        dtype = jnp.result_type(t, jnp.float32)
        center, p_start, p_pre, p_cs = self._points()
        center = jnp.asarray(center, dtype)
        p_start = jnp.asarray(p_start, dtype)
        p_pre = jnp.asarray(p_pre, dtype)
        p_cs = jnp.asarray(p_cs, dtype)

        t_pre = max(float(self.t_pre), 0.0)
        t_app = max(float(self.t_approach), 1.0e-6)
        t_contact = t_pre + t_app

        def blend(p0, p1, tau, T):
            s_lin = tau / T
            s = _smoothstep(s_lin)
            dsdt = _dsmoothstep_ds(s_lin) / T
            return (1.0 - s) * p0 + s * p1, dsdt * (p1 - p0)

        # phase 1: pre-approach (only if t_pre > 0)
        if t_pre > 0.0:
            p1, v1 = blend(p_start, p_pre, t, t_pre)
            p0_app = p_pre
        else:
            p1, v1 = p_start, jnp.zeros(3, dtype)
            p0_app = p_start

        # phase 2: approach/descend
        p2, v2 = blend(p0_app, p_cs, t - t_pre, t_app)

        # phase 3: circle (with stabilize-hold at the circle start)
        tt = jnp.maximum(t - t_contact, 0.0)
        th = self.omega * tt
        p3 = jnp.stack([
            center[0] + self.radius * jnp.cos(th),
            center[1] + self.radius * jnp.sin(th),
            jnp.full_like(th, self.z_contact),
        ])
        v3 = jnp.stack([
            -self.radius * self.omega * jnp.sin(th),
            self.radius * self.omega * jnp.cos(th),
            jnp.zeros_like(th),
        ])
        if self.t_stabilize > 0.0:
            hold = t < (t_contact + self.t_stabilize)
            p3 = jnp.where(hold, p_cs, p3)
            v3 = jnp.where(hold, jnp.zeros(3, dtype), v3)

        in_pre = t < t_pre
        in_app = (~in_pre) & (t < t_contact)
        p = jnp.where(in_pre, p1, jnp.where(in_app, p2, p3))
        v = jnp.where(in_pre, v1, jnp.where(in_app, v2, v3))
        surface = t >= t_contact
        return p, v, surface

    def numpy(self, t: float):
        """Host convenience: plain numpy evaluation."""
        p, v, s = self(jnp.asarray(float(t)))
        return np.asarray(p), np.asarray(v), bool(s)
