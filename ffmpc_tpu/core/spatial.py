"""Minimal batched 3-D spatial-algebra helpers (rotations, quaternions, log maps).

Everything here is shape-polymorphic pure ``jax.numpy``: inputs may carry
arbitrary leading batch dimensions; all ops broadcast over them.  The 7-DoF
Panda chain is tiny, so these ops live on the VPU; batching supplies the
parallelism.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_wxyz_to_rot(q):
    """Rotation matrix from a (w, x, y, z) quaternion. q: (..., 4) -> (..., 3, 3)."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
            2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
            2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rot_to_quat_wxyz(R):
    """(w,x,y,z) quaternion from rotation matrix; branch-free (Shepperd via stacking).

    R: (..., 3, 3) -> (..., 4).  Mirrors the semantics of the reference's
    matrix->quaternion conversion (franka_sim.py:324-354) but vectorized.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate branches; pick the numerically safest one per element.
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, 1e-12)) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], -1)

    s1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)

    s2 = jnp.sqrt(jnp.clip(1.0 + m11 - m00 - m22, 1e-12)) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)

    s3 = jnp.sqrt(jnp.clip(1.0 + m22 - m00 - m11, 1e-12)) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    use0 = (tr > 0.0)[..., None]
    use1 = ((m00 > m11) & (m00 > m22))[..., None]
    use2 = (m11 > m22)[..., None]
    q = jnp.where(use0, q0, jnp.where(use1, q1, jnp.where(use2, q2, q3)))
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)


def hat(v):
    """Skew-symmetric matrix of v: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    r = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return r.reshape(v.shape[:-1] + (3, 3))


def rot_z(theta):
    """Rotation about +z by theta: (...,) -> (..., 3, 3)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    r = jnp.stack([c, -s, zero, s, c, zero, zero, zero, one], axis=-1)
    return r.reshape(theta.shape + (3, 3))


def log3(R):
    """SO(3) log map: rotation matrix -> rotation vector (..., 3).

    Matches pinocchio's ``log3`` used by the reference's frame-rotation
    residual (crocoddyl_classical.py:585).  Numerically safe near the
    identity via a Taylor-expanded sinc factor.
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    c = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(c)
    # vee(R - R^T) / 2 = sin(theta) * axis
    w = 0.5 * jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0], R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )
    small = theta < 1e-5
    # theta/sin(theta), Taylor near 0: 1 + theta^2/6
    sin_t = jnp.sin(theta)
    factor = jnp.where(small, 1.0 + theta * theta / 6.0, theta / jnp.where(small, 1.0, sin_t))
    return w * factor[..., None]
