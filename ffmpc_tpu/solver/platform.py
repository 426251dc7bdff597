"""Shared platform/target resolution for the Pallas kernel wrappers.

One definition of "which platform will this computation run on" for
fddp.resolve_platform_mode and the three kernel wrappers
(backward_pallas / rollout_pallas / diff_pallas), replacing three local
copies that could drift.
"""

from __future__ import annotations

from typing import Optional

import jax


def default_platform() -> str:
    """Platform of the configured default device (a Device *or* a platform
    string), falling back to the default backend."""
    dev = jax.config.jax_default_device
    if dev is None:
        return jax.default_backend()
    if isinstance(dev, str):
        return dev
    return dev.platform


def resolve_interpret(platform: Optional[str] = None) -> bool:
    """Pallas kernels run compiled only on a real TPU target; anything else
    (CPU tests, virtual meshes) uses interpret mode.  ``platform`` pins the
    target explicitly — pass ``devs[0].platform`` when the computation is
    sharded onto known devices; otherwise the default device is consulted.
    """
    if platform is None:
        platform = default_platform()
    return platform != "tpu"
