"""Test configuration: run on host CPU with an 8-device virtual mesh and x64.

The container force-registers the remote "axon" TPU platform
(jax_platforms="axon,cpu"); compiling through the tunnel costs ~1 s per
executable, so tests pin the default device to the local CPU backend.
Sharding tests use the 8-device virtual CPU mesh; numerical oracle tests
(vs MuJoCo / finite differences) use float64.  The production path on TPU is
float32 — kernels are dtype-generic.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
# NOTE: no persistent compilation cache for tests.  In this jaxlib build,
# serializing/deserializing XLA:CPU AOT executables segfaults intermittently
# (observed in both the cache read and write paths); the TPU/bench cache at
# /tmp/ffmpc_jax_cache is unaffected and stays enabled in bench/entry.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
