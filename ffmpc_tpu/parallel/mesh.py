"""Device mesh + sharding helpers for batched MPC solves.

The reference is strictly single-process/single-thread (SURVEY.md section
2.3); scale-out is a new TPU-native capability: thousands of independent
FDDP solves (scenarios x perturbed x0 x configs) shard over the batch axis
of a 1-D "dp" mesh riding ICI within a slice and DCN across hosts.  Model
constants and per-problem static config are replicated; only the
batch-leading arrays shard.

For multi-host runs call ``maybe_initialize_distributed()`` before device
queries (jax.distributed.initialize), then build the mesh over all devices.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> None:
    """Initialize jax.distributed from standard env vars when present.

    No-op in single-process runs.  Set JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES and JAX_PROCESS_ID (or rely on the TPU pod runtime's
    auto-detection) to enable multi-host meshes.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )


def make_dp_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("dp",))


def shard_batch(mesh: Mesh):
    """Sharding for arrays whose leading axis is the solve batch."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batched_fn(fn, mesh: Mesh, n_batched_args: int):
    """jit ``fn`` with its first ``n_batched_args`` arguments sharded over
    the dp axis and outputs sharded the same way.

    The solves are independent, so XLA inserts no collectives — the mesh
    purely partitions work; cross-host reductions (metrics) happen on the
    sharded outputs afterwards and lower to psum over ICI/DCN.
    """
    bs = shard_batch(mesh)
    in_shardings = tuple(bs for _ in range(n_batched_args))
    return jax.jit(fn, in_shardings=in_shardings, out_shardings=bs)
