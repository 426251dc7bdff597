"""Array-pytree checkpointing for long sweeps.

The reference has no checkpoint/resume (runs are one-shot and buffered in
memory; SURVEY.md section 5).  For multi-hour batched sweeps on TPU we add
periodic checkpoints: any pytree of arrays (episode carries, warm starts,
accumulated metrics) round-trips through one .npz plus a json treedef.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np
import jax


def save_checkpoint(path: Path | str, tree: Any, meta: dict | None = None) -> None:
    """Save a pytree of arrays (+ JSON-able metadata) atomically."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    tmp = path.with_suffix(".tmp.npz")
    np.savez_compressed(tmp, **arrays)
    tmp.replace(path.with_suffix(".npz"))
    sidecar = {
        "treedef": str(treedef),
        "n_leaves": len(leaves),
        "meta": meta or {},
    }
    side_tmp = path.with_suffix(".json.tmp")
    side_tmp.write_text(json.dumps(sidecar, indent=2))
    side_tmp.replace(path.with_suffix(".json"))


def load_checkpoint(path: Path | str, like: Any) -> tuple[Any, dict]:
    """Load arrays into the structure of ``like`` (a template pytree).

    Returns (tree, meta).  Raises FileNotFoundError if absent.
    """
    path = Path(path)
    npz = path.with_suffix(".npz")
    side = path.with_suffix(".json")
    if not npz.exists():
        raise FileNotFoundError(npz)
    sidecar = json.loads(side.read_text()) if side.exists() else {"meta": {}}
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    with np.load(npz) as z:
        leaves = [z[f"leaf_{i}"] for i in range(len(leaves_like))]
    return jax.tree_util.tree_unflatten(treedef, leaves), sidecar.get("meta", {})


def checkpoint_exists(path: Path | str) -> bool:
    return Path(path).with_suffix(".npz").exists()
