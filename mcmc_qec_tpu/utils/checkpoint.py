"""Exact checkpoint/resume of sampler state.

The reference's only resilience is re-pickling the output DataFrame every
50 datapoints (generate_data.py:251-256) — chain state, RNG and accumulators
are lost on preemption.  Here any pytree of jax/numpy arrays (ladder
states, PRNG keys, eq counts, energy traces) round-trips through a single
``.npz`` with atomic replace, so a preempted run resumes exactly.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def save_pytree(path: str, tree: Any, meta: Dict[str, Any] | None = None) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["treedef"] = np.frombuffer(str(treedef).encode(), dtype=np.uint8)
    payload["meta"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **payload)
    os.replace(tmp + ".npz", path)


def load_pytree(path: str, like: Any) -> Tuple[Any, Dict[str, Any]]:
    """Restore a pytree saved by ``save_pytree``; ``like`` provides the
    structure (its leaf values are ignored)."""
    with np.load(path) as z:
        leaves_like, treedef = jax.tree_util.tree_flatten(like)
        n = len(leaves_like)
        leaves = [z[f"leaf_{i}"] for i in range(n)]
        meta = json.loads(bytes(z["meta"]).decode()) if "meta" in z else {}
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


class CheckpointManager:
    """Rolling checkpointer with a keep-last-k policy."""

    def __init__(self, directory: str, keep: int = 2):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step:012d}.npz")

    def save(self, step: int, tree: Any, meta: Dict[str, Any] | None = None) -> str:
        p = self.path(step)
        save_pytree(p, tree, {**(meta or {}), "step": step})
        self._gc()
        return p

    def latest(self) -> str | None:
        ckpts = sorted(
            f for f in os.listdir(self.directory) if f.startswith("ckpt_")
        )
        return os.path.join(self.directory, ckpts[-1]) if ckpts else None

    def restore_latest(self, like: Any):
        p = self.latest()
        if p is None:
            return None, None
        return load_pytree(p, like)

    def _gc(self) -> None:
        ckpts = sorted(
            f for f in os.listdir(self.directory) if f.startswith("ckpt_")
        )
        for f in ckpts[: -self.keep]:
            os.remove(os.path.join(self.directory, f))
