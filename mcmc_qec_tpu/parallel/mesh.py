"""Device-mesh sharding of the decoding workload.

The reference scales by SLURM job fan-out with file-based aggregation
(generate_data.py:274-308, concat_data.py); here the *syndrome batch* is the
parallel axis: arrays are sharded over a 1-D ``data`` mesh with
``jax.sharding.NamedSharding`` and every decoder's jitted computation then
runs SPMD — XLA inserts the (few) collectives, which ride ICI on a real
slice.  Ladders/classes/droplets stay local to a device, so the hot loop is
communication-free; only result gathers cross the mesh.

Multi-host: ``jax.distributed.initialize`` + the same code path — the data
axis spans all processes' devices and per-host batches are device_put to
their local shards.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def shard_batch(arr, mesh: Mesh, axis_name: str = "data"):
    """Place an array with its leading (batch) axis split over the mesh."""
    spec = P(axis_name, *([None] * (np.ndim(arr) - 1)))
    return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))


def replicate(arr, mesh: Mesh):
    return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, P()))


def pad_to_multiple(arr: np.ndarray, multiple: int):
    """Pad the batch axis to a multiple of the mesh size; returns
    (padded, original_length)."""
    B = arr.shape[0]
    rem = (-B) % multiple
    if rem == 0:
        return arr, B
    pad = np.repeat(arr[:1], rem, axis=0)
    return np.concatenate([arr, pad], axis=0), B
