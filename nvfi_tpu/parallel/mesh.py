"""Device-mesh utilities: data-parallel sharding over TPU chips.

The reference is single-process single-GPU with no distributed layer at all
(SURVEY.md §2.2); the TPU-native design adds first-class data parallelism:

* 1-D ``('data',)`` mesh over all chips;
* ray batches sharded on 'data' (each chip renders its slice);
* grids/MLPs replicated; jit/SPMD inserts the gradient all-reduce over ICI.

Rays are embarrassingly parallel, so this is the whole story for NVFi-scale
models — TP/PP buy nothing for tiny MLPs + plane grids (SURVEY.md §2.2), but
a 2-D ``('data', 'model')`` mesh is provided for channel-sharding very large
appearance grids.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_axis: int = 1) -> Mesh:
    """Build a ('data',) or ('data','model') mesh over the first n devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if model_axis > 1:
        assert n % model_axis == 0
        arr = np.asarray(devices).reshape(n // model_axis, model_axis)
        return Mesh(arr, ("data", "model"))
    return Mesh(np.asarray(devices), ("data",))


def replicate(mesh: Mesh, tree):
    """Place a pytree fully-replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_rays(mesh: Mesh, tree):
    """Shard leading (ray) axis of every leaf across the 'data' axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.device_put(tree, sharding)
