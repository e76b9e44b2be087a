"""Device-mesh utilities: data-parallel sharding over TPU chips.

The reference is single-process single-GPU with no distributed layer at all
(SURVEY.md §2.2); the TPU-native design adds first-class data parallelism:

* 1-D ``('data',)`` mesh over all chips;
* ray batches sharded on 'data' (each chip renders its slice);
* grids/MLPs replicated; jit/SPMD inserts the gradient all-reduce over ICI.

Rays are embarrassingly parallel, so this is the whole story for NVFi-scale
models — TP/PP buy nothing for tiny MLPs + plane grids (SURVEY.md §2.2) — but
a 2-D ``('data', 'model')`` mesh plus ``shard_scene_params`` channel-shards
the merged plane tables for very large appearance grids (tensor parallelism:
each 'model' shard gathers/scatters its own channel slice; the per-channel
cross-plane product needs no communication and the channel reductions lower
to one psum each).  Numerically equal to the replicated step —
tests/test_round4.py::test_model_axis_tp_matches_unsharded.
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


def shard_scene_params(mesh: Mesh, params: dict) -> dict:
    """Tensor-parallel placement of a K-plane scene: channel-shard the merged
    plane tables over the 'model' axis, replicate everything else.

    The factorized field math is per-channel until the final channel
    reduction (kplane._plane_product is elementwise over C; the density sum
    and the basis_mat contraction reduce over C), so sharding the last
    (channel) axis of every plane splits the hot gather bandwidth across the
    'model' axis with ONE psum-sized collective per reduction — the natural
    TP for very large appearance grids (SURVEY.md §2.2 phase-2 plan).  The
    gradient scatter-adds stay shard-local for the same reason.

    Channels that do not divide the axis fall back to replication (the merged
    table has density_n_comp + app_n_comp channels; the shipped configs' 72
    divide 2, 4 and 8).  On a ('data',)-only mesh this is plain replication.
    """
    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        return replicate(mesh, params)
    n_model = mesh.shape["model"]
    plane_sh = NamedSharding(mesh, P(None, None, "model"))
    repl = NamedSharding(mesh, P())
    out = {}
    for k, v in params.items():
        if k in ("planes_space", "planes_time"):
            out[k] = [
                jax.device_put(p, plane_sh if p.shape[-1] % n_model == 0 else repl)
                for p in v
            ]
        else:
            out[k] = jax.device_put(v, repl)
    return out
