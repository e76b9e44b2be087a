"""K-nearest-neighbor search (blockwise, TPU-friendly).

Replaces the reference's pytorch3d CUDA KNN (utils/seg_loss.py:4,96-99) with a
chunked brute-force top-k: pairwise distance blocks are built in VMEM-sized
tiles and reduced with ``lax.top_k``.  For segmentation-scale point sets
(<= ~64k) this is MXU-friendly (the distance matrix is a matmul) and needs no
spatial data structures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def knn(points: jnp.ndarray, k: int, chunk: int = 2048):
    """Exact KNN of each point to the full set (self included, like
    pytorch3d's ``knn_points(pc, pc)`` whose first neighbor is the point
    itself).

    Args:
      points: (N, 3).
      k: neighbor count.
    Returns:
      (dists (N, k), idx (N, k)) — squared distances, ascending.
    """
    n = points.shape[0]
    sq = jnp.sum(points**2, axis=-1)

    def chunk_knn(q):
        # q: (C, 3) -> (C, k) top-k smallest squared distances
        d = (
            jnp.sum(q**2, axis=-1)[:, None]
            - 2.0 * q @ points.T
            + sq[None, :]
        )
        neg_d, idx = jax.lax.top_k(-d, k)
        return -neg_d, idx

    if n <= chunk:
        return chunk_knn(points)

    pad = (-n) % chunk
    padded = jnp.concatenate([points, jnp.zeros((pad, 3), points.dtype)]) if pad else points
    blocks = padded.reshape(-1, chunk, 3)
    d, i = jax.lax.map(chunk_knn, blocks)
    d = d.reshape(-1, k)[:n]
    i = i.reshape(-1, k)[:n]
    return d, i
