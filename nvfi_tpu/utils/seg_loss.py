"""Segmentation losses: rigid-fit dynamic loss, KNN smooth loss, entropy.

JAX port of reference utils/seg_loss.py:

* ``fit_motion_svd_batch`` (:6-57): mask-weighted Kabsch — batched SVD rigid
  (R, t) best-fit with reflection correction; ill-posed batches fall back to
  identity.
* ``dynamic_loss`` (:60-86): each mask slot's points must move rigidly — the
  flow implied by the fitted per-object transforms (gradient-stopped, as the
  reference ``.detach()``s the transformed cloud) must match the observed flow
  under the soft-mask mixture.
* ``smooth_loss`` (:89-101): KNN (k=4, radius 0.01) mask agreement, with
  out-of-radius neighbors replaced by self (reference's ``idx[dist>radius] =
  self``); pytorch3d's CUDA KNN is replaced by the blockwise top-k in
  ops/knn.py.
* ``entropy_loss`` (:104-112), ``rank_loss`` (:115-122).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.knn import knn


def fit_motion_svd_batch(pc1, pc2, mask=None):
    """Weighted Kabsch per batch.

    Args:
      pc1, pc2: (B, N, 3); mask: optional (B, N) weights.
    Returns:
      R (B, 3, 3), t (B, 3).
    """
    if mask is None:
        pc1_mean = jnp.mean(pc1, axis=1, keepdims=True)
        pc2_mean = jnp.mean(pc2, axis=1, keepdims=True)
        w = jnp.ones(pc1.shape[:2], pc1.dtype)
    else:
        wsum = jnp.sum(mask, axis=1, keepdims=True)
        safe = jnp.maximum(wsum, 1e-12)
        pc1_mean = (jnp.einsum("bnd,bn->bd", pc1, mask) / safe)[:, None]
        pc2_mean = (jnp.einsum("bnd,bn->bd", pc2, mask) / safe)[:, None]
        w = mask

    pc1_c = pc1 - pc1_mean
    pc2_c = pc2 - pc2_mean
    S = jnp.einsum("bnd,bn,bne->bde", pc1_c, w, pc2_c)

    # ill-posed (NaN) covariances fall back to identity (reference :34-39)
    bad = jnp.any(jnp.isnan(S), axis=(1, 2))
    S_safe = jnp.where(bad[:, None, None], jnp.eye(3, dtype=S.dtype), S)

    u, s, vh = jnp.linalg.svd(S_safe)
    v = jnp.swapaxes(vh, -1, -2)
    det = jnp.linalg.det(v @ jnp.swapaxes(u, -1, -2))
    diag = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )
    R = v @ (diag[..., None] * jnp.swapaxes(u, -1, -2))
    t = pc2_mean[:, 0] - jnp.einsum("bij,bj->bi", R, pc1_mean[:, 0])

    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    R = jnp.where(bad[:, None, None], eye, R)
    t = jnp.where(bad[:, None], 0.0, t)
    return R, t


def dynamic_loss(pc, mask, flow):
    """Rigid-cluster flow discrepancy (reference :60-86).

    pc (B, N, 3), mask (B, N, K) soft assignments, flow (B, N, 3).
    Returns (scalar loss, transformed cloud (B, N, 3)).
    """
    n_batch, n_point, n_object = mask.shape
    pc2 = pc + flow
    mask_flat = jnp.swapaxes(mask, 1, 2).reshape(n_batch * n_object, n_point)
    pc_rep = jnp.repeat(pc, n_object, axis=0)
    pc2_rep = jnp.repeat(pc2, n_object, axis=0)

    R, t = fit_motion_svd_batch(pc_rep, pc2_rep, mask_flat)
    pc_tr = jnp.einsum("bij,bnj->bni", R, pc_rep) + t[:, None]
    pc_tr = jax.lax.stop_gradient(pc_tr.reshape(n_batch, n_object, n_point, 3))

    mixed = jnp.sum(mask.transpose(0, 2, 1)[..., None] * pc_tr, axis=1)
    loss = jnp.linalg.norm(mixed - pc2, axis=-1)
    return jnp.mean(loss), mixed


def smooth_loss(pc, mask, k: int = 4, radius: float = 0.01, loss_norm: int = 1):
    """KNN mask-agreement smoothness (reference :89-101).

    pc (B, N, 3), mask (B, N, K).  Out-of-radius neighbors are replaced by the
    nearest neighbor (self), zeroing their contribution.
    """
    def per_batch(pc_b, mask_b):
        dist, idx = knn(pc_b, k)
        self_idx = idx[:, :1]
        # reference compares squared knn dists against the radius directly
        idx = jnp.where(dist > radius, self_idx, idx)
        idx = jax.lax.stop_gradient(idx)
        nn_mask = mask_b[idx]  # (N, k, K)
        diff = mask_b[:, None, :] - nn_mask
        if loss_norm == 1:
            return jnp.mean(jnp.sum(jnp.abs(diff), axis=-1))
        return jnp.mean(jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-12))

    losses = jax.vmap(per_batch)(pc, mask)
    return jnp.mean(losses)


def entropy_loss(mask, epsilon: float = 1e-5):
    """Per-point assignment entropy (reference :104-112)."""
    loss = -(mask * jnp.log(jnp.clip(mask, epsilon, None)))
    return jnp.mean(jnp.sum(loss, axis=-1))


def rank_loss(mask):
    """Nuclear norm over (N, K) mask matrices (reference :115-122)."""
    s = jnp.linalg.svd(mask, compute_uv=False)
    return jnp.mean(jnp.sum(s, axis=-1))
