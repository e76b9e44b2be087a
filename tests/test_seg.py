"""Segmentation losses + metrics tests (Kabsch, KNN, AP/mIoU)."""

import numpy as np
import jax
import jax.numpy as jnp

from nvfi_tpu.utils.seg_loss import (
    dynamic_loss,
    entropy_loss,
    fit_motion_svd_batch,
    smooth_loss,
)
from nvfi_tpu.ops.knn import knn
from nvfi_tpu.eval import segm_metrics as sm


def random_rotation(rng):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def test_kabsch_recovers_rigid_motion():
    rng = np.random.RandomState(0)
    R_true = random_rotation(rng)
    t_true = rng.randn(3)
    pc1 = rng.randn(1, 64, 3).astype(np.float32)
    pc2 = (pc1 @ R_true.T + t_true).astype(np.float32)
    R, t = fit_motion_svd_batch(jnp.asarray(pc1), jnp.asarray(pc2))
    np.testing.assert_allclose(np.asarray(R)[0], R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t)[0], t_true, atol=1e-4)


def test_kabsch_weighted_ignores_masked_outliers():
    rng = np.random.RandomState(1)
    R_true = random_rotation(rng)
    pc1 = rng.randn(1, 64, 3).astype(np.float32)
    pc2 = (pc1 @ R_true.T).astype(np.float32)
    pc2[0, :10] += 5.0  # corrupt first 10 points
    mask = np.ones((1, 64), np.float32)
    mask[0, :10] = 0.0
    R, t = fit_motion_svd_batch(jnp.asarray(pc1), jnp.asarray(pc2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(R)[0], R_true, atol=1e-4)


def test_dynamic_loss_zero_for_correct_segmentation():
    """Two clusters moving with different rigid motions, mask = GT one-hot
    => per-cluster rigid fit is exact => loss ~ 0."""
    rng = np.random.RandomState(2)
    pc_a = rng.rand(32, 3) * 0.3
    pc_b = rng.rand(32, 3) * 0.3 + np.array([2.0, 0, 0])
    pc = np.concatenate([pc_a, pc_b])[None].astype(np.float32)
    flow = np.concatenate(
        [np.tile([0.5, 0.0, 0.0], (32, 1)), np.tile([0.0, -0.4, 0.2], (32, 1))]
    )[None].astype(np.float32)
    mask = np.zeros((1, 64, 2), np.float32)
    mask[0, :32, 0] = 1
    mask[0, 32:, 1] = 1
    loss, _ = dynamic_loss(jnp.asarray(pc), jnp.asarray(mask), jnp.asarray(flow))
    assert float(loss) < 1e-5

    # a wrong (uniform) mask cannot explain two motions -> larger loss
    mask_bad = np.full((1, 64, 2), 0.5, np.float32)
    loss_bad, _ = dynamic_loss(jnp.asarray(pc), jnp.asarray(mask_bad), jnp.asarray(flow))
    assert float(loss_bad) > float(loss) + 0.05


def test_knn_matches_scipy():
    from scipy.spatial import cKDTree

    rng = np.random.RandomState(3)
    pts = rng.rand(500, 3).astype(np.float32)
    d, i = knn(jnp.asarray(pts), 4, chunk=128)
    tree = cKDTree(pts)
    d_ref, i_ref = tree.query(pts, k=4)
    np.testing.assert_allclose(np.sqrt(np.maximum(np.asarray(d), 0)), d_ref, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], i_ref[:, 0])


def test_smooth_and_entropy_losses_behave():
    rng = np.random.RandomState(4)
    pc = rng.rand(1, 128, 3).astype(np.float32) * 0.05  # tight cluster
    uniform = np.full((1, 128, 4), 0.25, np.float32)
    onehot = np.zeros((1, 128, 4), np.float32)
    onehot[0, :, 0] = 1
    # identical labels everywhere -> zero smoothness penalty
    assert float(smooth_loss(jnp.asarray(pc), jnp.asarray(onehot))) < 1e-6
    # random labels in a tight cluster -> positive
    rand_mask = np.eye(4, dtype=np.float32)[rng.randint(4, size=(1, 128))]
    assert float(smooth_loss(jnp.asarray(pc), jnp.asarray(rand_mask))) > 0.1
    # entropy: uniform max, one-hot ~ 0
    assert float(entropy_loss(jnp.asarray(onehot))) < 1e-3
    assert float(entropy_loss(jnp.asarray(uniform))) > 1.0


def test_segm_metrics_perfect_prediction():
    rng = np.random.RandomState(5)
    gt = rng.randint(3, size=400)
    mask = np.eye(5, dtype=np.float32)[gt] * 0.9 + 0.02
    iou, matched, conf, n_inst = sm.eval_segm(gt, mask)
    assert n_inst == 3
    np.testing.assert_allclose(iou, 1.0)
    assert sm.calculate_AP(matched, conf, n_inst) == 1.0
    pq, f1, pre, rec = sm.calculate_PQ_F1(iou, matched, n_inst)
    assert pq == 1.0 and f1 == 1.0
    assert sm.clustering_miou(mask, sm.compress_label(gt)) > 0.999


def test_segm_metrics_permuted_labels_align():
    rng = np.random.RandomState(6)
    gt = rng.randint(3, size=400)
    perm = np.array([2, 0, 1])
    pred = perm[gt]
    aligned = sm.align_insts(gt, pred)
    np.testing.assert_array_equal(aligned, gt)
    assert sm.rand_index(np.eye(3, dtype=np.float32)[pred], gt) == 1.0
