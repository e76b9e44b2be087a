"""Headless point-cloud / flow / bbox viz (reference utils/point_visual_util.py
rebuilt without open3d: batched numpy geometry + PLY/PNG artifacts)."""

import numpy as np
import pytest

from nvfi_tpu.utils import point_viz as pv


def test_segm_pointcloud_colors_cycle_palette():
    pc = np.random.RandomState(0).randn(25, 3)
    g = pv.build_pointcloud_segm(pc, np.arange(25))
    assert g["points"].shape == (25, 3) and g["colors"].shape == (25, 3)
    # palette cycles mod 20 (reference indexes COLOR20[segm % 20])
    np.testing.assert_allclose(g["colors"][0], g["colors"][20])
    assert (g["colors"] >= 0).all() and (g["colors"] <= 1).all()


def test_bound_to_box_edges_are_axis_aligned():
    bounds = [np.array([[-1, 2], [0, 3], [5, 7]], np.float64)]
    (box,) = pv.bound_to_box(bounds)
    assert box.shape == (8, 3)
    (ls,) = pv.build_bbox3d([box])
    # every edge of an axis-aligned box varies along exactly one axis
    for a, b in ls["edges"]:
        assert (box[a] != box[b]).sum() == 1
    # edge lengths come in the three axis extents
    lens = sorted({round(float(np.abs(box[a] - box[b]).sum()), 6)
                   for a, b in ls["edges"]})
    assert lens == [2.0, 3.0, 3.0] or lens == [2.0, 3.0]


def test_align_matrix_rotates_z_to_vector():
    rng = np.random.RandomState(1)
    v = rng.randn(64, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v = np.concatenate([v, [[0, 0, 1.0]], [[0, 0, -1.0]]])  # degenerate cases
    R = pv.align_matrix(v)
    got = R @ np.array([0.0, 0.0, 1.0])
    np.testing.assert_allclose(got, v, atol=1e-8)
    # proper rotations: R R^T = I, det = +1
    np.testing.assert_allclose(R @ np.swapaxes(R, 1, 2),
                               np.broadcast_to(np.eye(3), R.shape), atol=1e-8)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-8)


def test_sphere_mesh_geometry():
    m = pv.pc_segm_to_sphere(np.array([[1.0, 2.0, 3.0], [-1.0, 0.0, 0.0]]),
                             segm=np.array([0, 1]), radius=0.25, resolution=6)
    v, f = m["vertices"], m["faces"]
    assert len(v) % 2 == 0 and (f < len(v)).all() and (f >= 0).all()
    half = len(v) // 2
    # every vertex sits on its sphere: |v - center| == radius
    r0 = np.linalg.norm(v[:half] - [1.0, 2.0, 3.0], axis=-1)
    r1 = np.linalg.norm(v[half:] - [-1.0, 0.0, 0.0], axis=-1)
    np.testing.assert_allclose(r0, 0.25, atol=1e-9)
    np.testing.assert_allclose(r1, 0.25, atol=1e-9)
    # two instances, two palette colors
    assert len(np.unique(m["colors"], axis=0)) == 2


def test_flow_arrows_span_point_to_tip():
    pc = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [2.0, 0.0, 0.0]])
    flow = np.array([[0.0, 0.0, 0.5], [0.3, 0.0, 0.0], [0.0, 0.0, 0.0]])
    m = pv.pc_flow_to_arrows(pc, flow, radius=0.01, resolution=8)
    v = m["vertices"]
    # arrow tips exist at point + flow (reference: arrow length = |flow|)
    for p, fl in zip(pc[:2], flow[:2]):
        tip = p + fl
        assert np.linalg.norm(v - tip, axis=-1).min() < 1e-8, tip
    # zero-flow point degenerates to a 2*radius ball around the point
    d2 = np.linalg.norm(v - pc[2], axis=-1)
    ball = d2[d2 < 0.1]
    assert len(ball) and np.allclose(ball, 0.02, atol=1e-9)


def test_ply_mesh_roundtrip(tmp_path):
    m = pv.pc_segm_to_sphere(np.random.RandomState(2).randn(3, 3),
                             segm=np.array([1, 2, 3]), resolution=4)
    p = str(tmp_path / "m.ply")
    pv.save_ply_mesh(p, m)
    back = pv.load_ply_mesh(p)
    np.testing.assert_allclose(back["vertices"], m["vertices"], atol=1e-5)
    np.testing.assert_array_equal(back["faces"], m["faces"])
    np.testing.assert_allclose(back["colors"], m["colors"], atol=1.0 / 255)


def test_bbox_lineset_ply_and_snapshot(tmp_path):
    boxes = pv.bound_to_box([np.array([[-1, 1], [-1, 1], [-1, 1.0]])])
    (ls,) = pv.build_bbox3d(boxes)
    p = str(tmp_path / "box.ply")
    pv.save_ply_mesh(p, {"vertices": ls["points"], "edges": ls["edges"],
                         "colors": np.full((8, 3), 0.5)})
    back = pv.load_ply_mesh(p)
    assert back["edges"].shape == (12, 2)

    png = str(tmp_path / "scene.png")
    pv.snapshot_png(
        png,
        pointclouds=[pv.build_pointcloud_segm(np.random.rand(20, 3),
                                              np.arange(20))],
        meshes=[pv.pc_flow_to_arrows(np.zeros((1, 3)),
                                     np.array([[0, 0, 1.0]]))],
        boxes=[ls],
        flows=(np.zeros((2, 3)), np.eye(3)[:2]),
        lim=2.0,
    )
    import os
    assert os.path.getsize(png) > 1000
