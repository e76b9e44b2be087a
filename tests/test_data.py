"""Dataset writer/loader round-trips (single-camera, multi-camera, segm)."""

import json
import os

import numpy as np

from nvfi_tpu.data import (
    load_blender_data,
    load_blender_data_dynamic,
    load_blender_data_segm,
    write_blender_dataset,
)


def test_blender_roundtrip(tmp_path):
    out = str(tmp_path / "scene")
    data_mem = write_blender_dataset(out, H=24, W=24, n_train=4, n_val=2, n_test=2)
    imgs, poses, times, counts, rposes, rtimes, (H, W, focal) = load_blender_data(
        out, half_res=False, testskip=1, white_background=True
    )
    assert counts["train"] == 4 and counts["test"] == 2
    assert imgs["train"].shape == (4, 24, 24, 3)
    # written RGBA composited over white must reproduce the in-memory images
    # (up to 8-bit quantization)
    np.testing.assert_allclose(imgs["train"], data_mem[0]["train"], atol=2 / 255)
    assert counts["init"] >= 1  # t==0 frames split out
    np.testing.assert_allclose(times["train"], data_mem[2]["train"], atol=1e-6)
    assert abs(focal - data_mem[6][2]) < 1e-3

    # segm flat layout loads too
    imgs2, poses2, segms, times2, *_ , hwf = load_blender_data_segm(
        out, half_res=False, testskip=1, white_background=True
    )
    assert segms.shape == (2, 24, 24)
    assert segms.max() >= 1  # objects present

    # half-res path
    imgs3, *_rest = load_blender_data(out, half_res=True, testskip=1, white_background=True)
    assert imgs3["train"].shape == (4, 12, 12, 3)


def test_multi_camera_loader(tmp_path):
    out = str(tmp_path / "rig")
    os.makedirs(out + "/train", exist_ok=True)
    from PIL import Image

    rng = np.random.RandomState(0)
    data = {"camera_angle_x": 0.69, "data": []}
    for cam in range(2):
        frames = []
        for i in range(3):
            rel = f"train/c{cam}_f{i}"
            img = (rng.rand(8, 8, 4) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(out, rel + ".png"))
            frames.append({"file_path": rel, "time": i / 2.0})
        data["data"].append(
            {"transform_matrix": np.eye(4).tolist(), "frames": frames}
        )
    for split in ("train", "val", "test"):
        with open(os.path.join(out, f"transforms_{split}.json"), "w") as f:
            json.dump(data, f)

    imgs, poses, times, counts, *_ , (H, W, focal) = load_blender_data_dynamic(
        out, half_res=False, testskip=1, white_background=True
    )
    assert counts["train"] == 6  # 2 cameras x 3 frames
    assert imgs["train"].shape == (6, 8, 8, 3)
    assert times["train"] == [0.0, 0.5, 1.0, 0.0, 0.5, 1.0]


def test_rest_frame_texture_rides_the_motion():
    """Textured movers (round-5 sur-family observability fix): the albedo
    pattern must be painted in the object's rest frame — i.e. move WITH the
    piece — not evaluated in world space.  Pin (a) rest_point inverts the
    forward rigid map exactly, (b) texture gives strong intra-object contrast
    (the observability property), and (c) exact translation invariance:
    translating a sliding sphere AND the camera by the same offset reproduces
    the image pixel-for-pixel, which is only true when the texture rides the
    body (directional light + translated normals are invariant; a world-space
    texture would slide under the object)."""
    import numpy as np

    from nvfi_tpu.data.synthetic import (
        SCENE_CAMERA, RigidSphere, _rot_axis, chessboard_tex_objects,
        render_frame,
    )
    from nvfi_tpu.data.blender import _spherical_pose

    objs = chessboard_tex_objects()
    orb = objs[0]
    assert orb.tex_freq > 0 and not orb.hollow
    p0 = orb.c0 + np.array([0.11, -0.07, 0.2], np.float32)
    for t in (0.25, 0.6):
        w = float(np.linalg.norm(orb.omega))
        fwd = _rot_axis(orb.omega / w, w * t) @ (p0 - orb.pivot) + orb.pivot
        back = orb.rest_point(fwd[None], t)[0]
        np.testing.assert_allclose(back, p0, atol=1e-5)

    cam = SCENE_CAMERA["chessboard_tex"]
    H = W = 72
    focal = 0.5 * W / np.tan(0.5 * cam["fov"])
    pose = _spherical_pose(45.0, -10.0, cam["radius"])
    rgb, segm = render_frame(objs, pose, H, W, focal, 0.375, white_background=False)
    lum = rgb[segm == 1].mean(-1)
    assert lum.size > 30, "orbiter should stay visible from the rig camera"
    assert lum.std() > 0.05  # observable texture contrast

    slider = RigidSphere(center=(0.0, 0.0, 0.0), radius=0.4,
                         color=(0.8, 0.7, 0.6), v_lin=(1.2, 0.4, 0.0),
                         tex_freq=5.0, tex_amp=0.45)
    t = 0.5
    pose0 = _spherical_pose(30.0, -25.0, 3.0)
    pose_t = pose0.copy()
    pose_t[:3, 3] += slider.v_lin * t
    img0, _ = render_frame([slider], pose0, H, W, focal, 0.0, white_background=False)
    img_t, _ = render_frame([slider], pose_t, H, W, focal, t, white_background=False)
    np.testing.assert_allclose(img_t, img0, atol=1e-4)
