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
