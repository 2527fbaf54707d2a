"""IO round-trips: PFM, cam.txt, dmb, PLY, depth PNG."""

import io as _io

import numpy as np

from mvsnet_tpu.io import (
    load_pfm, write_pfm, load_cam_txt, write_cam_txt, read_dmb, write_dmb,
    write_ply, load_depth_png, write_depth_png,
)
from mvsnet_tpu.io.ply import read_ply
from mvsnet_tpu.io.cams import cam_from_camera_json, projection_matrix


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((7, 5)).astype(np.float32)
    p = tmp_path / "x.pfm"
    write_pfm(str(p), img)
    out = load_pfm(str(p))
    np.testing.assert_array_equal(out, img)


def test_pfm_color_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.standard_normal((4, 6, 3)).astype(np.float32)
    p = tmp_path / "c.pfm"
    write_pfm(str(p), img)
    np.testing.assert_array_equal(load_pfm(str(p)), img)


def test_cam_txt_roundtrip(tmp_path):
    cam = np.zeros((2, 4, 4))
    cam[0] = np.arange(16).reshape(4, 4)
    cam[1, :3, :3] = [[320, 0, 160], [0, 240, 120], [0, 0, 1]]
    cam[1, 3] = [425.0, 2.5, 192, 902.5]
    p = tmp_path / "cam.txt"
    write_cam_txt(str(p), cam)
    out = load_cam_txt(str(p))
    np.testing.assert_allclose(out, cam)


def test_cam_txt_29_words():
    """29-word format: depth_num filled from max_d, end derived
    (reference: preprocess.py:131-138)."""
    words = ["extrinsic"] + [str(float(i)) for i in range(16)] + ["intrinsic"] + \
        [str(float(i)) for i in range(9)] + ["425.0", "2.5"]
    cam = load_cam_txt(_io.StringIO(" ".join(words)), max_d=192)
    assert cam[1, 3, 0] == 425.0
    assert cam[1, 3, 1] == 2.5
    assert cam[1, 3, 2] == 192
    assert cam[1, 3, 3] == 425.0 + 2.5 * 192


def test_cam_interval_scale():
    words = ["x"] + [str(float(i)) for i in range(16)] + ["i"] + \
        [str(float(i)) for i in range(9)] + ["100.0", "2.0", "64", "228.0"]
    cam = load_cam_txt(_io.StringIO(" ".join(words)), interval_scale=1.06)
    assert cam[1, 3, 1] == 2.0 * 1.06


def test_camera_json():
    data = {
        "intrinsics": {"fx": 500.0, "fy": 510.0, "px": 320.0, "py": 240.0},
        "pose": {"matrix": {f"{i},{j}": float(np.eye(4)[i, j]) for i in range(4) for j in range(4)}},
    }
    cam = cam_from_camera_json(data, min_depth=0.5, max_depth=5.0, depth_num=10)
    assert cam[1, 0, 0] == 500.0
    assert cam[1, 3, 0] == 0.5
    np.testing.assert_allclose(cam[1, 3, 1], (5.0 - 0.5) / 9)
    assert cam[1, 3, 3] == 5.0


def test_camera_json_translation_mm():
    mat = np.eye(4)
    mat[:3, 3] = [1.5, -2.0, 0.25]  # meters
    data = {
        "intrinsics": {"fx": 1, "fy": 1, "px": 0, "py": 0},
        "pose": {"matrix": {f"{i},{j}": float(mat[i, j]) for i in range(4) for j in range(4)}},
    }
    cam = cam_from_camera_json(data, 1, 2, 4)
    np.testing.assert_allclose(cam[0, :3, 3], [1500.0, -2000.0, 250.0])


def test_projection_matrix():
    cam = np.zeros((2, 4, 4))
    cam[0] = np.eye(4)
    cam[0, :3, 3] = [10, 20, 30]
    cam[1, :3, :3] = [[100, 0, 50], [0, 100, 40], [0, 0, 1]]
    P = projection_matrix(cam)
    assert P.shape == (3, 4)
    np.testing.assert_allclose(P, cam[1, :3, :3] @ cam[0, :3, :])


def test_dmb_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.standard_normal((5, 8)).astype(np.float32)
    p = tmp_path / "d.dmb"
    write_dmb(str(p), img)
    np.testing.assert_array_equal(read_dmb(str(p)), img)


def test_dmb_3channel_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.standard_normal((4, 6, 3)).astype(np.float32)
    p = tmp_path / "n.dmb"
    write_dmb(str(p), img)
    np.testing.assert_array_equal(read_dmb(str(p)), img)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    pts = rng.standard_normal((10, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (10, 3)).astype(np.uint8)
    p = tmp_path / "m.ply"
    write_ply(str(p), pts, colors=cols)
    rpts, rcols = read_ply(str(p))
    np.testing.assert_array_equal(rpts, pts)
    np.testing.assert_array_equal(rcols, cols)


def test_depth_png_roundtrip(tmp_path):
    depth = (np.random.default_rng(5).uniform(0, 10000, (6, 7))).astype(np.uint16)
    p = tmp_path / "d.png"
    write_depth_png(str(p), depth)
    np.testing.assert_array_equal(load_depth_png(str(p)), depth)
