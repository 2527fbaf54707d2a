"""Drivers: infer CLI writes outputs; benchmark CLI writes results CSV;
fusion accepts consistent geometry and rejects corrupted views."""

import os

import numpy as np
import pytest

from mvsnet_tpu.io.cams import write_cam_txt
from mvsnet_tpu.io.images import write_image
from mvsnet_tpu.io.pfm import load_pfm, write_pfm
from mvsnet_tpu.io.ply import read_ply
from tests.synthetic_session import make_dataset, make_session

INFER_ARGS = [
    "--view_num", "3", "--max_d", "8", "--width", "64", "--height", "64",
    "--base_image_size", "32", "--network_mode", "ultralite",
    "--compute_dtype", "float32",
]


def test_infer_cli_writes_outputs(tmp_path):
    from mvsnet_tpu.infer import main
    session = make_session(str(tmp_path / "sess"), n_images=4, with_depths=False)
    rc = main(["--input_dir", session] + INFER_ARGS)
    assert rc == 0
    out = os.path.join(session, "depths_mvsnet")
    for i in range(4):
        for suffix in (f"{i}_init.pfm", f"{i}_prob.pfm", f"{i}_depth.png",
                       f"{i}_prob.png", f"{i}.jpg", f"{i}.txt"):
            assert os.path.exists(os.path.join(out, suffix)), suffix
    depth = load_pfm(os.path.join(out, "0_init.pfm"))
    assert depth.shape == (16, 16)
    assert np.isfinite(depth).all()
    # depths inside the sweep range (1500..2500mm)
    assert depth.min() >= 1500 - 1 and depth.max() <= 2500 + 1


def test_test_cli_benchmarks(tmp_path):
    from mvsnet_tpu.test import main
    root = str(tmp_path / "data")
    make_dataset(root, n_sessions=1, split="test", n_images=4)
    results = str(tmp_path / "results.csv")
    rc = main(["--input_dir", root, "--results_path", results] + INFER_ARGS)
    assert rc == 0
    with open(results) as f:
        lines = f.readlines()
    assert lines[0].startswith("model_dir")
    assert len(lines) == 2


def _write_gt_predictions(session, out_dir, width=96, height=96,
                          plane_depth=2000.0, baseline=40.0):
    """Handwritten 'perfect' predictions: GT plane depth + prob 1."""
    os.makedirs(out_dir, exist_ok=True)
    K = np.array([[width * 1.2, 0, width / 2.0],
                  [0, width * 1.2, height / 2.0],
                  [0, 0, 1.0]])
    for i in range(4):
        tx = baseline * ((i % 3) - 1)
        ty = baseline * ((i // 3) - 0.5)
        cam = np.zeros((2, 4, 4))
        cam[0] = np.eye(4)
        cam[0, :3, 3] = [tx, ty, 0.0]
        cam[1, :3, :3] = K
        cam[1, 3] = [1500.0, 1000 / 7, 8, 2500.0]
        depth = np.full((height, width), plane_depth, np.float32)
        prob = np.ones((height, width), np.float32)
        write_pfm(os.path.join(out_dir, f"{i}_init.pfm"), depth)
        write_pfm(os.path.join(out_dir, f"{i}_prob.pfm"), prob)
        write_cam_txt(os.path.join(out_dir, f"{i}.txt"), cam)
        write_image(os.path.join(out_dir, f"{i}.jpg"),
                    np.full((height, width, 3), 128, np.uint8))


def test_fusion_accepts_consistent_geometry(tmp_path):
    from mvsnet_tpu.fusion import fuse_session
    session = make_session(str(tmp_path / "s"), n_images=4)
    out_dir = os.path.join(session, "depths_mvsnet")
    _write_gt_predictions(session, out_dir)
    ply = fuse_session(session, prob_threshold=0.5, disp_threshold=1.0,
                       num_consistent=2, depth_rel_threshold=0.01)
    points, colors = read_ply(ply)
    assert len(points) > 5000   # most of 4x96x96 pixels should fuse
    # fused points lie on the z=2000 plane
    np.testing.assert_allclose(points[:, 2], 2000.0, atol=20.0)


def test_fusion_rejects_inconsistent_view(tmp_path):
    from mvsnet_tpu.fusion import fuse_session
    session = make_session(str(tmp_path / "s"), n_images=4)
    out_dir = os.path.join(session, "depths_mvsnet")
    _write_gt_predictions(session, out_dir)
    # corrupt view 3's depth: far off the plane
    bad = np.full((96, 96), 900.0, np.float32)
    write_pfm(os.path.join(out_dir, "3_init.pfm"), bad)
    ply = fuse_session(session, prob_threshold=0.5, disp_threshold=1.0,
                       num_consistent=3, depth_rel_threshold=0.01)
    points, _ = read_ply(ply)
    # view 3's points can't reach 3 consistent partners; views 0-2 still can
    ok_z = np.abs(points[:, 2] - 2000.0) < 50
    assert ok_z.all()


def test_fusion_prob_filter(tmp_path):
    from mvsnet_tpu.fusion import probability_filter
    session = make_session(str(tmp_path / "s"), n_images=4)
    out_dir = os.path.join(session, "depths_mvsnet")
    _write_gt_predictions(session, out_dir)
    # low-confidence stripe in view 0
    prob = np.ones((96, 96), np.float32)
    prob[:20] = 0.1
    write_pfm(os.path.join(out_dir, "0_prob.pfm"), prob)
    probability_filter(session, 0.8)
    filtered = load_pfm(os.path.join(out_dir, "0_prob_filtered.pfm"))
    assert (filtered[:20] == 0).all()
    assert (filtered[20:] > 0).all()


def test_gipuma_export(tmp_path):
    from mvsnet_tpu.fusion import main as fusion_main
    session = make_session(str(tmp_path / "s"), n_images=4)
    out_dir = os.path.join(session, "depths_mvsnet")
    _write_gt_predictions(session, out_dir)
    rc = fusion_main(["--dense_folder", session, "--mode", "gipuma-export"])
    assert rc == 0
    pf = os.path.join(session, "points_mvsnet")
    assert os.path.exists(os.path.join(pf, "cams", "0.jpg.P"))
    assert os.path.exists(os.path.join(pf, "images", "0.jpg"))
    assert os.path.exists(os.path.join(pf, "2333__0", "disp.dmb"))
    assert os.path.exists(os.path.join(pf, "2333__0", "normals.dmb"))


def test_infer_cli_gru(tmp_path):
    from mvsnet_tpu.infer import main
    session = make_session(str(tmp_path / "sess"), n_images=3, with_depths=False)
    rc = main(["--input_dir", session, "--regularization", "GRU",
               "--view_num", "3", "--max_d", "8", "--width", "64", "--height", "64",
               "--base_image_size", "32", "--network_mode", "lite",
               "--compute_dtype", "float32"])
    assert rc == 0
    out = os.path.join(session, "depths_mvsnet")
    depth = load_pfm(os.path.join(out, "0_init.pfm"))
    # WTA depths snap to sweep samples within [min_depth, max_depth]
    assert depth.min() >= 1500 - 1 and depth.max() <= 2500 + 1


def test_fusion_sharded_matches_single(tmp_path):
    """Scene-block sharded fusion (2 shards) + merge == single-process fusion."""
    from mvsnet_tpu.fusion import fuse_session, merge_shards
    session = make_session(str(tmp_path / "s"), n_images=4)
    out_dir = os.path.join(session, "depths_mvsnet")
    _write_gt_predictions(session, out_dir)
    single = fuse_session(session, prob_threshold=0.5, disp_threshold=1.0,
                          num_consistent=2,
                          output_path=str(tmp_path / "single.ply"))
    for k in (0, 1):
        fuse_session(session, prob_threshold=0.5, disp_threshold=1.0,
                     num_consistent=2, shard_index=k, shard_count=2)
    merged = merge_shards(session)
    p1, _ = read_ply(single)
    p2, _ = read_ply(merged)
    assert p1.shape == p2.shape
    np.testing.assert_allclose(np.sort(p1, axis=0), np.sort(p2, axis=0), atol=1e-4)


def test_async_output_writer_overlaps_orders_and_raises():
    """The writer must not serialize the producing loop (bounded queue,
    background thread), must preserve submission order, and must re-raise
    worker exceptions on flush/close."""
    import time as _time

    from mvsnet_tpu.predict import AsyncOutputWriter

    calls = []

    def slow_write(i):
        _time.sleep(0.15)
        calls.append(i)

    w = AsyncOutputWriter(max_pending=2, write_fn=slow_write)
    t0 = _time.time()
    for i in range(4):
        w.write(i)
    enqueue_time = _time.time() - t0
    w.close()
    assert calls == [0, 1, 2, 3]
    # 4 x 150ms of writes; enqueueing only blocks past max_pending
    # (expected ~0.3s). Strictly less than fully-serialized (0.6s)
    # proves the overlap, with scheduler-jitter headroom.
    assert enqueue_time < 0.45, enqueue_time

    def bad_write(_):
        raise RuntimeError("disk full")

    w2 = AsyncOutputWriter(write_fn=bad_write)
    w2.write(0)
    with pytest.raises(RuntimeError, match="disk full"):
        w2.close()
