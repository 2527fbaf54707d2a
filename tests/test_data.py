"""Data plane: transforms, cluster, generator, loader."""

import json
import os

import numpy as np
import pytest

from mvsnet_tpu.data import Cluster, ClusterGenerator, PrefetchingLoader
from mvsnet_tpu.data import transforms as T
from tests.synthetic_session import make_dataset, make_session


def test_center_image():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (10, 12, 3)).astype(np.uint8)
    out = T.center_image(img)
    np.testing.assert_allclose(out.mean(axis=(0, 1)), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(axis=(0, 1)), 1.0, atol=1e-3)


def test_crop_shifts_principal_point():
    rng = np.random.default_rng(1)
    images = [rng.uniform(0, 1, (100, 140, 3)).astype(np.float32)]
    cam = np.zeros((2, 4, 4))
    cam[1, 0, 2], cam[1, 1, 2] = 70.0, 50.0
    images2, cams2 = T.crop_mvs_input(images, [cam], width=128, height=96, base_image_size=8)
    assert images2[0].shape[:2] == (96, 128)
    # crop start: h: ceil((100-96)/2)=2; w: ceil((140-128)/2)=6
    assert cams2[0][1, 0, 2] == 70.0 - 6
    assert cams2[0][1, 1, 2] == 50.0 - 2


def test_crop_rounds_to_base_size():
    images = [np.zeros((94, 130, 3), np.float32)]
    cam = np.zeros((2, 4, 4))
    out, _ = T.crop_mvs_input(images, [cam], width=1000, height=1000, base_image_size=8)
    # ceil to multiple of 8 can't exceed the image; numpy slicing clamps
    assert out[0].shape[0] <= 96 and out[0].shape[1] <= 136


def test_mask_depth_image():
    d = np.array([[100, 500, 900], [1500, 2000, 50]], np.float32)
    m = T.mask_depth_image(d, 200, 1000)
    assert m.shape == (2, 3, 1)
    np.testing.assert_allclose(m[..., 0], [[0, 500, 900], [0, 0, 0]])


def test_flip_cams():
    cams = np.zeros((3, 2, 4, 4), np.float32)
    cams[0, 1, 3] = [100.0, 2.0, 64, 226.0]
    flipped = T.flip_cams(cams, 64)
    assert flipped[0, 1, 3, 0] == 100.0 + 63 * 2.0
    assert flipped[0, 1, 3, 1] == -2.0
    # double flip restores the sweep
    back = T.flip_cams(flipped, 64)
    np.testing.assert_allclose(back[0, 1, 3, :2], cams[0, 1, 3, :2])


def test_cluster_pads_views(tmp_path):
    session = make_session(str(tmp_path / "s"), n_images=2)
    c = Cluster(session, 0, [1], 1500, 2500, view_num=4, depth_num=16)
    assert c.indices == [0, 1, 0, 0]


def test_cluster_camera_convention(tmp_path):
    session = make_session(str(tmp_path / "s"), n_images=3)
    c = Cluster(session, 0, [1, 2], 1500.0, 2500.0, view_num=3,
                depth_num=17, interval_scale=1.0)
    cam = c.load_camera(1)
    assert cam.shape == (2, 4, 4)
    assert cam[1, 3, 0] == 1500.0
    np.testing.assert_allclose(cam[1, 3, 1], (2500 - 1500) / 16)
    assert cam[1, 3, 2] == 17
    assert cam[1, 3, 3] == 2500.0
    # translation meters->mm: view 1 sits at (0, -20, 0) mm
    np.testing.assert_allclose(cam[0, :3, 3], [0.0, -20.0, 0.0], atol=1e-6)


def test_generator_train_mode(tmp_path):
    make_dataset(str(tmp_path), n_sessions=2, split="train", n_images=4)
    gen = ClusterGenerator(str(tmp_path), view_num=3, image_width=64, image_height=64,
                           depth_num=16, base_image_size=32, mode="train",
                           flip_cams=False, output_scale=0.25)
    samples = list(gen.iterate_once())
    assert len(samples) == 8   # 2 sessions x 4 clusters
    images, cams, depth, full_depth = samples[0]
    assert images.shape == (3, 64, 64, 3)
    assert cams.shape == (3, 2, 4, 4)
    assert depth.shape == (16, 16, 1)
    assert full_depth.shape == (64, 64, 1)
    # cams scaled by output_scale vs full intrinsics
    c_full = Cluster(gen.clusters[0].session_dir, 0, [1], 1500, 2500, 3,
                     depth_num=16).load_camera(0)
    # depth range rows are preserved by scaling
    np.testing.assert_allclose(cams[0][1, 3], c_full[1, 3].astype(np.float32))
    # GT depth values are the plane depth (2000mm), valid everywhere
    valid = depth[depth > 0]
    np.testing.assert_allclose(valid, 2000.0)


def test_generator_flip_cams_doubles(tmp_path):
    make_dataset(str(tmp_path), n_sessions=1, split="train", n_images=4)
    gen = ClusterGenerator(str(tmp_path), view_num=3, image_width=64, image_height=64,
                           depth_num=16, base_image_size=32, mode="train",
                           flip_cams=True)
    samples = list(gen.iterate_once())
    assert len(samples) == 8    # 4 clusters x 2 (forward + flipped)
    fwd_cams, flip_cams_ = samples[0][1], samples[1][1]
    assert flip_cams_[0][1, 3, 1] == -fwd_cams[0][1, 3, 1]
    np.testing.assert_allclose(
        flip_cams_[0][1, 3, 0],
        fwd_cams[0][1, 3, 0] + 15 * fwd_cams[0][1, 3, 1], rtol=1e-6)


def test_generator_test_mode(tmp_path):
    make_dataset(str(tmp_path), n_sessions=1, split="test", n_images=4)
    gen = ClusterGenerator(str(tmp_path), view_num=3, image_width=64, image_height=64,
                           depth_num=16, base_image_size=32, mode="test")
    s = next(iter(gen.iterate_once()))
    output_images, input_images, output_cams, full_cams, depth, index, session_dir = s
    assert output_images.shape == (3, 16, 16, 3)
    assert input_images.shape == (3, 64, 64, 3)
    assert output_cams.shape == (3, 2, 4, 4)
    assert full_cams.shape == (3, 2, 4, 4)
    assert depth.shape == (64, 64, 1)
    # scaled cams: intrinsics = full * 0.25
    np.testing.assert_allclose(output_cams[0][1, 0, 0], full_cams[0][1, 0, 0] * 0.25, rtol=1e-5)


def test_generator_inference_mode(tmp_path):
    session = make_session(str(tmp_path / "sess"), n_images=4, with_depths=False)
    gen = ClusterGenerator(session, view_num=3, image_width=64, image_height=64,
                           depth_num=16, base_image_size=32, mode="inference")
    s = next(iter(gen.iterate_once()))
    assert len(s) == 6
    assert s[4] in (0, 1, 2, 3)   # ref index


def test_generator_cache(tmp_path):
    make_dataset(str(tmp_path), n_sessions=1, split="train", n_images=4)
    g1 = ClusterGenerator(str(tmp_path), view_num=3, image_width=64, image_height=64,
                          depth_num=16, mode="train")
    assert os.path.exists(str(tmp_path / "train" / "clusters.pickle"))
    g2 = ClusterGenerator(str(tmp_path), view_num=3, image_width=64, image_height=64,
                          depth_num=16, mode="train")
    assert len(g2.clusters) == len(g1.clusters)


def test_generator_shards(tmp_path):
    make_dataset(str(tmp_path), n_sessions=2, split="train", n_images=4)
    g0 = ClusterGenerator(str(tmp_path), view_num=3, image_width=64, image_height=64,
                          depth_num=16, mode="train", shard_index=0, shard_count=2)
    g1 = ClusterGenerator(str(tmp_path), view_num=3, image_width=64, image_height=64,
                          depth_num=16, mode="train", shard_index=1, shard_count=2)
    assert len(g0.clusters) + len(g1.clusters) == 8
    keys0 = {(c.session_dir, c.ref_index) for c in g0.clusters}
    keys1 = {(c.session_dir, c.ref_index) for c in g1.clusters}
    assert not (keys0 & keys1)


def test_prefetching_loader(tmp_path):
    make_dataset(str(tmp_path), n_sessions=1, split="train", n_images=4)

    def factory():
        return ClusterGenerator(str(tmp_path), view_num=3, image_width=64,
                                image_height=64, depth_num=16, base_image_size=32,
                                mode="train", flip_cams=False)

    loader = PrefetchingLoader(factory, batch_size=2, epochs=1)
    batches = list(loader)
    assert len(batches) == 2   # 4 clusters / batch 2
    images, cams, depth, full_depth = batches[0]
    assert images.shape == (2, 3, 64, 64, 3)
    assert cams.shape == (2, 3, 2, 4, 4)
    assert depth.shape == (2, 16, 16, 1)
