"""Extra parity coverage: prob-map buckets, loss variants, width modes,
loader epochs, generator accounting, multi-session inference."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mvsnet_tpu import losses
from mvsnet_tpu.config import ModelConfig, scaled_filters
from mvsnet_tpu.data import ClusterGenerator, PrefetchingLoader
from mvsnet_tpu.ops.depth import probability_map
from tests.synthetic_session import make_dataset, make_session


def test_probability_map_two_buckets():
    """num_buckets=2 sums only floor/ceil planes (reference: model.py:128-131)."""
    B, D, H, W = 1, 6, 2, 2
    pv = np.zeros((B, D, H, W), np.float32)
    pv[:, 2] = 0.4
    pv[:, 3] = 0.3
    pv[:, 1] = 0.2   # the left1 bucket — excluded with 2 buckets
    pv[:, 4] = 0.1   # right1 — excluded
    depth = jnp.full((B, H, W, 1), 10.0 + 2.5 * 1.0)   # between planes 2,3
    pm2 = probability_map(jnp.asarray(pv), depth, jnp.array([10.0]), jnp.array([1.0]),
                          num_buckets=2)
    pm4 = probability_map(jnp.asarray(pv), depth, jnp.array([10.0]), jnp.array([1.0]),
                          num_buckets=4)
    np.testing.assert_allclose(np.asarray(pm2), 0.7, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pm4), 1.0, atol=1e-6)


def test_probability_map_integer_depth():
    """Depth exactly on a plane: floor == ceil, counted twice
    (reference semantics: prob_left0 + prob_right0 with same index)."""
    B, D, H, W = 1, 5, 1, 1
    pv = np.zeros((B, D, H, W), np.float32)
    pv[:, 2] = 0.5
    depth = jnp.full((B, H, W, 1), 12.0)   # plane 2 exactly (start 10, iv 1)
    pm = probability_map(jnp.asarray(pv), depth, jnp.array([10.0]), jnp.array([1.0]),
                         num_buckets=2)
    np.testing.assert_allclose(np.asarray(pm), 1.0, atol=1e-6)


@pytest.mark.parametrize("inverse,buckets", [(False, 4), (False, 2),
                                             (True, 4)])
def test_soft_argmin_prob_map_fused_matches_composed(inverse, buckets):
    """The fused 3DCNN tail (soft_argmin_prob_map) must reproduce the
    composed probability_map(soft_argmin(...)) path bit-for-bit up to
    f32 reassociation (reference: model.py:343-366 + 45-144)."""
    from mvsnet_tpu.ops.depth import soft_argmin, soft_argmin_prob_map

    rng = np.random.default_rng(3)
    B, D, H, W = 2, 16, 6, 7
    reg = jnp.asarray(rng.standard_normal((B, D, H, W)) * 3, jnp.float32)
    start = jnp.array([10.0, 12.0])
    interval = jnp.array([1.5, 2.0])
    end = start + (D - 1) * interval

    depth_ref, pv = soft_argmin(reg, start, interval, D,
                                inverse_depth=inverse, depth_end=end)
    pm_ref = probability_map(pv, depth_ref, start, interval,
                             inverse_depth=inverse, num_buckets=buckets)
    depth, pm = soft_argmin_prob_map(reg, start, interval, D,
                                     inverse_depth=inverse, depth_end=end,
                                     num_buckets=buckets)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(depth_ref),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pm_ref),
                               atol=1e-5, rtol=1e-5)

    # differentiable (the training graphs may route through it)
    g = jax.grad(lambda r: jnp.sum(
        soft_argmin_prob_map(r, start, interval, D, inverse_depth=inverse,
                             depth_end=end)[0]))(reg)
    assert np.isfinite(np.asarray(g)).all()


def test_power_loss_no_interval_norm():
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(5, 10, (1, 6, 6, 1)).astype(np.float32))
    pred = gt + 0.1
    a = float(losses.power_loss(gt, pred, jnp.array([0.5]), 1.0, 1.0,
                                no_interval_norm=True))
    b = float(losses.power_loss(gt, pred, jnp.array([0.5]), 1.0, 1.0,
                                no_interval_norm=False))
    assert a != b and np.isfinite(a) and np.isfinite(b)


@pytest.mark.parametrize("mode,div", [("fat", 0.5), ("ultrafat", 0.25)])
def test_fat_modes(mode, div):
    assert scaled_filters(8, mode) == int(8 / div)


def test_generator_len_with_flip(tmp_path):
    make_dataset(str(tmp_path), n_sessions=1, split="train", n_images=4)
    g = ClusterGenerator(str(tmp_path), view_num=3, image_width=64, image_height=64,
                         depth_num=8, base_image_size=32, mode="train", flip_cams=True)
    assert len(g) == 8
    g2 = ClusterGenerator(str(tmp_path), view_num=3, image_width=64, image_height=64,
                          depth_num=8, base_image_size=32, mode="train", flip_cams=False)
    assert len(g2) == 4


def test_loader_epoch_bounds(tmp_path):
    make_dataset(str(tmp_path), n_sessions=1, split="train", n_images=4)

    def factory():
        return ClusterGenerator(str(tmp_path), view_num=3, image_width=64,
                                image_height=64, depth_num=8, base_image_size=32,
                                mode="train", flip_cams=False)

    loader = PrefetchingLoader(factory, batch_size=1, epochs=3)
    assert len(list(loader)) == 12   # 4 clusters x 3 epochs


def test_infer_multi_session_directory(tmp_path):
    from mvsnet_tpu.infer import main
    root = tmp_path / "many"
    for k in range(2):
        make_session(str(root / f"s{k}"), n_images=3, with_depths=False)
    rc = main(["--input_dir", str(root), "--view_num", "3", "--max_d", "8",
               "--width", "64", "--height", "64", "--base_image_size", "32",
               "--network_mode", "ultralite", "--compute_dtype", "float32"])
    assert rc == 0
    for k in range(2):
        assert os.path.exists(str(root / f"s{k}" / "depths_mvsnet" / "0_init.pfm"))


def test_classification_loss_softmax_safe():
    """softmax-probability volumes never produce NaN (the reference's
    unclipped tf.log could NaN on exact zeros)."""
    B, D, H, W = 1, 4, 3, 3
    pv = np.zeros((B, D, H, W), np.float32)
    pv[:, 0] = 1.0   # exact zeros elsewhere
    gt = np.full((B, H, W, 1), 10.0, np.float32)   # bucket 0 (start 10, iv 1)
    xent, mae, l1, l3, _ = losses.mvsnet_classification_loss(
        jnp.asarray(pv), jnp.asarray(gt), D, jnp.array([10.0]), jnp.array([1.0]))
    assert np.isfinite(float(xent))
    assert float(xent) == pytest.approx(0.0, abs=1e-4)
