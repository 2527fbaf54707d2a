"""Inverse-depth sweep path end-to-end (R-MVSNet large-range mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from mvsnet_tpu.config import ModelConfig
from mvsnet_tpu.models import MVSNet
from mvsnet_tpu.ops.depth import probability_map, soft_argmin
from mvsnet_tpu.ops.geometry import inv_depth_values


def _inputs(D=8, H=64, W=64, V=3):
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.standard_normal((1, V, H, W, 3)), jnp.float32)
    K = np.array([[15.0, 0, W / 8], [0, 15.0, H / 8], [0, 0, 1]])
    cam = np.zeros((2, 4, 4))
    cam[0] = np.eye(4)
    cam[0, 0, 3] = 30.0
    cam[1, :3, :3] = K
    start, end = 400.0, 2000.0
    interval = (end - start) / (D - 1)
    cam[1, 3] = [start, interval, D, end]
    cams = jnp.asarray(np.stack([cam] * V))[None]
    return images, cams, jnp.array([start]), jnp.array([interval]), jnp.array([end])


def test_forward_3dcnn_inverse_depth_bounds():
    cfg = ModelConfig(view_num=3, max_d=8, width=64, height=64,
                      network_mode="ultralite", compute_dtype="float32",
                      inverse_depth=True)
    model = MVSNet(cfg)
    images, cams, ds, di, de = _inputs()
    vars_ = model.init(jax.random.PRNGKey(0), images, cams, ds, di,
                       method=MVSNet.forward_3dcnn)
    depth, prob = model.apply(vars_, images, cams, ds, di, method=MVSNet.forward_3dcnn)
    d = np.asarray(depth)
    assert (d >= 400 - 1e-2).all() and (d <= 2000 + 1e-2).all()
    assert np.isfinite(np.asarray(prob)).all()


def test_soft_argmin_inverse_depth_samples():
    """With all mass on plane k, soft-argmin returns the k-th inverse-depth
    sample (not the linear sample)."""
    B, D, H, W = 1, 8, 4, 4
    start, end = 400.0, 2000.0
    interval = (end - start) / (D - 1)
    k = 5
    cost = np.full((B, D, H, W), 50.0, np.float32)
    cost[:, k] = -50.0   # softmax(-cost) concentrates on plane k
    depth, pv = soft_argmin(jnp.asarray(cost), jnp.array([start]),
                            jnp.array([interval]), D, inverse_depth=True,
                            depth_end=jnp.array([end]))
    samples = np.asarray(inv_depth_values(np.array([start]), np.array([end]), D))
    np.testing.assert_allclose(np.asarray(depth)[0, :, :, 0], samples[0, k], rtol=1e-5)


def test_probability_map_inverse_depth_buckets():
    """Prob mass concentrated at plane k must be recovered by the 4-bucket
    confidence at the regressed (inverse-spaced) depth."""
    B, D, H, W = 1, 8, 4, 4
    start, end = 400.0, 2000.0
    interval = (end - start) / (D - 1)
    k = 3
    pv = np.full((B, D, H, W), 1e-6, np.float32)
    pv[:, k] = 1.0
    samples = np.asarray(inv_depth_values(np.array([start]), np.array([end]), D))
    depth = jnp.full((B, H, W, 1), float(samples[0, k]))
    pm = probability_map(jnp.asarray(pv), depth, jnp.array([start]),
                         jnp.array([interval]), inverse_depth=True, num_buckets=4)
    assert float(np.asarray(pm).min()) > 0.99


def test_gru_wta_inverse_depth():
    cfg = ModelConfig(view_num=3, max_d=8, width=64, height=64,
                      network_mode="lite", regularization="GRU",
                      compute_dtype="float32", inverse_depth=True)
    model = MVSNet(cfg)
    images, cams, ds, di, de = _inputs()
    vars_ = model.init(jax.random.PRNGKey(0), images, cams, ds, di,
                       method=MVSNet.forward_prob_recurrent)
    depth, prob = model.apply(vars_, images, cams, ds,
                              depth_interval=None, depth_end=de,
                              method=MVSNet.forward_gru_wta)
    d = np.asarray(depth)
    samples = np.asarray(inv_depth_values(np.array([400.0]), np.array([2000.0]), 8))
    # every WTA depth is exactly one of the inverse-depth samples
    assert np.isin(np.round(d, 3), np.round(samples[0], 3)).all()
