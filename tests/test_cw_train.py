"""Differentiable CW (channel-second-minor) conv/deconv contracts.

The training CW pipeline chains the Pallas 3D kernels in their native
(B, D, H, C, W) layout through fwd AND bwd (models/regnet.py training
path). These tests pin the custom-VJP layout contracts against XLA's
conv grads: values and (dx, dk) cotangents must match for every
(cw_in, cw_out) combination — CW is layout-only, gradients included.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _swap(x):
    return jnp.swapaxes(x, -1, -2)


def _xla_conv3d(x, k, stride):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(x, k, (stride,) * 3, "SAME",
                                        dimension_numbers=dn)


def _xla_deconv3d(x, k):
    return jax.lax.conv_transpose(x, k, (2, 2, 2), "SAME",
                                  dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _loss_weights(shape, seed=42):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape),
                       jnp.float32)


@pytest.mark.parametrize("cw_in,cw_out", [(False, False), (True, False),
                                          (False, True), (True, True)])
@pytest.mark.parametrize("stride", [1, 2])
def test_rowconv3d_cw_grads_match_xla(cw_in, cw_out, stride):
    from mvsnet_tpu.ops.pallas.conv3d import rowconv3d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 16, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)) * 0.1, jnp.float32)

    ref_out = _xla_conv3d(x, k, stride)
    w = _loss_weights(ref_out.shape)

    def ref_loss(x_, k_):
        return jnp.sum(_xla_conv3d(x_, k_, stride) * w)

    def cw_loss(x_, k_):
        xin = _swap(x_) if cw_in else x_
        y = rowconv3d(xin, k_, stride, cw_in=cw_in, cw_out=cw_out)
        if cw_out:
            y = _swap(y)
        return jnp.sum(y * w)

    ref_l, (ref_dx, ref_dk) = jax.value_and_grad(ref_loss, (0, 1))(x, k)
    cw_l, (cw_dx, cw_dk) = jax.value_and_grad(cw_loss, (0, 1))(x, k)
    np.testing.assert_allclose(float(cw_l), float(ref_l), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(cw_dx), np.asarray(ref_dx),
                               atol=3e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(cw_dk), np.asarray(ref_dk),
                               atol=3e-4, rtol=2e-4)


@pytest.mark.parametrize("cw_in,cw_out", [(False, False), (True, False),
                                          (False, True), (True, True)])
def test_rowdeconv3d_cw_grads_match_xla(cw_in, cw_out):
    from mvsnet_tpu.ops.pallas.deconv3d import rowdeconv3d

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 2, 4, 8, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)) * 0.1, jnp.float32)

    ref_out = _xla_deconv3d(x, k)
    w = _loss_weights(ref_out.shape)

    def ref_loss(x_, k_):
        return jnp.sum(_xla_deconv3d(x_, k_) * w)

    def cw_loss(x_, k_):
        xin = _swap(x_) if cw_in else x_
        y = rowdeconv3d(xin, k_, cw_in=cw_in, cw_out=cw_out)
        if cw_out:
            y = _swap(y)
        return jnp.sum(y * w)

    ref_l, (ref_dx, ref_dk) = jax.value_and_grad(ref_loss, (0, 1))(x, k)
    cw_l, (cw_dx, cw_dk) = jax.value_and_grad(cw_loss, (0, 1))(x, k)
    np.testing.assert_allclose(float(cw_l), float(ref_l), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(cw_dx), np.asarray(ref_dx),
                               atol=3e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(cw_dk), np.asarray(ref_dk),
                               atol=3e-4, rtol=2e-4)


class TestRegNetTrainCW:
    def _grads(self, x, monkeypatch, cw_env):
        from mvsnet_tpu.models.regnet import RegNetUS0

        monkeypatch.setenv("MVSNET_TPU_CW_TRAIN", cw_env)
        model = RegNetUS0("normal")
        vars_ = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, 16, 16, 32), jnp.float32), False)
        params = vars_["params"]
        stats = vars_.get("batch_stats", {})
        w = _loss_weights((1, 8, 16, 16, 1), seed=7)

        def loss(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": stats}, x, training=True,
                mutable=["batch_stats"])
            return jnp.sum(out * w), updates["batch_stats"]

        (l, new_stats), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return float(l), grads, new_stats

    def test_training_cw_matches_ndhwc(self, monkeypatch):
        """RegNet TRAINING fwd+bwd in CW vs NDHWC: loss, every parameter
        gradient, and the batch-norm running-stat updates must agree —
        the CW custom-VJP chain is layout-only end to end."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 16, 32)), jnp.float32)

        l0, g0, s0 = self._grads(x, monkeypatch, "0")
        l1, g1, s1 = self._grads(x, monkeypatch, "1")
        np.testing.assert_allclose(l1, l0, rtol=1e-5)
        flat0 = jax.tree_util.tree_leaves_with_path(g0)
        flat1 = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(g1)}
        for k, v in flat0:
            np.testing.assert_allclose(
                np.asarray(flat1[jax.tree_util.keystr(k)]), np.asarray(v),
                atol=1e-4, rtol=1e-4, err_msg=jax.tree_util.keystr(k))
        leaves0 = jax.tree_util.tree_leaves_with_path(s0)
        leaves1 = {jax.tree_util.keystr(k): v
                   for k, v in jax.tree_util.tree_leaves_with_path(s1)}
        for k, v in leaves0:
            np.testing.assert_allclose(
                np.asarray(leaves1[jax.tree_util.keystr(k)]), np.asarray(v),
                atol=1e-5, rtol=1e-5, err_msg=jax.tree_util.keystr(k))


def test_train_step_cw_matches(monkeypatch, tmp_path):
    """Full train step (features + cost VJP + CW RegNet + loss) with
    MVSNET_TPU_CW_TRAIN on vs off: identical losses over 3 steps."""
    import sys
    sys.path.insert(0, "tests")
    from synthetic_session import make_session

    import jax as _jax
    from mvsnet_tpu import train_lib
    from mvsnet_tpu.config import ModelConfig, TrainConfig
    from mvsnet_tpu.data import ClusterGenerator, batch_iterator
    from mvsnet_tpu.models import MVSNet

    make_session(str(tmp_path / "train" / "s0"), n_images=4)
    gen = ClusterGenerator(str(tmp_path), view_num=3, image_width=64,
                           image_height=64, depth_num=16, base_image_size=32,
                           mode="train", flip_cams=False)
    batches = list(batch_iterator(gen.iterate_once(), 1))[:3]
    mcfg = ModelConfig(view_num=3, max_d=16, width=64, height=64,
                       network_mode="ultralite", compute_dtype="float32")
    tcfg = TrainConfig(optimizer="adam", base_lr=1e-3, loss_type="original",
                       grad_loss=False)

    def run(env):
        monkeypatch.setenv("MVSNET_TPU_CW_TRAIN", env)
        model = MVSNet(mcfg)
        state = train_lib.create_train_state(model, mcfg, tcfg,
                                             _jax.random.PRNGKey(0), batches[0])
        step_fn = train_lib.make_train_step(model, mcfg, tcfg, donate=False)
        out = []
        for b in batches:
            state, m = step_fn(state, b)
            out.append(float(m["loss"]))
        return out

    l_off = run("0")
    l_on = run("1")
    np.testing.assert_allclose(l_on, l_off, rtol=1e-5)
