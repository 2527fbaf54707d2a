"""Channel-second-minor (CW) eval pipeline: layout plumbing correctness.

The Pallas 3D conv/deconv kernels and the fused cost kernel all work in
(…, C, W) internally; the CW pipeline chains them in that layout so eval
graphs pay zero NDHWC relayouts between layers (models/regnet.py,
models/mvsnet.py). These tests pin the contract: CW in/out flags change
LAYOUT ONLY — every path (Pallas interpret kernels, XLA fallbacks, the
cost-volume handoff, the full 3DCNN graph) produces identical numerics.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _swap(x):
    return jnp.swapaxes(x, -1, -2)


class TestConv3DCW:
    @pytest.mark.parametrize("cin,cout,stride", [
        (32, 8, 1),   # s1 non-packed
        (8, 8, 1),    # s1 lane-packed (C<=16)
        (16, 16, 2),  # s2
    ])
    def test_fused_cw_matches_ndhwc(self, cin, cout, stride):
        from mvsnet_tpu.ops.pallas.conv3d import _rowconv3d_fwd_impl

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((1, 4, 8, 16, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)

        ref = _rowconv3d_fwd_impl(x, k, b, stride=stride, relu=True,
                                  interpret=True)
        got_cw = _rowconv3d_fwd_impl(_swap(x), k, b, stride=stride,
                                     relu=True, interpret=True,
                                     cw_in=True, cw_out=True)
        np.testing.assert_allclose(np.asarray(_swap(got_cw)), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
        # mixed flags too
        got_in = _rowconv3d_fwd_impl(_swap(x), k, b, stride=stride,
                                     relu=True, interpret=True, cw_in=True)
        np.testing.assert_allclose(np.asarray(got_in), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
        got_out = _rowconv3d_fwd_impl(x, k, b, stride=stride, relu=True,
                                      interpret=True, cw_out=True)
        np.testing.assert_allclose(np.asarray(_swap(got_out)),
                                   np.asarray(ref), atol=2e-5, rtol=1e-5)


class TestDeconv3DCW:
    def test_fused_cw_matches_ndhwc(self):
        from mvsnet_tpu.ops.pallas.deconv3d import _rowdeconv3d_fwd_impl

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 3, 8, 16, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)

        ref = _rowdeconv3d_fwd_impl(x, k, b, relu=True, interpret=True)
        got = _rowdeconv3d_fwd_impl(_swap(x), k, b, relu=True,
                                    interpret=True, cw_in=True, cw_out=True)
        np.testing.assert_allclose(np.asarray(_swap(got)), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


class TestConv2DCW:
    @pytest.mark.parametrize("cin,cout,stride,K", [
        (32, 8, 1, 3),    # s1 carry kernel
        (8, 8, 1, 3),     # s1 lane-packed
        (16, 16, 2, 3),   # s2 dx-tap table
        (8, 16, 2, 5),    # 5x5 s2 (UNet tail / stems)
    ])
    def test_fused_cw_matches_ndhwc(self, cin, cout, stride, K):
        from mvsnet_tpu.ops.pallas.conv2d import (
            _rowconv2d_fwd_impl,
            _rowconv2d_s2_fwd_impl,
        )

        impl = _rowconv2d_s2_fwd_impl if stride == 2 else _rowconv2d_fwd_impl
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((1, 16, 32, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((K, K, cin, cout)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        ref = impl(x, k, b, relu=True, interpret=True)
        got = impl(_swap(x), k, b, relu=True, interpret=True,
                   cw_in=True, cw_out=True)
        np.testing.assert_allclose(np.asarray(_swap(got)), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


class TestDeconv2DCW:
    def test_fused_cw_matches_ndhwc(self):
        from mvsnet_tpu.ops.pallas.deconv2d import _rowdeconv2d_fwd_impl

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
        ref = _rowdeconv2d_fwd_impl(x, k, b, relu=True, interpret=True)
        got = _rowdeconv2d_fwd_impl(_swap(x), k, b, relu=True,
                                    interpret=True, cw_in=True, cw_out=True)
        np.testing.assert_allclose(np.asarray(_swap(got)), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


class TestGroupNormCW:
    def test_channel_axis(self):
        from mvsnet_tpu.models.layers import group_norm_core

        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((2, 6, 8, 16)), jnp.float32)
        gamma = jnp.asarray(rng.standard_normal(16), jnp.float32)
        beta = jnp.asarray(rng.standard_normal(16), jnp.float32)
        base = group_norm_core(x, gamma, beta, 2, 1e-5)
        cw = group_norm_core(_swap(x), gamma, beta, 2, 1e-5, channel_axis=-2)
        np.testing.assert_allclose(np.asarray(_swap(cw)), np.asarray(base),
                                   atol=1e-6, rtol=1e-6)


class TestFeatureNetCW:
    def _apply(self, x, cw):
        from mvsnet_tpu.models.feature_net import UNetDS2GN

        net = UNetDS2GN("ultralite")
        vars_ = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3), jnp.float32))
        return net.apply(vars_, x, cw=cw)

    def test_cw_plumbing_matches_default(self):
        """XLA fallback convs on CPU: CW is pure layout plumbing."""
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
        base = self._apply(x, cw=False)
        got = self._apply(x, cw=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   atol=0, rtol=0)

    def test_cw_forced_pallas_matches_xla(self, monkeypatch):
        """CW + forced Pallas dispatch (interpret): the chip's eval graph
        vs the XLA numerics."""
        rng = np.random.default_rng(10)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
        base = self._apply(x, cw=False)
        monkeypatch.setenv("MVSNET_TPU_FORCE_PALLAS_CONV", "1")
        got = self._apply(x, cw=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   atol=5e-5, rtol=1e-4)


class TestCostVolumeCW:
    def test_pallas_cost_cw_out(self):
        from mvsnet_tpu.ops.pallas.sweep import pallas_sweep_cost_volume
        from tests.test_pallas_sweep import make_homs

        rng = np.random.default_rng(2)
        H, W, C, D = 16, 24, 8, 4
        ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
        views = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)
        homs = jnp.stack([make_homs(D), make_homs(D, rot=0.03)], axis=0)
        base = pallas_sweep_cost_volume(ref, views, homs, interpret=True)
        cw = pallas_sweep_cost_volume(ref, views, homs, interpret=True,
                                      cw_out=True)
        np.testing.assert_allclose(np.asarray(_swap(cw)), np.asarray(base),
                                   atol=1e-5, rtol=1e-5)

    def test_xla_cost_cw_out(self):
        from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
        from tests.test_pallas_sweep import make_homs

        rng = np.random.default_rng(3)
        H, W, C, D = 16, 24, 8, 4
        ref = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)
        views = jnp.asarray(rng.standard_normal((2, 1, H, W, C)), jnp.float32)
        homs = jnp.stack([make_homs(D)[None], make_homs(D, rot=0.03)[None]],
                         axis=0)
        base = plane_sweep_cost_volume(ref, views, homs, use_pallas=False)
        cw = plane_sweep_cost_volume(ref, views, homs, use_pallas=False,
                                     cw_out=True)
        np.testing.assert_allclose(np.asarray(_swap(cw)), np.asarray(base),
                                   atol=0, rtol=0)


def _regnet_apply(x, training=False, x_cw=False):
    from mvsnet_tpu.models.regnet import RegNetUS0

    model = RegNetUS0("normal")
    vars_ = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 8, 16, 16, 32), jnp.float32), False)
    xin = _swap(x) if x_cw else x
    return model.apply(vars_, xin, training=training, x_cw=x_cw)


class TestRegNetCW:
    def test_cw_env_plumbing_matches_default(self, monkeypatch):
        """CW forced on (XLA fallback convs on CPU): pure layout plumbing —
        numerics must match the default NDHWC eval exactly."""
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 16, 32)), jnp.float32)

        monkeypatch.delenv("MVSNET_TPU_CW", raising=False)
        base = _regnet_apply(x)
        monkeypatch.setenv("MVSNET_TPU_CW", "1")
        got = _regnet_apply(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   atol=0, rtol=0)
        # CW input handoff (x_cw) too
        got_cw_in = _regnet_apply(x, x_cw=True)
        np.testing.assert_allclose(np.asarray(got_cw_in), np.asarray(base),
                                   atol=0, rtol=0)
        # training path ignores CW internally but honors the x_cw contract
        monkeypatch.delenv("MVSNET_TPU_CW", raising=False)
        t_base = _regnet_apply(x, training=False, x_cw=True)
        np.testing.assert_allclose(np.asarray(t_base), np.asarray(base),
                                   atol=0, rtol=0)

    def test_cw_forced_pallas_matches_xla(self, monkeypatch):
        """CW + forced Pallas dispatch (interpret kernels on CPU): the exact
        graph the chip runs, vs the XLA reference numerics."""
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 16, 32)), jnp.float32)

        monkeypatch.delenv("MVSNET_TPU_CW", raising=False)
        base = _regnet_apply(x)
        monkeypatch.setenv("MVSNET_TPU_CW", "1")
        monkeypatch.setenv("MVSNET_TPU_FORCE_PALLAS_CONV", "1")
        got = _regnet_apply(x, x_cw=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   atol=5e-5, rtol=1e-4)


class TestGRUCW:
    def test_cell_cw_matches_default(self):
        """ConvGRUCell in CW layout (XLA convs on CPU): layout-only."""
        from mvsnet_tpu.models.gru import ConvGRUCell

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 32)), jnp.float32)
        h = jnp.asarray(rng.standard_normal((1, 8, 16, 16)), jnp.float32)
        cell = ConvGRUCell(16)
        vars_ = cell.init(jax.random.PRNGKey(0), x, h)
        base, _ = cell.apply(vars_, x, h)
        got, got_state = cell.apply(vars_, _swap(x), _swap(h), cw=True)
        np.testing.assert_allclose(np.asarray(_swap(got)), np.asarray(base),
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(_swap(got_state)),
                                   np.asarray(base), atol=1e-6, rtol=1e-6)

    def test_wta_graph_cw_matches_default(self, monkeypatch):
        """Full forward_gru_wta eval graph: CW scan (cost handoff + CW GRU
        states across planes) vs the default layout — identical numerics."""
        from tests.test_models import _tiny_inputs

        from mvsnet_tpu.config import ModelConfig
        from mvsnet_tpu.models.mvsnet import MVSNet

        cfg = ModelConfig(view_num=3, max_d=8, width=64, height=64,
                          network_mode="ultralite", compute_dtype="float32",
                          regularization="GRU")
        model = MVSNet(cfg)
        images, cams, depth_start, depth_interval = _tiny_inputs(D=8)
        params = model.init(jax.random.PRNGKey(0), images, cams, depth_start,
                            depth_interval, method=MVSNet.forward_gru_wta)

        monkeypatch.delenv("MVSNET_TPU_CW", raising=False)
        d_base, p_base = model.apply(params, images, cams, depth_start,
                                     depth_interval,
                                     method=MVSNet.forward_gru_wta)
        monkeypatch.setenv("MVSNET_TPU_CW", "1")
        d_cw, p_cw = model.apply(params, images, cams, depth_start,
                                 depth_interval,
                                 method=MVSNet.forward_gru_wta)
        np.testing.assert_allclose(np.asarray(d_cw), np.asarray(d_base),
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p_cw), np.asarray(p_base),
                                   atol=1e-6, rtol=1e-6)


class TestForward3DCNNCW:
    def test_graph_cw_matches_default(self, monkeypatch):
        """Full 3DCNN eval graph with the CW cost-volume handoff (XLA paths
        on CPU) vs the default layout — identical numerics."""
        from tests.test_models import _tiny_inputs

        from mvsnet_tpu.config import ModelConfig
        from mvsnet_tpu.models.mvsnet import MVSNet

        cfg = ModelConfig(view_num=3, max_d=8, width=64, height=64,
                          network_mode="ultralite", compute_dtype="float32")
        model = MVSNet(cfg)
        images, cams, depth_start, depth_interval = _tiny_inputs(D=8)
        params = model.init(jax.random.PRNGKey(0), images, cams, depth_start,
                            depth_interval, method=MVSNet.forward_3dcnn)

        monkeypatch.delenv("MVSNET_TPU_CW", raising=False)
        d_base, p_base = model.apply(params, images, cams, depth_start,
                                     depth_interval,
                                     method=MVSNet.forward_3dcnn)
        monkeypatch.setenv("MVSNET_TPU_CW", "1")
        d_cw, p_cw = model.apply(params, images, cams, depth_start,
                                 depth_interval, method=MVSNet.forward_3dcnn)
        np.testing.assert_allclose(np.asarray(d_cw), np.asarray(d_base),
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p_cw), np.asarray(p_base),
                                   atol=1e-6, rtol=1e-6)
