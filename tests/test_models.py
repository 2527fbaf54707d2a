"""Model zoo: shapes, norm semantics, channel scaling, graph outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mvsnet_tpu.config import ModelConfig, scaled_filters
from mvsnet_tpu.models import MVSNet, RegNetUS0, UNetDS2GN
from mvsnet_tpu.models.gru import ConvGRUCell, GRURegularizer, gru_filter_sizes
from mvsnet_tpu.models.layers import GroupNormRef, group_norm_core


def test_scaled_filters():
    """network_mode width divisors (reference: network.py:75-85)."""
    assert scaled_filters(8, "normal") == 8
    assert scaled_filters(8, "semilite") == 6
    assert scaled_filters(8, "lite") == 4
    assert scaled_filters(8, "ultralite") == 2
    assert scaled_filters(8, "fat") == 16
    assert scaled_filters(32, "lite") == 16


def test_group_norm_matches_numpy():
    """group_norm_core == reference reshape-[N,G,C//G,H,W] moments form."""
    rng = np.random.default_rng(0)
    N, H, W, C, G = 2, 5, 6, 16, 2
    x = rng.standard_normal((N, H, W, C)).astype(np.float32)
    gamma = rng.standard_normal(C).astype(np.float32)
    beta = rng.standard_normal(C).astype(np.float32)
    got = np.asarray(group_norm_core(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), G, 1e-5))

    # numpy reference: NCHW transpose, reshape (N, G, C//G, H, W)
    xt = x.transpose(0, 3, 1, 2).reshape(N, G, C // G, H, W)
    mean = xt.mean(axis=(2, 3, 4), keepdims=True)
    var = xt.var(axis=(2, 3, 4), keepdims=True)
    xn = (xt - mean) / np.sqrt(var + 1e-5)
    xn = xn.reshape(N, C, H, W) * gamma[None, :, None, None] + beta[None, :, None, None]
    expected = xn.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_group_norm_ref_group_count():
    """G = max(1, C // 8): C=4 -> single group over all channels."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4)).astype(np.float32))
    gn = GroupNormRef()
    y, _ = gn.init_with_output(jax.random.PRNGKey(0), x)
    # single-group normalization over (H, W, C): global moments ~ (0, 1)
    y = np.asarray(y)
    assert abs(y.mean()) < 1e-4
    assert abs(y.std() - 1.0) < 1e-2


@pytest.mark.parametrize("mode,expect_c", [("normal", 32), ("lite", 16), ("ultralite", 8)])
def test_feature_tower_shapes(mode, expect_c):
    """UNetDS2GN: (B,H,W,3) -> (B,H/4,W/4,4*base) (reference: mvsnetworks.py:53-115)."""
    net = UNetDS2GN(network_mode=mode)
    x = jnp.zeros((1, 64, 96, 3))
    y, vars_ = net.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (1, 16, 24, expect_c)


def test_regnet_shape():
    net = RegNetUS0(network_mode="lite")
    x = jnp.zeros((1, 16, 16, 24, 16))
    y, vars_ = net.init_with_output(jax.random.PRNGKey(0), x, False)
    assert y.shape == (1, 16, 16, 24, 1)
    assert "batch_stats" in vars_


def test_gru_filter_sizes():
    assert gru_filter_sizes("normal") == (16, 4, 2)
    assert gru_filter_sizes("lite") == (8, 2, 1)


def test_conv_gru_cell():
    cell = ConvGRUCell(filters=4)
    x = jnp.ones((1, 8, 8, 6))
    h = jnp.zeros((1, 8, 8, 4))
    (y, h2), vars_ = cell.init_with_output(jax.random.PRNGKey(0), x, h)
    assert y.shape == (1, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(h2))
    assert np.abs(np.asarray(y)).max() <= 1.0 + 1e-5   # tanh-bounded blend of h=0 and y


def test_gru_regularizer_step():
    reg = GRURegularizer(network_mode="normal")
    states = GRURegularizer.init_states(1, 8, 8, "normal")
    x = jnp.ones((1, 8, 8, 32))
    (out, new_states), vars_ = reg.init_with_output(jax.random.PRNGKey(0), x, states)
    assert out.shape == (1, 8, 8, 1)
    assert [s.shape[-1] for s in new_states] == [16, 4, 2]


def _tiny_inputs(V=3, H=64, W=64, D=8):
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.standard_normal((1, V, H, W, 3)), jnp.float32)
    K = np.array([[15.0, 0, W / 8], [0, 15.0, H / 8], [0, 0, 1]])
    cam = np.zeros((2, 4, 4))
    cam[0] = np.eye(4)
    cam[1, :3, :3] = K
    cam[1, 3] = [5.0, 0.5, D, 5.0 + (D - 1) * 0.5]
    cams = jnp.asarray(np.stack([cam] * V))[None]
    return images, cams, jnp.array([5.0]), jnp.array([0.5])


def test_forward_3dcnn_bounds():
    cfg = ModelConfig(view_num=3, max_d=8, width=64, height=64,
                      network_mode="ultralite", compute_dtype="float32")
    model = MVSNet(cfg)
    images, cams, ds, di = _tiny_inputs(D=8)
    vars_ = model.init(jax.random.PRNGKey(0), images, cams, ds, di,
                       method=MVSNet.forward_3dcnn)
    depth, prob = model.apply(vars_, images, cams, ds, di, method=MVSNet.forward_3dcnn)
    assert depth.shape == (1, 16, 16, 1)
    assert prob.shape == (1, 16, 16, 1)
    d = np.asarray(depth)
    assert (d >= 5.0 - 1e-4).all() and (d <= 5.0 + 3.5 + 1e-4).all()
    p = np.asarray(prob)
    assert (p >= 0).all() and (p <= 1.0 + 1e-5).all()


def test_forward_gru_paths_share_params():
    cfg = ModelConfig(view_num=3, max_d=8, width=64, height=64,
                      network_mode="lite", regularization="GRU",
                      compute_dtype="float32")
    model = MVSNet(cfg)
    images, cams, ds, di = _tiny_inputs(D=8)
    v1 = model.init(jax.random.PRNGKey(0), images, cams, ds, di,
                    method=MVSNet.forward_prob_recurrent)
    # WTA must run with the *same* params (train ckpt -> decode)
    depth, prob = model.apply(v1, images, cams, ds, di, method=MVSNet.forward_gru_wta)
    assert depth.shape == (1, 16, 16, 1)
    pv = model.apply(v1, images, cams, ds, di, method=MVSNet.forward_prob_recurrent)
    assert pv.shape == (1, 8, 16, 16)
    np.testing.assert_allclose(np.asarray(jnp.sum(pv, axis=1)), 1.0, atol=1e-5)
    # WTA depth equals argmax of the softmax volume mapped to depth values
    wta_idx = np.argmax(np.asarray(pv), axis=1)
    expected_depth = 5.0 + wta_idx * 0.5
    np.testing.assert_allclose(np.asarray(depth)[..., 0], expected_depth, atol=1e-5)


def test_dim_constraint_raises():
    cfg = ModelConfig(view_num=3, max_d=12, width=64, height=64,
                      network_mode="ultralite", compute_dtype="float32")
    model = MVSNet(cfg)
    images, cams, ds, di = _tiny_inputs(D=12)
    with pytest.raises(ValueError, match="divisible by 8"):
        model.init(jax.random.PRNGKey(0), images, cams, ds, di,
                   method=MVSNet.forward_3dcnn)


def test_refinement_graph():
    cfg = ModelConfig(view_num=3, max_d=8, width=64, height=64,
                      network_mode="ultralite", compute_dtype="float32",
                      refinement=True, refine_with_confidence=True,
                      refinement_network="unet", upsample_before_refinement=True)
    model = MVSNet(cfg)
    images, cams, ds, di = _tiny_inputs(D=8)
    vars_ = model.init(jax.random.PRNGKey(0), images, cams, ds, di, training=False)
    depth, prob, refined, residual = model.apply(vars_, images, cams, ds, di, training=False)
    assert refined.shape == (1, 64, 64, 1)
    np.testing.assert_allclose(
        np.asarray(refined),
        np.asarray(residual) + np.asarray(jax.image.resize(depth, (1, 64, 64, 1), "bilinear")),
        rtol=1e-4, atol=1e-4)


def test_bf16_compute_path():
    """bf16 compute dtype: outputs still f32 and finite."""
    cfg = ModelConfig(view_num=3, max_d=8, width=64, height=64,
                      network_mode="ultralite", compute_dtype="bfloat16")
    model = MVSNet(cfg)
    images, cams, ds, di = _tiny_inputs(D=8)
    vars_ = model.init(jax.random.PRNGKey(0), images, cams, ds, di,
                       method=MVSNet.forward_3dcnn)
    depth, prob = model.apply(vars_, images, cams, ds, di, method=MVSNet.forward_3dcnn)
    assert depth.dtype == jnp.float32
    assert np.isfinite(np.asarray(depth)).all()
    # params stay f32
    leaves = jax.tree_util.tree_leaves(vars_["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_dsl_extras():
    """fc / pooling / dropout layer DSL parity (reference: network.py:417-517)."""
    from mvsnet_tpu.models.layers import Fc, avg_pool, l2_pool, max_pool
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    y, _ = Fc(num_out=16).init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (2, 16)
    assert (np.asarray(y) >= 0).all()   # relu default
    mp = max_pool(x)
    ap = avg_pool(x)
    lp = l2_pool(x)
    assert mp.shape == ap.shape == lp.shape == (2, 4, 4, 4)
    assert float(jnp.min(mp - ap)) >= -1e-6   # max >= mean per window
    np.testing.assert_allclose(
        np.asarray(l2_pool(jnp.ones_like(x))), 1.0, atol=1e-3)


@pytest.mark.parametrize("stride,cin,cout", [(1, 32, 8), (2, 32, 16),
                                             (1, 8, 1), (2, 16, 16)])
def test_wide_conv3d_matches_direct(stride, cin, cout):
    """The wide-N 3D conv lowering is the same math as nn.Conv (and shares
    its exact param tree, so checkpoints are interchangeable)."""
    from mvsnet_tpu.models.layers import Conv

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 24, cin)), jnp.float32)
    direct = Conv(cout, 3, stride, relu=False, use_bias=True,
                  wide_lowering=False)
    wide = Conv(cout, 3, stride, relu=False, use_bias=True,
                wide_lowering=True)
    variables = direct.init(jax.random.PRNGKey(0), x)
    # identical param tree: wide must apply direct's params unchanged
    a = direct.apply(variables, x)
    b = wide.apply(variables, x)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5)

    # gradients flow and match (the lowering is a reassociated sum)
    def loss(fn, v):
        return jnp.sum(jnp.square(fn.apply(v, x)))

    ga = jax.grad(lambda v: loss(direct, v))(variables)
    gb = jax.grad(lambda v: loss(wide, v))(variables)
    ka = ga["params"]["Conv_0"]["kernel"]
    kb = gb["params"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(ka), np.asarray(kb),
                               atol=2e-3, rtol=1e-4)


def test_regnet_pallas_lowering_params_interchange():
    """RegNetUS0 built on CPU (direct convs) evaluates identically with the
    Pallas conv dispatch forced on (interpret mode) — guards the
    name='Conv_0' param aliasing between the two branches."""
    import unittest.mock as mock

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 8, 16, 16, 8)), jnp.float32)
    net = RegNetUS0("ultralite")
    variables = net.init(jax.random.PRNGKey(0), x)
    a = net.apply(variables, x)
    with mock.patch("mvsnet_tpu.models.layers._pallas_conv3d_available",
                    return_value=True), \
         mock.patch("mvsnet_tpu.ops.pallas.conv3d._auto_interpret",
                    return_value=True):
        b = net.apply(variables, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5,
                               rtol=1e-5)


@pytest.mark.parametrize("cin,cout", [(16, 8), (32, 16), (8, 8)])
def test_wide_deconv3d_matches_direct(cin, cout):
    from mvsnet_tpu.models.layers import Deconv

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 12, cin)), jnp.float32)
    direct = Deconv(cout, 3, 2, relu=False, use_bias=True,
                    wide_lowering=False)
    wide = Deconv(cout, 3, 2, relu=False, use_bias=True, wide_lowering=True)
    variables = direct.init(jax.random.PRNGKey(0), x)
    a = direct.apply(variables, x)
    b = wide.apply(variables, x)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5)

    def loss(fn, v):
        return jnp.sum(jnp.square(fn.apply(v, x)))

    ga = jax.grad(lambda v: loss(direct, v))(variables)
    gb = jax.grad(lambda v: loss(wide, v))(variables)
    ka = ga["params"]["ConvTranspose_0"]["kernel"]
    kb = gb["params"]["ConvTranspose_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(ka), np.asarray(kb),
                               atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("k,s,cin,cout", [(3, 1, 3, 8), (3, 2, 3, 16),
                                          (5, 2, 3, 16), (3, 2, 5, 8)])
def test_im2col_conv2d_matches_xla(k, s, cin, cout):
    """The tiny-Cin im2col lowering must match lax conv SAME exactly."""
    from mvsnet_tpu.models.layers import _im2col_conv2d

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 14, 20, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1, jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(x, w, (s, s), "SAME",
                                       dimension_numbers=dn)
    got = _im2col_conv2d(x, w, (s, s))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("cls_name,cout,stride",
                         [("ConvBN", 8, 1), ("ConvBN", 16, 2),
                          ("DeconvBN", 8, 2)])
def test_bn_fold_matches_unfused(cls_name, cout, stride):
    """Eval-mode ConvBN/DeconvBN fold batch norm into the conv (per-channel
    affine + ReLU epilogue). The folded output must match the unfused
    conv -> BN -> ReLU math (reference: network.py:278-348) to bf16
    precision, including on the Pallas conv branch (interpret mode)."""
    import unittest.mock as mock

    from mvsnet_tpu.models.layers import Conv, ConvBN, Deconv, DeconvBN

    cls = {"ConvBN": ConvBN, "DeconvBN": DeconvBN}[cls_name]
    inner_cls = Conv if cls is ConvBN else Deconv
    sub = "conv" if cls is ConvBN else "deconv"
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 16, 32)), jnp.bfloat16)
    m = cls(cout, 3, stride, dtype="bfloat16")
    v = m.init(jax.random.PRNGKey(0), x, True)
    # non-trivial running stats so the fold actually does work
    v = jax.tree_util.tree_map(lambda a: a + 0.3 if a.ndim == 1 else a, v)

    def unfused_ref():
        inner = inner_cls(cout, 3, stride, relu=False, use_bias=False,
                          dtype="bfloat16")
        yc = inner.apply({"params": v["params"][sub]}, x)
        bs = v["batch_stats"]["bn"]["BatchNorm_0"]
        p = v["params"]["bn"]["BatchNorm_0"]
        y = ((yc.astype(jnp.float32) - bs["mean"])
             / jnp.sqrt(bs["var"] + 1e-5) * p["scale"] + p["bias"])
        return np.asarray(jnp.maximum(y, 0.0))

    ref = unfused_ref()
    got = np.asarray(m.apply(v, x, False), np.float32)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 6e-3

    # the Pallas branches fuse bias+ReLU in-kernel
    if cls is ConvBN:
        with mock.patch("mvsnet_tpu.models.layers._pallas_conv3d_available",
                        return_value=True), \
             mock.patch("mvsnet_tpu.ops.pallas.conv3d._auto_interpret",
                        return_value=True):
            got_p = np.asarray(m.apply(v, x, False), np.float32)
        assert np.abs(got_p - ref).max() / scale < 6e-3
    else:
        with mock.patch("mvsnet_tpu.models.layers._pallas_deconv3d_available",
                        return_value=True), \
             mock.patch("mvsnet_tpu.ops.pallas.deconv3d._auto_interpret",
                        return_value=True):
            got_p = np.asarray(m.apply(v, x, False), np.float32)
        assert np.abs(got_p - ref).max() / scale < 6e-3

    # training path unchanged: batch stats still update
    _, mut = m.apply(v, x, True, mutable=["batch_stats"])
    new_mean = mut["batch_stats"]["bn"]["BatchNorm_0"]["mean"]
    assert not np.allclose(np.asarray(new_mean),
                           np.asarray(v["batch_stats"]["bn"]["BatchNorm_0"]["mean"]))
