"""Golden parity against INDEPENDENT numpy transcriptions of the
reference formulas (VERDICT r1 missing #1 / next #5b).

Each helper here is transcribed directly from the cited reference lines
with plain numpy loops — NOT from the framework code — so a bug shared by
the framework and its own regenerated golden files cannot hide. Everything
runs at f32 on tiny shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


# --------------------------------------------------------------------------
# numpy transcriptions of the reference math
# --------------------------------------------------------------------------

def np_conv2d_same(x, kernel, stride=1):
    """tf.layers.conv2d(padding='same'), NHWC, no bias
    (reference: cnn_wrapper/network.py:203-205). TF SAME: pad so
    out = ceil(in/stride), extra pad goes on the bottom/right."""
    N, H, W, Cin = x.shape
    kh, kw, _, Cout = kernel.shape
    out_h = -(-H // stride)
    out_w = -(-W // stride)
    pad_h = max((out_h - 1) * stride + kh - H, 0)
    pad_w = max((out_w - 1) * stride + kw - W, 0)
    top, left = pad_h // 2, pad_w // 2
    xp = np.zeros((N, H + pad_h, W + pad_w, Cin), x.dtype)
    xp[:, top:top + H, left:left + W] = x
    out = np.zeros((N, out_h, out_w, Cout), np.float32)
    for i in range(out_h):
        for j in range(out_w):
            patch = xp[:, i * stride:i * stride + kh, j * stride:j * stride + kw, :]
            out[:, i, j, :] = np.tensordot(patch, kernel, axes=([1, 2, 3], [0, 1, 2]))
    return out


def np_group_norm(x, gamma, beta, group_channel=8, eps=1e-5):
    """Reference conv_gn normalization (network.py:239-276): NCHW transpose,
    G = max(1, C // group_channel), reshape (N, G, C//G, H, W), moments over
    (channel-in-group, H, W), per-channel affine."""
    N, H, W, C = x.shape
    G = max(1, C // group_channel)
    xt = np.transpose(x, (0, 3, 1, 2)).reshape(N, G, C // G, H, W)
    mean = xt.mean(axis=(2, 3, 4), keepdims=True)
    var = xt.var(axis=(2, 3, 4), keepdims=True)
    xt = (xt - mean) / np.sqrt(var + eps)
    out = xt.reshape(N, C, H, W) * gamma.reshape(1, C, 1, 1) + beta.reshape(1, C, 1, 1)
    return np.transpose(out, (0, 2, 3, 1))


def np_conv_gn(x, kernel, gamma, beta, stride=1):
    """conv (no bias) -> GN -> relu (network.py:217-276)."""
    return np.maximum(np_group_norm(np_conv2d_same(x, kernel, stride), gamma, beta), 0.0)


def np_homographies(left_cam, right_cam, depths):
    """H(d) = K_r R_r (I - c_rel . n_fronto / d) R_l^T K_l^-1
    (reference: homography_warping.py:10-58)."""
    R_l, R_r = left_cam[0, :3, :3], right_cam[0, :3, :3]
    t_l, t_r = left_cam[0, :3, 3:4], right_cam[0, :3, 3:4]
    K_l, K_r = left_cam[1, :3, :3], right_cam[1, :3, :3]
    c_l = -R_l.T @ t_l
    c_r = -R_r.T @ t_r
    c_rel = c_r - c_l
    fronto = R_l[2:3, :]                      # principal axis of the ref cam
    homs = []
    for d in depths:
        middle = np.eye(3) - (c_rel @ fronto) / d
        homs.append(K_r @ R_r @ middle @ R_l.T @ np.linalg.inv(K_l))
    return np.stack(homs)


def np_warp_zero_fill(img, hom):
    """tf.contrib.image.transform parity: evaluate H at image coords
    (pixel center +0.5), bilinear sample, out-of-image taps contribute 0
    (reference: homography_warping.py:211-253)."""
    H, W, C = img.shape
    out = np.zeros((H, W, C), np.float32)
    for y in range(H):
        for x in range(W):
            u, v, w = hom @ np.array([x + 0.5, y + 0.5, 1.0])
            sx, sy = u / w - 0.5, v / w - 0.5
            x0, y0 = int(np.floor(sx)), int(np.floor(sy))
            fx, fy = sx - x0, sy - y0
            acc = np.zeros(C, np.float32)
            for (yi, xi, wgt) in ((y0, x0, (1 - fy) * (1 - fx)),
                                  (y0, x0 + 1, (1 - fy) * fx),
                                  (y0 + 1, x0, fy * (1 - fx)),
                                  (y0 + 1, x0 + 1, fy * fx)):
                if 0 <= yi < H and 0 <= xi < W:
                    acc += wgt * img[yi, xi]
            out[y, x] = acc
    return out


def np_variance_cost(ref, warped_views):
    """cost = E[f^2] - E[f]^2 across views, reference included
    (reference: model.py:314-334)."""
    stack = np.stack([ref] + list(warped_views))
    return (stack ** 2).mean(axis=0) - stack.mean(axis=0) ** 2


def np_soft_argmin(cost, depth_start, depth_interval):
    """softmax over -cost along D, expectation over the linspace depths
    (reference: model.py:336-366)."""
    D = cost.shape[0]
    e = np.exp(-cost - (-cost).max(axis=0, keepdims=True))
    prob = e / e.sum(axis=0, keepdims=True)
    depths = depth_start + depth_interval * np.arange(D)
    return (prob * depths[:, None, None]).sum(axis=0), prob


def np_probability_map(prob, depth_map, depth_start, depth_interval):
    """Sum of the 4 depth bins nearest the regressed depth
    (reference: model.py:45-144,368-371)."""
    D = prob.shape[0]
    d = (depth_map - depth_start) / depth_interval
    out = np.zeros_like(depth_map)
    for y in range(depth_map.shape[0]):
        for x in range(depth_map.shape[1]):
            i = int(np.floor(d[y, x]))
            for b in (i - 1, i, i + 1, i + 2):
                if 0 <= b < D:
                    out[y, x] += prob[b, y, x]
    return out


# --------------------------------------------------------------------------
# parity gates
# --------------------------------------------------------------------------

def test_conv_gn_matches_reference_formula():
    from mvsnet_tpu.models.layers import ConvGN
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 10, 16)).astype(np.float32)
    m = ConvGN(24, 3, 2, dtype="float32")
    variables = m.init(jax.random.PRNGKey(0), x)
    kernel = np.asarray(variables["params"]["conv"]["Conv_0"]["kernel"])
    gamma = rng.standard_normal(24).astype(np.float32)
    beta = rng.standard_normal(24).astype(np.float32)
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    variables = {"params": {"conv": variables["params"]["conv"],
                            "gn": {"scale": jnp.asarray(gamma),
                                   "bias": jnp.asarray(beta)}}}
    got = np.asarray(m.apply(variables, x))
    want = np_conv_gn(x, kernel, gamma, beta, stride=2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_group_norm_grouping_matches_reference():
    """Channel c normalizes with group c // (C//G) — the NCHW reshape
    semantics of network.py:246-253, not contiguous-after-transpose."""
    from mvsnet_tpu.models.layers import group_norm_core
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 6, 32)).astype(np.float32)
    gamma = np.ones(32, np.float32)
    beta = np.zeros(32, np.float32)
    got = np.asarray(group_norm_core(jnp.asarray(x), jnp.asarray(gamma),
                                     jnp.asarray(beta), num_groups=4, eps=1e-5))
    want = np_group_norm(x, gamma, beta, group_channel=8)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_homographies_match_reference_formula():
    from mvsnet_tpu.ops.geometry import get_homographies
    rng = np.random.default_rng(2)
    def make_cam(seed):
        r = np.random.default_rng(seed)
        theta = r.uniform(-0.2, 0.2)
        c, s = np.cos(theta), np.sin(theta)
        cam = np.zeros((2, 4, 4), np.float32)
        cam[0] = np.eye(4)
        cam[0, :3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
        cam[0, :3, 3] = r.uniform(-50, 50, 3)
        cam[1, :3, :3] = [[100, 0, 32], [0, 100, 24], [0, 0, 1]]
        return cam
    left, right = make_cam(3), make_cam(4)
    depth_start, depth_interval, D = 400.0, 2.0, 5
    got = np.asarray(get_homographies(left[None], right[None], D,
                                      np.array([depth_start]),
                                      np.array([depth_interval])))[0]
    depths = depth_start + depth_interval * np.arange(D)
    want = np_homographies(left, right, depths)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_warp_and_variance_cost_match_reference_formula():
    from mvsnet_tpu.ops.warp import homography_warp
    rng = np.random.default_rng(5)
    H, W, C = 8, 10, 3
    img = rng.standard_normal((H, W, C)).astype(np.float32)
    hom = np.array([[0.97, -0.05, 1.2], [0.04, 1.01, -0.8],
                    [1e-4, -5e-5, 1.0]], np.float32)
    got = np.asarray(homography_warp(img[None], hom[None]))[0]
    want = np_warp_zero_fill(img, hom)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    ref = rng.standard_normal((H, W, C)).astype(np.float32)
    np.testing.assert_allclose(
        np_variance_cost(ref, [got]),
        np.stack([ref, got]).var(axis=0), atol=1e-6)


def test_soft_argmin_and_prob_map_match_reference_formula():
    from mvsnet_tpu.ops.depth import soft_argmin, probability_map
    rng = np.random.default_rng(6)
    D, H, W = 12, 5, 7
    cost = rng.standard_normal((1, D, H, W)).astype(np.float32)
    ds, di = 400.0, 2.5
    depth, prob_vol = soft_argmin(cost, np.array([ds]), np.array([di]), D)
    want_depth, want_prob = np_soft_argmin(cost[0], ds, di)
    np.testing.assert_allclose(np.asarray(depth)[0, ..., 0], want_depth,
                               atol=2e-4, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(prob_vol)[0], want_prob,
                               atol=2e-6, rtol=2e-5)

    pmap = probability_map(prob_vol, depth, np.array([ds]), np.array([di]))
    want_pmap = np_probability_map(want_prob, want_depth, ds, di)
    np.testing.assert_allclose(np.asarray(pmap)[0, ..., 0], want_pmap,
                               atol=2e-5, rtol=2e-5)


# --------------------------------------------------------------------------
# realistic-shape END-TO-END parity (VERDICT r2 next #5a)
# --------------------------------------------------------------------------
# Vectorized (tap-loop) transcriptions of the same reference formulas as
# above — needed to run the FULL 3D-CNN graph at 320x256xD32 in test time.
# The tap-loop formulation is still independent of the framework's
# lowering (XLA conv_general / Pallas row kernels): each SAME-pad tap is
# enumerated explicitly.

def np_conv_same_taps(x, kernel, stride=1):
    """TF SAME conv, channel-last, any spatial rank (tap loop)."""
    spatial = x.shape[1:-1]
    ks = kernel.shape[:-2]
    outs = tuple(-(-s // stride) for s in spatial)
    pads = tuple(max((o - 1) * stride + k - s, 0)
                 for s, o, k in zip(spatial, outs, ks))
    los = tuple(p // 2 for p in pads)
    xp = np.zeros((x.shape[0],) + tuple(s + p for s, p in zip(spatial, pads))
                  + (x.shape[-1],), np.float32)
    xp[(slice(None),) + tuple(slice(lo, lo + s) for lo, s in zip(los, spatial))] = x
    out = np.zeros((x.shape[0],) + outs + (kernel.shape[-1],), np.float32)
    for tap in np.ndindex(*ks):
        sl = (slice(None),) + tuple(
            slice(d, d + o * stride, stride) for d, o in zip(tap, outs))
        out += xp[sl] @ kernel[tap]
    return out


def np_deconv_same_s2_taps(x, kernel):
    """Stride-2 SAME transposed conv, channel-last, any spatial rank:
    out[2i+d] += x[i] @ kf[d] with kf the spatially flipped kernel (flax
    ConvTranspose stores kernels pre-flipped relative to TF
    conv2d_transpose; tf_import owns the storage flip — the math here is
    the reference deconv, network.py:350-409)."""
    ks = kernel.shape[:-2]
    kernel = kernel[(slice(None, None, -1),) * len(ks)]
    spatial = x.shape[1:-1]
    outs = tuple(2 * s for s in spatial)
    out = np.zeros((x.shape[0],) + tuple(o + k for o, k in zip(outs, ks))
                   + (kernel.shape[-1],), np.float32)
    for tap in np.ndindex(*ks):
        sl = (slice(None),) + tuple(
            slice(d, d + o, 2) for d, o in zip(tap, outs))
        out[sl] += x @ kernel[tap]
    return out[(slice(None),) + tuple(slice(0, o) for o in outs)]


def np_group_norm_nd(x, gamma, beta, group_channel=8, eps=1e-5):
    """np_group_norm generalized to any spatial rank."""
    C = x.shape[-1]
    spatial = x.shape[1:-1]
    G = max(1, C // group_channel)
    xt = np.moveaxis(x, -1, 1).reshape(x.shape[0], G, C // G, *spatial)
    ax = tuple(range(2, xt.ndim))
    mean = xt.mean(axis=ax, keepdims=True)
    var = xt.var(axis=ax, keepdims=True)
    xt = (xt - mean) / np.sqrt(var + eps)
    out = xt.reshape(x.shape[0], C, *spatial)
    shape = (1, C) + (1,) * len(spatial)
    return np.moveaxis(out * gamma.reshape(shape) + beta.reshape(shape), 1, -1)


def _np_convgn(params, name, x, stride=1):
    k = np.asarray(params[name]["conv"]["Conv_0"]["kernel"], np.float32)
    y = np_group_norm_nd(np_conv_same_taps(x, k, stride),
                         np.asarray(params[name]["gn"]["scale"], np.float32),
                         np.asarray(params[name]["gn"]["bias"], np.float32))
    return np.maximum(y, 0.0)


def _np_deconvgn(params, name, x):
    # reference deconv_gn applies NO relu (network.py:350-409)
    k = np.asarray(params[name]["deconv"]["ConvTranspose_0"]["kernel"],
                   np.float32)
    return np_group_norm_nd(
        np_deconv_same_s2_taps(x, k),
        np.asarray(params[name]["gn"]["scale"], np.float32),
        np.asarray(params[name]["gn"]["bias"], np.float32))


def _np_bn_eval(y, params, stats, name, eps=1e-5):
    bn_p, bn_s = params[name]["bn"], stats[name]["bn"]
    sub = next(iter(bn_s))
    return ((y - np.asarray(bn_s[sub]["mean"]))
            / np.sqrt(np.asarray(bn_s[sub]["var"]) + eps)
            * np.asarray(bn_p[sub]["scale"])
            + np.asarray(bn_p[sub]["bias"]))


def _np_convbn(params, stats, name, x, stride=1):
    k = np.asarray(params[name]["conv"]["Conv_0"]["kernel"], np.float32)
    return np.maximum(
        _np_bn_eval(np_conv_same_taps(x, k, stride), params, stats, name), 0.0)


def _np_deconvbn(params, stats, name, x):
    k = np.asarray(params[name]["deconv"]["ConvTranspose_0"]["kernel"],
                   np.float32)
    return np.maximum(
        _np_bn_eval(np_deconv_same_s2_taps(x, k), params, stats, name), 0.0)


def _np_bare_conv(params, name, x):
    return np_conv_same_taps(
        x, np.asarray(params[name]["Conv_0"]["kernel"], np.float32))


def np_unetds2gn(params, x):
    """UNetDS2GN transcription (reference mvsnetworks.py:53-115)."""
    cg = lambda n, xx, s=1: _np_convgn(params, n, xx, s)
    dg = lambda n, xx: _np_deconvgn(params, n, xx)
    c1_0 = cg("2dconv1_0", x, 2)
    c2_0 = cg("2dconv2_0", c1_0, 2)
    c3_0 = cg("2dconv3_0", c2_0, 2)
    c4_0 = cg("2dconv4_0", c3_0, 2)
    c0_2 = cg("2dconv0_2", cg("2dconv0_1", x))
    c1_2 = cg("2dconv1_2", cg("2dconv1_1", c1_0))
    c2_2 = cg("2dconv2_2", cg("2dconv2_1", c2_0))
    c3_2 = cg("2dconv3_2", cg("2dconv3_1", c3_0))
    c4_2 = cg("2dconv4_2", cg("2dconv4_1", c4_0))
    c5_2 = cg("2dconv5_2", cg("2dconv5_1", np.concatenate(
        [dg("2dconv5_0", c4_2), c3_2], -1)))
    c6_2 = cg("2dconv6_2", cg("2dconv6_1", np.concatenate(
        [dg("2dconv6_0", c5_2), c2_2], -1)))
    c7_2 = cg("2dconv7_2", cg("2dconv7_1", np.concatenate(
        [dg("2dconv7_0", c6_2), c1_2], -1)))
    c8_1 = cg("2dconv8_1", np.concatenate(
        [dg("2dconv8_0", c7_2), c0_2], -1))
    c8_2 = cg("2dconv8_2", c8_1)
    c9_2 = cg("conv9_2", cg("conv9_1", cg("conv9_0", c8_2, 2)))
    c10_1 = cg("conv10_1", cg("conv10_0", c9_2, 2))
    return _np_bare_conv(params, "conv10_2", c10_1)


def np_regnetus0(params, stats, cost):
    """RegNetUS0 transcription (reference mvsnetworks.py:122-158)."""
    cb = lambda n, xx, s=1: _np_convbn(params, stats, n, xx, s)
    db = lambda n, xx: _np_deconvbn(params, stats, n, xx)
    c1_0 = cb("3dconv1_0", cost, 2)
    c2_0 = cb("3dconv2_0", c1_0, 2)
    c3_0 = cb("3dconv3_0", c2_0, 2)
    c0_1 = cb("3dconv0_1", cost)
    c1_1 = cb("3dconv1_1", c1_0)
    c2_1 = cb("3dconv2_1", c2_0)
    c3_1 = cb("3dconv3_1", c3_0)
    c4_0 = db("3dconv4_0", c3_1)
    c5_0 = db("3dconv5_0", c4_0 + c2_1)
    c6_0 = db("3dconv6_0", c5_0 + c1_1)
    return _np_bare_conv(params, "3dconv6_2", c6_0 + c0_1)


def np_warp_zero_fill_vec(img, hom):
    """Vectorized np_warp_zero_fill (same formula, array form)."""
    H, W, C = img.shape
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pts = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], 0).reshape(3, -1)
    uvw = hom @ pts
    sx = uvw[0] / uvw[2] - 0.5
    sy = uvw[1] / uvw[2] - 0.5
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx, fy = (sx - x0).astype(np.float32), (sy - y0).astype(np.float32)
    out = np.zeros((H * W, C), np.float32)
    for (yi, xi, wgt) in ((y0, x0, (1 - fy) * (1 - fx)),
                          (y0, x0 + 1, (1 - fy) * fx),
                          (y0 + 1, x0, fy * (1 - fx)),
                          (y0 + 1, x0 + 1, fy * fx)):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc, xc = np.clip(yi, 0, H - 1), np.clip(xi, 0, W - 1)
        out += (wgt * valid)[:, None] * img[yc, xc]
    return out.reshape(H, W, C)


def np_forward_3dcnn(variables, images, cams, depth_start, depth_interval,
                     max_d):
    """Full 3D-CNN graph transcription (reference model.py:257-372):
    feature towers -> per-depth homography warp -> variance cost ->
    RegNetUS0 -> soft-argmin -> 4-bin prob map."""
    params = variables["params"]
    stats = variables["batch_stats"]
    B, V = images.shape[:2]
    assert B == 1
    feats = [np_unetds2gn(params["feature_net"], images[0, v:v + 1])
             for v in range(V)]
    ref = feats[0][0]
    depths = depth_start + depth_interval * np.arange(max_d)
    warped = []
    for v in range(1, V):
        homs = np_homographies(cams[0, 0], cams[0, v], depths)
        warped.append(np.stack(
            [np_warp_zero_fill_vec(feats[v][0], h) for h in homs]))
    stack = np.stack([np.broadcast_to(ref, warped[0].shape)] + warped)
    cost = (stack ** 2).mean(axis=0) - stack.mean(axis=0) ** 2
    reg = np_regnetus0(params["regnet"], stats["regnet"], cost[None])[0, ..., 0]
    e = np.exp(-reg - (-reg).max(axis=0, keepdims=True))
    prob = e / e.sum(axis=0, keepdims=True)
    depth_map = (prob * depths[:, None, None]).sum(axis=0)
    d = (depth_map - depth_start) / depth_interval
    i = np.floor(d).astype(np.int64)
    pmap = np.zeros_like(depth_map)
    for off in (-1, 0, 1, 2):
        b = i + off
        valid = (b >= 0) & (b < max_d)
        bc = np.clip(b, 0, max_d - 1)
        pmap += np.where(valid, np.take_along_axis(prob, bc[None], 0)[0], 0.0)
    return depth_map, pmap


# --------------------------------------------------------------------------
# GRU / R-MVSNet transcription (VERDICT r3 next #3)
# --------------------------------------------------------------------------
# Independent numpy transcriptions of inference_prob_recurrent and
# inference_winner_take_all (reference model.py:505-751) with the
# ConvGRUCell of convgru.py:82-121 and its group_norm fallbacks
# (convgru.py:9-52). At the reference GRU filter counts (16/4/2 with
# group_channel=16) every norm takes the G == 1 branch =
# tf.contrib.layers.layer_norm: moments over every non-batch axis,
# per-channel affine.


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_layer_norm(x, gamma, beta, eps=1e-12):
    """convgru.py:29-31 (G == 1 fallback)."""
    ax = tuple(range(1, x.ndim))
    mean = x.mean(axis=ax, keepdims=True)
    var = x.var(axis=ax, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * gamma + beta


def _np_gru_cell(p, x, h):
    """ConvGRUCell (convgru.py:82-121): gates = conv2d(concat(x, h), 2F)
    + bias -> split (reset first) -> norm -> sigmoid; candidate =
    tanh(norm(conv2d(concat(x, r*h), F) + bias)); h' = u*h + (1-u)*y."""
    kg = np.asarray(p["gates_conv"]["Conv_0"]["kernel"], np.float32)
    bg = np.asarray(p["gates_conv"]["Conv_0"]["bias"], np.float32)
    gates = np_conv_same_taps(np.concatenate([x, h], -1), kg) + bg
    r, u = np.split(gates, 2, axis=-1)
    r = _np_sigmoid(np_layer_norm(
        r, np.asarray(p["reset_norm"]["scale"], np.float32),
        np.asarray(p["reset_norm"]["bias"], np.float32)))
    u = _np_sigmoid(np_layer_norm(
        u, np.asarray(p["update_norm"]["scale"], np.float32),
        np.asarray(p["update_norm"]["bias"], np.float32)))
    ko = np.asarray(p["output_conv"]["Conv_0"]["kernel"], np.float32)
    bo = np.asarray(p["output_conv"]["Conv_0"]["bias"], np.float32)
    y = np.tanh(np_layer_norm(
        np_conv_same_taps(np.concatenate([x, r * h], -1), ko) + bo,
        np.asarray(p["output_norm"]["scale"], np.float32),
        np.asarray(p["output_norm"]["bias"], np.float32)))
    return u * h + (1 - u) * y


def np_gru_regs(variables, images, cams, depth_start, depth_interval,
                max_d):
    """Per-depth regularized costs of the GRU sweep (model.py:565-596):
    feature towers -> per-plane warp + variance cost -> 3-cell GRU on
    -cost -> 1-channel prob_conv (with bias)."""
    params = variables["params"]
    gp = params["gru_sweep"]["gru"]
    B, V = images.shape[:2]
    assert B == 1
    feats = [np_unetds2gn(params["feature_net"], images[0, v:v + 1])
             for v in range(V)]
    ref = feats[0]
    h_, w_, C = ref.shape[1:]
    depths = depth_start + depth_interval * np.arange(max_d)
    homs = [np_homographies(cams[0, 0], cams[0, v], depths)
            for v in range(1, V)]
    f1, f2, f3 = 16, 4, 2                 # normal mode (model.py:540-544)
    s1 = np.zeros((1, h_, w_, f1), np.float32)
    s2 = np.zeros((1, h_, w_, f2), np.float32)
    s3 = np.zeros((1, h_, w_, f3), np.float32)
    kp = np.asarray(gp["prob_conv"]["Conv_0"]["kernel"], np.float32)
    bp = np.asarray(gp["prob_conv"]["Conv_0"]["bias"], np.float32)
    regs = []
    for d in range(max_d):
        warped = [np_warp_zero_fill_vec(feats[v + 1][0], homs[v][d])[None]
                  for v in range(V - 1)]
        stack = np.stack([ref] + warped)
        cost = (stack ** 2).mean(axis=0) - stack.mean(axis=0) ** 2
        s1 = _np_gru_cell(gp["conv_gru1"], -cost, s1)
        s2 = _np_gru_cell(gp["conv_gru2"], s1, s2)
        s3 = _np_gru_cell(gp["conv_gru3"], s2, s3)
        regs.append(np_conv_same_taps(s3, kp) + bp)   # (1, h, w, 1)
    return np.stack([r[0, ..., 0] for r in regs])     # (D, h, w)


def np_prob_recurrent(variables, images, cams, ds, di, max_d):
    """Softmax probability volume over depth (model.py:596-599)."""
    regs = np_gru_regs(variables, images, cams, ds, di, max_d)
    e = np.exp(regs - regs.max(axis=0, keepdims=True))
    return e / e.sum(axis=0, keepdims=True)


def np_gru_wta(variables, images, cams, ds, di, max_d):
    """Winner-take-all decode (model.py:676-751): prob = exp(reg);
    running per-pixel argmax over planes; prob map =
    max_prob / (sum exp + 1e-7)."""
    regs = np_gru_regs(variables, images, cams, ds, di, max_d)
    prob = np.exp(regs)
    depths = ds + di * np.arange(max_d)
    max_prob = np.zeros_like(prob[0])
    depth_image = np.zeros_like(prob[0])
    exp_sum = np.zeros_like(prob[0])
    for d in range(max_d):
        upd = (max_prob < prob[d]).astype(np.float32)
        max_prob = upd * prob[d] + (1 - upd) * max_prob
        depth_image = upd * depths[d] + (1 - upd) * depth_image
        exp_sum += prob[d]
    return depth_image, max_prob / (exp_sum + 1e-7)


def _gru_test_inputs(H, W, D, V):
    rng = np.random.default_rng(11)
    images = rng.standard_normal((1, V, H, W, 3)).astype(np.float32)
    f = W * 1.2
    ds_, di_ = 425.0, 2.5
    cams = np.zeros((1, V, 2, 4, 4), np.float32)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    for v in range(V):
        yaw = np.deg2rad(3.0) * v
        cy, sy = np.cos(yaw), np.sin(yaw)
        E = np.eye(4)
        E[:3, :3] = [[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]]
        E[0, 3] = 50.0 * v
        cams[0, v, 0] = E
        cams[0, v, 1, :3, :3] = K
        cams[0, v, 1, 3] = [ds_, di_, D, ds_ + (D - 1) * di_]
    cams_s = cams.copy()
    cams_s[:, :, 1, :3, :3] *= 0.25
    cams_s[:, :, 1, 2, 2] = 1.0
    return images, cams_s


@pytest.mark.parametrize("cw", [False, True])
def test_gru_wta_matches_reference_transcription(cw, monkeypatch):
    """forward_gru_wta (and the underlying GRU sweep) vs the independent
    numpy transcription of model.py:601-751, CW pipeline off AND on."""
    from mvsnet_tpu.config import ModelConfig
    from mvsnet_tpu.models import MVSNet

    monkeypatch.setenv("MVSNET_TPU_CW", "1" if cw else "0")
    H, W, D, V = 64, 96, 8, 3
    cfg = ModelConfig(view_num=V, max_d=D, width=W, height=H,
                      network_mode="normal", regularization="GRU",
                      compute_dtype="float32")
    model = MVSNet(cfg)
    images, cams_s = _gru_test_inputs(H, W, D, V)
    dsb = cams_s[:, 0, 1, 3, 0]
    dib = cams_s[:, 0, 1, 3, 1]
    variables = model.init(jax.random.PRNGKey(0), images, cams_s, dsb, dib,
                           method=MVSNet.forward_gru_wta)
    got_d, got_p = model.apply(variables, images, cams_s, dsb, dib,
                               method=MVSNet.forward_gru_wta)
    want_d, want_p = np_gru_wta(jax.tree.map(np.asarray, variables),
                                images, cams_s, float(dsb[0]),
                                float(dib[0]), D)
    np.testing.assert_allclose(np.asarray(got_d)[0, ..., 0], want_d,
                               atol=1e-2, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_p)[0, ..., 0], want_p,
                               atol=1e-4, rtol=1e-3)


def test_prob_recurrent_matches_reference_transcription():
    """forward_prob_recurrent (the R-MVSNet training graph, incl. the
    custom-VJP warp's forward) vs the numpy transcription of
    model.py:505-599."""
    from mvsnet_tpu.config import ModelConfig
    from mvsnet_tpu.models import MVSNet

    H, W, D, V = 64, 96, 8, 3
    cfg = ModelConfig(view_num=V, max_d=D, width=W, height=H,
                      network_mode="normal", regularization="GRU",
                      compute_dtype="float32")
    model = MVSNet(cfg)
    images, cams_s = _gru_test_inputs(H, W, D, V)
    dsb = cams_s[:, 0, 1, 3, 0]
    dib = cams_s[:, 0, 1, 3, 1]
    variables = model.init(jax.random.PRNGKey(0), images, cams_s, dsb, dib,
                           method=MVSNet.forward_prob_recurrent)
    got = model.apply(variables, images, cams_s, dsb, dib,
                      method=MVSNet.forward_prob_recurrent)
    want = np_prob_recurrent(jax.tree.map(np.asarray, variables),
                             images, cams_s, float(dsb[0]), float(dib[0]), D)
    np.testing.assert_allclose(np.asarray(got)[0], want,
                               atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("cw", [False, True])
def test_e2e_realistic_shape_matches_reference_transcription(cw, monkeypatch):
    """320x256xD32 normal-mode f32 forward vs the independent numpy
    transcription, CW layout pipeline off AND on (VERDICT r2 #5a): a
    kernel-numerics regression at real shapes — e.g. in the CW backward/
    layout contract — fails here, not just at the golden tiny shapes."""
    from mvsnet_tpu.config import ModelConfig
    from mvsnet_tpu.models import MVSNet

    if cw:
        monkeypatch.setenv("MVSNET_TPU_CW", "1")
    else:
        monkeypatch.setenv("MVSNET_TPU_CW", "0")

    H, W, D, V = 256, 320, 32, 3
    cfg = ModelConfig(view_num=V, max_d=D, width=W, height=H,
                      network_mode="normal", compute_dtype="float32",
                      depth_chunk=32)
    model = MVSNet(cfg)
    rng = np.random.default_rng(0)
    images = rng.standard_normal((1, V, H, W, 3)).astype(np.float32)

    f = W * 1.2
    ds_, di_ = 425.0, 2.5
    cams = np.zeros((1, V, 2, 4, 4), np.float32)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    for v in range(V):
        yaw = np.deg2rad(3.0) * v
        cy, sy = np.cos(yaw), np.sin(yaw)
        E = np.eye(4)
        E[:3, :3] = [[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]]
        E[0, 3] = 50.0 * v
        cams[0, v, 0] = E
        cams[0, v, 1, :3, :3] = K
        cams[0, v, 1, 3] = [ds_, di_, D, ds_ + (D - 1) * di_]
    cams_s = cams.copy()
    cams_s[:, :, 1, :3, :3] *= 0.25
    cams_s[:, :, 1, 2, 2] = 1.0
    dsb = cams_s[:, 0, 1, 3, 0]
    dib = cams_s[:, 0, 1, 3, 1]

    variables = model.init(jax.random.PRNGKey(0), images, cams_s, dsb, dib,
                           training=False, method=MVSNet.forward_3dcnn)
    got_d, got_p = model.apply(variables, images, cams_s, dsb, dib,
                               training=False, method=MVSNet.forward_3dcnn)
    want_d, want_p = np_forward_3dcnn(
        jax.tree.map(np.asarray, variables), images, cams_s,
        float(dsb[0]), float(dib[0]), D)
    # depth in scene units (~425-500); 1e-2 abs = ~4e-5 of the range
    np.testing.assert_allclose(np.asarray(got_d)[0, ..., 0], want_d,
                               atol=1e-2, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_p)[0, ..., 0], want_p,
                               atol=1e-4, rtol=1e-3)
