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
