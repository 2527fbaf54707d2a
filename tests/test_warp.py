"""Warp op vs numpy bilinear reference; cost volume vs direct computation."""

import numpy as np
import jax.numpy as jnp

from mvsnet_tpu.ops import warp, cost_volume


def np_bilinear_zero_fill(image, x, y):
    """Numpy model of tf.contrib.image.transform BILINEAR semantics:
    4-tap blend, out-of-image taps contribute 0."""
    H, W, C = image.shape
    out = np.zeros((len(x), C), np.float64)
    for i, (xi, yi) in enumerate(zip(x, y)):
        x0, y0 = int(np.floor(xi)), int(np.floor(yi))
        fx, fy = xi - x0, yi - y0
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < H and 0 <= xx < W:
                    out[i] += wy * wx * image[yy, xx]
    return out


def np_homography_warp(image, Hm):
    H_, W_, C = image.shape
    xs, ys = np.meshgrid(np.arange(W_) + 0.5, np.arange(H_) + 0.5)
    pts = np.stack([xs.ravel(), ys.ravel(), np.ones(H_ * W_)], axis=0)
    uvw = Hm @ pts
    x = uvw[0] / uvw[2] - 0.5
    y = uvw[1] / uvw[2] - 0.5
    return np_bilinear_zero_fill(image, x, y).reshape(H_, W_, C)


def test_identity_warp_is_noop():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 12, 16, 3)).astype(np.float32)
    out = warp.homography_warp(jnp.asarray(img), jnp.eye(3)[None])
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)


def test_integer_translation():
    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 8, 10, 2)).astype(np.float32)
    # H maps output pixel -> input pixel: shift sampling by +2 in x
    Hm = np.array([[1, 0, 2], [0, 1, 0], [0, 0, 1]], np.float32)
    out = np.asarray(warp.homography_warp(jnp.asarray(img), jnp.asarray(Hm)[None]))
    np.testing.assert_allclose(out[0, :, :-2], img[0, :, 2:], atol=1e-5)
    np.testing.assert_allclose(out[0, :, -2:], 0.0, atol=1e-6)  # zero fill


def test_projective_warp_matches_numpy():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((6, 7, 2)).astype(np.float32)
    Hm = np.array([
        [0.95, 0.03, 0.4],
        [-0.02, 1.05, -0.3],
        [1e-4, -2e-4, 1.0],
    ], np.float32)
    expected = np_homography_warp(img.astype(np.float64), Hm.astype(np.float64))
    got = np.asarray(warp.homography_warp(jnp.asarray(img)[None], jnp.asarray(Hm)[None]))[0]
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_edge_fill_mode_clamps():
    img = np.arange(12, dtype=np.float32).reshape(1, 3, 4, 1)
    Hm = np.array([[1, 0, 100], [0, 1, 0], [0, 0, 1]], np.float32)  # far right
    out = np.asarray(warp.homography_warp(jnp.asarray(img), jnp.asarray(Hm)[None], fill_mode="edge"))
    np.testing.assert_allclose(out[0, :, :, 0], np.broadcast_to(img[0, :, 3:4, 0], (3, 4)))


def test_warp_gradients_flow():
    import jax
    img = jnp.ones((1, 6, 6, 1))
    Hm = jnp.eye(3)[None] * 1.0

    def f(im):
        return jnp.sum(warp.homography_warp(im, Hm) ** 2)

    g = jax.grad(f)(img)
    assert np.isfinite(np.asarray(g)).all()


def test_cost_volume_matches_direct():
    """Scanned chunked builder == direct per-depth variance computation."""
    rng = np.random.default_rng(3)
    B, H, W, C, D, V = 2, 6, 8, 4, 5, 3
    ref = rng.standard_normal((B, H, W, C)).astype(np.float32)
    views = rng.standard_normal((V - 1, B, H, W, C)).astype(np.float32)
    homs = np.tile(np.eye(3, dtype=np.float32), (V - 1, B, D, 1, 1))
    # small perturbations, keep well-conditioned
    homs[..., 0, 2] = rng.uniform(-1, 1, size=(V - 1, B, D))
    homs[..., 1, 2] = rng.uniform(-1, 1, size=(V - 1, B, D))

    cv = np.asarray(cost_volume.plane_sweep_cost_volume(
        jnp.asarray(ref), jnp.asarray(views), jnp.asarray(homs), depth_chunk=2))
    assert cv.shape == (B, D, H, W, C)

    # direct: for each depth, warp each view, accumulate
    for d in range(D):
        s = ref.copy()
        s2 = ref ** 2
        for v in range(V - 1):
            w = np.asarray(warp.homography_warp(jnp.asarray(views[v]), jnp.asarray(homs[v, :, d])))
            s = s + w
            s2 = s2 + w ** 2
        expected = s2 / V - (s / V) ** 2
        np.testing.assert_allclose(cv[:, d], expected, rtol=1e-4, atol=1e-5)


def test_cost_volume_zero_for_identical_views():
    """All views identical + identity homographies -> variance == 0."""
    rng = np.random.default_rng(4)
    B, H, W, C, D = 1, 4, 4, 2, 3
    ref = rng.standard_normal((B, H, W, C)).astype(np.float32)
    views = np.stack([ref, ref])
    homs = np.tile(np.eye(3, dtype=np.float32), (2, B, D, 1, 1))
    cv = np.asarray(cost_volume.plane_sweep_cost_volume(
        jnp.asarray(ref), jnp.asarray(views), jnp.asarray(homs)))
    np.testing.assert_allclose(cv, 0.0, atol=1e-5)


def test_cost_slice_matches_volume():
    rng = np.random.default_rng(5)
    B, H, W, C, D = 1, 5, 6, 3, 4
    ref = rng.standard_normal((B, H, W, C)).astype(np.float32)
    views = rng.standard_normal((2, B, H, W, C)).astype(np.float32)
    homs = np.tile(np.eye(3, dtype=np.float32), (2, B, D, 1, 1))
    homs[..., 0, 2] = rng.uniform(-0.5, 0.5, size=(2, B, D))
    full = np.asarray(cost_volume.plane_sweep_cost_volume(
        jnp.asarray(ref), jnp.asarray(views), jnp.asarray(homs)))
    sl = np.asarray(cost_volume.cost_slice(
        jnp.asarray(ref), jnp.asarray(views), jnp.asarray(homs[:, :, 2])))
    np.testing.assert_allclose(sl, full[:, 2], rtol=1e-5, atol=1e-6)
