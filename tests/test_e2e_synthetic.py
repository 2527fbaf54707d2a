"""End-to-end physics check: the plane-sweep pipeline must recover the
depth of a synthetic textured plane (exact homography for a plane)."""

import numpy as np
import jax.numpy as jnp

from mvsnet_tpu.ops import homographies_for_views, plane_sweep_cost_volume, homography_warp


import pytest


@pytest.mark.parametrize("true_plane", [4, 16, 27])
def test_plane_sweep_recovers_any_plane_depth(true_plane):
    """Argmin lands on (or next to) the correct plane across the sweep.

    Baseline is sized so adjacent planes differ by >=0.3 px of disparity
    even at the far end; +-1 plane tolerance absorbs the double-resampling
    bias of the synthetic render (the source view is itself produced by a
    bilinear warp).
    """
    rng = np.random.default_rng(true_plane)
    H, W, C = 48, 64, 8
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    D, start, interval = 32, 6.0, 0.25

    def cam(t):
        c = np.zeros((2, 4, 4))
        c[0, :3, :3] = np.eye(3)
        c[0, :3, 3] = t
        c[0, 3, 3] = 1
        c[1, :3, :3] = K
        c[1, 3] = [start, interval, D, start + (D - 1) * interval]
        return c

    ref, src = cam(np.zeros(3)), cam(np.array([-4.0, 1.2, 0.0]))
    tex = rng.standard_normal((H, W, C)).astype(np.float32)
    cams = jnp.asarray(np.stack([ref, src]))[None]
    homs = homographies_for_views(cams, D, np.array([start]), np.array([interval]))
    src_img = homography_warp(jnp.asarray(tex)[None],
                              jnp.linalg.inv(homs[0, 0, true_plane])[None])[0]
    cv = plane_sweep_cost_volume(
        jnp.asarray(tex)[None], jnp.asarray(src_img)[None, None], homs)
    per_plane = np.asarray(cv)[0, :, 12:-12, 12:-12, :].mean(axis=(1, 2, 3))
    assert abs(int(np.argmin(per_plane)) - true_plane) <= 1


def test_plane_sweep_recovers_plane_depth():
    rng = np.random.default_rng(0)
    H, W, C = 48, 64, 8
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])

    def cam(R, t, start, interval, D):
        c = np.zeros((2, 4, 4))
        c[0, :3, :3] = R
        c[0, :3, 3] = t
        c[0, 3, 3] = 1
        c[1, :3, :3] = K
        c[1, 3] = [start, interval, D, start + (D - 1) * interval]
        return c

    D, start, interval = 32, 6.0, 0.25      # plane 16 <=> depth 10.0
    ref = cam(np.eye(3), np.zeros(3), start, interval, D)
    src = cam(np.eye(3), np.array([-1.0, 0.0, 0.0]), start, interval, D)

    tex = rng.standard_normal((H, W, C)).astype(np.float32)
    cams = jnp.asarray(np.stack([ref, src]))[None]
    homs = homographies_for_views(cams, D, np.array([start]), np.array([interval]))

    # Render the source view of the textured plane by warping the reference
    # texture with the inverse of the true-plane homography.
    H_true = homs[0, 0, 16]
    src_img = homography_warp(jnp.asarray(tex)[None], jnp.linalg.inv(H_true)[None])[0]

    cv = plane_sweep_cost_volume(
        jnp.asarray(tex)[None], jnp.asarray(src_img)[None, None], homs, depth_chunk=8)
    per_plane = np.asarray(cv)[0, :, 8:-8, 8:-8, :].mean(axis=(1, 2, 3))

    best = int(np.argmin(per_plane))
    assert best == 16, f"expected plane 16 (depth 10.0), got {best}"
    # cost at the true plane is near zero and much lower than elsewhere
    assert per_plane[16] < 1e-3
    assert per_plane[16] < 0.1 * np.median(per_plane)
