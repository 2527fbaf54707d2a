"""Homography math vs closed-form / numpy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from mvsnet_tpu.ops import geometry


def make_cam(R, t, K, depth_start=1.0, depth_interval=0.1, depth_num=8):
    cam = np.zeros((2, 4, 4))
    cam[0, :3, :3] = R
    cam[0, :3, 3] = t
    cam[0, 3, 3] = 1.0
    cam[1, :3, :3] = K
    cam[1, 3] = [depth_start, depth_interval, depth_num,
                 depth_start + (depth_num - 1) * depth_interval]
    return cam


def rotation(axis, angle):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    a = np.cos(angle / 2)
    b, c, d = -axis * np.sin(angle / 2)
    return np.array([
        [a*a+b*b-c*c-d*d, 2*(b*c+a*d), 2*(b*d-a*c)],
        [2*(b*c-a*d), a*a+c*c-b*b-d*d, 2*(c*d+a*b)],
        [2*(b*d+a*c), 2*(c*d-a*b), a*a+d*d-b*b-c*c],
    ])


def np_homography(ref_cam, src_cam, d):
    """Direct numpy evaluation of the reference formula
    (homography_warping.py:37-56)."""
    R_l, t_l = ref_cam[0, :3, :3], ref_cam[0, :3, 3:4]
    R_r, t_r = src_cam[0, :3, :3], src_cam[0, :3, 3:4]
    K_l, K_r = ref_cam[1, :3, :3], src_cam[1, :3, :3]
    c_l = -R_l.T @ t_l
    c_r = -R_r.T @ t_r
    c_rel = c_r - c_l
    fronto = R_l[2:3, :]
    middle = np.eye(3) - (c_rel @ fronto) / d
    return K_r @ R_r @ middle @ R_l.T @ np.linalg.inv(K_l)


@pytest.fixture
def cams():
    K = np.array([[320.0, 0, 160], [0, 320.0, 120], [0, 0, 1]])
    ref = make_cam(np.eye(3), np.zeros(3), K, depth_start=500, depth_interval=10, depth_num=16)
    R = rotation([0, 1, 0], 0.05)
    t = np.array([-100.0, 20.0, 5.0])
    src = make_cam(R, t, K, depth_start=500, depth_interval=10, depth_num=16)
    return ref, src


def test_depth_values_linear():
    d = geometry.depth_values(np.array([2.0, 5.0]), np.array([0.5, 1.0]), 4)
    np.testing.assert_allclose(d, [[2.0, 2.5, 3.0, 3.5], [5, 6, 7, 8]])


def test_depth_values_flipped():
    """Negative interval = reversed sweep (GRU flip_cams,
    mvs_data_generation/utils.py:166-171)."""
    d = geometry.depth_values(np.array([5.0]), np.array([-1.0]), 4)
    np.testing.assert_allclose(d, [[5, 4, 3, 2]])


def test_inv_depth_values():
    d = geometry.inv_depth_values(np.array([1.0]), np.array([4.0]), 3)
    np.testing.assert_allclose(1.0 / d, [[1.0, 0.625, 0.25]], rtol=1e-6)


def test_homographies_match_closed_form(cams):
    ref, src = cams
    H = geometry.get_homographies(
        jnp.asarray(ref)[None], jnp.asarray(src)[None],
        depth_num=16, depth_start=np.array([500.0]), depth_interval=np.array([10.0]))
    assert H.shape == (1, 16, 3, 3)
    for i, d in enumerate([500.0, 510.0, 650.0]):
        idx = int((d - 500) / 10)
        expected = np_homography(ref, src, d)
        np.testing.assert_allclose(np.asarray(H)[0, idx], expected, rtol=2e-4, atol=2e-4)


def test_identity_homography_at_any_depth(cams):
    """ref == src -> H must be the identity for every depth."""
    ref, _ = cams
    H = geometry.get_homographies(
        jnp.asarray(ref)[None], jnp.asarray(ref)[None],
        depth_num=4, depth_start=np.array([500.0]), depth_interval=np.array([10.0]))
    np.testing.assert_allclose(np.asarray(H), np.broadcast_to(np.eye(3), (1, 4, 3, 3)), atol=1e-4)


def test_homography_maps_plane_points(cams):
    """A world point on the depth-d fronto plane must map ref->src pixel
    consistently with full projection."""
    ref, src = cams
    d = 600.0
    H = np_homography(ref, src, d)
    # take ref pixel (200, 130); backproject at depth d; project into src
    K = ref[1, :3, :3]
    pix = np.array([200.0, 130.0, 1.0])
    X_cam = np.linalg.inv(K) @ pix * d              # ref cam coords, z = d
    X_world = ref[0, :3, :3].T @ (X_cam - ref[0, :3, 3])
    x_src_h = src[1, :3, :3] @ (src[0, :3, :3] @ X_world + src[0, :3, 3])
    x_src = x_src_h[:2] / x_src_h[2]
    x_via_H = H @ pix
    np.testing.assert_allclose(x_via_H[:2] / x_via_H[2], x_src, rtol=1e-6)


def test_homographies_for_views(cams):
    ref, src = cams
    cams_arr = jnp.stack([jnp.asarray(ref), jnp.asarray(src), jnp.asarray(src)])[None]
    H = geometry.homographies_for_views(
        cams_arr, depth_num=8, depth_start=np.array([500.0]), depth_interval=np.array([10.0]))
    assert H.shape == (2, 1, 8, 3, 3)
    np.testing.assert_allclose(np.asarray(H[0]), np.asarray(H[1]), atol=1e-6)


def test_inverse_depth_homographies(cams):
    ref, src = cams
    H = geometry.get_homographies_inv_depth(
        jnp.asarray(ref)[None], jnp.asarray(src)[None],
        depth_num=8, depth_start=np.array([500.0]), depth_end=np.array([1000.0]))
    depths = geometry.inv_depth_values(np.array([500.0]), np.array([1000.0]), 8)
    expected = np_homography(ref, src, float(depths[0, 3]))
    np.testing.assert_allclose(np.asarray(H)[0, 3], expected, rtol=2e-4, atol=2e-4)


def test_scale_camera():
    K = np.array([[320.0, 0, 160], [0, 240.0, 120], [0, 0, 1]])
    cam = make_cam(np.eye(3), np.zeros(3), K)
    scaled = np.asarray(geometry.scale_camera(jnp.asarray(cam), 0.25))
    assert scaled[1, 0, 0] == pytest.approx(80.0)
    assert scaled[1, 1, 1] == pytest.approx(60.0)
    assert scaled[1, 0, 2] == pytest.approx(40.0)
    assert scaled[1, 1, 2] == pytest.approx(30.0)
    assert scaled[1, 2, 2] == pytest.approx(1.0)
    np.testing.assert_allclose(scaled[0], cam[0])
    np.testing.assert_allclose(scaled[1, 3], cam[1, 3])
