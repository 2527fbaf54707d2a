"""Plane-sweep homography geometry.

TPU-first re-derivation of the reference homography builders
(reference: mvsnet/homography_warping.py:10-106). Everything is batched
matmul over (B, D) — no python loops, no dynamic shapes — so XLA maps it
onto the MXU in one shot.

Camera convention ("cam tensor", reference: mvs_cluster.py:91-111):
  cam[0]           : 4x4 world->camera extrinsic [R|t] (t in mm)
  cam[1][:3, :3]   : 3x3 intrinsic K
  cam[1][3]        : [depth_start, depth_interval, depth_num, depth_end]

The plane-sweep homography from reference (left) image to a source (right)
image at fronto-parallel depth d (measured along the ref optical axis):

  H(d) = K_r * R_r * (I - (c_rel * n0^T) / d) * R_l^T * K_l^{-1}

with n0 = third row of R_l (ref viewing direction in world coords) and
c_rel = c_r - c_l the relative camera centers (c = -R^T t).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_values(depth_start, depth_interval, depth_num: int, *, dtype=jnp.float32):
    """Linear depth hypotheses: start + i * interval, i in [0, D).

    Args:
      depth_start: () or (B,) starting depth.
      depth_interval: () or (B,) plane spacing (may be negative — flipped sweep).
      depth_num: static plane count D.
    Returns:
      (B, D) or (D,) depth values, matching input batching.
    """
    i = jnp.arange(depth_num, dtype=dtype)
    depth_start = jnp.asarray(depth_start, dtype)
    depth_interval = jnp.asarray(depth_interval, dtype)
    if depth_start.ndim == 0:
        return depth_start + i * depth_interval
    return depth_start[:, None] + i[None, :] * depth_interval[:, None]


def inv_depth_values(depth_start, depth_end, depth_num: int, *, dtype=jnp.float32):
    """Inverse-depth hypotheses: 1 / linspace(1/start, 1/end, D).

    (reference: homography_warping.py:74-77)
    """
    depth_start = jnp.asarray(depth_start, dtype)
    depth_end = jnp.asarray(depth_end, dtype)
    t = jnp.linspace(0.0, 1.0, depth_num, dtype=dtype)
    if depth_start.ndim == 0:
        inv = (1.0 / depth_start) * (1 - t) + (1.0 / depth_end) * t
        return 1.0 / inv
    inv = (1.0 / depth_start)[:, None] * (1 - t)[None, :] + (1.0 / depth_end)[:, None] * t[None, :]
    return 1.0 / inv


def _homographies_from_depths(left_cam, right_cam, depth):
    """Shared core: H for each (batch, depth) pair.

    Args:
      left_cam:  (B, 2, 4, 4) reference cam tensor.
      right_cam: (B, 2, 4, 4) source cam tensor.
      depth:     (B, D) fronto-parallel plane depths.
    Returns:
      (B, D, 3, 3) homographies mapping ref *image* coords (pixel center at
      +0.5) to source image coords.
    """
    dtype = depth.dtype
    R_l = left_cam[:, 0, :3, :3].astype(dtype)     # (B,3,3)
    R_r = right_cam[:, 0, :3, :3].astype(dtype)
    t_l = left_cam[:, 0, :3, 3:4].astype(dtype)    # (B,3,1)
    t_r = right_cam[:, 0, :3, 3:4].astype(dtype)
    K_l = left_cam[:, 1, :3, :3].astype(dtype)
    K_r = right_cam[:, 1, :3, :3].astype(dtype)

    K_l_inv = jnp.linalg.inv(K_l)
    R_l_T = jnp.swapaxes(R_l, -1, -2)

    # Camera centers in world coords; fronto direction = 3rd row of R_l
    # (reference: homography_warping.py:37-41).
    c_l = -R_l_T @ t_l                              # (B,3,1)
    c_r = -jnp.swapaxes(R_r, -1, -2) @ t_r
    c_rel = c_r - c_l                               # (B,3,1)
    fronto = R_l[:, 2:3, :]                         # (B,1,3)

    # rank-1 outer product, broadcast over depth:
    outer = c_rel @ fronto                          # (B,3,3)
    eye = jnp.eye(3, dtype=dtype)
    middle = eye[None, None] - outer[:, None] / depth[:, :, None, None]  # (B,D,3,3)

    left_part = (R_l_T @ K_l_inv)[:, None]          # (B,1,3,3)
    right_part = (K_r @ R_r)[:, None]               # (B,1,3,3)
    return right_part @ (middle @ left_part)        # (B,D,3,3)


def get_homographies(left_cam, right_cam, depth_num: int, depth_start, depth_interval):
    """Linear-depth plane-sweep homographies (reference: homography_warping.py:10-58).

    depth_start / depth_interval: (B,) per-batch scalars.
    Returns (B, D, 3, 3).
    """
    B = left_cam.shape[0]
    depth_start = jnp.broadcast_to(jnp.asarray(depth_start, jnp.float32), (B,))
    depth_interval = jnp.broadcast_to(jnp.asarray(depth_interval, jnp.float32), (B,))
    depth = depth_values(depth_start, depth_interval, depth_num)
    return _homographies_from_depths(left_cam, right_cam, depth)


def get_homographies_inv_depth(left_cam, right_cam, depth_num: int, depth_start, depth_end):
    """Inverse-depth-sampled homographies (reference: homography_warping.py:60-106).

    Unlike the reference (which collapses depth_start to a scalar and thus
    only supports B=1), depths here are computed per batch element.
    """
    B = left_cam.shape[0]
    depth_start = jnp.broadcast_to(jnp.asarray(depth_start, jnp.float32), (B,))
    depth_end = jnp.broadcast_to(jnp.asarray(depth_end, jnp.float32), (B,))
    depth = inv_depth_values(depth_start, depth_end, depth_num)
    return _homographies_from_depths(left_cam, right_cam, depth)


def homographies_for_views(cams, depth_num: int, depth_start, depth_interval=None,
                           depth_end=None, inverse_depth: bool = False):
    """All source-view homographies at once.

    Args:
      cams: (B, V, 2, 4, 4); view 0 is the reference.
    Returns:
      (V-1, B, D, 3, 3) homographies ref -> view v+1.
    """
    ref_cam = cams[:, 0]
    view_cams = jnp.moveaxis(cams[:, 1:], 1, 0)     # (V-1, B, 2, 4, 4)
    if inverse_depth:
        fn = lambda vc: get_homographies_inv_depth(ref_cam, vc, depth_num, depth_start, depth_end)
    else:
        fn = lambda vc: get_homographies(ref_cam, vc, depth_num, depth_start, depth_interval)
    return jax.vmap(fn)(view_cams)


def scale_camera(cam, scale: float):
    """Scale intrinsics for a resized image (reference: mvs_data_generation/utils.py:64-73)."""
    cam = jnp.asarray(cam)
    K = cam[..., 1, :3, :3]
    scale_mat = jnp.array([[scale, 1.0, scale], [1.0, scale, scale], [1.0, 1.0, 1.0]], cam.dtype)
    new_K = K * scale_mat[: K.shape[-2], : K.shape[-1]]
    return cam.at[..., 1, :3, :3].set(new_K)
