"""Host-side image/camera/depth transforms (pure numpy + cv2).

Parity with reference mvs_data_generation/utils.py: per-image mean/var
normalization, camera scaling, crop-to-multiple with principal-point shift,
depth masking, GRU cam flipping.
"""

from __future__ import annotations

import math

import cv2
import numpy as np


def center_image(img):
    """Per-image, per-channel mean/var normalization
    (reference: mvs_data_generation/utils.py:33-38)."""
    img = img.astype(np.float32)
    var = np.var(img, axis=(0, 1), keepdims=True)
    mean = np.mean(img, axis=(0, 1), keepdims=True)
    return (img - mean) / (np.sqrt(var) + 1e-8)


def center_images(images):
    return [center_image(im) for im in images]


def scale_camera(cam, scale: float = 1.0):
    """Scale fx, fy, px, py (reference: utils.py:64-73)."""
    new_cam = np.copy(cam)
    new_cam[1][0][0] = cam[1][0][0] * scale
    new_cam[1][1][1] = cam[1][1][1] * scale
    new_cam[1][0][2] = cam[1][0][2] * scale
    new_cam[1][1][2] = cam[1][1][2] * scale
    return new_cam


def scale_image(image, scale: float = 1.0, interpolation: str = "linear"):
    """cv2 resize (reference: utils.py:83-88)."""
    interp = cv2.INTER_LINEAR if interpolation == "linear" else cv2.INTER_NEAREST
    return cv2.resize(image, None, fx=scale, fy=scale, interpolation=interp)


def scale_mvs_input(images, cams, depth_image=None, scale: float = 1.0):
    """Scale every view's image + intrinsics (reference: utils.py:107-118)."""
    images = [scale_image(im, scale=scale) for im in images]
    cams = [scale_camera(c, scale=scale) for c in cams]
    if depth_image is None:
        return images, cams
    depth_image = scale_image(depth_image, scale=scale, interpolation="nearest")
    return images, cams, depth_image


def crop_mvs_input(images, cams, width: int, height: int, base_image_size: int,
                   depth_image=None):
    """Center-crop to <= (width, height) and to a multiple of
    base_image_size, shifting the principal point (reference: utils.py:121-153)."""
    images = list(images)
    cams = [np.copy(c) for c in cams]
    start_h = start_w = finish_h = finish_w = 0
    for view in range(len(images)):
        h, w = images[view].shape[0:2]
        new_h = height if h > height else int(math.ceil(h / base_image_size) * base_image_size)
        new_w = width if w > width else int(math.ceil(w / base_image_size) * base_image_size)
        start_h = int(math.ceil((h - new_h) / 2))
        start_w = int(math.ceil((w - new_w) / 2))
        finish_h = start_h + new_h
        finish_w = start_w + new_w
        images[view] = images[view][start_h:finish_h, start_w:finish_w]
        cams[view][1][0][2] -= start_w
        cams[view][1][1][2] -= start_h

    if depth_image is not None:
        depth_image = depth_image[start_h:finish_h, start_w:finish_w]
        return images, cams, depth_image
    return images, cams


def mask_depth_image(depth_image, min_depth: float, max_depth: float):
    """Zero out-of-range depths, add channel dim (reference: utils.py:156-163)."""
    depth = np.asarray(depth_image).astype(np.float32)
    # cv2.THRESH_TOZERO / THRESH_TOZERO_INV boundary semantics:
    # keep min < d <= max, zero the rest.
    depth = np.where(depth <= min_depth, 0.0, depth)
    depth = np.where(depth > max_depth, 0.0, depth)
    if depth.ndim == 2:
        depth = depth[..., None]
    return depth


def scale_and_reshape_depth(depth_image, output_scale: float):
    """(reference: utils.py:91-99)"""
    depth = scale_image(np.copy(depth_image), scale=output_scale, interpolation="nearest")
    return depth.reshape(depth.shape[0], depth.shape[1], 1)


def reshape_depth(depth):
    return np.asarray(depth).reshape(depth.shape[0], depth.shape[1], 1)


def flip_cams(cams, depth_num: int):
    """Reverse the depth sweep for R-MVSNet bidirectional training
    (reference: utils.py:166-171): start += (D-1)*interval; interval *= -1.
    Applied to the reference cam (index 0)."""
    cams = np.copy(cams)
    cams[0][1, 3, 0] = cams[0][1, 3, 0] + (depth_num - 1) * cams[0][1, 3, 1]
    cams[0][1, 3, 1] = -cams[0][1, 3, 1]
    return cams
