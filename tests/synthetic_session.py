"""Synthetic mvs-training session builder for tests and e2e drives.

Renders a textured fronto-parallel plane at a known depth seen by a small
ring of translated cameras, and writes it in the session format the data
plane consumes (reference format: mvs_cluster.py:63-127):
  images/<i>.jpg, cameras/<i>.json, depths/<i>.png, covisibility.json
World units are millimeters (depth PNGs are uint16 mm); camera.json pose
translations are meters (the loader multiplies by 1000).
"""

from __future__ import annotations

import json
import os

import cv2
import numpy as np


def _plane_homography(K, t_ref, t_src, depth):
    """H mapping ref pixel -> src pixel for the z=depth fronto plane,
    identity rotations, world->cam translation t (mm)."""
    c_ref = -np.asarray(t_ref, float)
    c_src = -np.asarray(t_src, float)
    c_rel = (c_src - c_ref).reshape(3, 1)
    n = np.array([[0.0, 0.0, 1.0]])
    middle = np.eye(3) - (c_rel @ n) / depth
    return K @ middle @ np.linalg.inv(K)


def make_session(root: str, width: int = 96, height: int = 96,
                 n_images: int = 5, plane_depth_mm: float = 2000.0,
                 min_depth: float = 1500.0, max_depth: float = 2500.0,
                 baseline_mm: float = 40.0, seed: int = 0,
                 with_depths: bool = True) -> str:
    """Create one session under `root`; returns the session dir."""
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "cameras"), exist_ok=True)
    os.makedirs(os.path.join(root, "depths"), exist_ok=True)

    rng = np.random.default_rng(seed)
    K = np.array([[width * 1.2, 0, width / 2.0],
                  [0, width * 1.2, height / 2.0],
                  [0, 0, 1.0]])

    # Smooth random texture so bilinear warps stay informative under JPEG.
    tex = rng.uniform(0, 255, (height, width, 3)).astype(np.float32)
    tex = cv2.GaussianBlur(tex, (0, 0), 2.0)
    tex = (255 * (tex - tex.min()) / (np.ptp(tex) + 1e-6)).astype(np.uint8)

    translations = []
    for i in range(n_images):
        # camera i is shifted along x/y (world->cam translation, mm)
        tx = baseline_mm * ((i % 3) - 1)
        ty = baseline_mm * ((i // 3) - 0.5)
        translations.append(np.array([tx, ty, 0.0]))

    covis = {}
    for i, t in enumerate(translations):
        H = _plane_homography(K, translations[0], t, plane_depth_mm)
        # src view: sample the ref texture at H^{-1} * src pixels
        img = cv2.warpPerspective(tex, np.linalg.inv(H).astype(np.float64),
                                  (width, height), flags=cv2.INTER_LINEAR)
        cv2.imwrite(os.path.join(root, "images", f"{i}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 97])

        pose = np.eye(4)
        pose[:3, 3] = t / 1000.0   # meters in camera.json
        cam_json = {
            "intrinsics": {"fx": K[0, 0], "fy": K[1, 1], "px": K[0, 2], "py": K[1, 2]},
            "pose": {"matrix": {f"{r},{c}": float(pose[r, c])
                                for r in range(4) for c in range(4)}},
        }
        with open(os.path.join(root, "cameras", f"{i}.json"), "w") as f:
            json.dump(cam_json, f)

        if with_depths:
            depth = np.full((height, width), plane_depth_mm, np.uint16)
            cv2.imwrite(os.path.join(root, "depths", f"{i}.png"), depth)

        views = [j for j in range(n_images) if j != i][:4]
        covis[str(i)] = {"views": views, "min_depth": min_depth, "max_depth": max_depth}

    with open(os.path.join(root, "covisibility.json"), "w") as f:
        json.dump(covis, f)
    return root


def make_dataset(root: str, n_sessions: int = 2, split: str = "train", **kw) -> str:
    """Create <root>/<split>/session_<k>/ sessions; returns <root>."""
    for k in range(n_sessions):
        make_session(os.path.join(root, split, f"session_{k}"), seed=k, **kw)
    return root
