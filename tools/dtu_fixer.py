"""Fix converted DTU sessions: resize depths to 640x512 and apply the
1.171875 focal correction. `python tools/dtu_fixer.py <data_dir>`
(parity: datasets/tools/dtu_fixer.py).
"""

from __future__ import annotations

import argparse
import json
import os

import cv2

FOCAL_RESCALE = 1.171875


def fix_depths(data_dir: str) -> None:
    sessions = [f for f in os.listdir(data_dir)
                if not f.startswith(".") and not f.endswith(".txt")]
    n = 0
    for s in sessions:
        if "dtu_scan" not in s:
            continue
        sdir = os.path.join(data_dir, s)
        depths_dir = os.path.join(sdir, "depths")
        for name in os.listdir(depths_dir):
            path = os.path.join(depths_dir, name)
            img = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
            res = cv2.resize(img, dsize=(640, 512), interpolation=cv2.INTER_NEAREST)
            cv2.imwrite(path, res)
        cameras_dir = os.path.join(sdir, "cameras")
        for c in os.listdir(cameras_dir):
            path = os.path.join(cameras_dir, c)
            with open(path) as f:
                data = json.load(f)
            data["intrinsics"]["fx"] *= FOCAL_RESCALE
            data["intrinsics"]["fy"] *= FOCAL_RESCALE
            with open(path, "w") as f:
                json.dump(data, f)
        n += 1
        if n % 20 == 0:
            print(f"Fixed {n} sessions")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data_dir")
    args = p.parse_args()
    fix_depths(args.data_dir)
