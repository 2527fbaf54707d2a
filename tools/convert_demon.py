"""DeMoN (DPSNet-formatted) -> mvs-training session converter.

`python tools/convert_demon.py <demon_root>`
(parity: datasets/convert/demon_to_mvs_training.py — each subdirectory is
converted in place: cams/poses -> cameras/*.json, *.npy depths -> uint16 mm
PNGs, *.jpg -> images/, all-covisible clusters).
"""

from __future__ import annotations

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))   # repo root (mvsnet_tpu)
sys.path.insert(0, _HERE)                    # tools/

import convert_utils as utils  # noqa: E402


def convert_demon(root: str) -> None:
    sessions = [f for f in utils.list_no_hidden(root)
                if os.path.isdir(os.path.join(root, f))]
    for i, s in enumerate(sessions):
        d = os.path.join(root, s)
        try:
            utils.cameras_from_demon(d)
            n, min_depth, max_depth = utils.depths_from_demon(d)
            utils.images_from_demon(d)
            utils.covisibility_from_demon(d, min_depth=min_depth, max_depth=max_depth)
        except Exception as e:
            print(f"Failed to convert {d}: {e}")
        if i % 50 == 0:
            print(f"Converted {i}/{len(sessions)} sessions")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("demon_root")
    args = p.parse_args()
    convert_demon(args.demon_root)
