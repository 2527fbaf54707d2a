"""Batch test-and-fuse over the canonical 7-Scenes test sessions
(parity: scripts/7scenes_test.py).

`python -m scripts.seven_scenes_test --data_root ../data/7scenes/test \
    --model_dir ... --ckpt_step ...`
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.test_and_fuse import main as taf_main  # noqa: E402

SEVEN_SCENES_SESSIONS = [
    "office_9_mvs_training",
    "fire_4_mvs_training",
    "redkitchen_14_mvs_training",
    "stairs_4_mvs_training",
    "chess_5_mvs_training",
    "heads_1_mvs_training",
    "pumpkin_7_mvs_training",
]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default="../data/7scenes/test")
    p.add_argument("--model_dir", default=None)
    p.add_argument("--ckpt_step", default=None)
    args, extra = p.parse_known_args(argv)

    rc = 0
    for session in SEVEN_SCENES_SESSIONS:
        folder = os.path.join(args.data_root, session)
        if not os.path.isdir(folder):
            print(f"skipping missing session {folder}")
            continue
        taf_args = ["--test_folder_root", folder]
        if args.model_dir:
            taf_args += ["--model_dir", args.model_dir]
        if args.ckpt_step:
            taf_args += ["--ckpt_step", str(args.ckpt_step)]
        rc |= taf_main(taf_args + extra)
    return rc


if __name__ == "__main__":
    sys.exit(main())
