"""Checkpoint path conventions (reference: mvsnet/utils.py:75-95).

Checkpoints live at <model_dir>/<regularization>/<network_mode>/ — the same
directory layout as the reference, but each step is an orbax checkpoint
directory instead of a TF Saver file triplet.
"""

from __future__ import annotations

import os


def mkdir_p(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def ckpt_dir(base_dir: str, regularization: str, network_mode: str, build: bool = False) -> str:
    path = os.path.join(base_dir, regularization, network_mode)
    if build:
        mkdir_p(path)
    return path
