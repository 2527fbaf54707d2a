"""Checkpoint path conventions (reference: mvsnet/utils.py:75-95).

Checkpoints live at <model_dir>/<regularization>/<network_mode>/ — the same
directory layout as the reference, but each step is an orbax checkpoint
directory instead of a TF Saver file triplet. Remote (gs://, memory://, ...)
model dirs are supported like the reference's tf.file_io paths.
"""

from __future__ import annotations

import os

from mvsnet_tpu.io import filesystem as fs


def mkdir_p(path: str) -> None:
    fs.makedirs(path, exist_ok=True)


def ckpt_dir(base_dir: str, regularization: str, network_mode: str, build: bool = False) -> str:
    if fs.is_remote(base_dir):
        path = fs.join(base_dir, regularization, network_mode)
    else:
        path = os.path.join(base_dir, regularization, network_mode)
    if build:
        mkdir_p(path)
    return path
