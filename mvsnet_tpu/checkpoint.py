"""Checkpoint save/restore via orbax.

Replaces tf.train.Saver (reference: train.py:366-371,446; utils.py:75-95)
with orbax checkpoints laid out the same way:
  <model_dir>/<regularization>/<network_mode>/<step>/
`max_to_keep=None` semantics (keep everything) are preserved by default.

Remote model dirs (gs://, s3://, memory://, ...) work like the reference's
tf.file_io paths (reference: predictlib.py:69-76, README.md:43-49): orbax
writes to a local staging directory which is mirrored through fsspec —
uniform across schemes, including ones orbax/epath cannot mount natively.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Optional

import orbax.checkpoint as ocp

from mvsnet_tpu.io import filesystem as fs
from mvsnet_tpu.utils.paths import ckpt_dir


def _manager(path: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
    return ocp.CheckpointManager(os.path.abspath(path), options=options)


def _remote_steps(path: str):
    if not fs.isdir(path):
        return []
    steps = []
    for name in fs.listdir(path):
        try:
            steps.append(int(name))
        except ValueError:
            continue
    return sorted(steps)


def save_checkpoint(base_dir: str, regularization: str, network_mode: str,
                    step: int, state: Any) -> str:
    path = ckpt_dir(base_dir, regularization, network_mode, build=True)
    if fs.is_remote(path):
        with tempfile.TemporaryDirectory() as tmp:
            mgr = _manager(tmp)
            mgr.save(step, args=ocp.args.StandardSave(state))
            mgr.wait_until_finished()
            mgr.close()
            fs.upload_tree(os.path.join(tmp, str(step)),
                           fs.join(path, str(step)))
        return fs.join(path, str(step))
    mgr = _manager(path)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()
    return os.path.join(path, str(step))


def latest_step(base_dir: str, regularization: str, network_mode: str) -> Optional[int]:
    path = ckpt_dir(base_dir, regularization, network_mode)
    if fs.is_remote(path):
        steps = _remote_steps(path)
        return steps[-1] if steps else None
    if not os.path.isdir(path):
        return None
    mgr = _manager(path)
    step = mgr.latest_step()
    mgr.close()
    return step


def _restore(path: str, step: Optional[int], args_fn):
    """Shared restore body; args_fn(step) -> orbax restore args or None."""
    if fs.is_remote(path):
        if step is None:
            steps = _remote_steps(path)
            if not steps:
                raise FileNotFoundError(f"no checkpoints under {path}")
            step = steps[-1]
        with tempfile.TemporaryDirectory() as tmp:
            fs.download_tree(fs.join(path, str(step)),
                             os.path.join(tmp, str(step)))
            mgr = _manager(tmp)
            restored = mgr.restore(step, args=args_fn(step))
            mgr.close()
            return restored
    mgr = _manager(path)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoints under {path}")
    restored = mgr.restore(step, args=args_fn(step))
    mgr.close()
    return restored


def restore_tree(base_dir: str, regularization: str, network_mode: str,
                 step: Optional[int] = None) -> Any:
    """Template-free restore: returns the raw checkpoint pytree (nested
    dicts of arrays). Used by inference, which only needs params/batch_stats
    and must not depend on the optimizer structure the trainer used."""
    path = ckpt_dir(base_dir, regularization, network_mode)
    return _restore(path, step, lambda s: None)


def restore_checkpoint(base_dir: str, regularization: str, network_mode: str,
                       state_template: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure of `state_template` (a pytree with the
    right shapes/dtypes, e.g. a freshly initialized TrainState)."""
    path = ckpt_dir(base_dir, regularization, network_mode)
    return _restore(path, step,
                    lambda s: ocp.args.StandardRestore(state_template))
