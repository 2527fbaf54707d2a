"""Checkpoint save/restore via orbax.

Replaces tf.train.Saver (reference: train.py:366-371,446; utils.py:75-95)
with orbax checkpoints laid out the same way:
  <model_dir>/<regularization>/<network_mode>/<step>/
`max_to_keep=None` semantics (keep everything) are preserved by default.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

from mvsnet_tpu.utils.paths import ckpt_dir


def _manager(path: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
    return ocp.CheckpointManager(os.path.abspath(path), options=options)


def save_checkpoint(base_dir: str, regularization: str, network_mode: str,
                    step: int, state: Any) -> str:
    path = ckpt_dir(base_dir, regularization, network_mode, build=True)
    mgr = _manager(path)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()
    return os.path.join(path, str(step))


def latest_step(base_dir: str, regularization: str, network_mode: str) -> Optional[int]:
    path = ckpt_dir(base_dir, regularization, network_mode)
    if not os.path.isdir(path):
        return None
    mgr = _manager(path)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_tree(base_dir: str, regularization: str, network_mode: str,
                 step: Optional[int] = None) -> Any:
    """Template-free restore: returns the raw checkpoint pytree (nested
    dicts of arrays). Used by inference, which only needs params/batch_stats
    and must not depend on the optimizer structure the trainer used."""
    path = ckpt_dir(base_dir, regularization, network_mode)
    mgr = _manager(path)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoints under {path}")
    restored = mgr.restore(step)
    mgr.close()
    return restored


def restore_checkpoint(base_dir: str, regularization: str, network_mode: str,
                       state_template: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure of `state_template` (a pytree with the
    right shapes/dtypes, e.g. a freshly initialized TrainState)."""
    path = ckpt_dir(base_dir, regularization, network_mode)
    mgr = _manager(path)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoints under {path}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore(state_template))
    mgr.close()
    return restored
