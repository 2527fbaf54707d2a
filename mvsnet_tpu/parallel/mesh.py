"""Device mesh construction and in-model sharding constraints."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec

AXES = ("data", "depth", "space")

# Module-level active mesh: model code calls constrain() without threading a
# mesh handle through every function; the train-step builder installs it.
_ACTIVE_MESH: Optional[Mesh] = None


def factorize_devices(n: int) -> Tuple[int, int, int]:
    """Split n devices over (data, depth, space), preferring data, then depth.

    Powers of two factor cleanly (8 -> (2, 2, 2)); odd counts degrade to
    pure data parallelism on the residual factor.
    """
    def largest_pow2(x):
        p = 1
        while x % 2 == 0 and x > 1:
            x //= 2
            p *= 2
        return p

    p2 = largest_pow2(n)
    rest = n // p2
    # distribute the power-of-two part round-robin data -> depth -> space
    dims = [1, 1, 1]
    i = 0
    while p2 > 1:
        dims[i % 3] *= 2
        p2 //= 2
        i += 1
    dims[0] *= rest
    return tuple(dims)


def make_mesh(n_devices: Optional[int] = None,
              shape: Optional[Tuple[int, int, int]] = None,
              devices=None) -> Mesh:
    """Build a ('data', 'depth', 'space') mesh over the local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = factorize_devices(n_devices)
    assert int(np.prod(shape)) == n_devices, (shape, n_devices)
    dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(dev_array, AXES)


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


class shard_local:
    """Trace-time context: inside a shard_map body each shard is a
    single-device program — constrain() must no-op and the Pallas/CW
    dispatches (which refuse naked pallas_calls under a >1-device mesh)
    must see no active mesh. Restores the previous mesh on exit."""

    def __enter__(self):
        global _ACTIVE_MESH
        self._saved = _ACTIVE_MESH
        _ACTIVE_MESH = None
        return self

    def __exit__(self, exc_type, exc, tb):
        global _ACTIVE_MESH
        _ACTIVE_MESH = self._saved
        return False


def constrain(x, *axis_names):
    """with_sharding_constraint(x, P(*axis_names)) against the active mesh.

    Axis entries are mesh-axis names or None; an axis is silently dropped
    when the corresponding array dimension doesn't divide the mesh axis
    size (GSPMD prefers even shards for conv halo exchange).
    No-op when no mesh is active (single chip / tests).
    """
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    spec_axes = []
    for dim, name in enumerate(axis_names):
        if name is None or name not in mesh.axis_names:
            spec_axes.append(None)
            continue
        size = mesh.shape[name]
        if size > 1 and x.shape[dim] % size == 0:
            spec_axes.append(name)
        else:
            spec_axes.append(None)
    while len(spec_axes) < x.ndim:
        spec_axes.append(None)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, PartitionSpec(*spec_axes)))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batched host arrays: leading batch dim over 'data'."""
    return NamedSharding(mesh, PartitionSpec("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
