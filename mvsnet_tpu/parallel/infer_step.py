"""Sharded inference over the device mesh.

Large-frame depth inference sharded across chips: batch over 'data',
features / cost volume over 'space' (+'depth' for the regularizer) via the
in-model constraints. The Pallas sweep kernels assume a chip-local full
feature map, so multi-chip forwards use the XLA warp (GSPMD partitions its
gathers with halo exchange); single-chip keeps the fused kernel.
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from mvsnet_tpu.config import ModelConfig
from mvsnet_tpu.models import MVSNet
from mvsnet_tpu.parallel import mesh as mesh_lib


def make_sharded_forward(model: MVSNet, cfg: ModelConfig, mesh: Mesh):
    """Returns forward(variables, images, cams, depth_start, depth_interval)
    jitted over `mesh`. Variables replicated; batch sharded over 'data'."""
    mesh_lib.set_active_mesh(mesh)
    repl = NamedSharding(mesh, PartitionSpec())
    data_sharded = NamedSharding(mesh, PartitionSpec("data"))

    if mesh.devices.size > 1 and cfg.use_pallas:
        cfg = dataclasses.replace(cfg, use_pallas=False)
        model = MVSNet(cfg)

    def forward(variables, images, cams, depth_start, depth_interval):
        return model.apply(variables, images, cams, depth_start,
                           depth_interval, training=False,
                           method=MVSNet.forward_3dcnn)

    return jax.jit(
        forward,
        in_shardings=(repl, data_sharded, data_sharded, data_sharded, data_sharded),
        out_shardings=data_sharded,
    )
