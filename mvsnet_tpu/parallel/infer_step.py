"""Sharded inference over the device mesh.

Large-frame depth inference sharded across chips: batch over 'data',
features / cost volume over 'space' (+'depth' for the regularizer) via the
in-model constraints. The plane sweep keeps the fused Pallas kernel on
multi-chip meshes via the shard_map'ed variant (output rows over 'space',
planes over 'depth', source maps all-gathered over ICI —
ops/pallas/sweep.py:pallas_sweep_cost_volume_sharded); shapes the sharded
kernel can't take fall back to the XLA gather warp with a logged warning
(ops/cost_volume.py).
"""

from __future__ import annotations

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

    def forward(variables, images, cams, depth_start, depth_interval):
        return model.apply(variables, images, cams, depth_start,
                           depth_interval, training=False,
                           method=MVSNet.forward_3dcnn)

    return jax.jit(
        forward,
        in_shardings=(repl, data_sharded, data_sharded, data_sharded, data_sharded),
        out_shardings=data_sharded,
    )
