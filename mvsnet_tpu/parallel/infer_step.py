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
    jitted over `mesh`. Variables replicated; batch sharded over 'data'.

    Two regimes, chosen statically per traced batch size:

    * **Throughput serving** (B divisible by the device count): the whole
      single-device forward runs per shard under `shard_map` — every
      Pallas kernel and the CW layout chain engage exactly as on one
      chip, with ZERO collectives (embarrassingly parallel over maps).
      This is the production serving mode: linear scaling at full
      single-chip kernel speed.
    * **Latency mode** (B=1 or non-divisible): GSPMD shards the one
      cost volume / U-Net over 'depth' x 'space' via the in-model
      constraints (XLA convs + the shard_map'ed sharded cost kernel) —
      slower per map than the Pallas pipeline but splits a single map's
      latency across chips.
    """
    mesh_lib.set_active_mesh(mesh)
    repl = NamedSharding(mesh, PartitionSpec())
    data_sharded = NamedSharding(mesh, PartitionSpec("data"))
    n = mesh.devices.size
    all_axes = tuple(mesh.axis_names)
    batch_spec = PartitionSpec(all_axes)

    def local_forward(variables, images, cams, depth_start, depth_interval):
        with mesh_lib.shard_local():
            depth_map, prob_map = model.apply(
                variables, images, cams, depth_start, depth_interval,
                training=False, method=MVSNet.forward_3dcnn)
            if cfg.refinement:
                # per-map refinement rides the same shard (no collectives)
                stereo = (images[:, 1] if (cfg.refine_with_stereo
                                           and images.shape[1] > 1) else None)
                refined, _ = model.apply(
                    variables, depth_map, images[:, 0], prob_map, depth_start,
                    depth_interval, stereo_image=stereo, training=False,
                    method=MVSNet.refine)
                return refined, prob_map
            return depth_map, prob_map

    def forward(variables, images, cams, depth_start, depth_interval):
        B = images.shape[0]
        if n > 1 and B % n == 0:
            xs = (images, cams, depth_start, depth_interval)
            xs = tuple(jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, batch_spec)) for x in xs)
            return jax.shard_map(
                local_forward, mesh=mesh,
                in_specs=(PartitionSpec(),) + (batch_spec,) * 4,
                out_specs=batch_spec, check_vma=False,
            )(variables, *xs)
        depth_map, prob_map = model.apply(
            variables, images, cams, depth_start, depth_interval,
            training=False, method=MVSNet.forward_3dcnn)
        if cfg.refinement:
            stereo = (images[:, 1] if (cfg.refine_with_stereo
                                       and images.shape[1] > 1) else None)
            refined, _ = model.apply(
                variables, depth_map, images[:, 0], prob_map, depth_start,
                depth_interval, stereo_image=stereo, training=False,
                method=MVSNet.refine)
            return refined, prob_map
        return depth_map, prob_map

    return jax.jit(
        forward,
        in_shardings=(repl, data_sharded, data_sharded, data_sharded, data_sharded),
    )


def make_sharded_gru_forward(model: MVSNet, cfg: ModelConfig, mesh: Mesh):
    """forward_gru_wta over `mesh` — throughput-serving regime only.

    The GRU depth scan is sequential (no latency-mode sharding of one
    map), but maps are independent: when B divides the device count the
    whole WTA decode runs per shard under shard_map with zero
    collectives, like make_sharded_forward's serving branch. Other batch
    shapes run unsharded (replicated inputs, one chip does the work)."""
    mesh_lib.set_active_mesh(mesh)
    repl = NamedSharding(mesh, PartitionSpec())
    data_sharded = NamedSharding(mesh, PartitionSpec("data"))
    n = mesh.devices.size
    all_axes = tuple(mesh.axis_names)
    batch_spec = PartitionSpec(all_axes)

    def local_forward(variables, images, cams, depth_start, depth_end):
        with mesh_lib.shard_local():
            return model.apply(variables, images, cams, depth_start,
                               depth_interval=None, depth_end=depth_end,
                               method=MVSNet.forward_gru_wta)

    def forward(variables, images, cams, depth_start, depth_end):
        B = images.shape[0]
        if n > 1 and B % n == 0:
            xs = (images, cams, depth_start, depth_end)
            xs = tuple(jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, batch_spec)) for x in xs)
            return jax.shard_map(
                local_forward, mesh=mesh,
                in_specs=(PartitionSpec(),) + (batch_spec,) * 4,
                out_specs=batch_spec, check_vma=False,
            )(variables, *xs)
        return model.apply(variables, images, cams, depth_start,
                           depth_interval=None, depth_end=depth_end,
                           method=MVSNet.forward_gru_wta)

    return jax.jit(
        forward,
        in_shardings=(repl, data_sharded, data_sharded, data_sharded, data_sharded),
    )
