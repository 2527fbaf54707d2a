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
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from mvsnet_tpu.config import ModelConfig
from mvsnet_tpu.models import MVSNet
from mvsnet_tpu.models.mvsnet import apply_forward_3dcnn
from mvsnet_tpu.parallel import mesh as mesh_lib


def _pad_batch(xs, B: int, n: int):
    """Pad every array's leading batch dim from B up to the next multiple
    of n by repeating the last sample (sliced off by the caller)."""
    pad = (-B) % n
    return tuple(
        jnp.concatenate([x] + [x[-1:]] * pad, axis=0) for x in xs)


def make_sharded_forward(model: MVSNet, cfg: ModelConfig, mesh: Mesh):
    """Returns forward(variables, images, cams, depth_start, depth_interval)
    -> (depth_or_refined, prob_map, residual), jitted over `mesh`.
    Variables replicated; batch sharded over 'data'.

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

    Refinement (incl. the stereo channel) runs through the shared
    apply_forward_3dcnn in both regimes, so multi-device results —
    including the residual maps — match the single-device Predictor.
    """
    mesh_lib.set_active_mesh(mesh)
    repl = NamedSharding(mesh, PartitionSpec())
    data_sharded = NamedSharding(mesh, PartitionSpec("data"))
    n = mesh.devices.size
    all_axes = tuple(mesh.axis_names)
    batch_spec = PartitionSpec(all_axes)

    def local_forward(variables, images, cams, depth_start, depth_interval):
        with mesh_lib.shard_local():
            return apply_forward_3dcnn(model, variables, images, cams,
                                       depth_start, depth_interval)

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
        return apply_forward_3dcnn(model, variables, images, cams,
                                   depth_start, depth_interval)

    def jit_for(B: int):
        # in_shardings chosen per traced batch: B=1 / non-divisible batches
        # (latency regime) can't satisfy a 'data'-sharded input spec — they
        # stay replicated and the in-model constraints shard the volume.
        x_shard = data_sharded if B % mesh.shape["data"] == 0 else repl
        return jax.jit(
            forward,
            in_shardings=(repl, x_shard, x_shard, x_shard, x_shard),
        )

    def jitted(variables, images, cams, depth_start, depth_interval):
        return jit_for(images.shape[0])(variables, images, cams,
                                        depth_start, depth_interval)

    # exposed for the HLO collective audit (tests/test_parallel.py): lower
    # + compile the latency regime and inspect the partitioned module
    jitted.jit_for = jit_for
    return jitted


def make_sharded_gru_forward(model: MVSNet, cfg: ModelConfig, mesh: Mesh):
    """forward_gru_wta over `mesh` — throughput-serving regime.

    The GRU depth scan is sequential (no latency-mode sharding of one
    map), but maps are independent: the whole WTA decode runs per shard
    under shard_map with zero collectives, like make_sharded_forward's
    serving branch. Batches NOT divisible by the device count are padded
    up by repeating the last map and sliced back afterwards — every chip
    runs the full single-chip Pallas/CW pipeline (a padded B=1 costs the
    same wall-clock as one map on one chip; the spare chips burn a
    duplicate instead of the whole batch dropping to XLA-under-GSPMD)."""
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
        xs = (images, cams, depth_start, depth_end)
        if n > 1:
            xs = _pad_batch(xs, B, n)
            xs = tuple(jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, batch_spec)) for x in xs)
            depth_map, prob_map = jax.shard_map(
                local_forward, mesh=mesh,
                in_specs=(PartitionSpec(),) + (batch_spec,) * 4,
                out_specs=batch_spec, check_vma=False,
            )(variables, *xs)
            return depth_map[:B], prob_map[:B]
        return local_forward(variables, *xs)

    def jitted(variables, images, cams, depth_start, depth_end):
        # Non-divisible batches are padded INSIDE forward, so their raw
        # inputs can't satisfy a 'data'-sharded spec — keep them
        # replicated and let the in-graph constraint place the padded
        # batch (the divisible fast path still lands pre-sharded).
        B = images.shape[0]
        x_shard = data_sharded if B % mesh.shape["data"] == 0 else repl
        return jax.jit(
            forward,
            in_shardings=(repl, x_shard, x_shard, x_shard, x_shard),
        )(variables, images, cams, depth_start, depth_end)

    return jitted
