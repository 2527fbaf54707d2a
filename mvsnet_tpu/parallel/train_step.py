"""Sharded train/eval steps over a ('data', 'depth', 'space') mesh.

The step function is the same pure train step as train_lib; parallelism is
purely declarative: batch inputs sharded over 'data', params/opt-state
replicated, in-model constraints (models/mvsnet.py via parallel.mesh.constrain)
shard the cost volume over 'depth'/'space'. XLA GSPMD then emits:
  * gradient all-reduce over ICI (replacing reference average_gradients,
    train.py:155-186),
  * halo exchanges for spatially/depth-sharded convolutions,
  * collective softmax/reductions along the sharded depth axis.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from mvsnet_tpu.config import ModelConfig, TrainConfig
from mvsnet_tpu.models import MVSNet
from mvsnet_tpu.parallel import mesh as mesh_lib
from mvsnet_tpu import train_lib


def make_sharded_train_step(model: MVSNet, cfg: ModelConfig, tcfg: TrainConfig,
                            n_devices: int = None, mesh: Mesh = None,
                            donate: bool = True):
    """Returns (step_fn(state, batch) -> (state, metrics), mesh).

    `state` must be placed with replicated sharding (see shard_state);
    batches are host numpy arrays — jit moves them with the declared
    input shardings.
    """
    if mesh is None:
        mesh = mesh_lib.make_mesh(n_devices)
    mesh_lib.set_active_mesh(mesh)

    repl = NamedSharding(mesh, PartitionSpec())
    data_sharded = NamedSharding(mesh, PartitionSpec("data"))

    def train_step(state, batch):
        def loss_fn(params):
            return train_lib.compute_loss(model, cfg, tcfg, params,
                                          state.batch_stats, batch, training=True)

        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return new_state, metrics

    step = jax.jit(
        train_step,
        in_shardings=(repl, data_sharded),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
    return step, mesh


def shard_state(state, mesh: Mesh):
    """Replicate a TrainState across the mesh."""
    repl = NamedSharding(mesh, PartitionSpec())
    return jax.device_put(state, repl)


def make_sharded_eval_step(model: MVSNet, cfg: ModelConfig, tcfg: TrainConfig,
                           mesh: Mesh):
    mesh_lib.set_active_mesh(mesh)
    repl = NamedSharding(mesh, PartitionSpec())
    data_sharded = NamedSharding(mesh, PartitionSpec("data"))

    def eval_step(state, batch):
        _, (_, metrics) = train_lib.compute_loss(
            model, cfg, tcfg, state.params, state.batch_stats, batch,
            training=False)
        return metrics

    return jax.jit(eval_step, in_shardings=(repl, data_sharded),
                   out_shardings=repl)
