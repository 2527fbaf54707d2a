"""Training library: TrainState, optimizers, jitted train/eval steps.

Replaces the reference's in-graph tower replication + average_gradients
(reference: train.py:155-186,412-448) with a single functional train step.
Data parallelism is expressed with jax.sharding in parallel/train_step.py —
gradients are reduced by XLA collectives over ICI, not a hand-written
CPU-side average.
"""

from __future__ import annotations


from typing import Any

import jax
import jax.numpy as jnp
import optax

from flax.training import train_state

from mvsnet_tpu.config import ModelConfig, TrainConfig
from mvsnet_tpu.losses import mvsnet_classification_loss, mvsnet_regression_loss
from mvsnet_tpu.models import MVSNet


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def lr_schedule(tcfg: TrainConfig):
    """Continuous exponential decay: base_lr * gamma^(step/stepvalue)
    (reference: train.py:256-257, staircase=False default)."""
    return optax.exponential_decay(
        init_value=tcfg.base_lr, transition_steps=tcfg.stepvalue,
        decay_rate=tcfg.gamma, staircase=False)


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    """(reference: train.py:248-271; TF1 defaults preserved)"""
    sched = lr_schedule(tcfg)
    if tcfg.optimizer == "rmsprop":
        return optax.rmsprop(sched, decay=0.9, eps=1e-10)
    if tcfg.optimizer == "momentum":
        return optax.sgd(sched, momentum=0.9, nesterov=False)
    if tcfg.optimizer == "adam":
        return optax.adam(sched)
    raise NotImplementedError(tcfg.optimizer)


def create_train_state(model: MVSNet, cfg: ModelConfig, tcfg: TrainConfig,
                       rng, sample_batch) -> TrainState:
    images, cams, *_ = sample_batch
    ds = cams[:, 0, 1, 3, 0]
    di = cams[:, 0, 1, 3, 1]
    variables = model.init(rng, jnp.asarray(images), jnp.asarray(cams),
                           ds, di, training=True)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(tcfg),
    )


def batch_depth_params(cams):
    """depth_start/interval/end from the reference cam's depth row
    (reference: train.py:299-305)."""
    return cams[:, 0, 1, 3, 0], cams[:, 0, 1, 3, 1], cams[:, 0, 1, 3, 3]


def compute_loss(model: MVSNet, cfg: ModelConfig, tcfg: TrainConfig,
                 params, batch_stats, batch, training: bool):
    """Forward + loss for one batch; mirrors reference get_loss
    (train.py:307-364) including the refinement loss mixing."""
    images, cams, depth_image, full_depth = batch
    depth_start, depth_interval, depth_end = batch_depth_params(cams)
    variables = {"params": params, "batch_stats": batch_stats}
    mutable = ["batch_stats"] if training else []

    if cfg.regularization == "3DCNN":
        if training:
            outputs, new_vars = model.apply(
                variables, images, cams, depth_start, depth_interval,
                training=True, mutable=mutable)
        else:
            outputs = model.apply(variables, images, cams, depth_start,
                                  depth_interval, training=False)
            new_vars = {}
        if cfg.refinement:
            depth_map, prob_map, refined, residual = outputs
            loss0, l1_main, l3_main, debug = mvsnet_regression_loss(
                depth_map, depth_image, depth_start, depth_end,
                loss_type=tcfg.loss_type, alpha=tcfg.alpha, beta=tcfg.beta,
                eta=tcfg.eta, grad_loss=tcfg.grad_loss)
            target = full_depth if cfg.upsample_before_refinement else depth_image
            loss1, l1, l3, debug = mvsnet_regression_loss(
                refined, target, depth_start, depth_end,
                loss_type=tcfg.loss_type, alpha=tcfg.alpha, beta=tcfg.beta,
                eta=tcfg.eta, grad_loss=tcfg.grad_loss)
            if tcfg.refinement_train_mode == "refine_only":
                loss = loss1 + 1e-9 * loss0
            elif tcfg.refinement_train_mode == "main_only":
                loss = loss0 + 1e-12 * loss1
                l1, l3 = l1_main, l3_main
            else:
                loss = (loss0 + loss1) / 2
        else:
            depth_map, prob_map = outputs
            loss, l1, l3, debug = mvsnet_regression_loss(
                depth_map, depth_image, depth_start, depth_end,
                loss_type=tcfg.loss_type, alpha=tcfg.alpha, beta=tcfg.beta,
                eta=tcfg.eta, grad_loss=tcfg.grad_loss)
        metrics = {"loss": loss, "less_one": l1, "less_three": l3, "debug": debug}
        return loss, (new_vars.get("batch_stats", batch_stats), metrics)

    elif cfg.regularization == "GRU":
        prob_volume = model.apply(
            variables, images, cams, depth_start, depth_interval,
            method=MVSNet.forward_prob_recurrent)
        loss, mae, l1, l3, _ = mvsnet_classification_loss(
            prob_volume, depth_image, cfg.max_d, depth_start, depth_interval)
        metrics = {"loss": loss, "less_one": l1, "less_three": l3, "debug": mae}
        return loss, (batch_stats, metrics)

    raise NotImplementedError(cfg.regularization)


def make_train_step(model: MVSNet, cfg: ModelConfig, tcfg: TrainConfig,
                    donate: bool = True):
    def train_step(state: TrainState, batch):
        def loss_fn(params):
            return compute_loss(model, cfg, tcfg, params, state.batch_stats,
                                batch, training=True)

        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: MVSNet, cfg: ModelConfig, tcfg: TrainConfig):
    def eval_step(state: TrainState, batch):
        _, (_, metrics) = compute_loss(model, cfg, tcfg, state.params,
                                       state.batch_stats, batch, training=False)
        return metrics

    return jax.jit(eval_step)
