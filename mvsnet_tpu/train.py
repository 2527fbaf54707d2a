"""Training driver: `python -m mvsnet_tpu.train --train_data_root ... --model_dir ...`

Reference-parity CLI (train.py:35-137) on a functional JAX training loop:
prefetching host loader, jitted train step (data-parallel via
parallel.train_step when >1 device), periodic orbax snapshots, validation
rounds, NaN-loss abort, JSONL metrics sink (stands in for wandb).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

from mvsnet_tpu import checkpoint as ckpt
from mvsnet_tpu import train_lib
from mvsnet_tpu.config import DataConfig, ModelConfig, TrainConfig
from mvsnet_tpu.data import ClusterGenerator, PrefetchingLoader
from mvsnet_tpu.models import MVSNet
from mvsnet_tpu.utils.logging import setup_logger

logger = setup_logger("mvsnet_tpu.train")


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("1", "true", "t", "yes", "y")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # datasets (reference: train.py:35-50)
    p.add_argument("--train_data_root", required=True)
    p.add_argument("--model_dir", required=True)
    p.add_argument("--model_load_dir", default=None)
    p.add_argument("--ckpt_step", type=int, default=None)
    p.add_argument("--run_name", default=None)
    # input (train.py:53-68)
    p.add_argument("--view_num", type=int, default=3)
    p.add_argument("--max_d", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--sample_scale", type=float, default=0.25)
    p.add_argument("--interval_scale", type=float, default=1.0)
    p.add_argument("--base_image_size", type=int, default=8)
    p.add_argument("--inverse_depth", action="store_true")
    # architecture (train.py:70-90)
    p.add_argument("--regularization", default="3DCNN", choices=["3DCNN", "GRU"])
    p.add_argument("--optimizer", default="rmsprop",
                   choices=["rmsprop", "momentum", "adam"])
    p.add_argument("--refinement", action="store_true")
    p.add_argument("--refinement_train_mode", default="all",
                   choices=["all", "refine_only", "main_only"])
    p.add_argument("--network_mode", default="lite",
                   choices=["normal", "semilite", "lite", "ultralite", "fat", "ultrafat"])
    p.add_argument("--refinement_network", default="unet", choices=["original", "unet"])
    p.add_argument("--upsample_before_refinement", type=str2bool, default=True)
    p.add_argument("--refine_with_confidence", type=str2bool, default=True)
    p.add_argument("--refine_with_stereo", action="store_true")
    # training (train.py:92-135)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--epoch", type=int, default=1)
    p.add_argument("--max_steps_per_epoch", type=int, default=None)
    p.add_argument("--base_lr", type=float, default=1e-3)
    p.add_argument("--display", type=int, default=1)
    p.add_argument("--stepvalue", type=int, default=70000)
    p.add_argument("--snapshot", type=int, default=5000)
    p.add_argument("--gamma", type=float, default=0.5)
    p.add_argument("--val_batch_size", type=int, default=100)
    p.add_argument("--train_steps_per_val", type=int, default=500)
    p.add_argument("--dataset_fraction", type=float, default=1.0)
    p.add_argument("--loss_type", default="power",
                   choices=["original", "power", "gaussian"])
    p.add_argument("--alpha", type=float, default=0.25)
    p.add_argument("--beta", type=float, default=0.0)
    p.add_argument("--eta", type=float, default=0.02)
    p.add_argument("--grad_loss", type=str2bool, default=True)
    p.add_argument("--seed", type=int, default=0)
    # TPU-specific
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--depth_chunk", type=int, default=16)
    p.add_argument("--use_pallas", type=str2bool, default=True,
                   help="Pallas sweep kernels (custom-VJP warp in training); "
                        "disable to trade step time for faster compiles")
    p.add_argument("--num_devices", type=int, default=None,
                   help="data-parallel devices (default: all local)")
    p.add_argument("--loader_workers", type=int, default=2)
    # multi-host (pod slice) — omit for single-host runs
    p.add_argument("--coordinator_address", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of steps 10-15 here")
    p.add_argument("--image_log_interval", type=int, default=0,
                   help="every N steps render depth/confidence/residual "
                        "maps to <model_dir>/train_vis and wandb "
                        "(0 = off; reference: preprocess.py:198-266)")
    return p


def configs_from_args(args):
    mcfg = ModelConfig(
        view_num=args.view_num, max_d=args.max_d, width=args.width,
        height=args.height, sample_scale=args.sample_scale,
        interval_scale=args.interval_scale, base_image_size=args.base_image_size,
        inverse_depth=args.inverse_depth, regularization=args.regularization,
        network_mode=args.network_mode, refinement=args.refinement,
        refinement_network=args.refinement_network,
        upsample_before_refinement=args.upsample_before_refinement,
        refine_with_confidence=args.refine_with_confidence,
        refine_with_stereo=args.refine_with_stereo,
        compute_dtype=args.compute_dtype, depth_chunk=args.depth_chunk,
        use_pallas=args.use_pallas)
    tcfg = TrainConfig(
        batch_size=args.batch_size, epoch=args.epoch,
        max_steps_per_epoch=args.max_steps_per_epoch, base_lr=args.base_lr,
        stepvalue=args.stepvalue, gamma=args.gamma, snapshot=args.snapshot,
        optimizer=args.optimizer, loss_type=args.loss_type, alpha=args.alpha,
        beta=args.beta, eta=args.eta, grad_loss=args.grad_loss,
        refinement_train_mode=args.refinement_train_mode,
        val_batch_size=args.val_batch_size,
        train_steps_per_val=args.train_steps_per_val, seed=args.seed,
        num_devices=args.num_devices)
    dcfg = DataConfig(
        data_dir=args.train_data_root, view_num=args.view_num,
        image_width=args.width, image_height=args.height, depth_num=args.max_d,
        interval_scale=args.interval_scale, base_image_size=args.base_image_size,
        flip_cams=(args.regularization == "GRU"),
        sessions_frac=args.dataset_fraction)
    return mcfg, tcfg, dcfg


class MetricsSink:
    """JSONL metrics log, plus optional wandb mirroring (reference logged to
    wandb at train.py:506-515). wandb engages only when the package is
    installed AND WANDB_API_KEY/WANDB_MODE is configured — never by default,
    and no hardcoded keys (the reference shipped one; utils.py:61-72)."""

    def __init__(self, path, run_name=None):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._wandb = None
        if os.environ.get("WANDB_API_KEY") or os.environ.get("WANDB_MODE"):
            try:
                import wandb  # noqa: PLC0415
                wandb.init(project=os.environ.get("WANDB_PROJECT", "mvsnet_tpu"),
                           name=run_name)
                self._wandb = wandb
            except Exception as e:  # wandb missing/unconfigured: JSONL only
                logger.debug("wandb disabled: %s", e)

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in rec.items() if k != "time"},
                            step=step)

    def log_images(self, step: int, images: dict):
        """Mirror rendered arrays to wandb (reference logged depth/
        confidence/residual renders, preprocess.py:198-266)."""
        if self._wandb is not None:
            self._wandb.log({k: self._wandb.Image(np.asarray(v))
                             for k, v in images.items()}, step=step)


def make_vis_writer(model, mcfg, model_dir, sink):
    """Training-time image artifacts: every image-log interval, render the
    current batch's depth / confidence / |residual| maps to
    <model_dir>/train_vis/step_<N>/ and mirror them to wandb (reference:
    preprocess.py:198-266, train.py:506-515)."""
    from mvsnet_tpu.io import filesystem as fsio
    from mvsnet_tpu.io import images as imio

    fwd = {}

    def write(state, batch, total_step):
        if "fn" not in fwd:
            method = (MVSNet.forward_gru_wta if mcfg.regularization == "GRU"
                      else MVSNet.forward_3dcnn)

            def f(variables, images, cams, ds, di):
                return model.apply(variables, images, cams, ds, di,
                                   method=method)

            fwd["fn"] = jax.jit(f)
        images_t, cams, gt_depth = batch[0], batch[1], batch[2]
        ds, di, _ = train_lib.batch_depth_params(cams)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        depth, prob = fwd["fn"](variables, images_t, cams, ds, di)
        depth = np.asarray(depth[0, ..., 0], np.float32)
        prob = np.asarray(prob[0, ..., 0], np.float32)
        gt = np.asarray(gt_depth[0, ..., 0], np.float32)
        residual = np.abs(depth - gt) * (gt > 0)
        outdir = fsio.join(model_dir, "train_vis", f"step_{total_step}")
        fsio.makedirs(outdir)
        imio.write_inverse_depth_png(fsio.join(outdir, "depth.png"), depth)
        imio.write_confidence_png(fsio.join(outdir, "confidence.png"), prob)
        imio.write_depth_png(fsio.join(outdir, "residual.png"), residual)
        sink.log_images(total_step, {"depth": depth, "confidence": prob,
                                     "residual": residual})

    return write


def make_loader(dcfg: DataConfig, tcfg: TrainConfig, mode: str, workers: int = 2):
    def factory():
        return ClusterGenerator(
            dcfg.data_dir, dcfg.view_num, dcfg.image_width, dcfg.image_height,
            dcfg.depth_num, dcfg.interval_scale, dcfg.base_image_size,
            mode=mode, flip_cams=dcfg.flip_cams,
            sessions_frac=dcfg.sessions_frac,
            max_clusters_per_session=dcfg.max_clusters_per_session,
            seed=tcfg.seed, shard_index=jax.process_index(),
            shard_count=jax.process_count())
    return factory


def maybe_init_distributed(args) -> None:
    """Multi-host (DCN) initialization. The reference scaled only within one
    box (machines/*.yaml single-master); pod-slice training needs each host
    process to join the jax.distributed cluster. No-op single-host."""
    if args.coordinator_address:
        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id)
        logger.info("joined distributed run: process %d/%d",
                    jax.process_index(), jax.process_count())


def train(args) -> int:
    maybe_init_distributed(args)
    mcfg, tcfg, dcfg = configs_from_args(args)
    model = MVSNet(mcfg)
    metrics_sink = MetricsSink(os.path.join(args.model_dir, "metrics.jsonl"),
                               run_name=args.run_name)
    # persist the run configuration for reproducibility / inference parity
    from mvsnet_tpu.config import save_config
    os.makedirs(args.model_dir, exist_ok=True)
    save_config(os.path.join(args.model_dir, "config.json"),
                model=mcfg, train=tcfg, data=dcfg)

    train_factory = make_loader(dcfg, tcfg, "train", args.loader_workers)
    train_gen = train_factory()
    samples_per_epoch = len(train_gen)
    train_loader = PrefetchingLoader(
        lambda: train_gen, batch_size=tcfg.batch_size, epochs=tcfg.epoch,
        workers=args.loader_workers)

    # Device topology: single-device jit, or a sharded step over the
    # ('data','depth','space') mesh — GLOBAL devices when this is one
    # process of a multi-host (DCN) run.
    multiprocess = jax.process_count() > 1
    n_dev = tcfg.num_devices or (
        jax.device_count() if multiprocess else jax.local_device_count())
    mesh = None
    if n_dev > 1:
        from mvsnet_tpu.parallel.train_step import (make_sharded_train_step,
                                                    shard_state)
        step_fn, mesh = make_sharded_train_step(model, mcfg, tcfg, n_dev)
    else:
        step_fn = train_lib.make_train_step(model, mcfg, tcfg)

    def device_batch(batch):
        """Host batches -> step inputs. Single-process jit moves numpy with
        the declared in_shardings; a multi-host run must assemble the global
        array from each process's local shard."""
        if mesh is None or not multiprocess:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec
        sharding = NamedSharding(mesh, PartitionSpec("data"))
        return tuple(jax.make_array_from_process_local_data(sharding, np.asarray(b))
                     for b in batch)

    # init / restore
    first = next(iter(PrefetchingLoader(lambda: train_factory(),
                                        batch_size=tcfg.batch_size, epochs=1)))
    rng = jax.random.PRNGKey(tcfg.seed)
    state = train_lib.create_train_state(model, mcfg, tcfg, rng, first)
    total_step = 0
    if args.ckpt_step is not None:
        load_dir = args.model_load_dir or args.model_dir
        state = ckpt.restore_checkpoint(load_dir, mcfg.regularization,
                                        mcfg.network_mode, state, args.ckpt_step)
        total_step = args.ckpt_step
        logger.info("Restored checkpoint step %d from %s", total_step, load_dir)
    if mesh is not None:
        # place params/opt state replicated across the mesh up front — jit
        # would auto-reshard, but that defeats donate_argnums (a fresh copy
        # per step) and hides placement bugs.
        state = shard_state(state, mesh)

    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(state.params))
    logger.info("Training MVSNet(%s/%s) with %d params on %d device(s); "
                "%d samples/epoch", mcfg.regularization, mcfg.network_mode,
                n_params, n_dev, samples_per_epoch)

    # validation (reference: train.py:373-409) — only when a val split exists
    if mesh is not None:
        from mvsnet_tpu.parallel.train_step import make_sharded_eval_step
        eval_step = make_sharded_eval_step(model, mcfg, tcfg, mesh)
    else:
        eval_step = train_lib.make_eval_step(model, mcfg, tcfg)
    has_val = os.path.isdir(os.path.join(dcfg.data_dir, "val"))

    def run_validation(state, total_step):
        val_loader = PrefetchingLoader(make_loader(dcfg, tcfg, "val"),
                                       batch_size=tcfg.batch_size, epochs=1)
        vals = []
        for i, vbatch in enumerate(val_loader):
            if i >= int(tcfg.val_batch_size):
                break
            vals.append({k: float(v)
                         for k, v in eval_step(state, device_batch(vbatch)).items()})
        if vals:
            avg = {("val_" + k): float(np.mean([m[k] for m in vals])) for k in vals[0]}
            metrics_sink.log(total_step, **avg)
            logger.info("VAL step %d: %s", total_step,
                        {k: round(v, 4) for k, v in avg.items()})

    vis_writer = (make_vis_writer(model, mcfg, args.model_dir, metrics_sink)
                  if args.image_log_interval else None)

    window = []
    t_step = time.time()
    for step, batch in enumerate(train_loader):
        if tcfg.max_steps_per_epoch is not None and step >= tcfg.max_steps_per_epoch * tcfg.epoch:
            break
        if args.profile_dir and step == 10:
            jax.profiler.start_trace(args.profile_dir)
        if args.profile_dir and step == 15:
            jax.profiler.stop_trace()
            logger.info("profiler trace written to %s", args.profile_dir)
        state, metrics = step_fn(state, device_batch(batch))
        loss = float(metrics["loss"])
        duration = time.time() - t_step
        t_step = time.time()
        if np.isnan(loss):
            logger.error("NaN loss at step %d — aborting (reference behavior)", total_step)
            return 1
        window.append({k: float(v) for k, v in metrics.items()})
        if step % args.display == 0:
            logger.info("step %d total %d loss=%.4f <1px=%.4f <3px=%.4f (%.3fs)",
                        step, total_step, loss, float(metrics["less_one"]),
                        float(metrics["less_three"]), duration)
        if step % 50 == 0 and window:
            avg = {k: float(np.mean([m[k] for m in window])) for k in window[0]}
            metrics_sink.log(total_step, time_per_step=duration, **avg)
            window = []
        # reference advances the step counter by samples consumed
        # (train.py:518-519: batch_size*num_gpus, one batch per GPU); here
        # one loader batch is sharded across the mesh, so samples/step =
        # batch_size per process.
        samples_per_step = tcfg.batch_size * jax.process_count()
        total_step += samples_per_step
        if total_step % tcfg.snapshot < samples_per_step:
            ckpt.save_checkpoint(args.model_dir, mcfg.regularization,
                                 mcfg.network_mode, total_step, state)
        if has_val and step > 0 and step % int(tcfg.train_steps_per_val) == 0:
            run_validation(state, total_step)
        if vis_writer is not None and step % args.image_log_interval == 0:
            try:
                vis_writer(state, batch, total_step)
            except Exception as e:  # visualization must never kill training
                logger.warning("image logging failed at step %d: %s",
                               total_step, e)

    ckpt.save_checkpoint(args.model_dir, mcfg.regularization, mcfg.network_mode,
                         total_step, state)
    logger.info("Training done at step %d", total_step)
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return train(args)


if __name__ == "__main__":
    sys.exit(main())
