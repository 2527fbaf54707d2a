"""Inference driver: `python -m mvsnet_tpu.infer --input_dir <session(s)> ...`

Computes depth + probability maps for one session dir or a directory of
session dirs, writing to <session>/depths_mvsnet/ (or --output_dir).
Parity with reference mvsnet/inference.py:18-146; the graph is built once
and reused across sessions (no reuse_vars flag juggling — the Predictor
holds the jit cache).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from mvsnet_tpu import predict as pl
from mvsnet_tpu.config import ModelConfig
from mvsnet_tpu.data import batch_iterator
from mvsnet_tpu.utils.logging import setup_logger
from mvsnet_tpu.utils.paths import mkdir_p

logger = setup_logger("mvsnet_tpu.infer")


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--model_dir", default=None)
    p.add_argument("--ckpt_step", type=int, default=None)
    p.add_argument("--view_num", type=int, default=8)
    p.add_argument("--max_d", type=int, default=256)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--sample_scale", type=float, default=0.25)
    p.add_argument("--interval_scale", type=float, default=1.0)
    p.add_argument("--base_image_size", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--regularization", default="3DCNN", choices=["3DCNN", "GRU"])
    p.add_argument("--refinement", action="store_true")
    p.add_argument("--inverse_depth", action="store_true")
    p.add_argument("--network_mode", default="normal")
    p.add_argument("--refinement_network", default="original")
    p.add_argument("--upsample_before_refinement", action="store_true")
    p.add_argument("--refine_with_confidence", action="store_true")
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--max_clusters_per_session", type=int, default=None)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--num_devices", type=int, default=None,
                   help="shard 3D-CNN inference over N devices (mesh)")
    return p


def model_config_from_args(args) -> ModelConfig:
    return ModelConfig(
        view_num=args.view_num, max_d=args.max_d, width=args.width,
        height=args.height, sample_scale=args.sample_scale,
        interval_scale=args.interval_scale, base_image_size=args.base_image_size,
        inverse_depth=args.inverse_depth, regularization=args.regularization,
        network_mode=args.network_mode, refinement=args.refinement,
        refinement_network=args.refinement_network,
        upsample_before_refinement=args.upsample_before_refinement,
        refine_with_confidence=args.refine_with_confidence,
        compute_dtype=args.compute_dtype)


def compute_depth_maps(input_dir: str, args, predictor=None):
    """Run inference over one session dir (reference: inference.py:83-119)."""
    mcfg = model_config_from_args(args)
    output_dir = args.output_dir or os.path.join(input_dir, "depths_mvsnet")
    mkdir_p(output_dir)
    logger.info("Running inference on %s -> %s", input_dir, output_dir)

    gen = pl.setup_data_iterator(input_dir, mcfg, benchmark=False,
                                 max_clusters_per_session=args.max_clusters_per_session)
    if predictor is None:
        predictor = pl.Predictor(mcfg, args.model_dir, args.ckpt_step,
                             num_devices=args.num_devices)

    upsample = bool(args.refinement and args.upsample_before_refinement)
    n = len(gen.clusters)
    # Pipelined loop: predict(fetch=False) dispatches asynchronously and
    # the writer thread's np.asarray blocks on the device instead of the
    # main loop — the chip computes cluster i+1 while the host encodes
    # cluster i's PNGs/PFMs (reference wrote synchronously between
    # clusters, predictlib.py:162-177).
    with pl.AsyncOutputWriter() as writer:
        for step, batch in enumerate(batch_iterator(gen.iterate_once(),
                                                    args.batch_size)):
            scaled_images, input_images, scaled_cams, full_cams, indices, _ = batch
            ds, di, dn, de = pl.depth_params_from_cams(scaled_cams)
            t0 = time.time()
            depth, prob, residual = predictor.predict(
                input_images, scaled_cams, ds, di, de, fetch=False)
            logger.info("Depth inference %d/%d dispatched. (%.3f sec/step)",
                        step * args.batch_size, n, time.time() - t0)
            writer.write(output_dir, depth, prob, scaled_images, scaled_cams,
                         full_cams, input_images, indices,
                         residuals=residual, upsample=upsample,
                         sample_scale=args.sample_scale,
                         visualize=args.visualize)
    return predictor


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    single = os.path.isfile(os.path.join(args.input_dir, "covisibility.json"))
    if single:
        compute_depth_maps(args.input_dir, args)
    else:
        predictor = None
        for f in sorted(os.listdir(args.input_dir)):
            d = os.path.join(args.input_dir, f)
            if f.startswith(".") or not os.path.isdir(d):
                continue
            logger.info("Computing depth maps on dir %s", d)
            predictor = compute_depth_maps(d, args, predictor)
    return 0


if __name__ == "__main__":
    sys.exit(main())
