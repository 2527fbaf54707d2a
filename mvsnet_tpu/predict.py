"""Prediction library: model loading, jitted inference, output writing.

Parity with reference mvsnet/predictlib.py: data iterator setup
(:33-56), model load (:69-76), graph selection by regularization /
refinement (:79-99), PFM/PNG/cam output writing (:105-177), results CSV
(:226-266). Fixes the reference's GRU-branch NameError (depth_num/depth_end
out of scope, predictlib.py:94-96) by deriving them from the cam tensor.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvsnet_tpu import checkpoint as ckpt
from mvsnet_tpu.config import ModelConfig
from mvsnet_tpu.data import ClusterGenerator
from mvsnet_tpu.data.transforms import scale_image
from mvsnet_tpu.io.cams import write_cam_txt
from mvsnet_tpu.io.images import (
    write_confidence_png,
    write_depth_png,
    write_image,
    write_inverse_depth_png,
)
from mvsnet_tpu.io.pfm import write_pfm
from mvsnet_tpu.models import MVSNet
from mvsnet_tpu.utils.logging import setup_logger

logger = setup_logger("mvsnet_tpu.predict")


def setup_data_iterator(input_dir: str, mcfg: ModelConfig, benchmark: bool,
                        max_clusters_per_session: Optional[int] = None,
                        batch_size: int = 1):
    """(reference: predictlib.py:33-56)"""
    mode = "test" if benchmark else "inference"
    gen = ClusterGenerator(
        input_dir, mcfg.view_num, mcfg.width, mcfg.height, mcfg.max_d,
        mcfg.interval_scale, mcfg.base_image_size, mode=mode,
        output_scale=mcfg.sample_scale,
        max_clusters_per_session=max_clusters_per_session)
    return gen


class Predictor:
    """Loads a trained MVSNet and performs jitted depth+prob inference.

    num_devices > 1 runs the 3D-CNN forward sharded over a
    ('data','depth','space') mesh (GRU decode stays single-device — its
    depth scan is sequential).
    """

    def __init__(self, mcfg: ModelConfig, model_dir: Optional[str] = None,
                 ckpt_step: Optional[int] = None,
                 num_devices: Optional[int] = None):
        self.mcfg = mcfg
        self.model = MVSNet(mcfg)
        self.model_dir = model_dir
        self.ckpt_step = ckpt_step
        self.num_devices = num_devices
        self.variables = None
        self._jit_fn = None

    def _ensure_variables(self, images, cams, depth_start, depth_interval):
        if self.variables is not None:
            return
        rng = jax.random.PRNGKey(0)
        if self.mcfg.regularization == "GRU":
            variables = self.model.init(rng, images, cams, depth_start,
                                        depth_interval,
                                        method=MVSNet.forward_prob_recurrent)
        else:
            variables = self.model.init(rng, images, cams, depth_start,
                                        depth_interval, training=False)
        if self.model_dir is not None:
            tree = ckpt.restore_tree(self.model_dir, self.mcfg.regularization,
                                     self.mcfg.network_mode, self.ckpt_step)
            variables = {"params": tree["params"],
                         "batch_stats": tree.get("batch_stats") or {}}
            logger.info("Restored model from %s step %s", self.model_dir,
                        self.ckpt_step)
        self.variables = variables

    def _build_jit(self):
        mcfg = self.mcfg
        model = self.model

        if (self.num_devices or 1) > 1 and mcfg.regularization == "3DCNN":
            from mvsnet_tpu.parallel.infer_step import make_sharded_forward  # noqa: PLC0415
            from mvsnet_tpu.parallel.mesh import factorize_devices, make_mesh  # noqa: PLC0415
            # inference batches are tiny (usually 1): keep the data axis at 1
            # and give all devices to depth x space. (Batches divisible by
            # the device count flip to the batch-parallel serving regime
            # inside make_sharded_forward regardless of mesh shape.)
            da, de_, sp = factorize_devices(self.num_devices)
            mesh = make_mesh(self.num_devices, shape=(1, da * de_, sp))
            sharded = make_sharded_forward(model, mcfg, mesh)

            def forward_sharded(variables, images, cams, ds, di, de):
                return sharded(variables, images, cams, ds, di)

            return forward_sharded

        if (self.num_devices or 1) > 1 and mcfg.regularization == "GRU":
            from mvsnet_tpu.parallel.infer_step import make_sharded_gru_forward  # noqa: PLC0415
            from mvsnet_tpu.parallel.mesh import make_mesh  # noqa: PLC0415
            mesh = make_mesh(self.num_devices)
            sharded_gru = make_sharded_gru_forward(model, mcfg, mesh)
            zeros = jax.jit(jnp.zeros_like)

            def forward_sharded_gru(variables, images, cams, ds, di, de):
                depth_map, prob_map = sharded_gru(variables, images, cams, ds, de)
                return depth_map, prob_map, zeros(depth_map)

            return forward_sharded_gru

        def forward(variables, images, cams, depth_start, depth_interval, depth_end):
            if mcfg.regularization == "GRU":
                depth_map, prob_map = model.apply(
                    variables, images, cams, depth_start,
                    depth_interval=None, depth_end=depth_end,
                    method=MVSNet.forward_gru_wta)
                residual = jnp.zeros_like(depth_map)
                return depth_map, prob_map, residual
            # shared with the multi-device paths (parallel/infer_step.py):
            # refinement dispatch incl. the stereo channel cannot drift
            from mvsnet_tpu.models.mvsnet import apply_forward_3dcnn  # noqa: PLC0415
            return apply_forward_3dcnn(model, variables, images, cams,
                                       depth_start, depth_interval)

        return jax.jit(forward)

    def predict(self, images, cams, depth_start, depth_interval, depth_end,
                fetch: bool = True):
        """(depth_map, prob_map, residual)
        (reference: predictlib.py:79-99).

        fetch=True returns numpy (blocks until the device finishes).
        fetch=False returns the dispatched device arrays immediately —
        JAX dispatch is asynchronous, so the caller can hand them to an
        AsyncOutputWriter and enqueue the NEXT cluster while the chip is
        still computing this one (the write thread's np.asarray is what
        blocks on the result)."""
        images = jnp.asarray(images)
        cams = jnp.asarray(cams)
        self._ensure_variables(images, cams, depth_start, depth_interval)
        if self._jit_fn is None:
            self._jit_fn = self._build_jit()
        out = self._jit_fn(self.variables, images, cams,
                           jnp.asarray(depth_start), jnp.asarray(depth_interval),
                           jnp.asarray(depth_end))
        if not fetch:
            return out
        return tuple(np.asarray(o) for o in out)


def depth_params_from_cams(scaled_cams):
    """depth_start/interval/num/end from the scaled reference cam
    (reference: predictlib.py:182-199)."""
    depth_start = scaled_cams[:, 0, 1, 3, 0]
    depth_interval = scaled_cams[:, 0, 1, 3, 1]
    depth_num = int(scaled_cams[0, 0, 1, 3, 2])
    depth_end = scaled_cams[:, 0, 1, 3, 3]
    return depth_start, depth_interval, depth_num, depth_end


def write_output_slice(output_dir: str, depth_map, prob_map, images, cams,
                       full_cams, full_images, index, residual_depth_map=None,
                       upsample: bool = False, sample_scale: float = 0.25,
                       visualize: bool = False):
    """Write one prediction (reference: predictlib.py:105-159)."""
    depth_map = np.squeeze(np.asarray(depth_map))
    prob_map = np.squeeze(np.asarray(prob_map))
    if upsample:
        ref_image = np.squeeze(full_images)[0]
        ref_cam = np.squeeze(full_cams)[0]
        prob_map = scale_image(prob_map, 1.0 / sample_scale, "nearest")
    else:
        ref_image = np.squeeze(images)[0]
        ref_cam = np.squeeze(cams)[0]
    index = int(np.squeeze(index))

    write_pfm(os.path.join(output_dir, f"{index}_init.pfm"), depth_map.astype(np.float32))
    write_pfm(os.path.join(output_dir, f"{index}_prob.pfm"), prob_map.astype(np.float32))
    write_depth_png(os.path.join(output_dir, f"{index}_depth.png"), depth_map)
    write_confidence_png(os.path.join(output_dir, f"{index}_prob.png"), prob_map)
    # reference image: de-normalize centered floats to displayable range
    img = ref_image
    if img.dtype != np.uint8:
        img = img - img.min()
        peak = img.max()
        img = (255 * img / peak if peak > 0 else img).astype(np.uint8)
    write_image(os.path.join(output_dir, f"{index}.jpg"), img)
    write_cam_txt(os.path.join(output_dir, f"{index}.txt"), ref_cam)
    if visualize:
        write_inverse_depth_png(
            os.path.join(output_dir, f"{index}_depth_inverse.png"), depth_map)
        if residual_depth_map is not None:
            write_pfm(os.path.join(output_dir, f"{index}_residual.pfm"),
                      np.squeeze(np.asarray(residual_depth_map)).astype(np.float32))


def write_output(output_dir, depth_maps, prob_maps, images, cams, full_cams,
                 full_images, indices, residuals=None, upsample=False,
                 sample_scale=0.25, visualize=False):
    """Batched output writer (reference: predictlib.py:162-177)."""
    start = time.time()
    B = depth_maps.shape[0]
    for i in range(B):
        write_output_slice(
            output_dir, depth_maps[i], prob_maps[i], images[i], cams[i],
            full_cams[i], full_images[i], indices[i],
            None if residuals is None else residuals[i],
            upsample=upsample, sample_scale=sample_scale, visualize=visualize)
    logger.info("Time to write prediction results: %.3f s", time.time() - start)


class AsyncOutputWriter:
    """Overlap host-side output writing with device compute.

    The reference wrote outputs synchronously between clusters
    (predictlib.py:162-177) — at TPU speeds the PNG/JPEG/PFM encodes are
    a double-digit-percent throughput tax because the chip idles while
    the host encodes. Here `write()` enqueues the batch onto ONE worker
    thread (per-session file order preserved) with a bounded pending
    queue; combined with `Predictor.predict(fetch=False)` the worker's
    np.asarray is what waits for the device, and the main loop is free
    to feed the next cluster immediately.
    """

    def __init__(self, max_pending: int = 4, write_fn=None):
        from collections import deque  # noqa: PLC0415
        from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="output-writer")
        self._pending = deque()
        self._max = max(1, int(max_pending))
        self._write_fn = write_fn or write_output

    def write(self, *args, **kwargs):
        while len(self._pending) >= self._max:
            self._pending.popleft().result()   # re-raises worker errors
        self._pending.append(self._pool.submit(self._write_fn, *args, **kwargs))

    def flush(self):
        while self._pending:
            self._pending.popleft().result()

    def close(self):
        try:
            self.flush()
        finally:
            self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.close()
        else:
            # Don't mask the main error, and don't let queued writes run:
            # each blocks on np.asarray of device results from a possibly
            # wedged backend — without cancel_futures the interpreter's
            # atexit join would hang the crashed process on them.
            self._pool.shutdown(wait=False, cancel_futures=True)
        return False


RESULTS_HEADER = "model_dir, ckpt_step, loss, less_one, less_three, debug \n"


def ensure_header_exists(path: str):
    """(reference: predictlib.py:231-253)"""
    try:
        with open(path) as f:
            lines = f.readlines()
            if lines and lines[0] == RESULTS_HEADER:
                return
    except OSError:
        pass
    with open(path, "a+") as f:
        f.write(RESULTS_HEADER)


def write_results(path: str, model_dir, ckpt_step, loss, less_one, less_three,
                  debug):
    """Append a benchmark row (reference: predictlib.py:256-266)."""
    try:
        ensure_header_exists(path)
        with open(path, "a+") as f:
            f.write(f"{model_dir}, {ckpt_step}, {loss}, {less_one}, "
                    f"{less_three}, {debug} \n")
    except OSError as e:
        logger.error("Failed to write results: %s", e)
