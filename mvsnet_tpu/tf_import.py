"""Import reference TensorFlow checkpoints into mvsnet_tpu variables.

The reference ships TF1 Saver checkpoints (reference: train.py:446,
utils.py:75-95; README.md:43-49 points at trained GCS models). This module
maps those variables onto the Flax tree so reference-trained weights can
drive quality-parity runs (BASELINE.md north star: <=1% depth-accuracy
delta on DTU scan9).

Name mapping. The reference builds every network in the default variable
scope, so TF names are exactly the layer names this package already
mirrors (cnn_wrapper/mvsnetworks.py:53-158; convgru.py:82-121):

  TF variable                      Flax leaf
  <layer>/kernel               ->  params/<net>/<layer>/conv/Conv_0/kernel
                                   (deconv: .../deconv/ConvTranspose_0/kernel,
                                    transposed — see below; bare convs:
                                    .../<layer>/Conv_0/kernel)
  <layer>/bias                 ->  .../bias
  <layer>/gn/gamma|beta        ->  params/<net>/<layer>/gn/scale|bias
  <layer>/bn/gamma|beta        ->  params/<net>/<layer>/bn/BatchNorm_0/scale|bias
  <layer>/bn/moving_mean|variance -> batch_stats/<net>/<layer>/bn/BatchNorm_0/mean|var

Layout transforms: tf.layers.conv2d/conv3d kernels are (spatial..., in,
out) — identical to Flax. tf.layers.conv2d_transpose/conv3d_transpose
kernels are (spatial..., OUT, IN) and must swap the last two axes for
flax.linen.ConvTranspose.

GRU naming (reference convgru.py:84-121): each ConvGRUCell lives in scope
`conv_gru<i>` with `Gates/conv/{kernel,bias}` (the 2x-filters gate conv)
and `Output/output_conv/{kernel,bias}`. The per-gate norms depend on the
group arithmetic (convgru.py:24-35, group_channel=16): true group norm
creates `<scope>/{reset,update,output}_norm/gn/{gamma,beta}`, but at the
standard GRU widths (16/4/2 filters) G collapses to 1 and tf.contrib's
layer_norm is used instead — variables `Gates/LayerNorm[_1]/{gamma,beta}`
(reset first, update second) and `Output/LayerNorm/...`; G>=C would give
`InstanceNorm`. The importer tries all three spellings.
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax

logger = logging.getLogger("mvsnet_tpu.tf_import")

# top-level Flax module names that do not exist as TF scopes
_NET_WRAPPERS = {"feature_net", "regnet", "refine_net", "gru_sweep", "gru"}


def _swap_io(k):
    """TF conv*_transpose kernel (spatial..., out, in) -> Flax (..., in, out)."""
    return np.swapaxes(k, -1, -2)


def flax_path_to_tf_name(path: Tuple[str, ...]) -> Tuple[list, Callable]:
    """Map one Flax leaf path (collection, modules..., leaf) to candidate TF
    variable names (tried in order) and a layout transform. Returns ([], id)
    when the leaf has no TF counterpart."""
    parts = [str(getattr(k, "key", k)) for k in path]
    collection, parts = parts[0], parts[1:]
    leaf = parts.pop()
    parts = [p for p in parts if p not in _NET_WRAPPERS]
    transform = lambda x: x

    # GRU cells (reference convgru.py:82-121)
    if parts and parts[0].startswith("conv_gru"):
        cell = parts[0]
        inner = parts[1] if len(parts) > 1 else ""
        if inner == "gates_conv":
            return [f"{cell}/Gates/conv/{leaf}"], transform
        if inner == "output_conv":
            return [f"{cell}/Output/output_conv/{leaf}"], transform
        gn_leaf = {"scale": "gamma", "bias": "beta"}[leaf]
        gn_name, ln_name = {
            "reset_norm": ("Gates/reset_norm", "Gates/LayerNorm"),
            "update_norm": ("Gates/update_norm", "Gates/LayerNorm_1"),
            "output_norm": ("Output/output_norm", "Output/LayerNorm"),
        }[inner]
        return [f"{cell}/{gn_name}/gn/{gn_leaf}",
                f"{cell}/{ln_name}/{gn_leaf}",
                f"{cell}/{gn_name.rsplit('/', 1)[0]}/InstanceNorm/{gn_leaf}"], transform
    if parts and parts[0] == "prob_conv":
        return [f"prob_conv/{leaf}"], transform

    layer = parts[0] if parts else ""
    inner = parts[1:]

    if "gn" in inner:
        gn_leaf = {"scale": "gamma", "bias": "beta"}[leaf]
        return [f"{layer}/gn/{gn_leaf}"], transform
    if "bn" in inner:
        if collection == "batch_stats":
            bn_leaf = {"mean": "moving_mean", "var": "moving_variance"}[leaf]
        else:
            bn_leaf = {"scale": "gamma", "bias": "beta"}[leaf]
        return [f"{layer}/bn/{bn_leaf}"], transform
    if any(p.startswith("ConvTranspose") for p in inner) or "deconv" in inner:
        if leaf == "kernel":
            transform = _swap_io
        return [f"{layer}/{leaf}"], transform
    # plain conv (wrapped as conv/Conv_0 or bare Conv_0)
    return [f"{layer}/{leaf}"], transform


def import_tf_vars(var_dict: Dict[str, np.ndarray], variables,
                   strict: bool = True):
    """Copy TF variables into a Flax variables template.

    Args:
      var_dict: {tf_variable_name: numpy array} — from load_tf_checkpoint
        or an .npz export.
      variables: template pytree (e.g. model.init(...)) defining structure,
        shapes and dtypes.
      strict: raise on any template leaf missing from var_dict; otherwise
        keep the template value and warn.
    Returns the filled pytree.
    """
    flat = jax.tree_util.tree_flatten_with_path(variables)
    leaves, treedef = flat
    used = set()
    out = []
    missing = []
    for path, leaf in leaves:
        candidates, transform = flax_path_to_tf_name(path)
        tf_name = next((c for c in candidates if c in var_dict), None)
        if tf_name is not None:
            val = transform(np.asarray(var_dict[tf_name]))
            if val.shape != leaf.shape:
                raise ValueError(
                    f"shape mismatch for {tf_name}: checkpoint {val.shape} "
                    f"vs model {leaf.shape}")
            out.append(val.astype(leaf.dtype))
            used.add(tf_name)
        else:
            missing.append((tuple(str(getattr(k, 'key', k)) for k in path),
                            candidates))
            out.append(leaf)
    if missing:
        msg = f"{len(missing)} model leaves not found in the TF checkpoint: " \
              f"{missing[:5]}..."
        if strict:
            raise KeyError(msg)
        logger.warning(msg)
    unused = set(var_dict) - used
    unused = {u for u in unused
              if not any(s in u for s in ("Adam", "RMSProp", "Momentum",
                                          "global_step", "beta1_power",
                                          "beta2_power"))}
    if unused:
        logger.warning("%d checkpoint variables unused by the model: %s...",
                       len(unused), sorted(unused)[:5])
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(variables), out)


def load_tf_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a TF checkpoint (Saver prefix or .npz export) into a dict.

    Saver V2 bundles (`<path>.index` + `<path>.data-*`) are read by the
    in-repo pure-numpy bundle reader (io/tf_bundle.py) — no tensorflow
    needed. tensorflow, when present, is only a fallback for exotic
    variants the native reader rejects (e.g. re-compressed index blocks,
    partitioned variables).
    """
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}

    from mvsnet_tpu.io import tf_bundle  # noqa: PLC0415

    if tf_bundle.is_bundle(path):
        try:
            return dict(tf_bundle.read_bundle(path))
        except ValueError as e:
            logger.warning("native bundle reader failed (%s); trying "
                           "tensorflow", e)
    try:
        import tensorflow as tf  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            f"{path} is not a readable Saver V2 bundle or .npz export, "
            "and tensorflow is not installed for the fallback path; "
            "convert to .npz offline (np.savez(path, **{name: "
            "reader.get_tensor(name) for name in "
            "reader.get_variable_to_shape_map()}))") from e
    reader = tf.train.load_checkpoint(path)  # pragma: no cover
    return {name: reader.get_tensor(name)  # pragma: no cover
            for name in reader.get_variable_to_shape_map()}


def import_checkpoint(ckpt_path: str, model_dir: str,
                      regularization: str = "3DCNN",
                      network_mode: str = "normal",
                      strict: bool = True) -> str:
    """One-call import: TF checkpoint (Saver prefix / .npz) -> orbax model
    dir loadable by Predictor/test/infer (--model_dir).

    Params are shape-independent of the operating point, so the template
    inits at tiny shapes; the saved tree is {params, batch_stats}, the
    layout predict.py:81-90 restores. The step number is parsed from the
    reference's tf_model_<step>.ckpt convention when present (so
    --ckpt_step keeps meaning), else 0.
    """
    import re

    from mvsnet_tpu import checkpoint as ckpt_lib
    from mvsnet_tpu.config import ModelConfig
    from mvsnet_tpu.models import MVSNet

    cfg = ModelConfig(view_num=3, max_d=8, width=64, height=64,
                      network_mode=network_mode, compute_dtype="float32",
                      regularization=regularization)
    model = MVSNet(cfg)
    rng = np.random.default_rng(0)
    images = rng.standard_normal((1, 3, 64, 64, 3)).astype(np.float32)
    cam = np.zeros((2, 4, 4), np.float32)
    cam[0] = np.eye(4)
    cam[1, :3, :3] = [[20, 0, 8], [0, 20, 8], [0, 0, 1]]
    cam[1, 3] = [500.0, 10.0, 8, 570.0]
    cams = np.broadcast_to(cam, (1, 3, 2, 4, 4)).copy()
    ds, di = cams[:, 0, 1, 3, 0], cams[:, 0, 1, 3, 1]
    if regularization == "GRU":
        variables = model.init(jax.random.PRNGKey(0), images, cams, ds, di,
                               method=MVSNet.forward_prob_recurrent)
    else:
        variables = model.init(jax.random.PRNGKey(0), images, cams, ds, di,
                               training=False,
                               method=MVSNet.forward_3dcnn)
    filled = import_tf_vars(load_tf_checkpoint(ckpt_path), variables,
                            strict=strict)
    m = re.search(r"(\d+)", os.path.basename(ckpt_path))
    step = int(m.group(1)) if m else 0
    tree = {"params": filled["params"],
            "batch_stats": filled.get("batch_stats") or {}}
    return ckpt_lib.save_checkpoint(model_dir, regularization, network_mode,
                                    step, tree)
