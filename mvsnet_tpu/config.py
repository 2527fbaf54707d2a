"""Typed configuration for mvsnet_tpu.

Replaces the reference's process-global `tf.app.flags` system
(reference: mvsnet/train.py:35-137, test.py:22-86, inference.py:18-80)
with immutable dataclasses that can be passed explicitly, hashed for jit
static args, and serialized to/from JSON for experiment configs.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional

import jax.numpy as jnp

# Width divisors per network mode (reference: cnn_wrapper/network.py:75-85).
NETWORK_MODE_DIVISORS = {
    "normal": 1.0,
    "semilite": 4.0 / 3.0,
    "lite": 2.0,
    "ultralite": 4.0,
    "fat": 0.5,
    "ultrafat": 0.25,
}


def base_divisor(network_mode: str) -> float:
    try:
        return NETWORK_MODE_DIVISORS[network_mode]
    except KeyError:
        raise ValueError(
            f"unknown network_mode {network_mode!r}; expected one of "
            f"{sorted(NETWORK_MODE_DIVISORS)}"
        )


def scaled_filters(base: int, network_mode: str) -> int:
    """Filter-count scaling: max(1, int(base / divisor)).

    Matches the reference arithmetic exactly (int() truncation, floor at 1)
    so channel counts line up for checkpoint-level parity
    (reference: cnn_wrapper/mvsnetworks.py:23,41,58,127,166).
    """
    return max(1, int(base / base_divisor(network_mode)))


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static model hyperparameters (jit-static).

    Defaults mirror the reference training flags (train.py:53-90).
    """

    view_num: int = 3
    max_d: int = 192
    width: int = 640
    height: int = 480
    sample_scale: float = 0.25        # cost volume resolution vs input
    interval_scale: float = 1.0
    base_image_size: int = 8
    inverse_depth: bool = False
    regularization: str = "3DCNN"     # "3DCNN" | "GRU"
    network_mode: str = "normal"
    refinement: bool = False
    refinement_network: str = "original"   # "original" | "unet"
    upsample_before_refinement: bool = True
    refine_with_confidence: bool = False
    refine_with_stereo: bool = False
    residual_refinement: bool = True
    prob_num_buckets: int = 4
    # TPU-specific knobs (no reference equivalent):
    compute_dtype: str = "bfloat16"   # conv compute dtype; params stay f32
    depth_chunk: int = 16             # depth planes per scan step in cost volume
    use_pallas: bool = True           # fused Pallas warp+variance kernel on TPU

    @property
    def base_divisor(self) -> float:
        return base_divisor(self.network_mode)

    @property
    def feature_channels(self) -> int:
        """Output channels of the feature tower = 4 * scaled base filter 8."""
        return scaled_filters(8, self.network_mode) * 4

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def feature_height(self) -> int:
        return int(self.height * self.sample_scale)

    @property
    def feature_width(self) -> int:
        return int(self.width * self.sample_scale)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: train.py:92-135)."""

    batch_size: int = 1
    epoch: int = 1
    max_steps_per_epoch: Optional[int] = None
    base_lr: float = 1e-3
    stepvalue: int = 70000            # lr decay interval (exponential, continuous)
    gamma: float = 0.5                # lr decay rate
    snapshot: int = 5000              # checkpoint every N steps
    optimizer: str = "rmsprop"        # "rmsprop" | "momentum" | "adam"
    loss_type: str = "power"          # "original" | "power" | "gaussian"
    alpha: float = 0.25
    beta: float = 0.0
    eta: float = 0.02
    grad_loss: bool = True
    refinement_train_mode: str = "all"   # "all" | "refine_only" | "main_only"
    val_batch_size: int = 100
    train_steps_per_val: int = 500
    seed: int = 0
    # TPU-specific:
    num_devices: Optional[int] = None    # None = all local devices (data parallel)
    remat: bool = True                   # jax.checkpoint on cost volume / regularizer


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Data-plane parameters (reference: cluster_generator.py:28-56)."""

    data_dir: str = ""
    view_num: int = 3
    image_width: int = 640
    image_height: int = 480
    depth_num: int = 192
    interval_scale: float = 1.0
    base_image_size: int = 8
    output_scale: float = 0.25
    flip_cams: bool = False
    sessions_frac: float = 1.0
    max_clusters_per_session: Optional[int] = None
    include_empty: bool = False
    clear_cache: bool = False
    prefetch: int = 2


def _to_jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _to_jsonable(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    return obj


def save_config(path: str, **configs) -> None:
    with open(path, "w") as f:
        json.dump({k: _to_jsonable(v) for k, v in configs.items()}, f, indent=2)


def load_config(path: str):
    with open(path) as f:
        raw = json.load(f)
    out = {}
    for key, cls in (("model", ModelConfig), ("train", TrainConfig), ("data", DataConfig)):
        if key in raw:
            out[key] = cls(**raw[key])
    return out
