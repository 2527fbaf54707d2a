"""Pallas TPU kernels for the hot ops.

sweep.py — plane-sweep homography warp as one-hot banded MXU matmuls
          (gather-free; the TPU-native replacement for the XLA gather warp).
"""

from mvsnet_tpu.ops.pallas.sweep import (  # noqa: F401
    pallas_cost_supported,
    pallas_sweep_cost_volume,
    pallas_sweep_supported,
    pallas_warp_all_depths,
)
