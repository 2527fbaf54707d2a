"""mvsnet_tpu — a TPU-native multi-view-stereo framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
ubiquity6/MVSNet reference (TF1 / CUDA): plane-sweep MVS depth inference
(MVSNet 3D-CNN and R-MVSNet ConvGRU variants), production data plane,
training/benchmark/inference drivers and distributed depth fusion — all
engineered for TPU hardware: static shapes, `lax.scan` depth streaming,
bf16 MXU convolutions, SPMD sharding over a named device mesh, and Pallas
kernels for the hot plane-sweep/variance path.

Package map (reference parity noted per module):
  ops/       geometry, homography warping, cost volumes, soft-argmin
  models/    feature towers, 3D regularizer, ConvGRU, refinement nets
  data/      cluster/session data plane (mvs_data_generation equivalent)
  io/        PFM / cam.txt / camera.json / dmb / PLY IO
  parallel/  mesh + sharding helpers, distributed train/infer steps
  losses.py  regression & classification losses + metrics
  train.py / test.py / infer.py / fusion.py   drivers
"""

__version__ = "0.1.0"
