"""SPMD parallelism: device meshes, sharding constraints, distributed steps.

The reference's only strategy was single-host multi-GPU replication with a
CPU-side gradient average (reference: train.py:155-186,424-445). Here the
scaling axes native to plane-sweep MVS are first-class mesh axes:

  data   — clusters/batch (pure data parallel; gradient psum over ICI)
  depth  — depth-plane slabs of the cost volume (the memory axis; GSPMD
           inserts halo exchange for the 3D U-Net's D-convolutions)
  space  — spatial tiling of features/volumes (halo exchange likewise)

Gradient reduction, collective softmax over sharded depth, and halo
exchanges are all emitted by XLA from sharding annotations — no hand-written
collectives in the model code.

There is deliberately NO 'view' mesh axis: V-1 <= 7 source views each do
independent full-image work, which the warp kernel / XLA already saturate
per chip; splitting views across chips would replicate the reference
feature map everywhere and fragment MXU work for no bandwidth win. View
accumulation stays intra-chip (fused into the sweep kernel).
"""

from mvsnet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    factorize_devices,
    set_active_mesh,
    active_mesh,
    constrain,
)

# make_sharded_train_step lives in mvsnet_tpu.parallel.train_step; import it
# from there directly (importing it here would cycle through train_lib).
