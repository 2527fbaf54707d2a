"""Chip smoke for the D-pack conv3d kernel: compile + numerics at a
small shape (set MVSNET_TPU_CONV3D_DPACK=1 when invoking)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from mvsnet_tpu.ops.pallas.conv3d import rowconv3d_fused, _xla_conv3d


def main() -> int:
    rng = np.random.default_rng(0)
    for (D, H, W, C, Co) in [(8, 64, 256, 8, 8), (8, 64, 256, 32, 8),
                             (8, 64, 256, 8, 1)]:
        x = jnp.asarray(rng.standard_normal((1, D, H, W, C)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, C, Co)) * 0.1,
                        jnp.bfloat16)
        got = np.asarray(rowconv3d_fused(x, k), np.float32)
        exp = np.asarray(_xla_conv3d(x, k), np.float32)
        err = float(np.abs(got - exp).max())
        print(f"dpack {C}->{Co} chip err: {err:.4f}", flush=True)
        assert err < 0.1, err
    print("dpack smoke OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
