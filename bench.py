"""Benchmark: MVSNet 3D-CNN depth-map inference throughput on one chip.

Operating point = the reference's 3DCNN test configuration: 1152x864 input,
max_d=192, interval_scale=1.06, view_num=3 (README.md:124-125; the
reference ran this on a GTX 1080Ti).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md); the upstream R-MVSNet paper (cited at README.md:83-99)
reports ~4.7 s per depth map for MVSNet at this operating point on a GTX
1080Ti, i.e. ~0.213 maps/s — used here as the baseline denominator.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax.numpy as jnp

BASELINE_MAPS_PER_SEC = 1.0 / 4.7


def main() -> int:
    import jax

    from mvsnet_tpu.config import ModelConfig
    from mvsnet_tpu.models import MVSNet

    height, width, max_d, view_num = 864, 1152, 192, 3
    cfg = ModelConfig(view_num=view_num, max_d=max_d, width=width, height=height,
                      interval_scale=1.06, network_mode="normal",
                      compute_dtype="bfloat16", depth_chunk=32)
    model = MVSNet(cfg)

    rng = np.random.default_rng(0)
    images = rng.standard_normal((1, view_num, height, width, 3)).astype(np.float32)
    K = np.array([[width * 1.2 / 4, 0, width / 8],
                  [0, width * 1.2 / 4, height / 8], [0, 0, 1]])
    cam = np.zeros((2, 4, 4))
    cam[0] = np.eye(4)
    cam[0, 0, 3] = 40.0
    depth_start, depth_interval = 425.0, 2.5 * 1.06
    cam[1, :3, :3] = K
    cam[1, 3] = [depth_start, depth_interval, max_d,
                 depth_start + (max_d - 1) * depth_interval]
    cams = np.broadcast_to(cam, (1, view_num, 2, 4, 4)).astype(np.float32).copy()
    ds = cams[:, 0, 1, 3, 0]
    di = cams[:, 0, 1, 3, 1]

    variables = model.init(jax.random.PRNGKey(0), images, cams, ds, di,
                           training=False, method=MVSNet.forward_3dcnn)

    # Timing on this backend must account for (a) async dispatch —
    # block_until_ready can return before remote work finishes, so a scalar
    # checksum is fetched — and (b) large, VARIABLE per-fetch tunnel latency.
    # Both cancel by running N forwards inside one fori_loop (serialized via
    # a tiny data dependence) and differencing two loop lengths.
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def forward_n(variables, images, cams, ds, di, n):
        def body(_, carry):
            # carry*1e-30 keeps a loop-carried dependence without changing
            # values; prevents XLA from hoisting the loop-invariant forward.
            depth, prob = model.apply(variables, images + carry * 1e-30,
                                      cams, ds, di, training=False,
                                      method=MVSNet.forward_3dcnn)
            return jnp.sum(depth) + jnp.sum(prob)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    iters = 5
    # warmup / compile both loop lengths
    float(forward_n(variables, images, cams, ds, di, 1))
    float(forward_n(variables, images, cams, ds, di, 1 + iters))

    t0 = time.perf_counter()
    float(forward_n(variables, images, cams, ds, di, 1))
    t1 = time.perf_counter()
    float(forward_n(variables, images, cams, ds, di, 1 + iters))
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / iters

    maps_per_sec = 1.0 / dt
    print(json.dumps({
        "metric": "depth_maps_per_sec_1152x864_d192_3dcnn",
        "value": round(maps_per_sec, 4),
        "unit": "maps/s",
        "vs_baseline": round(maps_per_sec / BASELINE_MAPS_PER_SEC, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
