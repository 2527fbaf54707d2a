#!/usr/bin/env python
"""Probe: is the Pallas conv3d per-ROW fixed cost real, and how big?

Runs the 32->8 full-res layer at constant voxel count but different
(H, W) aspect ratios: if time tracks H (row count) rather than H*W,
the ~0.3 us/row fixed cost hypothesis (BENCHMARKS.md r3b) is confirmed
and its size drops out of the slope. Also times a matmul-only floor
(staging writes removed would need a kernel edit; instead we time the
XLA matmul equivalent of the per-slab contraction for reference).

Chip tool — run bare (no env overrides), NEVER concurrently with
another bench.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=8):
    # latency-cancelled + loop-carried perturbation so XLA can't hoist
    # the body (same harness as tools/bench_conv.py:timed)
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(n, *a):
        def body(_, carry):
            perturbed = (a[0] + carry * 1e-30).astype(a[0].dtype)
            out = fn(*((perturbed,) + a[1:]))
            return jnp.sum(out).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(1, *args))
    float(loop(1 + iters, *args))
    t0 = time.perf_counter()
    float(loop(1, *args))
    t1 = time.perf_counter()
    float(loop(1 + iters, *args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters


def main():
    from mvsnet_tpu.ops.pallas.conv3d import rowconv3d, rowconv3d_supported

    rng = np.random.default_rng(0)
    D, Cin, Cout = 192, 32, 8
    shapes = [(216, 288), (108, 576), (54, 1152), (432, 144)]
    w_ = jnp.asarray(rng.standard_normal((3, 3, 3, Cin, Cout)) * 0.1,
                     jnp.bfloat16)
    for H, W in shapes:
        x = jnp.asarray(rng.standard_normal((1, D, H, W, Cin)), jnp.bfloat16)
        if not rowconv3d_supported(D, H, W, Cin, Cout):
            print(f"H={H:4d} W={W:4d}: unsupported")
            continue
        t = timed(lambda a, b: rowconv3d(a, b, 1), x, w_)
        rows = D * H
        print(f"H={H:4d} W={W:4d}: {t*1e3:7.2f} ms  "
              f"({t/rows*1e9:6.0f} ns/row, {rows} rows)", flush=True)


if __name__ == "__main__":
    main()
