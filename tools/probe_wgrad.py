"""Per-layer conv3d weight-grad timings at the training point.

The corrected r4f stage bench localized ~137 ms of the 616 ms train step
to RegNet weight grads (dk+dx 205.8 vs dx-only 69.1). XLA's native conv
wgrad emits tiny-output convs; the XWGRAD huge-K matmul reformulation
LOST on chip (+20%, r4g — the 9x shifted-g HBM materialization beats the
matmul-shape win). This probe times each RegNet-lite layer's dk alone so
a future in-VMEM Pallas dk kernel (build the 9-row G matrix per row in
VMEM, no HBM concats) knows which layer class pays.

Usage: python tools/probe_wgrad.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import time

import numpy as np


def timed(fn, *args, iters=6):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(n, *a):
        def body(_, carry):
            perturbed = jax.tree.map(
                lambda t: (t + carry * 1e-30).astype(t.dtype), a[0])
            out = fn(*((perturbed,) + a[1:]))
            sums = jax.tree.leaves(jax.tree.map(
                lambda t: jnp.sum(t.astype(jnp.float32)), out))
            total = sums[0]
            for s in sums[1:]:
                total = total + s
            return total.astype(jnp.float32)
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
    import jax
    import jax.numpy as jnp

    from mvsnet_tpu.ops.pallas.conv3d import _xla_conv3d
    from mvsnet_tpu.ops.pallas.deconv3d import _xla_deconv3d

    # RegNet-lite layer shapes at the 640x480xD192 train point
    # (D, h, w) = (192, 120, 160); b = 4
    D, h, w = 192, 120, 160
    layers = [
        ("0_1 s1 16->4 full", (1, D, h, w, 16), (3, 3, 3, 16, 4), 1),
        ("1_0 s2 16->8", (1, D, h, w, 16), (3, 3, 3, 16, 8), 2),
        ("1_1 s1 8->8 half", (1, D // 2, h // 2, w // 2, 8),
         (3, 3, 3, 8, 8), 1),
        ("2_0 s2 8->16", (1, D // 2, h // 2, w // 2, 8),
         (3, 3, 3, 8, 16), 2),
        ("2_1 s1 16->16 quar", (1, D // 4, h // 4, w // 4, 16),
         (3, 3, 3, 16, 16), 1),
        ("3_0 s2 16->32", (1, D // 4, h // 4, w // 4, 16),
         (3, 3, 3, 16, 32), 2),
        ("3_1 s1 32->32 eigh", (1, D // 8, h // 8, w // 8, 32),
         (3, 3, 3, 32, 32), 1),
        ("6_2 s1 4->1 full", (1, D, h, w, 4), (3, 3, 3, 4, 1), 1),
        ("dec 32->16", (1, D // 8, h // 8, w // 8, 32),
         (3, 3, 3, 32, 16), -2),
        ("dec 16->8", (1, D // 4, h // 4, w // 4, 16),
         (3, 3, 3, 16, 8), -2),
        ("dec 8->4", (1, D // 2, h // 2, w // 2, 8),
         (3, 3, 3, 8, 4), -2),
    ]
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    results = {}
    total = 0.0
    for name, xs, ks, s in layers:
        x = jnp.asarray(rng.standard_normal(xs), dt)
        k = jnp.asarray(rng.standard_normal(ks) * 0.1, jnp.float32)
        if s == -2:
            fwd = lambda a, b: _xla_deconv3d(a, b.astype(a.dtype))
            go = (1, xs[1] * 2, xs[2] * 2, xs[3] * 2, ks[4])
        else:
            fwd = lambda a, b, s=s: _xla_conv3d(a, b.astype(a.dtype), s)
            go = (1, xs[1] // s, xs[2] // s, xs[3] // s, ks[4])
        g = jnp.asarray(rng.standard_normal(go), dt)

        def dk_only(a, kk, fwd=fwd, g=g):
            _, wgrad = jax.vjp(lambda q: fwd(a, q), kk)
            (dk,) = wgrad(g.astype(fwd(a, kk).dtype))
            return dk

        t = timed(dk_only, x, k)
        total += t
        print(f"{name:22s} dk {t*1e3:7.2f} ms", flush=True)
        results[name] = round(t, 5)
    print(f"{'TOTAL dk':22s}    {total*1e3:7.2f} ms", flush=True)
    results["total_s"] = round(total, 5)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
