"""Chip probe: the Pallas s2/deconv weight-grad kernel (_PWGRAD_S2).

Per RegNet-lite training shape: numerics vs the known-good XLA huge-K
matmul form (_wgrad_matmul_s2) + differenced timing of both.

Usage: python tools/probe_dks2.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=8):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(n, *a):
        def body(_, carry):
            out = fn(a[0] + carry * 1e-30, *a[1:])
            return jnp.sum(out.astype(jnp.float32))
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
    import jax.numpy as jnp

    from mvsnet_tpu.ops.pallas.conv3d import (
        _pallas_wgrad_s2, _swap_cw, _wgrad_matmul_s2,
        rowconv3d_dks2_supported)

    rng = np.random.default_rng(0)
    results = {}
    # (D, H, W, C, Cg): RegNet-lite s2 layers at the train point + the
    # deconv role (full-res cotangent as source)
    for shape in [(192, 120, 160, 8, 16), (96, 60, 80, 16, 32),
                  (192, 120, 160, 16, 8)]:
        D, H, W, C, Cg = shape
        assert rowconv3d_dks2_supported(D, H, W, C, Cg, jnp.bfloat16), shape
        x = jnp.asarray(rng.standard_normal((1, D, H, W, C)), jnp.bfloat16)
        g = jnp.asarray(
            rng.standard_normal((1, D // 2, H // 2, W // 2, Cg)),
            jnp.bfloat16)
        x_cw, g_cw = _swap_cw(x), _swap_cw(g)

        dk_p = np.asarray(_pallas_wgrad_s2(x_cw, g_cw))
        dk_x = np.asarray(_wgrad_matmul_s2(
            x.astype(jnp.float32), g.astype(jnp.float32), (3, 3, 3, C, Cg)))
        scale = np.abs(dk_x).max() + 1e-9
        err = np.abs(dk_p - dk_x).max() / scale
        tp = timed(lambda a: _pallas_wgrad_s2(a, g_cw), x_cw)
        tx = timed(lambda a: _wgrad_matmul_s2(a, g.astype(jnp.float32),
                                              (3, 3, 3, C, Cg)),
                   x.astype(jnp.float32))
        key = "x".join(map(str, shape))
        print(f"{key}: rel_err={err:.4g} pallas={tp*1e3:.2f}ms "
              f"xla_mm={tx*1e3:.2f}ms", flush=True)
        results[key] = {"rel_err": round(float(err), 6),
                        "pallas_ms": round(tp * 1e3, 2),
                        "xla_mm_ms": round(tx * 1e3, 2)}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
