"""Per-stage breakdown of the 3DCNN inference graph on the real chip.

Times each stage of forward_3dcnn in isolation at the 1152x864, D=192,
V=3 bf16 operating point with the realistic ring rig (same as bench.py):
feature net, fused cost volume, RegNetUS0, soft-argmin tail. The sum
won't exactly match bench.py (no cross-stage fusion), but it shows where
the milliseconds live.

Usage: python tools/bench_stages.py [--stage STAGE]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import functools
import json
import time

import numpy as np


def timed(fn, *args, iters=8):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(n, *a):
        def body(_, carry):
            perturbed = jax.tree.map(
                lambda t: (t + carry * 1e-30).astype(t.dtype), a[0])
            out = fn(*((perturbed,) + a[1:]))
            return (jnp.sum(out[0]) if isinstance(out, tuple)
                    else jnp.sum(out)).astype(jnp.float32)
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["all", "features", "cost", "regnet", "tail"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from mvsnet_tpu.config import ModelConfig
    from mvsnet_tpu.models.feature_net import UNetDS2GN
    from mvsnet_tpu.models.regnet import RegNetUS0
    from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
    from mvsnet_tpu.ops.depth import probability_map, soft_argmin
    from mvsnet_tpu.ops.geometry import homographies_for_views

    W, H, D, V = 1152, 864, 192, 3
    h, w, C = H // 4, W // 4, 32
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    results = {}
    want = lambda s: args.stage in ("all", s)

    if want("features"):
        net = UNetDS2GN("normal", dtype=dt)
        imgs = jnp.asarray(rng.standard_normal((V, H, W, 3)), dt)
        params = jax.jit(net.init)(jax.random.PRNGKey(0), imgs[:1, :64, :64])
        t = timed(lambda x, p: net.apply(p, x), imgs, params)
        print(f"features (3 views)      {t*1e3:7.2f} ms", flush=True)
        results["features_s"] = round(t, 5)

    cams = bench_mod.make_rig(V, W, H, 425.0, 2.5 * 1.06, D)
    # cams scaled to the feature resolution
    cams_s = cams.copy()
    cams_s[:, :, 1, :2] /= 4.0
    depth_start = jnp.full((1,), 425.0, jnp.float32)
    depth_interval = jnp.full((1,), 2.5 * 1.06, jnp.float32)
    depth_end = depth_start + (D - 1) * depth_interval

    if want("cost"):
        ref_f = jnp.asarray(rng.standard_normal((1, h, w, C)), dt)
        view_f = jnp.asarray(rng.standard_normal((V - 1, 1, h, w, C)), dt)
        homs = homographies_for_views(jnp.asarray(cams_s), D, depth_start,
                                      depth_interval, depth_end)

        def cost(rv, h_):
            r, v = rv
            return plane_sweep_cost_volume(r, v, h_, use_pallas=True)

        t = timed(cost, (ref_f, view_f), homs)
        print(f"fused cost volume       {t*1e3:7.2f} ms", flush=True)
        results["cost_s"] = round(t, 5)

    if want("regnet"):
        net = RegNetUS0("normal", dtype=dt)
        cv = jnp.asarray(rng.standard_normal((1, D, h, w, C)), dt)
        params = jax.jit(lambda k, x: net.init(k, x, False))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 16, 32, 32, C), dt))
        t = timed(lambda x, p: net.apply(p, x, False), cv, params)
        print(f"RegNetUS0 3D U-Net      {t*1e3:7.2f} ms", flush=True)
        results["regnet_s"] = round(t, 5)

    if want("tail"):
        reg = jnp.asarray(rng.standard_normal((1, D, h, w)), jnp.float32)

        def tail(r):
            depth_map, prob_volume = soft_argmin(r, depth_start,
                                                 depth_interval, D)
            pm = probability_map(prob_volume, depth_map, depth_start,
                                 depth_interval)
            return depth_map + pm

        t = timed(tail, reg)
        print(f"soft-argmin + prob map  {t*1e3:7.2f} ms", flush=True)
        results["tail_s"] = round(t, 5)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
