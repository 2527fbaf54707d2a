"""Component breakdown of the R-MVSNet GRU operating point on the chip.

1600x1184, D=256, V=3, bf16 — the BENCH gru metric runs 1.06 s/map end to
end (round 1). This times the pieces in isolation to aim the next kernel:
  features   UNetDS2GN on 3 views
  cost       plane-sweep cost volume at (296, 400, 32) x D256
  gru        256-step scan of the 3-cell ConvGRU regularizer
  wta        winner-take-all + prob tail

Usage: python tools/bench_gru.py [--part features|cost|gru|wta|all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_rig, timed_loop  # noqa: E402  (repo-root bench.py)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="all",
                    choices=["features", "cost", "gru", "wta", "all"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mvsnet_tpu.models.feature_net import UNetDS2GN
    from mvsnet_tpu.models.gru import GRURegularizer
    from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
    from mvsnet_tpu.ops.depth import winner_take_all_update
    from mvsnet_tpu.ops.geometry import depth_values, homographies_for_views

    height, width, max_d, view_num = 1184, 1600, 256, 3
    h, w, C = height // 4, width // 4, 32
    rng = np.random.default_rng(0)
    results = {}
    parts = ([args.part] if args.part != "all"
             else ["features", "cost", "gru", "wta"])

    if "features" in parts:
        net = UNetDS2GN("normal", dtype="bfloat16")
        imgs = jnp.asarray(rng.standard_normal((view_num, height, width, 3)),
                           jnp.float32)
        variables = jax.jit(net.init)(jax.random.PRNGKey(0), imgs)

        def step(carry):
            f = net.apply(variables, imgs + carry * 1e-30)
            return jnp.sum(f).astype(jnp.float32)

        t, _sm = timed_loop(step, iters=4)
        print(f"features (3 views): {t*1e3:8.2f} ms")
        results["features"] = round(t, 5)

    if "cost" in parts:
        depth_start, depth_interval = 425.0, 2.0
        cams = make_rig(view_num, width, height, depth_start, depth_interval,
                        max_d)
        cams_s = cams.copy()
        cams_s[:, :, 1, :3, :3] *= 0.25
        cams_s[:, :, 1, 2, 2] = 1.0
        homs = homographies_for_views(
            jnp.asarray(cams_s), max_d,
            jnp.array([depth_start]), jnp.array([depth_interval]),
            jnp.array([depth_start + (max_d - 1) * depth_interval]))
        ref = jnp.asarray(rng.standard_normal((1, h, w, C)), jnp.bfloat16)
        views = jnp.asarray(rng.standard_normal((view_num - 1, 1, h, w, C)),
                            jnp.bfloat16)

        def step(carry):
            cv = plane_sweep_cost_volume(ref + carry.astype(jnp.bfloat16)
                                         * 1e-30, views, homs)
            return jnp.sum(cv.astype(jnp.float32))

        t, _sm = timed_loop(step, iters=3)
        print(f"cost volume:        {t*1e3:8.2f} ms")
        results["cost"] = round(t, 5)

    if "gru" in parts:
        from flax import linen as nn

        reg_mod = GRURegularizer("normal", dtype="bfloat16")
        cost_by_depth = jnp.asarray(
            rng.standard_normal((max_d, 1, h, w, C)) * 0.1, jnp.bfloat16)
        init_states = GRURegularizer.init_states(1, h, w, "normal",
                                                 jnp.float32)
        variables = jax.jit(reg_mod.init)(jax.random.PRNGKey(0),
                                          cost_by_depth[0], init_states)

        def sweep(cost):
            def body(states, cost_d):
                out, new_states = reg_mod.apply(variables, -cost_d, states)
                return new_states, out.astype(jnp.float32)

            _, regs = jax.lax.scan(body, init_states, cost)
            return regs

        def step(carry):
            r = sweep(cost_by_depth + carry.astype(jnp.bfloat16) * 1e-30)
            return jnp.sum(r)

        t, _sm = timed_loop(step, iters=3)
        print(f"gru scan (D=256):   {t*1e3:8.2f} ms")
        results["gru"] = round(t, 5)

    if "wta" in parts:
        regs = jnp.asarray(rng.standard_normal((1, max_d, h, w)) * 0.1,
                           jnp.float32)
        samples = depth_values(jnp.array([425.0]), jnp.array([2.0]), max_d)

        def step(carry):
            prob = jnp.exp(regs + carry * 1e-30)
            c = (jnp.zeros((1, h, w, 1)), jnp.zeros((1, h, w, 1)),
                 jnp.zeros((1, h, w, 1)))

            def body(cc, xs):
                p, d = xs
                return winner_take_all_update(cc, p[..., None], d), None

            (mx, dep, es), _ = jax.lax.scan(
                body, c, (jnp.moveaxis(prob, 1, 0),
                          jnp.moveaxis(samples, 1, 0)))
            return (jnp.sum(dep) + jnp.sum(mx / (es + 1e-7))).astype(
                jnp.float32)

        t, _sm = timed_loop(step, iters=3)
        print(f"wta tail:           {t*1e3:8.2f} ms")
        results["wta"] = round(t, 5)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
