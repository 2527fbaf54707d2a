"""Microbenchmark: Pallas sweep kernels on the real chip.

Times the fused cost-volume kernel and the plain all-depths warp at the
3DCNN operating point (h=216, w=288, C=32, D=192, V=3, bf16) with
REALISTIC cameras (rotation + baseline, so the vertical band is honestly
exercised), checks numerics against the XLA gather path, and reports the
band span the homographies actually need.

Usage: python tools/bench_sweep.py [--xla] [--small]
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


def make_cams(view_num, width, height, depth_start, depth_interval, max_d,
              yaw_deg=4.0, roll_deg=1.0, baseline=60.0):
    """Realistic ring-of-cameras rig: yaw+roll rotations and mm baselines."""
    f = width * 1.2
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]])
    cams = np.zeros((1, view_num, 2, 4, 4), np.float32)
    for v in range(view_num):
        yaw = np.deg2rad(yaw_deg) * v
        roll = np.deg2rad(roll_deg) * v
        cy, sy = np.cos(yaw), np.sin(yaw)
        cr, sr = np.cos(roll), np.sin(roll)
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rr = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
        R = Rr @ Ry
        E = np.eye(4)
        E[:3, :3] = R
        E[0, 3] = baseline * v
        E[1, 3] = 0.3 * baseline * v
        cams[0, v, 0] = E
        cams[0, v, 1, :3, :3] = K
        cams[0, v, 1, 3] = [depth_start, depth_interval, max_d,
                            depth_start + (max_d - 1) * depth_interval]
    return cams


def band_stats(homs, H, W):
    """Max/mean in-row r0 span over all (view, depth, row)."""
    import jax
    import jax.numpy as jnp
    from mvsnet_tpu.ops.warp import projected_coords

    @jax.jit
    def spans(h):
        _, y = projected_coords(h.reshape(-1, 3, 3), H, W)
        r0 = jnp.floor(y.reshape(-1, H, W))
        return jnp.max(r0, axis=2) - jnp.min(r0, axis=2)   # (N, H)

    s = np.asarray(spans(homs))
    return float(s.max()), float(s.mean())


def timed(fn, *args, iters=8):
    """Differencing harness: cancels the variable per-fetch tunnel latency."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(n, *a):
        def body(_, carry):
            # keep the perturbed operand's dtype (f32 promotion would
            # change the kernels under test)
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--xla", action="store_true", help="also time the XLA gather path")
    ap.add_argument("--small", action="store_true", help="tiny shapes (smoke)")
    ap.add_argument("--point", default="3dcnn", choices=["3dcnn", "gru"],
                    help="gru = 1600x1184 feature res (w=400 engages the "
                         "NT=2 lane-tiled K-banded kernel), one 64-depth "
                         "chunk of the D=256 sweep")
    ap.add_argument("--skip-warp", action="store_true")
    ap.add_argument("--skip-check", action="store_true")
    ap.add_argument("--yaw", type=float, default=4.0)
    ap.add_argument("--roll", type=float, default=1.0)
    ap.add_argument("--baseline", type=float, default=60.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mvsnet_tpu.ops.geometry import homographies_for_views
    from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
    from mvsnet_tpu.ops.pallas.sweep import (
        pallas_sweep_cost_volume, pallas_warp_all_depths, BAND)

    if args.small:
        H, W, C, D, V = 32, 64, 32, 16, 3
    elif args.point == "gru":
        H, W, C, D, V = 296, 400, 32, 64, 3
    else:
        H, W, C, D, V = 216, 288, 32, 192, 3
    depth_start, depth_interval = 425.0, 2.5 * 1.06

    cams = make_cams(V, W * 4, H * 4, depth_start, depth_interval, D,
                     yaw_deg=args.yaw, roll_deg=args.roll,
                     baseline=args.baseline)
    # features live at 1/4 res: scale K
    cams_s = cams.copy()
    cams_s[:, :, 1, :3, :3] *= 0.25
    cams_s[:, :, 1, 2, 2] = 1.0

    homs = homographies_for_views(jnp.asarray(cams_s), D, depth_start,
                                  depth_interval)          # (V-1, 1, D, 3, 3)
    smax, smean = band_stats(homs, H, W)
    print(f"band r0-span: max={smax:.0f} mean={smean:.2f} (BAND={BAND})")

    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.bfloat16)
    views = jnp.asarray(rng.standard_normal((V - 1, H, W, C)), jnp.bfloat16)
    homs_b0 = homs[:, 0]                                   # (V-1, D, 3, 3)

    # numerics vs XLA gather path — error reduced ON-device (the full
    # volumes are ~1.5 GB each; fetching them through the tunnel stalls,
    # and holding pallas+XLA volumes plus gather temporaries OOMs HBM at
    # full D, so the check runs on a depth subset at full spatial size)
    import jax as _jax
    Dc = min(D, 48)

    @_jax.jit
    def check(ref, views, homs):
        got = pallas_sweep_cost_volume(ref, views, homs[:, 0]).astype(jnp.float32)
        want = plane_sweep_cost_volume(
            ref[None], views[:, None], homs, use_pallas=False,
            out_dtype=jnp.float32)[0]
        d = jnp.abs(got - want)
        return jnp.max(d), jnp.max(jnp.abs(want))

    if not args.skip_check:
        err, scale = check(ref, views, homs[:, :, :Dc])
        err, scale = float(err), float(scale)
        print(f"fused-kernel max abs err vs XLA (D={Dc}): "
              f"{err:.3e} (rel {err / max(scale, 1e-9):.3e})")

    dt_fused = timed(lambda r, v, h: pallas_sweep_cost_volume(r, v, h),
                     ref, views, homs_b0)
    results = {"fused_cost_s": round(dt_fused, 5)}
    print(f"fused cost volume: {dt_fused * 1e3:.1f} ms")

    if not args.skip_warp:
        dt_warp = timed(lambda img, h: pallas_warp_all_depths(img, h),
                        views[0], homs_b0[0])
        results["warp_s"] = round(dt_warp, 5)
        print(f"plain warp (1 view, all depths): {dt_warp * 1e3:.1f} ms")

    if args.xla:
        dt_xla = timed(
            lambda r, v, h: plane_sweep_cost_volume(r[None], v[:, None], h,
                                                    use_pallas=False)[0],
            ref, views, homs)
        results["xla_cost_s"] = round(dt_xla, 5)
        print(f"XLA gather cost volume: {dt_xla * 1e3:.1f} ms")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
