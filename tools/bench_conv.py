"""Layout experiments for the small-channel conv stages on the real chip.

The UNetDS2GN feature tower (models/feature_net.py) spends most of its
time in 8-16 channel convs at full 864x1152 resolution; RegNetUS0 in
8-64 channel 3D convs. With NHWC those channel counts waste most of the
128 MXU/VPU lanes. This tool times representative conv(+GN) stacks under
different layouts/dtypes to pick the production lowering.

Usage: PYTHONPATH=$PYTHONPATH:. python tools/bench_conv.py [--case CASE]
"""

from __future__ import annotations

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


def gn(x, G, eps=1e-5, channel_axis=-1):
    import jax
    import jax.numpy as jnp
    xf = x.astype(jnp.float32)
    if channel_axis == -1:
        N = xf.shape[0]
        C = xf.shape[-1]
        spatial = xf.shape[1:-1]
        xg = xf.reshape(N, *spatial, G, C // G)
        axes = tuple(range(1, 1 + len(spatial))) + (xf.ndim,)
    else:  # channel axis 1 (NCHW)
        N, C = xf.shape[:2]
        spatial = xf.shape[2:]
        xg = xf.reshape(N, G, C // G, *spatial)
        axes = (2,) + tuple(range(3, 3 + len(spatial)))
    m = xg.mean(axis=axes, keepdims=True)
    v = xg.var(axis=axes, keepdims=True)
    xg = (xg - m) * jax.lax.rsqrt(v + eps)
    return xg.reshape(x.shape).astype(x.dtype)


def stack_nhwc(x, ws):
    """conv3x3(3->8) GN relu, conv3x3(8->8) GN relu, conv5x5s2(8->16) GN."""
    import jax
    import jax.numpy as jnp
    dn = jax.lax.conv_dimension_numbers(x.shape, ws[0].shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, ws[0], (1, 1), "SAME",
                                     dimension_numbers=dn)
    y = jax.nn.relu(gn(y, 1))
    dn = jax.lax.conv_dimension_numbers(y.shape, ws[1].shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(y, ws[1], (1, 1), "SAME",
                                     dimension_numbers=dn)
    y = jax.nn.relu(gn(y, 1))
    dn = jax.lax.conv_dimension_numbers(y.shape, ws[2].shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(y, ws[2], (2, 2), "SAME",
                                     dimension_numbers=dn)
    return jax.nn.relu(gn(y, 2))


def stack_nchw(x, ws):
    import jax
    import jax.numpy as jnp
    dn = jax.lax.conv_dimension_numbers(x.shape, ws[0].shape,
                                        ("NCHW", "OIHW", "NCHW"))
    y = jax.lax.conv_general_dilated(x, ws[0], (1, 1), "SAME",
                                     dimension_numbers=dn)
    y = jax.nn.relu(gn(y, 1, channel_axis=1))
    dn = jax.lax.conv_dimension_numbers(y.shape, ws[1].shape,
                                        ("NCHW", "OIHW", "NCHW"))
    y = jax.lax.conv_general_dilated(y, ws[1], (1, 1), "SAME",
                                     dimension_numbers=dn)
    y = jax.nn.relu(gn(y, 1, channel_axis=1))
    dn = jax.lax.conv_dimension_numbers(y.shape, ws[2].shape,
                                        ("NCHW", "OIHW", "NCHW"))
    y = jax.lax.conv_general_dilated(y, ws[2], (2, 2), "SAME",
                                     dimension_numbers=dn)
    return jax.nn.relu(gn(y, 2, channel_axis=1))


def conv_im2col(x, w, stride=1):
    """3x3/5x5 SAME conv as shifted-copy im2col + ONE matmul.

    XLA's TPU conv lowering pads Cin and Cout to the 128-lane MXU width
    independently per tap; at C=8 that's a ~256x FLOP inflation. im2col
    pays the pad once: K = k*k*Cin -> 128, N = Cout -> 128.
    """
    import jax
    import jax.numpy as jnp
    kh, kw, cin, cout = w.shape
    B, H, W, C = x.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    cols = [xp[:, dy:dy + H, dx:dx + W, :]
            for dy in range(kh) for dx in range(kw)]
    patches = jnp.concatenate(cols, axis=-1)          # (B, H, W, k*k*C)
    if stride > 1:
        patches = patches[:, ::stride, ::stride]
    return jax.lax.dot_general(
        patches, w.reshape(kh * kw * cin, cout),
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def stack_im2col(x, ws):
    import jax
    y = conv_im2col(x, ws[0])
    y = jax.nn.relu(gn(y, 1))
    y = conv_im2col(y, ws[1])
    y = jax.nn.relu(gn(y, 1))
    y = conv_im2col(y, ws[2], stride=2)
    return jax.nn.relu(gn(y, 2))


def conv3d_widen(x, w, s=1):
    """3x3x3 conv as a 1x1x3 conv with N=(dz,dy,Cout) + 9 shifted adds.

    XLA's TPU conv pads Cout to the 128 MXU lanes; at Cout=8 that is a 16x
    FLOP inflation. Folding the (dz, dy) taps into the output-channel dim
    lifts N to 9*Cout (72->128 for Cout=8, a 1.78x pad) while K=(dx, Cin)
    stays in the contraction — the tap combine becomes 9 cheap shifted adds
    that XLA fuses into one pass.
    """
    import jax
    import jax.numpy as jnp
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (3, 3, 3)
    k2 = jnp.transpose(w, (2, 3, 0, 1, 4)).reshape(1, 1, kw, cin, kd * kh * cout)
    d = jax.lax.conv_dimension_numbers(x.shape, k2.shape,
                                       ("NDHWC", "DHWIO", "NDHWC"))
    p = jax.lax.conv_general_dilated(x, k2, (1, 1, s), "SAME",
                                     dimension_numbers=d)
    B, D, H, W, _ = p.shape
    pp = jnp.pad(p, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    out = None
    # SAME pad_low is 1 at stride 1 but 0 at stride 2 (k=3): shift starts.
    o = s - 1
    for dz in range(3):
        for dy in range(3):
            i = dz * 3 + dy
            term = pp[:, dz + o:dz + o + D:s, dy + o:dy + o + H:s, :,
                      i * cout:(i + 1) * cout]
            out = term if out is None else out + term
    return out


def regnet3d_ndhwc(x, ws):
    """3x3x3 conv stacks at the RegNet scales (D=192, h=216, w=288)."""
    import jax
    dn = ("NDHWC", "DHWIO", "NDHWC")
    y = x
    for w in ws:
        d = jax.lax.conv_dimension_numbers(y.shape, w.shape, dn)
        s = (2, 2, 2) if w.shape[-1] > w.shape[-2] else (1, 1, 1)
        y = jax.lax.conv_general_dilated(y, w, s, "SAME",
                                         dimension_numbers=d)
        y = jax.nn.relu(gn(y, 1))
    return y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="2d",
                    choices=["2d", "3d", "pallas3d", "pallas2d"])
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax.numpy as jnp
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    results = {}

    if args.case == "2d":
        B, H, W = 3, 864, 1152
        x = jnp.asarray(rng.standard_normal((B, H, W, 3)), dt)
        ws = [jnp.asarray(rng.standard_normal(s) * 0.1, dt) for s in
              [(3, 3, 3, 8), (3, 3, 8, 8), (5, 5, 8, 16)]]
        dt_nhwc = timed(stack_nhwc, x, ws)
        print(f"2d NHWC {args.dtype}: {dt_nhwc*1e3:.2f} ms")
        results["nhwc"] = dt_nhwc

        xc = jnp.transpose(x, (0, 3, 1, 2))
        wsc = [jnp.transpose(w, (3, 2, 0, 1)) for w in ws]
        dt_nchw = timed(stack_nchw, xc, wsc)
        print(f"2d NCHW {args.dtype}: {dt_nchw*1e3:.2f} ms")
        results["nchw"] = dt_nchw

        dt_i2c = timed(stack_im2col, x, ws)
        print(f"2d im2col {args.dtype}: {dt_i2c*1e3:.2f} ms")
        results["im2col"] = dt_i2c
        # numerics cross-check on a slice
        import jax
        a = np.asarray(stack_nhwc(x[:1, :64, :64], ws), np.float32)
        b = np.asarray(stack_im2col(x[:1, :64, :64], ws), np.float32)
        print("im2col vs conv max abs err:", float(np.abs(a - b).max()))
    elif args.case == "pallas2d":
        # feature-net / GRU 3x3 s1 layers: per-row Pallas kernel vs XLA
        import jax

        from mvsnet_tpu.ops.pallas.conv2d import _xla_conv2d, rowconv2d
        cases = [
            ("2dconv0_1 8->8 full", (3, 864, 1152, 8)),
            ("2dconv8_2 16->8 full", (3, 864, 1152, 16), 8),
            ("2dconv1_1 16->16 1/2", (3, 432, 576, 16)),
            ("2dconv2_1 32->32 1/4", (3, 216, 288, 32)),
            ("gru cell 48->32 1/4", (1, 296, 400, 48), 32),
        ]
        for case in cases:
            name, xs = case[0], case[1]
            cout = case[2] if len(case) > 2 else xs[-1]
            x = jnp.asarray(rng.standard_normal(xs), dt)
            w_ = jnp.asarray(
                rng.standard_normal((3, 3, xs[-1], cout)) * 0.1, dt)
            fl = 2 * np.prod(xs[:3]) * 9 * xs[-1] * cout
            for tag, fn in (("xla", _xla_conv2d), ("pallas", rowconv2d)):
                t = timed(fn, x, w_)
                print(f"{name:24s} {tag:6s} {t*1e3:7.2f} ms  ({fl/1e9:6.1f} GF"
                      f" -> {fl/t/1e12:5.1f} TF/s)", flush=True)
                results[f"{name} {tag}"] = round(t, 5)
    elif args.case == "pallas3d":
        # the per-slab wide-N Pallas kernel vs the same layers
        from mvsnet_tpu.ops.pallas.conv3d import rowconv3d
        D, h, w = 192, 216, 288
        cases = [
            ("3dconv0_1 32->8 full", (1, D, h, w, 32), (3, 3, 3, 32, 8), 1),
            ("3dconv6_2 8->1 full", (1, D, h, w, 8), (3, 3, 3, 8, 1), 1),
            ("3dconv1_1 16->16 half", (1, D // 2, h // 2, w // 2, 16),
             (3, 3, 3, 16, 16), 1),
            ("3dconv1_0 32->16 s2", (1, D, h, w, 32), (3, 3, 3, 32, 16), 2),
        ]
        for name, xs, wsh, s in cases:
            x = jnp.asarray(rng.standard_normal(xs), dt)
            w_ = jnp.asarray(rng.standard_normal(wsh) * 0.1, jnp.float32)
            t = timed(lambda a, b: rowconv3d(a, b.astype(a.dtype), s), x, w_)
            fl = 2 * np.prod(xs[1:4]) * 27 * wsh[3] * wsh[4] / s ** 3
            print(f"{name:24s} pallas {t*1e3:7.2f} ms  ({fl/1e9:6.1f} GF -> "
                  f"{fl/t/1e12:5.1f} TF/s)")
            results[f"{name} pallas"] = round(t, 5)
    else:
        # RegNetUS0 hot layers at the 3DCNN operating point (conv-only:
        # inference BN folds to a fused affine).
        import jax
        D, h, w = 192, 216, 288

        def conv3d(x, w, s=1):
            d = jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
            return jax.lax.conv_general_dilated(x, w, (s, s, s), "SAME",
                                                dimension_numbers=d)

        def deconv3d(x, w, s=2):
            return jax.lax.conv_transpose(
                x, w, (s, s, s), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        cases = [
            ("3dconv0_1 32->8 full", (1, D, h, w, 32), (3, 3, 3, 32, 8), 1),
            ("3dconv1_0 32->16 s2", (1, D, h, w, 32), (3, 3, 3, 32, 16), 2),
            ("3dconv1_1 16->16 half", (1, D // 2, h // 2, w // 2, 16),
             (3, 3, 3, 16, 16), 1),
            ("3dconv6_2 8->1 full", (1, D, h, w, 8), (3, 3, 3, 8, 1), 1),
        ]
        for name, xs, wsh, s in cases:
            x = jnp.asarray(rng.standard_normal(xs), dt)
            w_ = jnp.asarray(rng.standard_normal(wsh) * 0.1, dt)
            vox = np.prod(xs[1:4]) / s ** 3
            fl = 2 * vox * 27 * wsh[3] * wsh[4]
            for tag, fn in (("xla", conv3d), ("widen", conv3d_widen)):
                t = timed(lambda a, b: fn(a, b, s), x, w_)
                print(f"{name:24s} {tag:6s} {t*1e3:7.2f} ms  ({fl/1e9:6.1f} GF"
                      f" -> {fl/t/1e12:5.1f} TF/s)")
                results[f"{name} {tag}"] = round(t, 5)
            a = np.asarray(conv3d(x[:, :16, :24, :32], w_, s), np.float32)
            b = np.asarray(conv3d_widen(x[:, :16, :24, :32], w_, s), np.float32)
            print(f"  widen vs conv max abs err: {float(np.abs(a - b).max()):.2e}")

        x = jnp.asarray(rng.standard_normal((1, D // 2, h // 2, w // 2, 16)), dt)
        w_ = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)) * 0.1, dt)
        t = timed(deconv3d, x, w_)
        print(f"{'deconv 16->8 to full':24s} {t*1e3:7.2f} ms")
        results["deconv 16->8"] = round(t, 5)

    print(json.dumps({k: round(v, 5) for k, v in results.items()}))


if __name__ == "__main__":
    main()
