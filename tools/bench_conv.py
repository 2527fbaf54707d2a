"""Layout experiments for the small-channel conv stages on the real chip.

The UNetDS2GN feature tower (models/feature_net.py) spends most of its
time in 8-16 channel convs at full 864x1152 resolution; RegNetUS0 in
8-64 channel 3D convs. With NHWC those channel counts waste most of the
128 MXU/VPU lanes. This tool times representative conv(+GN) stacks under
different layouts/dtypes to pick the production lowering.

Usage: PYTHONPATH=$PYTHONPATH:. python tools/bench_conv.py [--case CASE]
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
                    choices=["2d", "3d", "pallas3d", "pallas2d", "regnetsum",
                             "glue", "bisect"])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--stages", default="",
                    help="bisect: comma-separated stage indices (default all)")
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
    elif args.case == "bisect":
        # truncation bisect of RegNetUS0 in ONE process: time progressively
        # longer prefixes; consecutive deltas localize the in-graph glue
        # (layer sum 47.6 ms vs full module 115.75 ms measured on chip)
        import jax
        from flax import linen as nn

        from mvsnet_tpu.models.layers import Conv, ConvBN, DeconvBN

        D, h, w = 192, 216, 288
        N_STAGES = 11

        class Trunc(nn.Module):
            stage: int
            dtype: str

            @nn.compact
            def __call__(self, x, training=False):
                d = self.dtype
                s = self.stage
                x = x.astype(d)
                live = []
                c1_0 = ConvBN(16, 3, 2, name="3dconv1_0", dtype=d)(x, training)
                live.append(c1_0)
                if s >= 2:
                    c2_0 = ConvBN(32, 3, 2, name="3dconv2_0", dtype=d)(
                        c1_0, training)
                    live.append(c2_0)
                if s >= 3:
                    c3_0 = ConvBN(64, 3, 2, name="3dconv3_0", dtype=d)(
                        c2_0, training)
                    live.append(c3_0)
                if s >= 4:
                    c0_1 = ConvBN(8, 3, 1, name="3dconv0_1", dtype=d)(
                        x, training)
                    live.append(c0_1)
                if s >= 5:
                    c1_1 = ConvBN(16, 3, 1, name="3dconv1_1", dtype=d)(
                        c1_0, training)
                    live.append(c1_1)
                if s >= 6:
                    c2_1 = ConvBN(32, 3, 1, name="3dconv2_1", dtype=d)(
                        c2_0, training)
                    live.append(c2_1)
                if s >= 7:
                    c3_1 = ConvBN(64, 3, 1, name="3dconv3_1", dtype=d)(
                        c3_0, training)
                    live.append(c3_1)
                if s >= 8:
                    c4_1 = DeconvBN(32, 3, 2, name="3dconv4_0", dtype=d)(
                        c3_1, training) + c2_1
                    live.append(c4_1)
                if s >= 9:
                    c5_1 = DeconvBN(16, 3, 2, name="3dconv5_0", dtype=d)(
                        c4_1, training) + c1_1
                    live.append(c5_1)
                if s >= 10:
                    c6_1 = DeconvBN(8, 3, 2, name="3dconv6_0", dtype=d)(
                        c5_1, training) + c0_1
                    live.append(c6_1)
                if s >= 11:
                    out = Conv(1, 3, 1, relu=False, use_bias=False,
                               name="3dconv6_2", dtype=d)(c6_1)
                    live = [out]
                # consume every live tensor so XLA keeps all stages
                return sum(jnp.sum(t.astype(jnp.float32)) for t in live)

        stages = ([int(s) for s in args.stages.split(",") if s]
                  or list(range(1, N_STAGES + 1)))
        x = jnp.asarray(rng.standard_normal((1, D, h, w, 32)), dt)
        prev = 0.0
        for s in stages:
            m = Trunc(s, args.dtype)
            params = jax.jit(lambda k, a, m=m: m.init(k, a, False))(
                jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 32, 32), dt))
            t = timed(lambda a, p, m=m: m.apply(p, a, False), x, params)
            print(f"stage {s:2d}: {t*1e3:8.2f} ms  (delta {1e3*(t-prev):7.2f})",
                  flush=True)
            results[f"stage{s}"] = round(t, 5)
            prev = t
    elif args.case == "glue":
        # decompose the RegNet in-graph glue: module-vs-bare-kernel for the
        # hot layer, BN alone, the layout transposes alone
        import jax

        from mvsnet_tpu.models.layers import BatchNormRef, ConvBN
        from mvsnet_tpu.ops.pallas.conv3d import rowconv3d

        D, h, w = 192, 216, 288
        x32 = jnp.asarray(rng.standard_normal((1, D, h, w, 32)), dt)
        x8 = jnp.asarray(rng.standard_normal((1, D, h, w, 8)), dt)
        k_ = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 8)) * 0.1,
                         jnp.float32)

        t = timed(lambda a, b: rowconv3d(a, b.astype(a.dtype), 1), x32, k_)
        print(f"{'bare rowconv 32->8':24s} {t*1e3:7.2f} ms", flush=True)
        results["bare"] = round(t, 5)

        m = ConvBN(8, 3, 1, dtype=args.dtype)
        v = jax.jit(lambda kk, a: m.init(kk, a, False))(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 32, 32), dt))
        t = timed(lambda a, p: m.apply(p, a, False), x32, v)
        print(f"{'ConvBN module 32->8':24s} {t*1e3:7.2f} ms", flush=True)
        results["convbn"] = round(t, 5)

        bn = BatchNormRef()
        vb = jax.jit(lambda kk, a: bn.init(kk, a, False))(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 32, 8), dt))
        t = timed(lambda a, p: jax.nn.relu(bn.apply(p, a, False)), x8, vb)
        print(f"{'BN+relu 8ch full-res':24s} {t*1e3:7.2f} ms", flush=True)
        results["bn"] = round(t, 5)

        t = timed(lambda a: jnp.transpose(a, (0, 1, 2, 4, 3)), x32)
        print(f"{'transpose cm 32ch':24s} {t*1e3:7.2f} ms", flush=True)
        results["transpose"] = round(t, 5)

        def pack4(a):
            B, Dd, H, W, C = a.shape
            a = jnp.transpose(a, (0, 1, 2, 4, 3)).reshape(B, Dd, H // 4, 4,
                                                          C, W)
            return jnp.transpose(a, (0, 1, 2, 4, 3, 5)).reshape(
                B, Dd, H // 4, C, 4 * W)

        t = timed(pack4, x8)
        print(f"{'pack4 8ch full-res':24s} {t*1e3:7.2f} ms", flush=True)
        results["pack4"] = round(t, 5)
    elif args.case == "regnetsum":
        # every RegNetUS0 layer timed standalone + the full module, ONE
        # process — pins down in-graph glue vs chip-window drift
        import jax

        from mvsnet_tpu.models.regnet import RegNetUS0
        from mvsnet_tpu.ops.pallas.conv3d import rowconv3d, rowconv3d_supported

        D, h, w = 192, 216, 288

        def deconv3d(x, w_, s=2):
            return jax.lax.conv_transpose(
                x, w_, (s, s, s), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        layers = [
            ("0_1 32->8 full s1", (1, D, h, w, 32), 8, 1),
            ("1_0 32->16 s2", (1, D, h, w, 32), 16, 2),
            ("1_1 16->16 half s1", (1, D // 2, h // 2, w // 2, 16), 16, 1),
            ("2_0 16->32 s2", (1, D // 2, h // 2, w // 2, 16), 32, 2),
            ("2_1 32->32 quarter s1", (1, D // 4, h // 4, w // 4, 32), 32, 1),
            ("3_0 32->64 s2", (1, D // 4, h // 4, w // 4, 32), 64, 2),
            ("3_1 64->64 eighth s1", (1, D // 8, h // 8, w // 8, 64), 64, 1),
            ("6_2 8->1 full s1", (1, D, h, w, 8), 1, 1),
        ]
        total = 0.0
        for name, xs, cout, s in layers:
            x = jnp.asarray(rng.standard_normal(xs), dt)
            w_ = jnp.asarray(rng.standard_normal(
                (3, 3, 3, xs[-1], cout)) * 0.1, jnp.float32)
            sup = rowconv3d_supported(xs[1], xs[2], xs[3], xs[-1], cout, dt)
            if sup:
                fn = (lambda a, b, s=s: rowconv3d(a, b.astype(a.dtype), s))
            else:                                  # the dispatch's fallback
                def fn(a, b, s=s):
                    d = jax.lax.conv_dimension_numbers(
                        a.shape, b.shape, ("NDHWC", "DHWIO", "NDHWC"))
                    return jax.lax.conv_general_dilated(
                        a, b.astype(a.dtype), (s, s, s), "SAME",
                        dimension_numbers=d)
            t = timed(fn, x, w_)
            total += t
            print(f"{name:24s} {t*1e3:7.2f} ms", flush=True)
            results[name] = round(t, 5)
        for name, xs, cout in [
                ("4_0 deconv 64->32", (1, D // 8, h // 8, w // 8, 64), 32),
                ("5_0 deconv 32->16", (1, D // 4, h // 4, w // 4, 32), 16),
                ("6_0 deconv 16->8", (1, D // 2, h // 2, w // 2, 16), 8)]:
            x = jnp.asarray(rng.standard_normal(xs), dt)
            w_ = jnp.asarray(rng.standard_normal(
                (3, 3, 3, xs[-1], cout)) * 0.1, dt)
            t = timed(deconv3d, x, w_)
            total += t
            print(f"{name:24s} {t*1e3:7.2f} ms", flush=True)
            results[name] = round(t, 5)
        print(f"{'LAYER SUM':24s} {total*1e3:7.2f} ms", flush=True)

        net = RegNetUS0("normal", dtype=args.dtype)
        cv = jnp.asarray(rng.standard_normal((1, D, h, w, 32)), dt)
        params = jax.jit(lambda k, a: net.init(k, a, False))(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 32, 32), dt))
        t = timed(lambda a, p: net.apply(p, a, False), cv, params)
        print(f"{'FULL RegNetUS0':24s} {t*1e3:7.2f} ms "
              f"(glue {1e3*(t-total):.2f})", flush=True)
        results["full"] = round(t, 5)
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
