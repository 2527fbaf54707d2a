"""Bisect which Pallas kernel crashes the Mosaic compiler on chip.

bench.py's fast path died in ApplyVectorLayoutPass
(vector_extract_strided_slice: limits 4 > dim 1) compiling the 3D-CNN
graph; the CW=0 retry died too, so the bad kernel is in the conv family
(the sweep kernels passed tools/bench_sweep.py on chip just before).
This probes each kernel class individually with COMPILE-ONLY lowering
(`.lower().compile()` — one remote compile each, no execution) so one
run pinpoints the crash. The compile-helper crash surfaces as a
catchable JaxRuntimeError (HTTP 500), so we keep going after a hit.

Usage: python tools/bisect_mosaic.py [--w 1152] [--case NAME]
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=1152)
    ap.add_argument("--h", type=int, default=96)
    ap.add_argument("--case", default=None, help="only run cases whose "
                    "name contains this substring")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvsnet_tpu.models.layers import Conv, ConvGN, Deconv

    H, W = args.h, args.w
    rng = np.random.default_rng(0)
    results = {}

    def probe(name, fn, *xs):
        if args.case and args.case not in name:
            return
        try:
            jax.jit(fn).lower(*xs).compile()
            results[name] = "ok"
            print(f"PASS  {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            head = str(e).splitlines()[0][:160]
            s = str(e)
            crash = any(m in s for m in (
                "SIGABRT", "Check failed", "INTERNAL", "500",
                "ApplyVectorLayoutPass"))
            results[name] = "CRASH" if crash else f"fail: {head}"
            print(f"{'CRASH' if crash else 'FAIL'}  {name}: {head}",
                  flush=True)
            if not crash:
                traceback.print_exc(limit=2)

    def bf(shape):
        # host numpy: never touches the (remote) device — lower() accepts it
        return rng.standard_normal(shape).astype(jnp.bfloat16)

    def host_init(m, x):
        # eager Module.init on the remote-TPU backend = one remote compile
        # PER OP (minutes/case); eval_shape traces host-side in µs and the
        # param VALUES are irrelevant for a compile-only probe.
        shapes = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)
        return jax.tree.map(
            lambda s: np.ones(s.shape, s.dtype)
            if s.dtype != np.uint32 else np.zeros(s.shape, s.dtype),
            shapes)

    def conv2d_case(name, div, cin, cout, k, s, gn=True):
        h, w = H // div, W // div
        x = bf((1, h, w, cin))
        m = (ConvGN if gn else Conv)(cout, k, s, dtype="bfloat16")
        v = host_init(m, x)
        probe(name, lambda xx: m.apply(v, xx).astype(jnp.float32), x)

    # --- 2D eval-path kernels, suspicion order ------------------------
    # packed s1 engages by default at C<=16 (PACK=4)
    conv2d_case("2d_packed_3to8_s1_fullres", 1, 3, 8, 3, 1)
    conv2d_case("2d_packed_8to8_s1_fullres", 1, 8, 8, 3, 1)
    conv2d_case("2d_packed_16to16_s1_half", 2, 16, 16, 3, 1)
    conv2d_case("2d_packed_16to8_s1_fullres", 1, 16, 8, 3, 1)

    def deconv2d_case(name, div, cin, cout):
        h, w = H // div, W // div
        x = bf((1, h, w, cin))
        m = Deconv(cout, 3, 2, dtype="bfloat16")
        v = host_init(m, x)
        probe(name, lambda xx: m.apply(v, xx).astype(jnp.float32), x)

    deconv2d_case("2d_deconv_128to64", 16, 128, 64)
    deconv2d_case("2d_deconv_32to16", 4, 32, 16)
    deconv2d_case("2d_deconv_16to8", 2, 16, 8)

    conv2d_case("2d_s2_3to16", 1, 3, 16, 3, 2)
    conv2d_case("2d_s2_16to32", 2, 16, 32, 3, 2)
    conv2d_case("2d_s2_5x5_8to16", 1, 8, 16, 5, 2)
    conv2d_case("2d_carry_32to32_quarter", 4, 32, 32, 3, 1)
    conv2d_case("2d_carry_64to64_eighth", 8, 64, 64, 3, 1)

    # GRU operating point: W/4 = 400 (1600-wide input) — every lane count
    # here is a NON-multiple of 128 (packed WP = 1600), the regime where
    # the sliced-carry/zeros-init Mosaic crash bit (bisect_carry2d.py)
    def gru_cell_conv(name, w4, cin, cout):
        x = bf((1, H // 4, w4, cin))
        m = Conv(cout, 3, 1, relu=False, use_bias=True, dtype="bfloat16")
        v = host_init(m, x)
        probe(name, lambda xx: m.apply(v, xx).astype(jnp.float32), x)

    gru_cell_conv("2d_gru_gates_32to32_w400", 400, 32, 32)
    gru_cell_conv("2d_gru_cell_16to4_w400", 400, 16, 4)
    gru_cell_conv("2d_gru_prob_2to1_w400", 400, 2, 1)

    # --- 3D regularizer kernels (both layouts) ------------------------
    from mvsnet_tpu.ops.pallas.conv3d import rowconv3d_fused
    from mvsnet_tpu.ops.pallas.deconv3d import rowdeconv3d_fused

    D, h3, w3 = 16, H // 4, W // 4

    def conv3d_case(name, cin, cout, stride, cw):
        x = bf((1, D, h3, w3, cin) if not cw else (1, D, h3, cin, w3))
        k = bf((3, 3, 3, cin, cout))
        b = np.zeros((cout,), np.float32)
        probe(name, lambda xx: rowconv3d_fused(
            xx, k, b, relu=True, stride=stride, cw_in=cw, cw_out=cw
        ).astype(jnp.float32), x)

    def deconv3d_case(name, cin, cout, cw):
        x = bf((1, D, h3, w3, cin) if not cw else (1, D, h3, cin, w3))
        k = bf((3, 3, 3, cin, cout))
        b = np.zeros((cout,), np.float32)
        probe(name, lambda xx: rowdeconv3d_fused(
            xx, k, b, relu=True, cw_in=cw, cw_out=cw
        ).astype(jnp.float32), x)

    for cw in (False, True):
        t = "cw" if cw else "nd"
        conv3d_case(f"3d_{t}_s1_8to8", 8, 8, 1, cw)
        conv3d_case(f"3d_{t}_s2_8to16", 8, 16, 2, cw)
        conv3d_case(f"3d_{t}_s1_32to32", 32, 32, 1, cw)
        deconv3d_case(f"3d_{t}_deconv_16to8", 16, 8, cw)
        deconv3d_case(f"3d_{t}_deconv_64to32", 64, 32, cw)

    bad = {k: v for k, v in results.items() if v != "ok"}
    print("SUMMARY", bad if bad else "all green")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
