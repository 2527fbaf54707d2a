"""Layer-level microbenchmark of the feature net on the real chip.

Times individual ConvGN layers at the shapes UNetDS2GN actually runs at
the 1152x864 operating point (3 views batched), to locate where the
~87 ms goes: small-channel convs (XLA pads channels to the 128-lane MXU
width), group-norm overhead, or resolution.

Usage: python tools/bench_featnet.py [--full]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="also time the whole tower")
    ap.add_argument("--only-full", action="store_true",
                    help="skip per-layer timings (fewer tunnel compiles)")
    args = ap.parse_args()
    if args.only_full:
        args.full = True

    import jax
    import jax.numpy as jnp
    from mvsnet_tpu.models.layers import ConvGN, Conv
    from mvsnet_tpu.models.feature_net import UNetDS2GN

    B = 3                      # views batched
    H, W = 864, 1152
    rng = np.random.default_rng(0)
    results = {}

    # Representative layers (name, in_res_divisor, Cin, Cout, kernel, stride)
    layers = [
        ("0_1 full-res 3->8",    1, 3, 8, 3, 1),
        ("0_2 full-res 8->8",    1, 8, 8, 3, 1),
        ("1_0 s2 3->16",         1, 3, 16, 3, 2),
        ("1_1 half 16->16",      2, 16, 16, 3, 1),
        ("2_0 s2 16->32",        2, 16, 32, 3, 2),
        ("2_1 quarter 32->32",   4, 32, 32, 3, 1),
        ("3_0 s2 32->64",        4, 32, 64, 3, 2),
        ("3_1 eighth 64->64",    8, 64, 64, 3, 1),
        ("4_1 sixteenth 128",   16, 128, 128, 3, 1),
        ("9_0 s2 8->16 (5x5)",   1, 8, 16, 5, 2),
        ("10_0 s2 16->32 (5x5)", 2, 16, 32, 5, 2),
        ("5_1 cat 128->64",      8, 128, 64, 3, 1),
        ("7_1 cat 32->16",       2, 32, 16, 3, 1),
        ("8_1 cat 16->8",        1, 16, 8, 3, 1),
    ]
    if args.only_full:
        layers = []
    for name, div, cin, cout, k, s in layers:
        h, w = H // div, W // div
        x = jnp.asarray(rng.standard_normal((B, h, w, cin)), jnp.bfloat16)
        m = ConvGN(cout, k, s, dtype="bfloat16")
        variables = m.init(jax.random.PRNGKey(0), x)
        dt = timed(lambda xx: m.apply(variables, xx).astype(jnp.float32), x)
        flops = 2 * B * (h // s) * (w // s) * k * k * cin * cout
        results[name] = round(dt * 1e3, 3)
        print(f"{name:26s} {dt*1e3:7.2f} ms   ({flops/1e9:6.1f} GF -> "
              f"{flops/dt/1e12:6.1f} TF/s)")

    if not args.only_full:
        from mvsnet_tpu.models.layers import DeconvGN

        # decoder deconvs (now the parity-split Pallas kernel)
        for name, div, cin, cout in [("5_0 deconv 128->64", 16, 128, 64),
                                     ("7_0 deconv 32->16", 4, 32, 16),
                                     ("8_0 deconv 16->8", 2, 16, 8)]:
            h, w = H // div, W // div
            x = jnp.asarray(rng.standard_normal((B, h, w, cin)), jnp.bfloat16)
            m = DeconvGN(cout, 3, 2, dtype="bfloat16")
            variables = m.init(jax.random.PRNGKey(0), x)
            dt = timed(lambda xx, m=m, variables=variables:
                       m.apply(variables, xx).astype(jnp.float32), x)
            results[name] = round(dt * 1e3, 3)
            print(f"{name:26s} {dt*1e3:7.2f} ms")

        # conv WITHOUT GN at the worst shape, to split conv vs norm cost
        x = jnp.asarray(rng.standard_normal((B, H, W, 8)), jnp.bfloat16)
        m = Conv(8, 3, 1, relu=True, use_bias=False, dtype="bfloat16")
        variables = m.init(jax.random.PRNGKey(0), x)
        dt = timed(lambda xx: m.apply(variables, xx).astype(jnp.float32), x)
        results["conv-only full-res 8->8"] = round(dt * 1e3, 3)
        print(f"{'conv-only full-res 8->8':26s} {dt*1e3:7.2f} ms")

    if args.full:
        x = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
        m = UNetDS2GN("normal", dtype="bfloat16")
        variables = m.init(jax.random.PRNGKey(0), x)
        dt = timed(lambda xx: m.apply(variables, xx).astype(jnp.float32), x)
        results["full UNetDS2GN"] = round(dt * 1e3, 3)
        print(f"{'full UNetDS2GN':26s} {dt*1e3:7.2f} ms")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
