"""Micro-bisect the Mosaic SIGABRT inside the 2D carry conv kernel.

tools/bisect_mosaic.py pinned the crash to _make_kernel2d_carry
(conv2d.py:34) — C=32/64 s1 convs; every other kernel family compiles.
The Mosaic check is `vector_extract_strided_slice: limits[i] <= dim(i)
(4 vs 1)`. This probes standalone variants of the kernel structure, each
removing ONE construct, compile-only (same harness as bisect_mosaic).

Usage: python tools/bisect_carry2d.py [--case NAME]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default=None)
    ap.add_argument("--h", type=int, default=24)
    ap.add_argument("--w", type=int, default=288)
    ap.add_argument("--c", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W, C = args.h, args.w, args.c
    Cout = C
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, H, C, W)).astype(dt)
    w2 = rng.standard_normal((3 * Cout, 3 * C)).astype(dt)
    results = {}

    params = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                  vmem_limit_bytes=100 * 2 ** 20)

    def run(name, kern):
        if args.case and args.case not in name:
            return
        f = lambda xb, wb: pl.pallas_call(  # noqa: E731
            kern, grid=(1,),
            in_specs=[
                pl.BlockSpec((1, H, C, W), lambda g: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * Cout, 3 * C), lambda g: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, H, Cout, W), lambda g: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, H, Cout, W), dt),
            compiler_params=params,
        )(xb, wb)
        try:
            jax.jit(f).lower(x, w2).compile()
            results[name] = "ok"
            print(f"PASS  {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            head = str(e).splitlines()[0][:150]
            results[name] = "CRASH"
            print(f"CRASH {name}: {head}", flush=True)

    def tap_of(x_ref, w, j):
        xr = x_ref[0, pl.ds(j, 1)].reshape(C, W)
        zc = jnp.zeros((C, 1), xr.dtype)
        left = jnp.concatenate([zc, xr[:, :W - 1]], axis=1)
        right = jnp.concatenate([xr[:, 1:], zc], axis=1)
        cat = jnp.concatenate([left, xr, right], axis=0)
        return jax.lax.dot_general(w, cat, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # A: faithful copy of _make_kernel2d_carry (expect CRASH)
    def kA(x_ref, w_ref, out_ref):
        w = w_ref[...]
        zP = jnp.zeros((3 * Cout, W), jnp.float32)

        def row(j, carry):
            p_prev, p_prev2 = carry
            p_cur = tap_of(x_ref, w, j)
            v = (p_prev2[0 * Cout:1 * Cout] + p_prev[1 * Cout:2 * Cout]
                 + p_cur[2 * Cout:3 * Cout])

            @pl.when(j >= 1)
            def _():
                out_ref[0, pl.ds(j - 1, 1)] = v.astype(out_ref.dtype)[None]

            return (p_cur, p_prev)

        pl_, pl2 = jax.lax.fori_loop(0, H, row, (zP, zP))
        out_ref[0, pl.ds(H - 1, 1)] = (
            pl2[0 * Cout:1 * Cout] + pl_[1 * Cout:2 * Cout]
        ).astype(out_ref.dtype)[None]

    # B: no pl.when — shift indexing so every iteration writes (row j
    #    writes garbage top row instead of skipping)
    def kB(x_ref, w_ref, out_ref):
        w = w_ref[...]
        zP = jnp.zeros((3 * Cout, W), jnp.float32)

        def row(j, carry):
            p_prev, p_prev2 = carry
            p_cur = tap_of(x_ref, w, j)
            v = (p_prev2[0 * Cout:1 * Cout] + p_prev[1 * Cout:2 * Cout]
                 + p_cur[2 * Cout:3 * Cout])
            out_ref[0, pl.ds(jnp.maximum(j - 1, 0), 1)] = \
                v.astype(out_ref.dtype)[None]
            return (p_cur, p_prev)

        jax.lax.fori_loop(0, H, row, (zP, zP))

    # C: carry holds the three Cout-row PIECES (no strided slicing of
    #    carried vectors; slices happen on the fresh tap result only)
    def kC(x_ref, w_ref, out_ref):
        w = w_ref[...]
        z = jnp.zeros((Cout, W), jnp.float32)

        def row(j, carry):
            a_prev, b_prev2 = carry          # dy1 of P(j-1), dy0 of P(j-2)
            p_cur = tap_of(x_ref, w, j)
            v = b_prev2 + a_prev + p_cur[2 * Cout:3 * Cout]

            @pl.when(j >= 1)
            def _():
                out_ref[0, pl.ds(j - 1, 1)] = v.astype(out_ref.dtype)[None]

            return (p_cur[1 * Cout:2 * Cout], p_cur[0 * Cout:1 * Cout])

        a, b = jax.lax.fori_loop(0, H, row, (z, z))
        out_ref[0, pl.ds(H - 1, 1)] = (a + b).astype(out_ref.dtype)[None]

    # D: python-unrolled loop, same carries/slices (fori removed)
    def kD(x_ref, w_ref, out_ref):
        w = w_ref[...]
        zP = jnp.zeros((3 * Cout, W), jnp.float32)
        p_prev, p_prev2 = zP, zP
        for j in range(H):
            p_cur = tap_of(x_ref, w, j)
            v = (p_prev2[0 * Cout:1 * Cout] + p_prev[1 * Cout:2 * Cout]
                 + p_cur[2 * Cout:3 * Cout])
            if j >= 1:
                out_ref[0, pl.ds(j - 1, 1)] = v.astype(out_ref.dtype)[None]
            p_cur, p_prev, p_prev2 = None, p_cur, p_prev
        out_ref[0, pl.ds(H - 1, 1)] = (
            p_prev2[0 * Cout:1 * Cout] + p_prev[1 * Cout:2 * Cout]
        ).astype(out_ref.dtype)[None]

    # E: fori + carries, but NO final-row epilogue after the loop
    def kE(x_ref, w_ref, out_ref):
        w = w_ref[...]
        zP = jnp.zeros((3 * Cout, W), jnp.float32)

        def row(j, carry):
            p_prev, p_prev2 = carry
            p_cur = tap_of(x_ref, w, j)
            v = (p_prev2[0 * Cout:1 * Cout] + p_prev[1 * Cout:2 * Cout]
                 + p_cur[2 * Cout:3 * Cout])

            @pl.when(j >= 1)
            def _():
                out_ref[0, pl.ds(j - 1, 1)] = v.astype(out_ref.dtype)[None]

            return (p_cur, p_prev)

        jax.lax.fori_loop(0, H, row, (zP, zP))

    # F: fori + carries + epilogue, but conditional write replaced by
    #    select into row 0 (pl.when removed, same indexing as A)
    def kF(x_ref, w_ref, out_ref):
        w = w_ref[...]
        zP = jnp.zeros((3 * Cout, W), jnp.float32)

        def row(j, carry):
            p_prev, p_prev2 = carry
            p_cur = tap_of(x_ref, w, j)
            v = (p_prev2[0 * Cout:1 * Cout] + p_prev[1 * Cout:2 * Cout]
                 + p_cur[2 * Cout:3 * Cout])
            jdst = jnp.where(j >= 1, j - 1, H - 1)
            out_ref[0, pl.ds(jdst, 1)] = v.astype(out_ref.dtype)[None]
            return (p_cur, p_prev)

        pl_, pl2 = jax.lax.fori_loop(0, H, row, (zP, zP))
        out_ref[0, pl.ds(H - 1, 1)] = (
            pl2[0 * Cout:1 * Cout] + pl_[1 * Cout:2 * Cout]
        ).astype(out_ref.dtype)[None]

    # G: same as A but the carry INIT is a zeroed fresh tap result instead
    #    of a jnp.zeros constant (conv3d's sliced carries pass and differ
    #    from A in exactly this: init = (p0, tap(0)))
    def kG(x_ref, w_ref, out_ref):
        w = w_ref[...]
        z0 = tap_of(x_ref, w, 0) * 0.0

        def row(j, carry):
            p_prev, p_prev2 = carry
            p_cur = tap_of(x_ref, w, j)
            v = (p_prev2[0 * Cout:1 * Cout] + p_prev[1 * Cout:2 * Cout]
                 + p_cur[2 * Cout:3 * Cout])

            @pl.when(j >= 1)
            def _():
                out_ref[0, pl.ds(j - 1, 1)] = v.astype(out_ref.dtype)[None]

            return (p_cur, p_prev)

        pl_, pl2 = jax.lax.fori_loop(0, H, row, (z0, z0))
        out_ref[0, pl.ds(H - 1, 1)] = (
            pl2[0 * Cout:1 * Cout] + pl_[1 * Cout:2 * Cout]
        ).astype(out_ref.dtype)[None]

    for name, k in (("A_faithful", kA), ("B_nowhen", kB), ("C_pieces", kC),
                    ("D_unrolled", kD), ("E_noepilogue", kE),
                    ("F_selectdst", kF), ("G_freshinit", kG)):
        run(name, k)

    print("SUMMARY", {k: v for k, v in results.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
