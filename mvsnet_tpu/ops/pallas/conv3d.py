"""3x3x3 conv as per-slab wide-N matmuls (Pallas TPU).

Why: XLA's TPU conv lowering runs the RegNetUS0 regularizer's small-channel
3D convs at 0.2-7 TF/s (tools/bench_conv.py on v5e: 32->8 full-res 44.5 ms
for 165 GF) because both Cin and Cout pad to the 128-lane MXU per tap.
An XLA-level re-association (ops/conv_lowering.py) did not help: the 1x1x3
conv it builds lowers through the same conv path (63 ms measured).

Kernel idea: for each SOURCE z-slab, one big matmul computes every tap
contribution at once:

  P[(y, x), (dz, dy, co)] = sum_{dx, ci} W[(dx, ci), (dz, dy, co)]
                                        * x[zs, y, x + dx - 1, ci]

with K = (dx, Cin) <= 96 -> 128 lanes and N = (dz, dy, Cout) = 9*Cout
(72 -> 128 for Cout=8 instead of 8 -> 128). Each source slab is read
exactly ONCE; its P rows scatter-add (cheap VPU shifts) into a revolving
3-slot f32 accumulator holding the partially-built output slabs
z in {zs-1, zs, zs+1}:

  out[zs + 1 - dz, ys + 1 - dy] += P[ys, (dz, dy)]

The grid runs (D+1) sequential cells: cell g accumulates slab g and emits
finished output slab g-1. No halo reads, no atomics, ~42% MXU efficiency
at 32->8 (vs ~1.6% for the XLA lowering).

Reference semantics: SAME 3x3x3 stride-1 conv, NDHWC x DHWIO
(reference regularizer topology: cnn_wrapper/mvsnetworks.py:122-158).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Software-pipeline the per-row tap matmuls: issue P(y+2) at iteration y
# so the VPU staging work never waits on the matmul just pushed into the
# MXU. Chip A/B (bench_logs/r3b_pipe_ab.log, bracketed): a small but
# consistent win (0_1 13.89/13.86 -> 13.66 ms, 6_2 6.07 -> 6.00,
# 1_1 2.44/2.51 -> 2.40; s2 within noise) — ~1.6%, i.e. the per-row
# fixed cost is NOT an MXU-wait stall; suspicion moves to the scalar
# core's dynamic-slice address work (see _FSTORE).
_PIPE = _os.environ.get("MVSNET_TPU_CONV3D_PIPE", "1") not in ("0", "")
# Fuse the three per-dz staging stores into ONE per-row store: dz_ref
# becomes (H', 3*Cout, W') with the dz slots concatenated on sublanes,
# cutting the per-row dynamic stores 3 -> 1 (the slab accumulate reads
# static sublane slices instead). Chip A/B (r3b_fstore_ab.log): LOSES
# (0_1 14.2 -> 14.9, 1_1 2.38 -> 2.59) — refuted, default OFF.
_FSTORE = _os.environ.get("MVSNET_TPU_CONV3D_FSTORE", "0") not in ("0", "")
# D-pack (VERDICT r3 #4): process TWO consecutive depth slabs per grid
# cell with their rows lane-concatenated, so one tap matmul / staging
# store / loop iteration covers both slabs — the ~0.2-0.3 us/row fixed
# cost (the dominant term of every full-res RegNet layer) halves per
# output element. dx stays seam-masked lane shifts; dy stays the P-ring;
# the dz scatter becomes 2 lane-rolls + 3 selects per row (a roll by W
# swaps the two slabs' halves, which is exactly the odd-dz slab move).
# Outputs emit 2 slabs/cell.
# Chip A/B (r4_queue ab_conv_def vs ab_conv_dpack, same window, s2
# control 9.95/10.07): 8->1 full 5.63 -> 0.15 ms, 16->16 half
# 2.13 -> 1.35, but 32->8 full 7.00 -> 8.33 — the mask/roll VPU work
# scales with C, same shape as the row-PACK result. DEFAULT: D-pack for
# C <= 16 (beats row-PACK there and replaces it); env =1 forces it
# everywhere, =0 disables.
_DPACK_ENV = _os.environ.get("MVSNET_TPU_CONV3D_DPACK", "")
_DPACK = _DPACK_ENV not in ("0", "")
_DPACK_AUTO = _DPACK_ENV == ""          # default: C <= 16 only
# Row-loop MANUAL unroll factor (rows per fori iteration): the
# row-aspect probe (r3b_rowprobe.log) fits t = rows*210ns +
# rows*W*0.44ns — if the 210 ns/row fixed cost is loop machinery,
# unrolling divides it. Mosaic rejects fori_loop(unroll=k) for
# 1 < k < num_steps, so the unroll is hand-rolled in the loop bodies.
# The effective factor is the largest divisor of the row count <= the
# knob, so any H works. Default 8: bracketed chip A/Bs
# (r3b_munroll_ab/munroll3_ab logs) — 0_1 14.08 -> 7.0, s2 13.7 -> 9.9;
# UN=24 trades +0.6 ms on s2 for -0.6 ms on 0_1 (tied in aggregate).
_UNROLL = int(_os.environ.get("MVSNET_TPU_CONV3D_UNROLL", "8"))
# s2 tap split: the stride-2 kernel matmuls EVERY source row against all
# 9 (dz,dy) taps, but an odd source row (2t+1) only ever contributes its
# dy=1 taps and an even row its dy=0/dy=2 taps — half the issued MACs are
# discarded. Split the tap matrix into w_even (6*Cout) / w_odd (3*Cout)
# and matmul each row against only its parity's taps.
# Chip A/B (r4d ab4): s2 10.19 -> 9.12 ms while every s1 control
# DRIFTED UP 4-16% in the same arm — true win >= 10%. DEFAULT ON.
_S2SPLIT = _os.environ.get("MVSNET_TPU_CONV3D_S2SPLIT", "1") not in ("0", "")
# Weight-grad reformulation: XLA's native conv wgrad emits tiny-output
# convs (Ci x Co results, MXU lane-starved) — the corrected r4f stage
# bench measured RegNet dk ~137 ms of the 616 ms train step. XWGRAD
# computes dk as ONE huge-contraction matmul instead:
#   dk[(dx,ci),(dz,dy,co)] = sum_n xdx[n,(dx,ci)] * gzy[n,(dz,dy,co)]
# with xdx = lane-concat of the 3 dx-shifted x views and gzy the 9
# (dz,dy)-shifted g views (zero-padded SAME shifts); K = B*D*H*W.
# Chip A/B (r4g): RegNet dk+dx 206.1 -> 247.6 ms — REFUTED (the 9x
# shifted-g HBM materialization beats the matmul-shape win). Kept for
# the record; see _PWGRAD for the in-VMEM answer.
_XWGRAD = _os.environ.get("MVSNET_TPU_CONV3D_XWGRAD", "0") not in ("0", "")
# Pallas s1 weight grad: the same huge-K contraction but with the 9-row
# G matrix built IN VMEM per source row (no HBM concats — the thing
# that sank XWGRAD): per (slab, row), cat (3C, W) is the fwd kernel's
# dx-shift build and Gc (9Cout, W) sublane-concats the 9 masked
# (dz,dy)-paired g rows from a 3-slab g window; one (3C,W)x(9Cout,W)ᵀ
# MXU dot accumulates into a tiny (3C, 9Cout) f32 scratch.
# Chip A/B (r4j, clean bracket, dx-only flat 69.2 across arms): RegNet
# stage dk+dx 206.02 / 206.07 -> 124.60 ms, i.e. dk 136.8 -> 55.4 ms
# (-60%). DEFAULT ON; 0 restores XLA's wgrad convs.
_PWGRAD = _os.environ.get("MVSNET_TPU_CONV3D_PWGRAD", "1") not in ("0", "")
# Pallas s2/deconv weight grad (VERDICT r4 #1: port the in-VMEM trick to
# the remaining XLA dks). G-CENTRIC, unlike dks1: the grid walks the
# HALF-RES cotangent slabs t and each cotangent row does ONE MXU dot
#   acc[co, (dz,dy,dx,ci)] += sum_v g[t,u,v,co] * x[2t+dz, 2u+dy, 2v+dx, ci]
# The stride-2 lane reads come from an XLA-side lane-parity pre-split of
# x (xe/xo at W/2 lanes): dx=0 -> xe row, dx=1 -> xo row, dx=2 -> xe row
# shifted one lane — every tap is a plain shift, the contraction runs at
# output resolution (zero parity waste, 4x fewer row iterations than
# dks1 at the same input), and nothing is materialized in HBM.
# Serves BOTH the s2 conv dk and (roles reversed + q-involution, see
# deconv3d.py bwd) the deconv dk.
# Chip (r5 queue, 00:02-00:35 UTC, bracketed): RegNet stage dk+dx
# 124.17 / 115.16 / 124.03 ms (dk 54.8 -> 45.9, -16%); full step
# 439.88 -> 433.75 ms. Kernel-level smoke vs the XWGRAD matmul form:
# 1.35 vs 100.2 ms at (192,120,160,8->16), err <= 3e-6. DEFAULT ON.
_PWGRAD_S2 = _os.environ.get(
    "MVSNET_TPU_CONV3D_PWGRAD_S2", "1") not in ("0", "")


def _unroll_for(steps: int) -> int:
    u = max(1, min(_UNROLL, steps))
    while steps % u:
        u -= 1
    return u

_VMEM_LIMIT = 100 * 2 ** 20
_ARBITRARY1 = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                   vmem_limit_bytes=_VMEM_LIMIT)


def _emit(acc, b_ref, relu, out_ref):
    """Epilogue at the final slab write: fused per-channel bias (folded
    eval-mode batch norm shift) + ReLU, in the f32 accumulator, for free —
    the slab is being written out exactly once anyway."""
    v = acc
    if b_ref is not None:
        v = v + b_ref[...]          # (Cout, W') broadcasts over (1, H', ...)
    if relu:
        v = jnp.maximum(v, 0.0)
    out_ref[...] = v.astype(out_ref.dtype)


def _make_kernel(D: int, H: int, W: int, C: int, Cout: int,
                 has_bias: bool = False, relu: bool = False):
    """Channel-second-minor edition: every scratch/output tile is shaped
    (..., Cout, W), because a (..., W, Cout=8) VMEM buffer pads the minor
    dim to 128 lanes (measured: the accumulators alone demanded 2x92 MiB).
    The per-row matmul therefore emits (9*Cout, W) directly (transposed
    operands), tap blocks are FREE sublane slices at multiples of Cout, and
    the dy shift is pure row indexing into the staging scratch."""

    def kernel(x_ref, w_ref, *rest):
        # x_ref: (1, H, C, W) source slab min(g, D-1), channel-second-minor
        #   (a (W, C<=40) block would pad C to 128 lanes: 4x the DMA and
        #   VPU read traffic at C=32); w_ref: (9*Cout, 3*C);
        # b_ref (when has_bias): (Cout, W) f32 per-channel bias;
        # out_ref: (1, H, Cout, W) output slab max(g-1, 0) — the wrapper
        #   transposes back to NDHWC;
        # acc_ref: (3, H, Cout, W) f32 revolving accumulator, slot(z) = z%3;
        # dz_ref: (3, H, Cout, W) f32 per-dz staging (dz stays a python int
        #   because a [dynamic, static-slice] ref access lowers as a >2D
        #   gather in Mosaic).
        if has_bias:
            b_ref, out_ref, acc_ref, dz_ref = rest
        else:
            (out_ref, acc_ref, dz_ref), b_ref = rest, None
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        @pl.when(g > 0)
        def _():
            # slot((g+1) % 3) last held z = g-2, emitted at cell g-1.
            acc_ref[pl.ds((g + 1) % 3, 1)] = jnp.zeros((1, H, Cout, W),
                                                       jnp.float32)

        @pl.when(g < D)
        def _():
            w = w_ref[...]

            def tap_matmul(i, zero_edge=True):
                # P(i)[(dz,dy,co), x] for source row i (zeros past the edge
                # unless the caller defers that to use time)
                x = x_ref[0, pl.ds(jnp.minimum(i, H - 1), 1)].reshape(C, W)
                zero = jnp.zeros((C, 1), x.dtype)
                # dx shifts run along LANES of the (C, W) row
                left = jnp.concatenate([zero, x[:, :W - 1]], axis=1)
                right = jnp.concatenate([x[:, 1:], zero], axis=1)
                cat = jnp.concatenate([left, x, right], axis=0)  # (3C, W)
                P = jax.lax.dot_general(
                    w, cat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (9*Cout, W)
                return jnp.where(i < H, P, 0.0) if zero_edge else P

            # P-ring over output rows: out(y) reads P(y-1), P(y), P(y+1),
            # so each source row is matmul'ed ONCE and each staging row is
            # written ONCE (no read-modify-write, no zeroing pass).
            def stage(y, accs):
                # one dynamic store per row when _FSTORE (dz slots ride
                # sublanes); three otherwise
                if _FSTORE:
                    dz_ref[pl.ds(y, 1)] = jnp.concatenate(accs,
                                                          axis=0)[None]
                else:
                    for dz in range(3):
                        dz_ref[dz, pl.ds(y, 1)] = accs[dz][None]

            if _PIPE:
                # software-pipelined edition: the matmul for row y+2 is
                # ISSUED at iteration y and consumed at y+1, so the VPU
                # staging work never waits on the matmul just pushed into
                # the MXU. The edge zeroing moves to use time (only the
                # dy=2 slices of P(y+1) can read past the last row).
                # UN rows per fori iteration (manual unroll, _UNROLL).
                UN = _unroll_for(H)

                def row(i, carry):
                    p_prev, p_cur, p_next = carry    # P(y-1), P(y), P(y+1)
                    for r in range(UN):
                        y = i * UN + r
                        p_next2 = tap_matmul(y + 2, zero_edge=False)
                        accs = []
                        for dz in range(3):
                            dn = p_next[(dz * 3 + 2) * Cout:
                                        (dz * 3 + 3) * Cout]
                            dn = jnp.where(y + 1 < H, dn, 0.0)
                            accs.append(p_prev[(dz * 3 + 0) * Cout:
                                               (dz * 3 + 1) * Cout]
                                        + p_cur[(dz * 3 + 1) * Cout:
                                                (dz * 3 + 2) * Cout]
                                        + dn)
                        stage(y, accs)
                        p_prev, p_cur, p_next = p_cur, p_next, p_next2
                    return p_prev, p_cur, p_next

                p0 = jnp.zeros((9 * Cout, W), jnp.float32)
                jax.lax.fori_loop(0, H // UN, row,
                                  (p0, tap_matmul(0, zero_edge=False),
                                   tap_matmul(1, zero_edge=False)))
            else:
                def row(y, carry):
                    p_prev, p_cur = carry            # P(y-1), P(y)
                    p_next = tap_matmul(y + 1)
                    accs = [p_prev[(dz * 3 + 0) * Cout:(dz * 3 + 1) * Cout]
                            + p_cur[(dz * 3 + 1) * Cout:(dz * 3 + 2) * Cout]
                            + p_next[(dz * 3 + 2) * Cout:(dz * 3 + 3) * Cout]
                            for dz in range(3)]
                    stage(y, accs)
                    return p_cur, p_next

                p0 = jnp.zeros((9 * Cout, W), jnp.float32)
                jax.lax.fori_loop(0, H, row, (p0, tap_matmul(0)))

            for dz in range(3):
                z = g + 1 - dz

                @pl.when((z >= 0) & (z < D))
                def _(dz=dz, z=z):
                    if _FSTORE:
                        acc_ref[pl.ds(z % 3, 1)] += (
                            dz_ref[:, dz * Cout:(dz + 1) * Cout][None])
                    else:
                        acc_ref[pl.ds(z % 3, 1)] += dz_ref[dz:dz + 1]

        @pl.when(g > 0)
        def _():
            _emit(acc_ref[pl.ds((g - 1) % 3, 1)], b_ref, relu, out_ref)

    return kernel


def _make_kernel_packed(D: int, H: int, W: int, C: int, Cout: int,
                        PACK: int, has_bias: bool = False,
                        relu: bool = False):
    """Lane-packed s1 edition: PACK consecutive image rows ride the lane
    axis, so one tap matmul covers PACK rows and the ~0.3 us/row fixed
    per-iteration cost (measured flat across layer shapes) amortizes.

    Input arrives XLA-side packed as (D, H/PACK, C, PACK*W): lane index
    = r*W + x. dx shifts become lane shifts with the row-boundary leak
    columns masked; the dy ring combine needs source rows t*PACK+r-1 /
    +1, i.e. the packed P lane-rolled by +-W with the wrapped row
    stitched in from the neighbouring ring entry.
    """
    HP = H // PACK
    WP = PACK * W

    def kernel(x_ref, w_ref, *rest):
        # x_ref: (1, HP, C, WP) source slab min(g, D-1);
        # w_ref: (9*Cout, 3*C);
        # b_ref (when has_bias): (Cout, WP) f32 per-channel bias;
        # out_ref: (1, HP, Cout, WP) packed output slab max(g-1, 0) — the
        #   wrapper unpacks back to NDHWC;
        # acc_ref: (3, HP, Cout, WP) f32 revolving accumulator;
        # dz_ref: (3, HP, Cout, WP) f32 per-dz staging.
        if has_bias:
            b_ref, out_ref, acc_ref, dz_ref = rest
        else:
            (out_ref, acc_ref, dz_ref), b_ref = rest, None
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        @pl.when(g > 0)
        def _():
            acc_ref[pl.ds((g + 1) % 3, 1)] = jnp.zeros((1, HP, Cout, WP),
                                                       jnp.float32)

        @pl.when(g < D)
        def _():
            w = w_ref[...]
            lane = jax.lax.broadcasted_iota(jnp.int32, (C, WP), 1)
            # row-boundary leak masks for the dx lane shifts
            m_left = (lane % W != 0).astype(w.dtype)         # kill x=0 leak
            m_right = (lane % W != W - 1).astype(w.dtype)    # kill x=W-1
            lane_o = jax.lax.broadcasted_iota(jnp.int32, (Cout, WP), 1)
            first_row = lane_o < W                           # packed row 0
            last_row = lane_o >= WP - W                      # packed row -1

            def tap_matmul(t):
                xq = x_ref[0, pl.ds(jnp.minimum(t, HP - 1), 1)]
                xq = xq.reshape(C, WP)
                zc = jnp.zeros((C, 1), xq.dtype)
                left = jnp.concatenate([zc, xq[:, :WP - 1]], axis=1)
                right = jnp.concatenate([xq[:, 1:], zc], axis=1)
                cat = jnp.concatenate(
                    [left * m_left, xq, right * m_right], axis=0)
                P = jax.lax.dot_general(
                    w, cat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (9Cout, WP)
                return jnp.where(t < HP, P, 0.0)

            def blk(P, i):
                return P[i * Cout:(i + 1) * Cout]            # (Cout, WP)

            UN = _unroll_for(HP)

            def row(i, carry):
                p_prev, p_cur = carry                        # P(t-1), P(t)
                for r in range(UN):
                    t = i * UN + r
                    p_next = tap_matmul(t + 1)
                    accs = []
                    for dz in range(3):
                        # dy=0 taps: source rows shifted down one image
                        # row — lane-roll right by W, first packed row
                        # stitched from the previous group's last row
                        up = jnp.where(
                            first_row,
                            pltpu.roll(blk(p_prev, dz * 3), W, 1),
                            pltpu.roll(blk(p_cur, dz * 3), W, 1))
                        # dy=2 taps: shifted up one image row (cyclic
                        # right by WP - W == left by W; pltpu.roll wants
                        # shift >= 0)
                        dn = jnp.where(
                            last_row,
                            pltpu.roll(blk(p_next, dz * 3 + 2), WP - W, 1),
                            pltpu.roll(blk(p_cur, dz * 3 + 2), WP - W, 1))
                        accs.append(up + blk(p_cur, dz * 3 + 1) + dn)
                    if _FSTORE:
                        dz_ref[pl.ds(t, 1)] = jnp.concatenate(accs,
                                                              axis=0)[None]
                    else:
                        for dz in range(3):
                            dz_ref[dz, pl.ds(t, 1)] = accs[dz][None]
                    p_prev, p_cur = p_cur, p_next
                return p_prev, p_cur

            p0 = jnp.zeros((9 * Cout, WP), jnp.float32)
            jax.lax.fori_loop(0, HP // UN, row, (p0, tap_matmul(0)))

            for dz in range(3):
                z = g + 1 - dz

                @pl.when((z >= 0) & (z < D))
                def _(dz=dz, z=z):
                    if _FSTORE:
                        acc_ref[pl.ds(z % 3, 1)] += (
                            dz_ref[:, dz * Cout:(dz + 1) * Cout][None])
                    else:
                        acc_ref[pl.ds(z % 3, 1)] += dz_ref[dz:dz + 1]

        @pl.when(g > 0)
        def _():
            _emit(acc_ref[pl.ds((g - 1) % 3, 1)], b_ref, relu, out_ref)

    return kernel


def _make_kernel_dpack(D: int, H: int, W: int, C: int, Cout: int,
                       has_bias: bool = False, relu: bool = False):
    """D-pack edition (see _DPACK): grid cell g covers source slabs
    2g and 2g+1, whose rows are lane-concatenated IN-KERNEL (no XLA-side
    relayout) into (C, 2W) so every tap matmul, staging store, and loop
    iteration serves two slabs.

    Slab routing: a tap at depth offset dz from source slab 2g+q lands in
    output slab z = 2g+q+1-dz, i.e. output PAIR g+delta with
    delta in {-1, 0, +1} and a lane half that flips for odd (q - dz).
    A cyclic lane-roll by W on the (Cout, 2W) row swaps the halves, so
    the whole scatter is: roll A0 and A2 (the dz=0/2 dy-combined rows),
    then select-merge into three per-delta staging rows. After the row
    loop the three staged slabs accumulate into a 3-slot revolving PAIR
    accumulator, and the finished pair g-1 is emitted as the cell's two
    output slabs (static lane-half slices).
    """
    G = D // 2                       # source/output pairs

    def kernel(x_ref, w_ref, *rest):
        # x_ref: (2, H, C, W) source slabs (2g, 2g+1), channel-second-minor;
        # w_ref: (9*Cout, 3*C); b_ref (when has_bias): (Cout, 2W) f32;
        # out_ref: (2, H, Cout, W) output slabs (2(g-1), 2(g-1)+1);
        # acc_ref: (3, H, Cout, 2W) f32 revolving PAIR accumulator,
        #   slot(t) = t % 3; st_ref: (3, H, Cout, 2W) f32 per-delta staging
        #   (index delta+1).
        if has_bias:
            b_ref, out_ref, acc_ref, st_ref = rest
        else:
            (out_ref, acc_ref, st_ref), b_ref = rest, None
        g = pl.program_id(0)
        W2 = 2 * W

        @pl.when(g == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        @pl.when(g > 0)
        def _():
            # slot((g+1) % 3) last held pair g-2, emitted at cell g-1
            acc_ref[pl.ds((g + 1) % 3, 1)] = jnp.zeros((1, H, Cout, W2),
                                                       jnp.float32)

        @pl.when(g < G)
        def _():
            w = w_ref[...]
            lane = jax.lax.broadcasted_iota(jnp.int32, (C, W2), 1)
            m_left = (lane % W != 0).astype(w.dtype)      # kill x=0 leak
            m_right = (lane % W != W - 1).astype(w.dtype)
            lane_o = jax.lax.broadcasted_iota(jnp.int32, (Cout, W2), 1)
            first_half = lane_o < W

            def tap_matmul(i, zero_edge=True):
                xa = x_ref[0, pl.ds(jnp.minimum(i, H - 1), 1)].reshape(C, W)
                xb = x_ref[1, pl.ds(jnp.minimum(i, H - 1), 1)].reshape(C, W)
                xq = jnp.concatenate([xa, xb], axis=1)        # (C, 2W)
                zc = jnp.zeros((C, 1), xq.dtype)
                left = jnp.concatenate([zc, xq[:, :W2 - 1]], axis=1)
                right = jnp.concatenate([xq[:, 1:], zc], axis=1)
                cat = jnp.concatenate(
                    [left * m_left, xq, right * m_right], axis=0)  # (3C, 2W)
                P = jax.lax.dot_general(
                    w, cat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (9Cout, 2W)
                return jnp.where(i < H, P, 0.0) if zero_edge else P

            def stage(y, accs):
                # dz routing: roll-by-W swaps the slab halves
                a0r = pltpu.roll(accs[0], W, 1)
                a2r = pltpu.roll(accs[2], W, 1)
                zero = jnp.zeros_like(a0r)
                st_ref[2, pl.ds(y, 1)] = jnp.where(first_half, a0r,
                                                   zero)[None]
                st_ref[1, pl.ds(y, 1)] = (accs[1] + jnp.where(
                    first_half, a2r, a0r))[None]
                st_ref[0, pl.ds(y, 1)] = jnp.where(first_half, zero,
                                                   a2r)[None]

            if _PIPE:
                UN = _unroll_for(H)

                def row(i, carry):
                    p_prev, p_cur, p_next = carry    # P(y-1), P(y), P(y+1)
                    for r in range(UN):
                        y = i * UN + r
                        p_next2 = tap_matmul(y + 2, zero_edge=False)
                        accs = []
                        for dz in range(3):
                            dn = p_next[(dz * 3 + 2) * Cout:
                                        (dz * 3 + 3) * Cout]
                            dn = jnp.where(y + 1 < H, dn, 0.0)
                            accs.append(p_prev[(dz * 3 + 0) * Cout:
                                               (dz * 3 + 1) * Cout]
                                        + p_cur[(dz * 3 + 1) * Cout:
                                                (dz * 3 + 2) * Cout]
                                        + dn)
                        stage(y, accs)
                        p_prev, p_cur, p_next = p_cur, p_next, p_next2
                    return p_prev, p_cur, p_next

                p0 = jnp.zeros((9 * Cout, W2), jnp.float32)
                jax.lax.fori_loop(0, H // UN, row,
                                  (p0, tap_matmul(0, zero_edge=False),
                                   tap_matmul(1, zero_edge=False)))
            else:
                def row(y, carry):
                    p_prev, p_cur = carry
                    p_next = tap_matmul(y + 1)
                    accs = [p_prev[(dz * 3 + 0) * Cout:(dz * 3 + 1) * Cout]
                            + p_cur[(dz * 3 + 1) * Cout:(dz * 3 + 2) * Cout]
                            + p_next[(dz * 3 + 2) * Cout:(dz * 3 + 3) * Cout]
                            for dz in range(3)]
                    stage(y, accs)
                    return p_cur, p_next

                p0 = jnp.zeros((9 * Cout, W2), jnp.float32)
                jax.lax.fori_loop(0, H, row, (p0, tap_matmul(0)))

            for delta in (-1, 0, 1):
                t = g + delta

                @pl.when((t >= 0) & (t < G))
                def _(delta=delta, t=t):
                    acc_ref[pl.ds(t % 3, 1)] += st_ref[delta + 1:delta + 2]

        @pl.when(g > 0)
        def _():
            v = acc_ref[pl.ds((g - 1) % 3, 1)]           # (1, H, Cout, 2W)
            if b_ref is not None:
                v = v + b_ref[...]
            if relu:
                v = jnp.maximum(v, 0.0)
            v = v.astype(out_ref.dtype)
            out_ref[0] = v[0, :, :, :W]
            out_ref[1] = v[0, :, :, W:]

    return kernel


def rowconv3d_dpack_supported(D: int, H: int, W: int, C: int, Cout: int,
                              dtype=jnp.bfloat16) -> bool:
    """VMEM model for the D-pack s1 kernel (channel-second-minor; the
    2W lane axis pads to a 128 multiple)."""
    item = jnp.dtype(dtype).itemsize
    w2pad = -(-(2 * W) // 128) * 128
    wpad = -(-W // 128) * 128
    copad = -(-Cout // 8) * 8
    cpad = -(-C // 8) * 8
    slab = 2 * 2 * H * cpad * wpad * item            # (2, H, C, W) dbuf
    scratch = 6 * H * copad * w2pad * 4              # 3-slot acc + staging
    out = 2 * 2 * H * copad * wpad * item
    total = slab + scratch + out
    return (D >= 4 and D % 2 == 0 and W % 8 == 0 and C <= 40 and Cout <= 32
            and (Cout % 8 == 0 or Cout == 1)
            and total < _VMEM_LIMIT - 8 * 2 ** 20)


def _make_kernel_s2(D: int, H: int, W: int, C: int, Cout: int,
                    has_bias: bool = False, relu: bool = False):
    """Stride-2 variant: out[z',y',x'] = sum k[dz,dy,dx] x[2z'+dz, 2y'+dy,
    2x'+dx] (SAME s2 pad_low=0). Source rows stream once; each row's taps
    scatter by parity into a 2-slot revolving accumulator of half-res
    output slabs. Channel-second-minor like _make_kernel.
    """
    H2, W2 = H // 2, W // 2

    def kernel(x_ref, w_ref, *rest):
        # x_ref: (1, H, W, C) slab min(g, D-1); b_ref (when has_bias):
        # (Cout, W2) f32 per-channel bias; out_ref: (1, H2, Cout, W2)
        # at index max(g//2 - 1, 0); acc_ref: (2, H2, Cout, W2) f32,
        # slot(z') = z' % 2; dz_ref: (3, H2+2, Cout, W2) f32 per-dz staging
        # (+1 pad row each side). Grid (D+1,) sequential.
        if has_bias:
            b_ref, out_ref, acc_ref, dz_ref = rest
        else:
            (out_ref, acc_ref, dz_ref), b_ref = rest, None
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        @pl.when((g > 0) & (g % 2 == 0) & (g // 2 < D // 2))
        def _():
            # even cell g starts accumulating z' = g/2
            acc_ref[pl.ds((g // 2) % 2, 1)] = jnp.zeros((1, H2, Cout, W2),
                                                        jnp.float32)

        @pl.when(g < D)
        def _():
            w = w_ref[...]

            def tap_matmul(i, zero_edge=True):
                # x_ref comes pre-reshaped to (1, H, W/2, 2C) XLA-side: a
                # (W, C) -> (W/2, 2C) shape cast inside the kernel is
                # unsupported by Mosaic's layout inference.
                x2 = x_ref[0, pl.ds(jnp.minimum(i, H - 1), 1)].reshape(
                    W2, 2 * C)
                nxt_full = jnp.concatenate(
                    [x2[1:], jnp.zeros((1, 2 * C), x2.dtype)], axis=0)
                cat = jnp.concatenate([x2, nxt_full[:, :C]], axis=1)
                P = jax.lax.dot_general(
                    w, cat, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (9*Cout, W2)
                return jnp.where(i < H, P, 0.0) if zero_edge else P

            def stage(t, accs):
                if _FSTORE:
                    dz_ref[pl.ds(t, 1)] = jnp.concatenate(accs,
                                                          axis=0)[None]
                else:
                    for dz in range(3):
                        dz_ref[dz, pl.ds(t, 1)] = accs[dz][None]

            # out(t) reads source rows 2t+dy: P(2t) carried from the
            # previous iteration (as its P(2t'+2)), P(2t+1)/P(2t+2) fresh.
            if _PIPE:
                # pipelined: both fresh matmuls are issued one iteration
                # ahead of their use (see the s1 kernel note). Only the
                # dy=2 slices of P(2t+2) can read past the last source row
                # (2t+1 <= H-1 always), so edge zeroing happens at use.
                UN = _unroll_for(H2)

                def row(i, carry):
                    p_even, p_odd, p_nxt = carry
                    for r in range(UN):
                        t = i * UN + r
                        p_odd2 = tap_matmul(2 * t + 3, zero_edge=False)
                        p_nxt2 = tap_matmul(2 * t + 4, zero_edge=False)
                        accs = []
                        for dz in range(3):
                            dn = p_nxt[(dz * 3 + 2) * Cout:
                                       (dz * 3 + 3) * Cout]
                            dn = jnp.where(2 * t + 2 < H, dn, 0.0)
                            accs.append(p_even[(dz * 3 + 0) * Cout:
                                               (dz * 3 + 1) * Cout]
                                        + p_odd[(dz * 3 + 1) * Cout:
                                                (dz * 3 + 2) * Cout]
                                        + dn)
                        stage(t, accs)
                        p_even, p_odd, p_nxt = p_nxt, p_odd2, p_nxt2
                    return p_even, p_odd, p_nxt

                jax.lax.fori_loop(0, H2 // UN, row,
                                  (tap_matmul(0, zero_edge=False),
                                   tap_matmul(1, zero_edge=False),
                                   tap_matmul(2, zero_edge=False)))
            else:
                def row(t, p_even):
                    p_odd = tap_matmul(2 * t + 1)
                    p_nxt = tap_matmul(2 * t + 2)
                    accs = [p_even[(dz * 3 + 0) * Cout:(dz * 3 + 1) * Cout]
                            + p_odd[(dz * 3 + 1) * Cout:(dz * 3 + 2) * Cout]
                            + p_nxt[(dz * 3 + 2) * Cout:(dz * 3 + 3) * Cout]
                            for dz in range(3)]
                    stage(t, accs)
                    return p_nxt

                jax.lax.fori_loop(0, H2, row, tap_matmul(0))

            for dz in range(3):
                # z' = (g - dz) / 2 when parity matches
                @pl.when(((g - dz) % 2 == 0) & (g - dz >= 0)
                         & ((g - dz) // 2 < D // 2))
                def _(dz=dz):
                    slot = pl.ds(((g - dz) // 2) % 2, 1)
                    if _FSTORE:
                        acc_ref[slot] += (
                            dz_ref[:, dz * Cout:(dz + 1) * Cout][None])
                    else:
                        acc_ref[slot] += dz_ref[dz:dz + 1]

        @pl.when((g >= 2) & (g % 2 == 0))
        def _():
            _emit(acc_ref[pl.ds((g // 2 - 1) % 2, 1)], b_ref, relu, out_ref)

    return kernel


def _make_kernel_s2_split(D: int, H: int, W: int, C: int, Cout: int,
                          has_bias: bool = False, relu: bool = False):
    """Stride-2 tap-split variant (_S2SPLIT): odd source rows matmul only
    their dy=1 taps (3*Cout), even rows only dy=0/dy=2 (6*Cout) — half
    the issued MACs of _make_kernel_s2. Same staging/accumulator wiring.

    Operands: w_even (3C, 6*Cout) cols [(dz*2 + (dy==2))*Cout + co],
    w_odd (3C, 3*Cout) cols [dz*Cout + co].
    """
    H2, W2 = H // 2, W // 2

    def kernel(x_ref, we_ref, wo_ref, *rest):
        if has_bias:
            b_ref, out_ref, acc_ref, dz_ref = rest
        else:
            (out_ref, acc_ref, dz_ref), b_ref = rest, None
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        @pl.when((g > 0) & (g % 2 == 0) & (g // 2 < D // 2))
        def _():
            acc_ref[pl.ds((g // 2) % 2, 1)] = jnp.zeros((1, H2, Cout, W2),
                                                        jnp.float32)

        @pl.when(g < D)
        def _():
            we = we_ref[...]
            wo = wo_ref[...]

            def tap_matmul(i, w, zero_edge=True):
                x2 = x_ref[0, pl.ds(jnp.minimum(i, H - 1), 1)].reshape(
                    W2, 2 * C)
                nxt_full = jnp.concatenate(
                    [x2[1:], jnp.zeros((1, 2 * C), x2.dtype)], axis=0)
                cat = jnp.concatenate([x2, nxt_full[:, :C]], axis=1)
                P = jax.lax.dot_general(
                    w, cat, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (·*Cout, W2)
                return jnp.where(i < H, P, 0.0) if zero_edge else P

            even = lambda i, ze=True: tap_matmul(i, we, ze)
            odd = lambda i, ze=True: tap_matmul(i, wo, ze)

            def stage(t, accs):
                if _FSTORE:
                    dz_ref[pl.ds(t, 1)] = jnp.concatenate(accs,
                                                          axis=0)[None]
                else:
                    for dz in range(3):
                        dz_ref[dz, pl.ds(t, 1)] = accs[dz][None]

            def combine(p_even, p_odd, p_nxt, t):
                # accs[dz] = dy0 of row 2t + dy1 of row 2t+1 + dy2 of
                # row 2t+2 (even matrix cols: (dz*2 + (dy==2)) chunks)
                accs = []
                for dz in range(3):
                    dn = p_nxt[(dz * 2 + 1) * Cout:(dz * 2 + 2) * Cout]
                    dn = jnp.where(2 * t + 2 < H, dn, 0.0)
                    accs.append(p_even[(dz * 2 + 0) * Cout:
                                       (dz * 2 + 1) * Cout]
                                + p_odd[dz * Cout:(dz + 1) * Cout]
                                + dn)
                return accs

            if _PIPE:
                UN = _unroll_for(H2)

                def row(i, carry):
                    p_even, p_odd, p_nxt = carry
                    for r in range(UN):
                        t = i * UN + r
                        p_odd2 = odd(2 * t + 3, False)
                        p_nxt2 = even(2 * t + 4, False)
                        stage(t, combine(p_even, p_odd, p_nxt, t))
                        p_even, p_odd, p_nxt = p_nxt, p_odd2, p_nxt2
                    return p_even, p_odd, p_nxt

                jax.lax.fori_loop(0, H2 // UN, row,
                                  (even(0, False), odd(1, False),
                                   even(2, False)))
            else:
                def row(t, p_even):
                    p_odd = odd(2 * t + 1)
                    p_nxt = even(2 * t + 2)
                    stage(t, combine(p_even, p_odd, p_nxt, t))
                    return p_nxt

                jax.lax.fori_loop(0, H2, row, even(0))

            for dz in range(3):
                @pl.when(((g - dz) % 2 == 0) & (g - dz >= 0)
                         & ((g - dz) // 2 < D // 2))
                def _(dz=dz):
                    slot = pl.ds(((g - dz) // 2) % 2, 1)
                    if _FSTORE:
                        acc_ref[slot] += (
                            dz_ref[:, dz * Cout:(dz + 1) * Cout][None])
                    else:
                        acc_ref[slot] += dz_ref[dz:dz + 1]

        @pl.when((g >= 2) & (g % 2 == 0))
        def _():
            _emit(acc_ref[pl.ds((g // 2 - 1) % 2, 1)], b_ref, relu, out_ref)

    return kernel


def _weights_s2_split(kernel):
    """(3,3,3,Cin,Cout) -> w_even (3*Cin, 6*Cout), w_odd (3*Cin, 3*Cout).

    Column orders match _make_kernel_s2_split: even [(dz*2+(dy==2))*Cout],
    odd [dz*Cout]."""
    wr = _weights_wide(kernel)                       # (3C, [(dz*3+dy)*Co])
    cout = kernel.shape[-1]
    ev = jnp.concatenate(
        [wr[:, (dz * 3 + dy) * cout:(dz * 3 + dy + 1) * cout]
         for dz in range(3) for dy in (0, 2)], axis=1)
    od = jnp.concatenate(
        [wr[:, (dz * 3 + 1) * cout:(dz * 3 + 2) * cout]
         for dz in range(3)], axis=1)
    return ev, od


def rowconv3d_supported(D: int, H: int, W: int, C: int, Cout: int,
                        dtype=jnp.bfloat16) -> bool:
    """VMEM model with tile padding: everything is channel-second-minor
    (W pads to 128 lanes; C / Cout pad to 8 sublanes) except the stride-2
    input block, which stays (W/2, 2C) lane-minor (2C pads to 128)."""
    item = jnp.dtype(dtype).itemsize
    wpad = -(-W // 128) * 128
    copad = -(-Cout // 8) * 8
    cpad = -(-C // 8) * 8
    slab = 2 * H * max(cpad * wpad, (W // 2) * 128) * item  # dbl-buffered
    scratch = 6 * H * copad * wpad * 4          # 3-slot acc + 3-slot staging
    out = 2 * H * copad * wpad * item
    total = slab + scratch + out
    # Cout: ring slices of the (9*Cout, W) tap matrix sit at Cout-strided
    # sublane offsets; 8-aligned and single-row (Cout=1, measured 9.8 ms vs
    # XLA 24.7 at the prob-conv shape) are cheap, other unaligned strides
    # relayout (Cout=1 measured 2.3x slower under the old lane-minor input).
    return (D >= 2 and W % 8 == 0 and C <= 40 and Cout <= 32
            and (Cout % 8 == 0 or Cout == 1)
            and total < _VMEM_LIMIT - 8 * 2 ** 20)


def _weights_wide(kernel):
    """(3,3,3,Cin,Cout) -> (3*Cin, 9*Cout): W[(dx,ci),(dz,dy,co)]."""
    kd, kh, kw, cin, cout = kernel.shape
    return jnp.transpose(kernel, (2, 3, 0, 1, 4)).reshape(kw * cin,
                                                          kd * kh * cout)


@functools.partial(jax.jit,
                   static_argnames=("stride", "relu", "interpret",
                                    "cw_in", "cw_out"))
def _rowconv3d_fwd_impl(x, kernel, bias=None, stride: int = 1,
                        relu: bool = False, interpret: bool = False,
                        cw_in: bool = False, cw_out: bool = False):
    # cw_in/cw_out: accept/emit the kernel's native channel-second-minor
    # (B, D, H, C, W) layout, skipping the NDHWC relayout on that side.
    # Chained CW convs (the RegNet eval pipeline, models/regnet.py) then
    # pay ZERO transposes between layers instead of two per layer.
    if cw_in:
        B, D, H, C, W = x.shape
    else:
        B, D, H, W, C = x.shape
    cout = kernel.shape[-1]
    wr = _weights_wide(kernel)
    has_bias = bias is not None

    # outputs come (D', H', Cout, W') — channel-second-minor to avoid the
    # 16x minor-dim pad of Cout<128 VMEM tiles; transposed back below.
    dpack = False
    if stride == 1:
        # Lane-packing amortizes the fixed per-row cost but its roll/mask
        # overhead scales with C. Measured (full-res v5e): 8->1 9.8->6.0,
        # 16->16 3.8->2.8, but 32->8 13.6->20.3 — pack only for C<=16.
        import os  # noqa: PLC0415
        forced = os.environ.get("MVSNET_TPU_CONV_PACK")
        pack = 1
        if C <= 16:
            pack = 4 if H % 4 == 0 else (2 if H % 2 == 0 else 1)
        if forced:
            pack = int(forced) if H % int(forced) == 0 else 1
        want_dpack = (C <= 16) if _DPACK_AUTO else _DPACK
        dpack = (want_dpack and rowconv3d_dpack_supported(D, H, W, C, cout,
                                                          x.dtype))
        if dpack:
            pack = 1
        HP, WP = H // pack, pack * W
        if dpack:
            kern = _make_kernel_dpack(D, H, W, C, cout, has_bias, relu)
        elif pack > 1:
            kern = _make_kernel_packed(D, H, W, C, cout, pack, has_bias, relu)
        else:
            kern = _make_kernel(D, H, W, C, cout, has_bias, relu)
        out_shape = (D, HP, cout, WP)
        if dpack:
            out_spec = pl.BlockSpec((2, HP, cout, WP),
                                    lambda g: (jnp.maximum(g - 1, 0),
                                               0, 0, 0),
                                    memory_space=pltpu.VMEM)
            scratch = [pltpu.VMEM((3, HP, cout, 2 * WP), jnp.float32),
                       pltpu.VMEM((3, HP, cout, 2 * WP), jnp.float32)]
        else:
            out_spec = pl.BlockSpec((1, HP, cout, WP),
                                    lambda g: (jnp.maximum(g - 1, 0),
                                               0, 0, 0),
                                    memory_space=pltpu.VMEM)
            dz_shape = ((HP, 3 * cout, WP) if _FSTORE
                        else (3, HP, cout, WP))
            scratch = [pltpu.VMEM((3, HP, cout, WP), jnp.float32),
                       pltpu.VMEM(dz_shape, jnp.float32)]
        # channel-second-minor input + (9Cout, 3C) weights; PACK rows
        # ride the lane axis (lane = r*W + x)
        if not cw_in:
            x = jnp.transpose(x, (0, 1, 2, 4, 3))
        if pack > 1:
            x = x.reshape(B, D, HP, pack, C, W)
            x = jnp.transpose(x, (0, 1, 2, 4, 3, 5)).reshape(B, D, HP, C, WP)
        wr = wr.T
    else:
        assert stride == 2 and D % 2 == 0 and H % 2 == 0 and W % 2 == 0
        if cw_in:
            # the s2 kernel reads (W/2, 2C) lane-interleaved rows — that
            # slicing only exists in W-minor order, so pay the relayout
            # here (net zero: the producer skipped its output transpose).
            x = jnp.transpose(x, (0, 1, 2, 4, 3))
        if _S2SPLIT:
            kern = _make_kernel_s2_split(D, H, W, C, cout, has_bias, relu)
        else:
            kern = _make_kernel_s2(D, H, W, C, cout, has_bias, relu)
        out_shape = (D // 2, H // 2, cout, W // 2)
        out_spec = pl.BlockSpec((1, H // 2, cout, W // 2),
                                lambda g: (jnp.maximum(g // 2 - 1, 0), 0, 0, 0),
                                memory_space=pltpu.VMEM)
        dz_shape = ((H // 2, 3 * cout, W // 2) if _FSTORE
                    else (3, H // 2, cout, W // 2))
        scratch = [pltpu.VMEM((2, H // 2, cout, W // 2), jnp.float32),
                   pltpu.VMEM(dz_shape, jnp.float32)]

    if stride == 2:
        x = x.reshape(B, D, H, W // 2, 2 * C)
    in_block = x.shape[2:]

    if dpack:
        in_specs = [
            pl.BlockSpec((2,) + in_block,
                         lambda g: (jnp.minimum(g, D // 2 - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wr.shape, lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    elif stride == 2 and _S2SPLIT:
        we, wo = _weights_s2_split(kernel)
        in_specs = [
            pl.BlockSpec((1,) + in_block,
                         lambda g: (jnp.minimum(g, D - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(we.shape, lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wo.shape, lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        in_specs = [
            pl.BlockSpec((1,) + in_block,
                         lambda g: (jnp.minimum(g, D - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wr.shape, lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    if stride == 2 and _S2SPLIT:
        operands = [we.astype(x.dtype), wo.astype(x.dtype)]
    else:
        operands = [wr.astype(x.dtype)]
    if has_bias:
        # per-channel bias broadcast to the kernel's (Cout, W') lane tile
        b2d = jnp.broadcast_to(bias.astype(jnp.float32)[:, None],
                               (cout, 2 * out_shape[-1] if dpack
                                else out_shape[-1]))
        in_specs.append(pl.BlockSpec(b2d.shape, lambda g: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(b2d)

    grid_n = (D // 2 + 1) if dpack else (D + 1)

    def one(xb):
        return pl.pallas_call(
            kern,
            grid=(grid_n,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=_ARBITRARY1,
            cost_estimate=pl.CostEstimate(
                flops=2 * D * H * W * 27 * C * cout // stride ** 3,
                bytes_accessed=(D * H * W * C * x.dtype.itemsize
                                + D * H * W * cout * x.dtype.itemsize
                                // stride ** 3),
                transcendentals=0,
            ),
        )(xb, *operands)

    out = jnp.stack([one(x[b]) for b in range(B)], axis=0)
    if stride == 1 and pack > 1:
        out = out.reshape(B, D, H // pack, cout, pack, W)
        if cw_out:
            # (B, D, HP, Co, PACK, W) -> (B, D, H, Co, W)
            out = jnp.transpose(out, (0, 1, 2, 4, 3, 5))
            return out.reshape(B, D, H, cout, W)
        # (B, D, HP, Co, PACK*W) -> (B, D, H, W, Co)
        out = jnp.transpose(out, (0, 1, 2, 4, 5, 3))
        return out.reshape(B, D, H, W, cout)
    if cw_out:
        return out                                   # (B, D', H', Co, W')
    return jnp.transpose(out, (0, 1, 2, 4, 3))       # -> (B, D', H', W', Co)


def _auto_interpret() -> bool:
    # interpret everywhere but real TPUs, so CPU tests exercise the same code
    return jax.default_backend() != "tpu"


def rowconv3d_interpret(x, kernel, stride: int = 1):
    """Interpreter-mode variant for CPU tests."""
    return _rowconv3d_fwd_impl(x, kernel, stride=stride, interpret=True)


def _flip(kernel):
    # conv transpose filter: flip taps, swap ci/co
    return jnp.transpose(kernel[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))


def _xla_conv3d(x, kernel, stride: int = 1):
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(x, kernel, (stride,) * 3, "SAME",
                                        dimension_numbers=dn)


def _swap_cw(x):
    return jnp.swapaxes(x, -1, -2)


def _shift_zero(a, axis: int, off: int):
    """Shift `a` by `off` along `axis`, zero-filling (positive = toward
    higher indices reading from lower ones: out[i] = a[i - off])."""
    if off == 0:
        return a
    n = a.shape[axis]
    pad = [(0, 0)] * a.ndim
    if off > 0:
        pad[axis] = (off, 0)
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(0, n)
        return jnp.pad(a, pad)[tuple(sl)]
    pad[axis] = (0, -off)
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(-off, n - off)
    return jnp.pad(a, pad)[tuple(sl)]


def _wgrad_matmul_s1(x_n, g_n, kshape):
    """dk for the SAME s1 3x3x3 conv as one huge-K matmul (see _XWGRAD).

    dk[dz,dy,dx,ci,co] = sum_{zyx} x[z+dz-1, y+dy-1, x+dx-1, ci]
                                   * g[z, y, x, co]
    = sum_n xdx[n, (dx,ci)] * gzy[n, (dz,dy,co)] with
    xdx(dx) = x shifted by (1-dx) in W (x'[n] = x[n+dx-1]) and
    gzy(dz,dy) = g shifted by (dz-1, dy-1) in (D, H) (g'[p] = g[p-dz+1])
    — the dx shift rides x, the dz/dy shifts ride g, so the pairing at
    output offset 0 reproduces every tap.
    """
    kd, kh, kw, ci, co = kshape
    xdx = jnp.concatenate([_shift_zero(x_n, 3, 1 - dx) for dx in range(kw)],
                          axis=-1)                   # (B,D,H,W, 3ci)
    gzy = jnp.concatenate([_shift_zero(_shift_zero(g_n, 1, dz - 1),
                                       2, dy - 1)
                           for dz in range(kd) for dy in range(kh)],
                          axis=-1)                   # (B,D,H,W, 9co)
    flat = jax.lax.dot_general(
        xdx.reshape(-1, kw * ci), gzy.reshape(-1, kd * kh * co),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (3ci, 9co)
    dk = flat.reshape(kw, ci, kd, kh, co)
    return jnp.transpose(dk, (2, 3, 0, 1, 4)).astype(jnp.float32)


def _wgrad_matmul_s2(x_n, g_n, kshape):
    """dk for the SAME s2 3x3x3 conv (pad_low=0: out[t] reads 2t+d):

    dk[dz,dy,dx,ci,co] = sum_{z'y'x'} x[2z'+dz, 2y'+dy, 2x'+dx, ci]
                                      * g[z', y', x', co]
    — all 27 taps are strided-shifted views of x paired with the same g,
    so the 27 (dz,dy,dx) views lane-concat on the x side.
    """
    kd, kh, kw, ci, co = kshape
    B, D, H, W, _ = x_n.shape
    xp = jnp.pad(x_n, ((0, 0), (0, kd - 1), (0, kh - 1), (0, kw - 1),
                       (0, 0)))
    views = [xp[:, dz:dz + D:2, dy:dy + H:2, dx:dx + W:2]
             for dz in range(kd) for dy in range(kh) for dx in range(kw)]
    x27 = jnp.concatenate(views, axis=-1)            # (B,D/2,H/2,W/2,27ci)
    flat = jax.lax.dot_general(
        x27.reshape(-1, kd * kh * kw * ci), g_n.reshape(-1, co),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (27ci, co)
    return flat.reshape(kd, kh, kw, ci, co).astype(jnp.float32)


def _make_kernel_dks1(D: int, H: int, W: int, C: int, Cout: int):
    """Pallas s1 3x3x3 weight grad (see _PWGRAD).

    Grid (D,) sequential over SOURCE slabs s. Cell s pairs x slab s with
    g slabs z = s+1 (dz=0), s (dz=1), s-1 (dz=2) from a clamped 3-slab
    window, one MXU dot per source row:

      dk[(dx,ci),(dz,dy,co)] += cat_{s,y}[(dx,ci), x]
                                 * Gc_{s,y}[(dz,dy,co), x]

    cat = the forward tap_matmul's dx-shift build; Gc sublane-concats
    the 9 (dz,dy) g rows (y_out = y - dy + 1, zero-masked off-edge).
    out_ref (3C, 9Cout) f32 accumulates across the grid (constant index
    map) and the wrapper maps it back to (3,3,3,Ci,Co).
    """

    def kernel(x_ref, g0_ref, g1_ref, g2_ref, out_ref, acc_ref):
        # x_ref: (1, H, C, W) slab s (channel-second-minor);
        # g{dz}_ref: (1, H, Cout, W) g slab z = s + 1 - dz (index map
        #   clamped; validity derived from s in-kernel);
        # out_ref: (3C, 9Cout) f32; acc_ref: (3C, 9Cout) f32 scratch.
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        grefs = [g0_ref, g1_ref, g2_ref]
        valids = [s + 1 < D, jnp.bool_(True), s >= 1]

        def grow(dz, y2):
            row = grefs[dz][0, pl.ds(jnp.clip(y2, 0, H - 1), 1)].reshape(
                Cout, W)
            keep = valids[dz] & (y2 >= 0) & (y2 < H)
            return jnp.where(keep, row, jnp.zeros_like(row))

        UN = _unroll_for(H)

        def row(i, carry):
            for r in range(UN):
                y = i * UN + r
                x = x_ref[0, pl.ds(y, 1)].reshape(C, W)
                zero = jnp.zeros((C, 1), x.dtype)
                left = jnp.concatenate([zero, x[:, :W - 1]], axis=1)
                right = jnp.concatenate([x[:, 1:], zero], axis=1)
                cat = jnp.concatenate([left, x, right], axis=0)  # (3C, W)
                rows = [grow(dz, y - dy + 1)
                        for dz in range(3) for dy in range(3)]
                gc = jnp.concatenate(rows, axis=0)     # (9Cout, W)
                acc_ref[...] += jax.lax.dot_general(
                    cat, gc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return carry

        jax.lax.fori_loop(0, H // UN, row, 0)

        @pl.when(s == D - 1)
        def _():
            out_ref[...] = acc_ref[...]

    return kernel


def rowconv3d_dks1_supported(D: int, H: int, W: int, C: int, Cout: int,
                             dtype=jnp.bfloat16) -> bool:
    """VMEM model: x slab + 3-slab g window (double-buffered), tiny acc."""
    item = jnp.dtype(dtype).itemsize
    wpad = -(-W // 128) * 128
    cpad = -(-C // 8) * 8
    copad = -(-Cout // 8) * 8
    xs = 2 * H * cpad * wpad * item
    gs = 2 * 3 * H * copad * wpad * item
    acc = 2 * (3 * cpad) * -(-(9 * Cout) // 128) * 128 * 4
    return (D >= 3 and W % 8 == 0 and C <= 40 and Cout <= 32
            and xs + gs + acc < _VMEM_LIMIT - 8 * 2 ** 20)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_wgrad_s1(x_cw, g_cw, interpret: bool = False):
    """dk for the SAME s1 conv: x_cw (B, D, H, C, W), g_cw
    (B, D, H, Cout, W) -> (3, 3, 3, C, Cout) f32."""
    B, D, H, C_, W = x_cw.shape
    Cout_ = g_cw.shape[3]
    kern = _make_kernel_dks1(D, H, W, C_, Cout_)

    def one(xb, gb):
        return pl.pallas_call(
            kern,
            grid=(D,),
            in_specs=[
                pl.BlockSpec((1, H, C_, W), lambda s: (s, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, Cout_, W),
                             lambda s: (jnp.minimum(s + 1, D - 1), 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, Cout_, W), lambda s: (s, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, Cout_, W),
                             lambda s: (jnp.maximum(s - 1, 0), 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3 * C_, 9 * Cout_), lambda s: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3 * C_, 9 * Cout_),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((3 * C_, 9 * Cout_), jnp.float32)],
            interpret=interpret,
            compiler_params=_ARBITRARY1,
            cost_estimate=pl.CostEstimate(
                flops=2 * D * H * W * 27 * C_ * Cout_,
                bytes_accessed=(D * H * W * (C_ + 3 * Cout_)
                                * x_cw.dtype.itemsize),
                transcendentals=0,
            ),
        )(xb, gb, gb, gb)

    flat = one(x_cw[0], g_cw[0])
    for b in range(1, B):
        flat = flat + one(x_cw[b], g_cw[b])
    # flat rows (dx, ci), cols (dz, dy, co) — the _weights_wide layout;
    # invert its (2,3,0,1,4) permutation (self-inverse)
    dk = flat.reshape(3, C_, 3, 3, Cout_)
    return jnp.transpose(dk, (2, 3, 0, 1, 4))


def _make_kernel_dks2(D: int, H: int, W2: int, C: int, Cg: int,
                      Dg: int, Hg: int):
    """Pallas s2 3x3x3 weight grad (see _PWGRAD_S2).

    Grid (Dg,) sequential over cotangent slabs t. Refs: lane-parity
    pre-split source slabs (xe/xo, W2 = W//2 lanes) for the 3-slab
    window z = 2t+dz, plus the g slab t. Per cotangent row u the 27
    (dz,dy,dx) taps are 9 (xe,xo) row fetches + one lane shift each:
    one (Cg, W2) x (27C, W2)^T MXU dot accumulates into (Cg, 27C) f32.
    """

    def kernel(xe0_ref, xo0_ref, xe1_ref, xo1_ref, xe2_ref, xo2_ref,
               g_ref, out_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        xes = [xe0_ref, xe1_ref, xe2_ref]
        xos = [xo0_ref, xo1_ref, xo2_ref]
        # source slab 2t+dz validity (D even => dz=0,1 always in range)
        vz = [jnp.bool_(True), jnp.bool_(True), 2 * t + 2 <= D - 1]
        UN = _unroll_for(Hg)

        def row(i, carry):
            for r_u in range(UN):
                u = i * UN + r_u
                grow = g_ref[0, pl.ds(u, 1)].reshape(Cg, W2)
                blocks = []
                for dz in range(3):
                    for dy in range(3):
                        r = 2 * u + dy
                        keep = vz[dz] & (r <= H - 1)
                        rc = jnp.minimum(r, H - 1)
                        xe_r = xes[dz][0, pl.ds(rc, 1)].reshape(C, W2)
                        xo_r = xos[dz][0, pl.ds(rc, 1)].reshape(C, W2)
                        xe_s = jnp.concatenate(
                            [xe_r[:, 1:], jnp.zeros((C, 1), xe_r.dtype)],
                            axis=1)
                        blk = jnp.concatenate([xe_r, xo_r, xe_s], axis=0)
                        blocks.append(
                            jnp.where(keep, blk, jnp.zeros_like(blk)))
                x27 = jnp.concatenate(blocks, axis=0)       # (27C, W2)
                acc_ref[...] += jax.lax.dot_general(
                    grow, x27, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return carry

        jax.lax.fori_loop(0, Hg // UN, row, 0)

        @pl.when(t == Dg - 1)
        def _():
            out_ref[...] = acc_ref[...]

    return kernel


def rowconv3d_dks2_supported(D: int, H: int, W: int, C: int, Cg: int,
                             dtype=jnp.bfloat16) -> bool:
    """VMEM model: 6 half-width source slabs + cotangent slab
    (double-buffered) + tiny acc; even dims (SAME s2 pad_low=0)."""
    item = jnp.dtype(dtype).itemsize
    if D < 2 or D % 2 or H % 2 or W % 2:
        return False
    W2 = W // 2
    wpad = -(-W2 // 128) * 128
    cpad = -(-C // 8) * 8
    cgpad = -(-Cg // 8) * 8
    xs = 2 * 6 * H * cpad * wpad * item
    gs = 2 * (H // 2) * cgpad * wpad * item
    acc = 2 * cgpad * (-(-(27 * C) // 128) * 128) * 4
    return (C <= 64 and Cg <= 64
            and xs + gs + acc < _VMEM_LIMIT - 8 * 2 ** 20)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_wgrad_s2(x_cw, g_cw, interpret: bool = False):
    """dk for the SAME s2 conv (pad_low=0): x_cw (B, D, H, C, W), g_cw
    (B, D//2, H//2, Cg, W//2) -> (3, 3, 3, C, Cg) f32."""
    B, D, H, C_, W = x_cw.shape
    _, Dg, Hg, Cg, W2 = g_cw.shape
    xe = x_cw[..., 0::2]
    xo = x_cw[..., 1::2]
    kern = _make_kernel_dks2(D, H, W2, C_, Cg, Dg, Hg)

    def one(xeb, xob, gb):
        sl = pl.BlockSpec((1, H, C_, W2), lambda t: (2 * t, 0, 0, 0),
                          memory_space=pltpu.VMEM)
        sl1 = pl.BlockSpec((1, H, C_, W2), lambda t: (2 * t + 1, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        sl2 = pl.BlockSpec((1, H, C_, W2),
                           lambda t: (jnp.minimum(2 * t + 2, D - 1), 0, 0, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(Dg,),
            in_specs=[sl, sl, sl1, sl1, sl2, sl2,
                      pl.BlockSpec((1, Hg, Cg, W2), lambda t: (t, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((Cg, 27 * C_), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Cg, 27 * C_), jnp.float32),
            scratch_shapes=[pltpu.VMEM((Cg, 27 * C_), jnp.float32)],
            interpret=interpret,
            compiler_params=_ARBITRARY1,
            cost_estimate=pl.CostEstimate(
                flops=2 * Dg * Hg * W2 * 27 * C_ * Cg,
                bytes_accessed=((3 * D * H * (W // 2) * C_
                                 + Dg * Hg * W2 * Cg)
                                * x_cw.dtype.itemsize),
                transcendentals=0,
            ),
        )(xeb, xob, xeb, xob, xeb, xob, gb)

    flat = one(xe[0], xo[0], g_cw[0])
    for b in range(1, B):
        flat = flat + one(xe[b], xo[b], g_cw[b])
    # flat rows co, cols (dz, dy, dx, ci)
    dk = flat.reshape(Cg, 3, 3, 3, C_)
    return jnp.transpose(dk, (1, 2, 3, 4, 0))


@functools.lru_cache(maxsize=None)
def _make_rowconv3d_s1(cw_in: bool, cw_out: bool):
    """Differentiable s1 conv for a fixed (cw_in, cw_out) layout contract.

    The layout flags are baked into a cached custom_vjp (they're static):
    dx runs the SAME Pallas kernel with the flipped filter and the layout
    contract transposed (cotangents arrive in the output layout, dx must
    leave in the input layout); dk uses XLA's wgrad on NDHWC views (XLA
    fuses the swaps into its conv)."""

    @jax.custom_vjp
    def f(x, kernel):
        return _rowconv3d_fwd_impl(x, kernel, stride=1,
                                   interpret=_auto_interpret(),
                                   cw_in=cw_in, cw_out=cw_out)

    def fwd(x, kernel):
        return f(x, kernel), (x, kernel)

    def bwd(res, g):
        x, kernel = res
        g = g.astype(x.dtype)
        # the conv is linear: dx is the same kernel run with the flipped
        # filter, in the transposed layout contract
        dx = _rowconv3d_fwd_impl(g, _flip(kernel), stride=1,
                                 interpret=_auto_interpret(),
                                 cw_in=cw_out, cw_out=cw_in)
        xW = x.shape[4] if cw_in else x.shape[3]
        if _PWGRAD and rowconv3d_dks1_supported(
                x.shape[1], x.shape[2], xW,
                kernel.shape[3], kernel.shape[4], x.dtype):
            x_cw2 = x if cw_in else _swap_cw(x)      # (B, D, H, C, W)
            g_cw2 = g if cw_out else _swap_cw(g)
            dk = _pallas_wgrad_s1(
                x_cw2, g_cw2,
                interpret=_auto_interpret()).astype(kernel.dtype)
            return dx, dk
        x_n = _swap_cw(x) if cw_in else x
        g_n = _swap_cw(g) if cw_out else g
        if _XWGRAD:
            dk = _wgrad_matmul_s1(x_n, g_n,
                                  kernel.shape).astype(kernel.dtype)
        else:
            _, wgrad = jax.vjp(lambda k: _xla_conv3d(x_n, k, 1), kernel)
            (dk,) = wgrad(g_n)
        return dx, dk

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def _make_rowconv3d_s2(cw_in: bool, cw_out: bool):
    """Differentiable s2 conv for a fixed layout contract (see s1).

    dx runs the Pallas stride-2 DECONV kernel (deconv3d.py) with the
    flipped/transposed filter — the exact adjoint (the deconv's own dx
    rides this kernel in the opposite direction; the filter transform is
    an involution). dk (and the dx fallback when the deconv's VMEM model
    declines) uses XLA's native conv grads on NDHWC views."""

    @jax.custom_vjp
    def f(x, kernel):
        return _rowconv3d_fwd_impl(x, kernel, stride=2,
                                   interpret=_auto_interpret(),
                                   cw_in=cw_in, cw_out=cw_out)

    def fwd(x, kernel):
        return f(x, kernel), (x, kernel)

    def bwd(res, g):
        from mvsnet_tpu.ops.pallas.deconv3d import (  # noqa: PLC0415
            _rowdeconv3d_fwd_impl, rowdeconv3d_supported)
        x, kernel = res
        g = g.astype(x.dtype)
        q = _flip(kernel).astype(x.dtype)            # (3,3,3,Cout,Cin)
        if cw_out:
            gD, gH, gW = g.shape[1], g.shape[2], g.shape[4]
        else:
            gD, gH, gW = g.shape[1], g.shape[2], g.shape[3]
        x_n = _swap_cw(x) if cw_in else x
        g_n = _swap_cw(g) if cw_out else g

        def dk_of():
            xD, xH = x.shape[1], x.shape[2]
            xW = x.shape[4] if cw_in else x.shape[3]
            if _PWGRAD_S2 and rowconv3d_dks2_supported(
                    xD, xH, xW, kernel.shape[3], kernel.shape[4], x.dtype):
                x_cw2 = x if cw_in else _swap_cw(x)
                g_cw2 = g if cw_out else _swap_cw(g)
                return _pallas_wgrad_s2(
                    x_cw2, g_cw2,
                    interpret=_auto_interpret()).astype(kernel.dtype)
            if _XWGRAD:
                return _wgrad_matmul_s2(x_n, g_n,
                                        kernel.shape).astype(kernel.dtype)
            _, wgrad = jax.vjp(lambda k: _xla_conv3d(x_n, k, 2), kernel)
            (dk,) = wgrad(g_n)
            return dk

        if rowdeconv3d_supported(gD, gH, gW, q.shape[3], q.shape[4],
                                 g.dtype):
            dx = _rowdeconv3d_fwd_impl(g, q, interpret=_auto_interpret(),
                                       cw_in=cw_out, cw_out=cw_in)
            return dx, dk_of()
        _, xgrad = jax.vjp(lambda a: _xla_conv3d(a, kernel, 2), x_n)
        (dx_n,) = xgrad(g_n)
        dx = _swap_cw(dx_n) if cw_in else dx_n
        return dx, dk_of()

    f.defvjp(fwd, bwd)
    return f


def rowconv3d(x, kernel, stride: int = 1, cw_in: bool = False,
              cw_out: bool = False):
    """SAME 3x3x3 conv, stride 1 or 2, (B, D, H, W, Cin) @ (3,3,3,Cin,Cout).

    Drop-in for lax.conv_general_dilated(..., (s,s,s), 'SAME') with
    NDHWC/DHWIO. Differentiable: at stride 1, dx runs the same kernel with
    the flipped/transposed filter; dk (and the whole stride-2 backward)
    uses XLA's native conv grads. cw_in/cw_out: channel-second-minor
    (B, D, H, C, W) input/output — the training CW pipeline
    (models/regnet.py); gradients honor the same layout contract.
    """
    if stride == 1:
        return _make_rowconv3d_s1(cw_in, cw_out)(x, kernel)
    assert stride == 2, stride
    return _make_rowconv3d_s2(cw_in, cw_out)(x, kernel)


def rowconv3d_fused(x, kernel, bias=None, relu: bool = False,
                    stride: int = 1, cw_in: bool = False,
                    cw_out: bool = False):
    """Eval-only fused conv + per-channel bias + ReLU in one Pallas pass.

    The bias add and ReLU ride the kernel's final slab write (f32
    accumulator -> output cast), so a folded eval-mode batch norm
    (`y = conv(x, k*gamma*rsqrt(var+eps)) + (beta - mean*gamma*rsqrt)`)
    costs zero extra HBM traffic vs the bare conv. NOT differentiable —
    training uses `rowconv3d` + the unfused norm so batch stats stay exact
    (reference semantics: network.py:278-298 conv -> BN -> ReLU).

    cw_in/cw_out: take/return the channel-second-minor (B, D, H, C, W)
    layout (the kernels' native one) so chained eval convs skip the
    per-layer NDHWC relayouts entirely.
    """
    return _rowconv3d_fwd_impl(x, kernel, bias, stride=stride, relu=relu,
                               interpret=_auto_interpret(),
                               cw_in=cw_in, cw_out=cw_out)
