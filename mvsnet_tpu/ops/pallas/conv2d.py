"""3x3 2D conv as per-row wide-N matmuls (Pallas TPU).

The 2D sibling of ops/pallas/conv3d.py, for the small-channel convs in the
ConvGRU regularizer cells (models/gru.py; reference: convgru.py:54-121)
and the UNetDS2GN feature tower (reference: mvsnetworks.py:53-115). XLA
lowers these at ~1-7 TF/s on v5e because Cin and Cout both pad to the
128-lane MXU per tap.

Per source row, ONE matmul computes every tap contribution:

  P[(dy, co), x] = sum_{dx, ci} W2[(dy, co), (dx, ci)] * x[ys, x + dx - 1, ci]

with K = (dx, Cin) and the (dy, co) pairs on sublanes; the dy taps land on
output rows ys + 1 - dy by pure row indexing into a staging scratch.
Everything is channel-second-minor — the input arrives pre-transposed to
(B, H, C, W) — because (…, W, Cout<128) VMEM tiles pad their minor dim to
128 lanes (measured 16x blowups in the 3D kernel's first attempt).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

from mvsnet_tpu.ops.pallas.conv3d import _unroll_for

# 2D analog of conv3d._S2SPLIT (parity-split s2 tap matmuls — halves
# issued MACs; the 3D edition chip-won >=10%). A/B knob, default off
# until the chip run.
_S2SPLIT2D = _os.environ.get("MVSNET_TPU_CONV2D_S2SPLIT",
                             "0") not in ("0", "")

_VMEM_LIMIT = 100 * 2 ** 20
_ARBITRARY1 = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                   vmem_limit_bytes=_VMEM_LIMIT)


def _make_kernel2d_carry(H: int, W: int, C: int, Cout: int,
                         has_bias: bool = False, relu: bool = False):
    """Carry edition: write each output row exactly ONCE.

    out[y] = dy0·P(y-1) + dy1·P(y) + dy2·P(y+1), so walking source rows j
    with the previous two tap matmuls (P(j-1), P(j-2)) as fori carries
    finishes output row j-1 per iteration — no (H+2)-row staging scratch,
    no 3x read-modify-write accumulation, no final staging→out copy (the
    same structure as the deconv kernels' p_prev carry, deconv3d.py).

    Mosaic constraint (round-3 chip bisect, tools/bisect_carry2d.py):
    initializing a fori carry that gets STRIDED-SLICED in the loop body
    with a `jnp.zeros` splat constant SIGABRTs ApplyVectorLayoutPass
    ("limits[i] <= dim(i) (4 vs 1)") when W is not a multiple of 128 —
    the constant's layout can't reconcile with the sliced use on the
    backedge. Deriving the zero init from a real tap result (variant G,
    chip-validated) gives the init the body's layout; conv3d.py's kernels
    always did this, which is why they never crashed.
    """

    def kernel(x_ref, w_ref, *rest):
        # x_ref: (1, H, C, W); w_ref: (3*Cout, 3*C) rows (dy, co), cols
        # (dx, ci); b_ref (when has_bias): (Cout, W) f32; out_ref:
        # (1, H, Cout, W).
        if has_bias:
            b_ref, out_ref = rest
        else:
            (out_ref,), b_ref = rest, None
        w = w_ref[...]

        def tap(j):
            x = x_ref[0, pl.ds(j, 1)].reshape(C, W)
            zc = jnp.zeros((C, 1), x.dtype)
            left = jnp.concatenate([zc, x[:, :W - 1]], axis=1)
            right = jnp.concatenate([x[:, 1:], zc], axis=1)
            cat = jnp.concatenate([left, x, right], axis=0)   # (3C, W)
            return jax.lax.dot_general(
                w, cat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (3*Cout, W)

        def emit(v):
            if b_ref is not None:
                v = v + b_ref[...]
            if relu:
                v = jnp.maximum(v, 0.0)
            return v.astype(out_ref.dtype)

        # UN source rows per fori iteration (manual unroll — Mosaic's
        # per-iteration loop machinery costs ~210 ns; conv3d.py r3b A/Bs)
        UN = _unroll_for(H)

        def row(i, carry):
            p_prev, p_prev2 = carry                 # P(j-1), P(j-2)
            for r in range(UN):
                j = i * UN + r
                p_cur = tap(j)
                # out[j-1] = dy0 P(j-2) + dy1 P(j-1) + dy2 P(j)
                v = (p_prev2[0 * Cout:1 * Cout]
                     + p_prev[1 * Cout:2 * Cout]
                     + p_cur[2 * Cout:3 * Cout])

                @pl.when(j >= 1)
                def _(j=j, v=v):
                    out_ref[0, pl.ds(j - 1, 1)] = emit(v)[None]

                p_prev, p_prev2 = p_cur, p_prev
            return (p_prev, p_prev2)

        # P(-1) = P(-2) = 0, derived from a live tap so the init carries
        # the body's vector layout (see docstring; NOT jnp.zeros)
        zP = tap(0) * 0.0
        p_last, p_last2 = jax.lax.fori_loop(0, H // UN, row, (zP, zP))
        # bottom row: source row H would be zero padding
        out_ref[0, pl.ds(H - 1, 1)] = emit(
            p_last2[0 * Cout:1 * Cout] + p_last[1 * Cout:2 * Cout])[None]

    return kernel


def _make_kernel2d_bpack(H: int, W: int, B: int, C: int, Cout: int,
                         has_bias: bool = False, relu: bool = False):
    """Batch lane-pack edition: the B batch images ride the lane axis
    (lane = b*W + x), so ONE kernel invocation serves the whole batch and
    the per-row fixed cost (matmul issue + loop machinery, the dominant
    term of every small-channel layer) amortizes B-fold.

    Unlike the row-PACK kernel there are NO rolls or stitches: every
    packed segment shares the same image row y, so the dy taps are the
    ordinary P(j-1)/P(j-2) carries of the carry kernel. dx shifts are
    lane shifts with the two per-segment seam columns masked. The
    feature tower runs its 3 views through this as one call instead of
    3 sequential pallas_calls.
    """
    WB = B * W

    def kernel(x_ref, w_ref, *rest):
        # x_ref: (1, H, C, WB); w_ref: (3*Cout, 3*C);
        # b_ref (when has_bias): (Cout, WB) f32; out_ref: (1, H, Cout, WB).
        if has_bias:
            b_ref, out_ref = rest
        else:
            (out_ref,), b_ref = rest, None
        w = w_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, WB), 1)
        m_left = (lane % W != 0).astype(w.dtype)         # kill x=0 leak
        m_right = (lane % W != W - 1).astype(w.dtype)    # kill x=W-1

        def tap(j):
            x = x_ref[0, pl.ds(j, 1)].reshape(C, WB)
            zc = jnp.zeros((C, 1), x.dtype)
            left = jnp.concatenate([zc, x[:, :WB - 1]], axis=1)
            right = jnp.concatenate([x[:, 1:], zc], axis=1)
            cat = jnp.concatenate(
                [left * m_left, x, right * m_right], axis=0)  # (3C, WB)
            return jax.lax.dot_general(
                w, cat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (3Cout, WB)

        def emit(v):
            if b_ref is not None:
                v = v + b_ref[...]
            if relu:
                v = jnp.maximum(v, 0.0)
            return v.astype(out_ref.dtype)

        UN = _unroll_for(H)

        def row(i, carry):
            p_prev, p_prev2 = carry                 # P(j-1), P(j-2)
            for r in range(UN):
                j = i * UN + r
                p_cur = tap(j)
                v = (p_prev2[0 * Cout:1 * Cout]
                     + p_prev[1 * Cout:2 * Cout]
                     + p_cur[2 * Cout:3 * Cout])

                @pl.when(j >= 1)
                def _(j=j, v=v):
                    out_ref[0, pl.ds(j - 1, 1)] = emit(v)[None]

                p_prev, p_prev2 = p_cur, p_prev
            return (p_prev, p_prev2)

        # live-tap zero init (NOT jnp.zeros — the r3 carry-layout rule)
        zP = tap(0) * 0.0
        p_last, p_last2 = jax.lax.fori_loop(0, H // UN, row, (zP, zP))
        out_ref[0, pl.ds(H - 1, 1)] = emit(
            p_last2[0 * Cout:1 * Cout] + p_last[1 * Cout:2 * Cout])[None]

    return kernel


def _make_kernel2d_packed(H: int, W: int, C: int, Cout: int, PACK: int,
                          has_bias: bool = False, relu: bool = False):
    """Lane-packed s1 edition (the 2D sibling of conv3d's packed kernel):
    PACK consecutive image rows ride the lane axis, so one tap matmul
    covers PACK rows and the fixed per-row cost amortizes. Input arrives
    XLA-side packed as (H/PACK, C, PACK*W), lane = p*W + x; dx shifts are
    lane shifts with row-boundary leak columns masked; dy taps lane-roll
    by +-W with the wrapped row stitched from the neighbouring packed row
    (carried, single-write rows like _make_kernel2d_carry).
    """
    HP = H // PACK
    WP = PACK * W

    def kernel(x_ref, w_ref, *rest):
        # x_ref: (1, HP, C, WP); w_ref: (3*Cout, 3*C) rows (dy, co);
        # b_ref (when has_bias): (Cout, WP) f32; out_ref: (1, HP, Cout, WP).
        if has_bias:
            b_ref, out_ref = rest
        else:
            (out_ref,), b_ref = rest, None
        w = w_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, WP), 1)
        m_left = (lane % W != 0).astype(w.dtype)         # kill x=0 leak
        m_right = (lane % W != W - 1).astype(w.dtype)    # kill x=W-1
        lane_o = jax.lax.broadcasted_iota(jnp.int32, (Cout, WP), 1)
        first_row = lane_o < W                           # packed row 0
        last_row = lane_o >= WP - W                      # packed row -1

        def tap(t):
            xq = x_ref[0, pl.ds(jnp.minimum(t, HP - 1), 1)].reshape(C, WP)
            zc = jnp.zeros((C, 1), xq.dtype)
            left = jnp.concatenate([zc, xq[:, :WP - 1]], axis=1)
            right = jnp.concatenate([xq[:, 1:], zc], axis=1)
            cat = jnp.concatenate(
                [left * m_left, xq, right * m_right], axis=0)
            P = jax.lax.dot_general(
                w, cat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (3*Cout, WP)
            return jnp.where(t < HP, P, 0.0)

        def blk(P, dy):
            return P[dy * Cout:(dy + 1) * Cout]          # (Cout, WP)

        def emit(v):
            if b_ref is not None:
                v = v + b_ref[...]
            if relu:
                v = jnp.maximum(v, 0.0)
            return v.astype(out_ref.dtype)

        UN = _unroll_for(HP)

        def row(i, carry):
            p_prev, p_cur = carry                        # P(t-1), P(t)
            for r in range(UN):
                t = i * UN + r
                p_next = tap(t + 1)
                # dy=0 taps: source rows one image row up — lane-roll
                # right by W; packed row 0 stitches from the previous
                # packed group
                up = jnp.where(first_row,
                               pltpu.roll(blk(p_prev, 0), W, 1),
                               pltpu.roll(blk(p_cur, 0), W, 1))
                # dy=2 taps: one image row down (cyclic right by WP - W
                # == left by W; pltpu.roll wants shift >= 0)
                dn = jnp.where(last_row,
                               pltpu.roll(blk(p_next, 2), WP - W, 1),
                               pltpu.roll(blk(p_cur, 2), WP - W, 1))
                out_ref[0, pl.ds(t, 1)] = emit(up + blk(p_cur, 1)
                                               + dn)[None]
                p_prev, p_cur = p_cur, p_next
            return p_prev, p_cur

        # P(-1) = 0 derived from a live tap, NOT a jnp.zeros splat: a
        # zeros-const init for a carry that gets strided-sliced in the
        # body crashes Mosaic at WP % 128 != 0 (see _make_kernel2d_carry)
        t0 = tap(0)
        jax.lax.fori_loop(0, HP // UN, row, (t0 * 0.0, t0))

    return kernel


def _pack2d(H: int, W: int, C: int, Cout: int, item: int) -> int:
    """Packing factor for the s1 kernel: PACK rows on lanes when C is
    small (the per-row fixed cost dominates; conv3d measured pack wins
    only for C <= 16) and the packed whole-image blocks fit VMEM."""
    import os  # noqa: PLC0415

    forced = os.environ.get("MVSNET_TPU_CONV_PACK2D")
    if forced:
        cand = int(forced)
    elif C <= 16:
        cand = 4
    else:
        return 1
    while cand > 1:
        if H % cand == 0:
            wp = -(-(cand * W) // 128) * 128
            cpad = -(-C // 8) * 8
            copad = -(-Cout // 8) * 8
            blocks = 2 * (H // cand) * (cpad + copad) * wp * item
            if blocks < _VMEM_LIMIT - 8 * 2 ** 20:
                return cand
        cand //= 2
    return 1


def _make_kernel2d(H: int, W: int, C: int, Cout: int):
    def kernel(x_ref, w_ref, out_ref, st_ref):
        # x_ref: (1, H, C, W) one image, channel-second-minor;
        # w_ref: (3*Cout, 3*C) with rows (dy, co) and cols (dx, ci);
        # out_ref: (1, H, Cout, W); st_ref: (H+2, Cout, W) f32 staging
        # with one pad row on each side.
        st_ref[...] = jnp.zeros_like(st_ref)
        w = w_ref[...]

        def row(i, _):
            x = x_ref[0, pl.ds(i, 1)].reshape(C, W)
            zc = jnp.zeros((C, 1), x.dtype)
            # dx shifts along LANES; each shift is its own value
            left = jnp.concatenate([zc, x[:, :W - 1]], axis=1)
            right = jnp.concatenate([x[:, 1:], zc], axis=1)
            cat = jnp.concatenate([left, x, right], axis=0)   # (3C, W)
            P = jax.lax.dot_general(
                w, cat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (3*Cout, W)
            for dy in range(3):
                blk = P[dy * Cout:(dy + 1) * Cout]            # (Cout, W)
                # target row y = i + 1 - dy, +1 staging pad
                st_ref[pl.ds(i + 2 - dy, 1)] += blk[None]
            return 0

        jax.lax.fori_loop(0, H, row, 0)

        # emit in modest static chunks (a whole-image value would spill)
        eb = 16
        for r0 in range(0, H, eb):
            r1 = min(r0 + eb, H)
            out_ref[0, r0:r1] = st_ref[1 + r0:1 + r1].astype(out_ref.dtype)

    return kernel


def _make_kernel2d_s2(TB: int, W2: int, C: int, Cout: int, K: int = 3,
                      has_bias: bool = False, relu: bool = False):
    """Stride-2 variant over a pre-folded dx-tap table, K in {3, 5}.

    The wrapper builds cat[(i), dx*C + ci, x'] = x[i - pl, 2x' + dx - pl]
    (pl = SAME pad_low = (K-2)//2, zeros outside) XLA-side, so each source
    row needs ONE (K*Cout, K*C) @ (K*C, W2) matmul; out row t sums the dy
    blocks of P(2t) .. P(2t+K-1) with the first K-2 taps carried from the
    previous iteration — 2 fresh matmuls per output row (one per consumed
    source row, the streaming optimum). Each output row is written exactly
    once, with the optional bias/ReLU epilogue riding the write.
    TB = output rows per band; the block holds 2*TB + K - 2 table rows.
    """

    def kernel(cat_ref, w_ref, *rest):
        # cat_ref: (1, 2*TB + K - 2, K*C, W2); w_ref: (K*Cout, K*C) rows
        # (dy, co); b_ref (when has_bias): (Cout, W2) f32;
        # out_ref: (1, TB, Cout, W2).
        if has_bias:
            b_ref, out_ref = rest
        else:
            (out_ref,), b_ref = rest, None
        w = w_ref[...]

        def tap(i):
            x = cat_ref[0, pl.ds(i, 1)].reshape(K * C, W2)
            return jax.lax.dot_general(
                w, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (K*Cout, W2)

        def emit(v):
            if b_ref is not None:
                v = v + b_ref[...]
            if relu:
                v = jnp.maximum(v, 0.0)
            return v.astype(out_ref.dtype)

        UN = _unroll_for(TB)

        def row(i, carry):                # carry: P(2t) .. P(2t+K-3)
            for r in range(UN):
                t = i * UN + r
                pa = tap(2 * t + K - 2)
                pb = tap(2 * t + K - 1)
                ps = carry + (pa, pb)
                v = ps[0][0:Cout]
                for dy in range(1, K):
                    v = v + ps[dy][dy * Cout:(dy + 1) * Cout]
                out_ref[0, pl.ds(t, 1)] = emit(v)[None]
                carry = ps[2:]
            return carry

        # carry inits are live tap results (NOT jnp.zeros splats) — safe
        # against the sliced-carry layout crash (see _make_kernel2d_carry)
        init = tuple(tap(i) for i in range(K - 2))
        jax.lax.fori_loop(0, TB // UN, row, init)

    return kernel


def _make_kernel2d_s2_split(TB: int, W2: int, C: int, Cout: int, K: int = 3,
                            has_bias: bool = False, relu: bool = False):
    """Tap-split edition of _make_kernel2d_s2 (see conv3d._S2SPLIT): an
    EVEN table row j only ever contributes its even-dy taps (dy = j - 2t)
    and an odd row its odd-dy taps, so matmulling every row against all K
    dy blocks discards half the issued MACs. Operands: w_even
    (ceil(K/2)*Cout, K*C) rows (dy in 0,2[,4]; co), w_odd
    (floor(K/2)*Cout, K*C) rows (dy in 1[,3]; co)."""

    def kernel(cat_ref, we_ref, wo_ref, *rest):
        if has_bias:
            b_ref, out_ref = rest
        else:
            (out_ref,), b_ref = rest, None
        we = we_ref[...]
        wo = wo_ref[...]

        def tap(i, even):
            x = cat_ref[0, pl.ds(i, 1)].reshape(K * C, W2)
            return jax.lax.dot_general(
                we if even else wo, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # ((ne|no)*Cout, W2)

        def emit(v):
            if b_ref is not None:
                v = v + b_ref[...]
            if relu:
                v = jnp.maximum(v, 0.0)
            return v.astype(out_ref.dtype)

        UN = _unroll_for(TB)

        def row(i, carry):                # carry: P(2t) .. P(2t+K-3)
            for r in range(UN):
                t = i * UN + r
                # table offsets K-2 (odd for odd K) and K-1 (even)
                pa = tap(2 * t + K - 2, even=False)
                pb = tap(2 * t + K - 1, even=True)
                ps = carry + (pa, pb)
                v = ps[0][0:Cout]                      # dy=0: even block 0
                for dy in range(1, K):
                    blk = dy // 2 if dy % 2 == 0 else (dy - 1) // 2
                    v = v + ps[dy][blk * Cout:(blk + 1) * Cout]
                out_ref[0, pl.ds(t, 1)] = emit(v)[None]
                carry = ps[2:]
            return carry

        # carry inits are live tap results (see _make_kernel2d_s2)
        init = tuple(tap(i, even=(i % 2 == 0)) for i in range(K - 2))
        jax.lax.fori_loop(0, TB // UN, row, init)

    return kernel


def _weights_wide2d_s2_split(kernel):
    """(K,K,Cin,Cout) -> (w_even, w_odd) parity-split dy blocks, orders
    matching _make_kernel2d_s2_split."""
    w = _weights_wide2d_s2(kernel)                    # rows (dy, co)
    K, cout = kernel.shape[0], kernel.shape[-1]
    we = jnp.concatenate([w[dy * cout:(dy + 1) * cout]
                          for dy in range(0, K, 2)], axis=0)
    wo = jnp.concatenate([w[dy * cout:(dy + 1) * cout]
                          for dy in range(1, K, 2)], axis=0)
    return we, wo


def _fold_dx_s2(x, K: int = 3):
    """(B, H, W, C) -> (B, H + K - 2, K*C, W2) dx-tap table.

    table[i, dx*C + ci, x'] = x[i - pl, 2x' + dx - pl, ci] with
    pl = (K-2)//2 (the SAME-s2 low pad), zeros outside the image."""
    B, H, W, C = x.shape
    W2 = W // 2
    pl_ = (K - 2) // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pl_, K - 1 - pl_), (0, 0)))
    planes = [xp[:, :, dx:dx + 2 * W2:2] for dx in range(K)]  # (B,H,W2,C) each
    cat = jnp.concatenate(planes, axis=3)                 # (B, H, W2, K*C)
    cat = jnp.transpose(cat, (0, 1, 3, 2))                # (B, H, K*C, W2)
    return jnp.pad(cat, ((0, 0), (pl_, K - 2 - pl_), (0, 0), (0, 0)))


def _weights_wide2d_s2(kernel):
    """(K,K,Cin,Cout) -> (K*Cout, K*Cin): rows (dy, co), cols (dx, ci)."""
    kh, kw, cin, cout = kernel.shape
    return jnp.transpose(kernel, (0, 3, 1, 2)).reshape(kh * cout, kw * cin)


def _s2_fits(TB: int, W2: int, C: int, Cout: int, K: int, item: int) -> bool:
    w2pad = -(-W2 // 128) * 128
    ckpad = -(-(K * C) // 8) * 8
    copad = -(-Cout // 8) * 8
    cat = 2 * (2 * TB + K - 2) * ckpad * w2pad * item     # double-buffered
    out = 2 * TB * copad * w2pad * item
    return cat + out < _VMEM_LIMIT - 8 * 2 ** 20


def _s2_band_rows(H2: int, W2: int, C: int, Cout: int, K: int,
                  item: int) -> int:
    """Largest output band TB dividing H2 whose blocks fit VMEM (0=none)."""
    tb = H2
    while tb >= 1:
        if H2 % tb == 0 and _s2_fits(tb, W2, C, Cout, K, item):
            return tb
        tb //= 2
    return 0


def rowconv2d_s2_supported(H: int, W: int, C: int, Cout: int,
                           dtype=jnp.bfloat16, K: int = 3) -> bool:
    item = jnp.dtype(dtype).itemsize
    return (K in (3, 5) and H % 2 == 0 and W % 16 == 0 and H >= 2 * K
            and C <= 64 and Cout <= 64
            and _s2_band_rows(H // 2, W // 2, C, Cout, K, item) > 0)


@functools.partial(jax.jit, static_argnames=("relu", "interpret",
                                             "cw_in", "cw_out"))
def _rowconv2d_s2_fwd_impl(x, kernel, bias=None, relu: bool = False,
                           interpret: bool = False, cw_in: bool = False,
                           cw_out: bool = False):
    if cw_in:
        # the dx-tap fold reads lane-minor W; pay the relayout here (net
        # zero: the CW producer skipped its own output transpose)
        x = jnp.transpose(x, (0, 1, 3, 2))
    import os  # noqa: PLC0415

    B, H, W, C = x.shape
    K, cout = kernel.shape[0], kernel.shape[-1]
    H2, W2 = H // 2, W // 2
    w2 = _weights_wide2d_s2(kernel).astype(x.dtype)
    cat = _fold_dx_s2(x, K).astype(x.dtype)           # (B, H+K-2, K*C, W2)
    item = jnp.dtype(x.dtype).itemsize
    # batch lane-pack: the kernel is lane-shift-free (dx pre-folded), so
    # packing the batch is just wider tables — one call per band serves
    # the whole batch (env-gated, chip A/B)
    bp = (B if (B > 1 and os.environ.get("MVSNET_TPU_CONV_BPACK") == "1"
                and _s2_band_rows(H2, B * W2, C, cout, K, item) > 0)
          else 1)
    WP = bp * W2
    if bp > 1:
        cat = jnp.transpose(cat, (1, 2, 0, 3)).reshape(
            H + K - 2, K * C, WP)[None]               # (1, H+K-2, K*C, WP)
    TB = _s2_band_rows(H2, WP, C, cout, K, item)
    assert TB > 0, (H, W, C, cout, K)
    has_bias = bias is not None
    b2d = None
    if has_bias:
        b2d = jnp.broadcast_to(bias.astype(jnp.float32)[:, None],
                               (cout, WP))

    if _S2SPLIT2D:
        kern = _make_kernel2d_s2_split(TB, WP, C, cout, K, has_bias, relu)
        we, wo = _weights_wide2d_s2_split(kernel)
        we, wo = we.astype(x.dtype), wo.astype(x.dtype)
    else:
        kern = _make_kernel2d_s2(TB, WP, C, cout, K, has_bias, relu)
    rows_blk = 2 * TB + K - 2

    def band(cb):                                     # (rows_blk, K*C, WP)
        in_specs = [
            pl.BlockSpec((1, rows_blk, K * C, WP),
                         lambda g: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        ]
        if _S2SPLIT2D:
            in_specs += [
                pl.BlockSpec(we.shape, lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(wo.shape, lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
            operands = [we, wo]
        else:
            in_specs.append(pl.BlockSpec(w2.shape, lambda g: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands = [w2]
        if has_bias:
            in_specs.append(pl.BlockSpec((cout, WP), lambda g: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(b2d)
        return pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, TB, cout, WP),
                                   lambda g: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, TB, cout, WP), x.dtype),
            interpret=interpret,
            compiler_params=_ARBITRARY1,
            cost_estimate=pl.CostEstimate(
                flops=2 * TB * WP * K * K * C * cout * 2,
                bytes_accessed=(TB * WP * (2 * K * C + cout) * item),
                transcendentals=0,
            ),
        )(cb[None], *operands)

    def one(cb):                                      # (H+K-2, K*C, WP)
        parts = []
        for t0 in range(0, H2, TB):
            parts.append(band(cb[2 * t0:2 * t0 + rows_blk]))
        return jnp.concatenate(parts, axis=1)

    if bp > 1:
        outp = one(cat[0])[0]                         # (H2, Cout, B*W2)
        out = jnp.transpose(outp.reshape(H2, cout, B, W2), (2, 0, 1, 3))
    else:
        out = jnp.concatenate([one(cat[b]) for b in range(B)], axis=0)
    if cw_out:
        return out                                    # (B, H2, Cout, W2)
    return jnp.transpose(out, (0, 1, 3, 2))           # (B, H2, W2, Cout)


def _xla_conv2d_s2(x, kernel):
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, kernel, (2, 2), "SAME",
                                        dimension_numbers=dn)


@jax.custom_vjp
def rowconv2d_s2(x, kernel):
    """SAME stride-2 KxK conv (K in {3, 5}), (B,H,W,Cin) @ (K,K,Cin,Cout).

    Drop-in for lax.conv_general_dilated(..., (2,2), 'SAME') NHWC/HWIO —
    the UNetDS2GN encoder's downsampling convs (the 3->16 image stem runs
    at 0.1 TF/s through XLA: Cin pads to the 128-lane MXU per tap) and
    the 5x5 s2 tail convs (conv9_0/conv10_0; reference topology
    mvsnetworks.py:53-115). Differentiable: K=3 dx rides the parity-split
    Pallas deconv (the exact adjoint); otherwise XLA's gradient conv.
    """
    return _rowconv2d_s2_fwd_impl(x, kernel, interpret=_auto_interpret())


def _s2_vjp_fwd(x, kernel):
    return (_rowconv2d_s2_fwd_impl(x, kernel, interpret=_auto_interpret()),
            (x, kernel))


def _s2_vjp_bwd(res, g):
    from mvsnet_tpu.ops.pallas.deconv2d import (  # noqa: PLC0415
        rowdeconv2d,
        rowdeconv2d_supported,
    )
    x, kernel = res
    g = g.astype(x.dtype)
    # adjoint of the SAME s2 conv = the parity-split deconv with the
    # spatially-flipped, io-transposed kernel (deconv2d.py module doc)
    q = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2)).astype(x.dtype)
    gH, gW = g.shape[1:3]
    if (kernel.shape[0] == 3
            and rowdeconv2d_supported(gH, gW, q.shape[2], q.shape[3],
                                      g.dtype)):
        # interpret-mode on CPU (like the 3D VJPs) so tests exercise the
        # same gradient path the chip runs
        dx = rowdeconv2d(g, q)[:, :x.shape[1], :x.shape[2]]
    else:
        # exact by construction (k=5 SAME pads are asymmetric; deriving
        # the conv_transpose offset by hand is error-prone)
        _, xgrad = jax.vjp(lambda a: _xla_conv2d_s2(a, kernel), x)
        (dx,) = xgrad(g)
    _, wgrad = jax.vjp(lambda k: _xla_conv2d_s2(x, k), kernel)
    (dk,) = wgrad(g)
    return dx, dk


rowconv2d_s2.defvjp(_s2_vjp_fwd, _s2_vjp_bwd)


def rowconv2d_s2_fused(x, kernel, bias=None, relu: bool = False,
                       cw_in: bool = False, cw_out: bool = False):
    """Eval-only fused s2 conv + per-channel bias + ReLU (one Pallas pass).
    cw_in/cw_out: channel-second-minor (B, H, C, W) in/out."""
    return _rowconv2d_s2_fwd_impl(x, kernel, bias, relu=relu,
                                  interpret=_auto_interpret(),
                                  cw_in=cw_in, cw_out=cw_out)


def rowconv2d_s2_interpret(x, kernel):
    return _rowconv2d_s2_fwd_impl(x, kernel, interpret=True)


def _fits(H: int, W: int, C: int, Cout: int, item: int) -> bool:
    wpad = -(-W // 128) * 128
    cpad = -(-C // 8) * 8
    copad = -(-Cout // 8) * 8
    xblk = 2 * H * cpad * wpad * item
    st = (H + 2) * copad * wpad * 4
    out = 2 * H * copad * wpad * item
    return xblk + st + out < _VMEM_LIMIT - 8 * 2 ** 20


def _num_bands(H: int, W: int, C: int, Cout: int, item: int) -> int:
    """Split H into halo'd bands until one band fits VMEM (0 = give up)."""
    nb = 1
    while nb <= 16:
        if H % nb == 0 and _fits(H // nb + 2, W, C, Cout, item):
            return nb
        nb *= 2
    return 0


def rowconv2d_supported(H: int, W: int, C: int, Cout: int,
                        dtype=jnp.bfloat16) -> bool:
    """Shape/VMEM gate (H-banding makes big images fit)."""
    item = jnp.dtype(dtype).itemsize
    return (H >= 3 and W % 8 == 0 and C <= 64 and Cout <= 64
            and _num_bands(H, W, C, Cout, item) > 0)


def _weights_wide2d(kernel):
    """(3,3,Cin,Cout) -> (3*Cout, 3*Cin): W2[(dy,co),(dx,ci)]."""
    kh, kw, cin, cout = kernel.shape
    return jnp.transpose(kernel, (0, 3, 1, 2)).reshape(kh * cout, kw * cin)


@functools.partial(jax.jit, static_argnames=("relu", "interpret",
                                             "cw_in", "cw_out"))
def _rowconv2d_fwd_impl(x, kernel, bias=None, relu: bool = False,
                        interpret: bool = False, cw_in: bool = False,
                        cw_out: bool = False):
    # cw_in/cw_out: accept/emit the kernels' native channel-second-minor
    # (B, H, C, W) layout — chained CW convs (the UNetDS2GN eval pipeline)
    # skip the per-layer NHWC relayouts.
    import os  # noqa: PLC0415

    if cw_in:
        B, H, C, W = x.shape
        xt = x
    else:
        B, H, W, C = x.shape
        xt = jnp.transpose(x, (0, 1, 3, 2))             # (B, H, C, W)
    cout = kernel.shape[-1]
    w2 = _weights_wide2d(kernel)
    item = jnp.dtype(x.dtype).itemsize
    nb = _num_bands(H, W, C, cout, item) or 1
    hb = H // nb
    has_bias = bias is not None
    staging = bool(os.environ.get("MVSNET_TPU_CONV2D_STAGING"))
    # Batch lane-pack: one call serves the whole batch (roll-free, unlike
    # row-PACK). Env-gated off pending the chip A/B.
    bpack = (B > 1 and not staging
             and os.environ.get("MVSNET_TPU_CONV_BPACK") == "1"
             and _num_bands(H, B * W, C, cout, item) > 0)
    pack = 1
    if not staging and not bpack and nb == 1:
        pack = _pack2d(H, W, C, cout, item)
    b2d = None
    if has_bias:
        bw = W
        if pack > 1:
            bw = pack * W
        elif bpack:
            bw = B * W
        b2d = jnp.broadcast_to(bias.astype(jnp.float32)[:, None], (cout, bw))

    if bpack:
        WB = B * W
        nbb = _num_bands(H, WB, C, cout, item)
        hbb = H // nbb
        xp = jnp.transpose(xt, (1, 2, 0, 3)).reshape(H, C, WB)

        def bcall(xb, hband):
            kern = _make_kernel2d_bpack(hband, W, B, C, cout, has_bias,
                                        relu)
            in_specs = [
                pl.BlockSpec((1, hband, C, WB), lambda g: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * cout, 3 * C), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
            operands = [w2.astype(x.dtype)]
            if has_bias:
                in_specs.append(pl.BlockSpec((cout, WB), lambda g: (0, 0),
                                             memory_space=pltpu.VMEM))
                operands.append(b2d)
            return pl.pallas_call(
                kern,
                grid=(1,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, hband, cout, WB),
                                       lambda g: (0, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, hband, cout, WB),
                                               x.dtype),
                interpret=interpret,
                compiler_params=_ARBITRARY1,
                cost_estimate=pl.CostEstimate(
                    flops=2 * B * hband * W * 9 * C * cout,
                    bytes_accessed=B * hband * W * (C + cout) * item,
                    transcendentals=0,
                ),
            )(xb[None], *operands)

        if nbb == 1:
            outp = bcall(xp, H)[0]
        else:
            parts = []
            for i in range(nbb):
                lo = i * hbb
                s, e = max(lo - 1, 0), min(lo + hbb + 1, H)
                bo = bcall(xp[s:e], e - s)
                parts.append(bo[0, lo - s:lo - s + hbb])
            outp = jnp.concatenate(parts, axis=0)       # (H, Cout, WB)
        out = jnp.transpose(outp.reshape(H, cout, B, W), (2, 0, 1, 3))
        if cw_out:
            return out                                  # (B, H, Cout, W)
        return jnp.transpose(out, (0, 1, 3, 2))         # (B, H, W, Cout)

    if pack > 1:
        HP, WP = H // pack, pack * W
        xp = jnp.transpose(xt.reshape(B, HP, pack, C, W),
                           (0, 1, 3, 2, 4)).reshape(B, HP, C, WP)
        kern = _make_kernel2d_packed(H, W, C, cout, pack, has_bias, relu)
        in_specs = [
            pl.BlockSpec((1, HP, C, WP), lambda g: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * cout, 3 * C), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [w2.astype(x.dtype)]
        if has_bias:
            in_specs.append(pl.BlockSpec((cout, WP), lambda g: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(b2d)

        def packed_call(xb):
            return pl.pallas_call(
                kern,
                grid=(1,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, HP, cout, WP),
                                       lambda g: (0, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, HP, cout, WP), x.dtype),
                interpret=interpret,
                compiler_params=_ARBITRARY1,
                cost_estimate=pl.CostEstimate(
                    flops=2 * H * W * 9 * C * cout,
                    bytes_accessed=H * W * (C + cout) * item,
                    transcendentals=0,
                ),
            )(xb[None], *operands)

        out = jnp.concatenate([packed_call(xp[b]) for b in range(B)],
                              axis=0)                   # (B, HP, Cout, WP)
        out = jnp.transpose(out.reshape(B, HP, cout, pack, W),
                            (0, 1, 3, 2, 4)).reshape(B, H, cout, W)
        if cw_out:
            return out                                  # (B, H, Cout, W)
        return jnp.transpose(out, (0, 1, 3, 2))         # (B, H, W, Cout)

    def call(xb, hband):
        use_staging = staging and not has_bias and not relu
        if use_staging:
            kern = _make_kernel2d(hband, W, C, cout)
            scratch = [pltpu.VMEM((hband + 2, cout, W), jnp.float32)]
        else:
            kern = _make_kernel2d_carry(hband, W, C, cout, has_bias, relu)
            scratch = []
        in_specs = [
            pl.BlockSpec((1, hband, C, W), lambda g: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * cout, 3 * C), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [w2.astype(x.dtype)]
        if has_bias:
            # the carry kernel always takes the bias operand (the staging
            # kernel is only selected when there is no bias/ReLU)
            in_specs.append(pl.BlockSpec((cout, W), lambda g: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(b2d)
        return pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, hband, cout, W),
                                   lambda g: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, hband, cout, W), x.dtype),
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=_ARBITRARY1,
            cost_estimate=pl.CostEstimate(
                flops=2 * hband * W * 9 * C * cout,
                bytes_accessed=hband * W * (C + cout) * x.dtype.itemsize,
                transcendentals=0,
            ),
        )(xb[None], *operands)

    def one(xb):
        if nb == 1:
            return call(xb, H)
        # halo'd H-bands: band edges at the image boundary see zero pad
        # (same as the full conv); interior edges get one real halo row
        parts = []
        for i in range(nb):
            lo = i * hb
            s, e = max(lo - 1, 0), min(lo + hb + 1, H)
            bo = call(xb[s:e], e - s)
            parts.append(bo[:, lo - s:lo - s + hb])
        return jnp.concatenate(parts, axis=1)

    out = jnp.concatenate([one(xt[b]) for b in range(B)], axis=0)
    if cw_out:
        return out                                      # (B, H, Cout, W)
    return jnp.transpose(out, (0, 1, 3, 2))             # (B, H, W, Cout)


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _xla_conv2d(x, kernel):
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, kernel, (1, 1), "SAME",
                                        dimension_numbers=dn)


def rowconv2d_interpret(x, kernel):
    return _rowconv2d_fwd_impl(x, kernel, interpret=True)


def _flip2d(kernel):
    return jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))


@jax.custom_vjp
def rowconv2d(x, kernel):
    """SAME stride-1 3x3 conv, (B, H, W, Cin) @ (3,3,Cin,Cout).

    Drop-in for lax.conv_general_dilated(..., (1,1), 'SAME') NHWC/HWIO.
    Differentiable: dx reuses the kernel with the flipped filter; dk uses
    XLA's native wgrad.
    """
    return _rowconv2d_fwd_impl(x, kernel, interpret=_auto_interpret())


def _vjp2d_fwd(x, kernel):
    return _rowconv2d_fwd_impl(x, kernel, interpret=_auto_interpret()), (x, kernel)


def _vjp2d_bwd(res, g):
    x, kernel = res
    g = g.astype(x.dtype)
    dx = _rowconv2d_fwd_impl(g, _flip2d(kernel), interpret=_auto_interpret())
    _, wgrad = jax.vjp(lambda k: _xla_conv2d(x, k), kernel)
    (dk,) = wgrad(g)
    return dx, dk


rowconv2d.defvjp(_vjp2d_fwd, _vjp2d_bwd)


@jax.custom_vjp
def rowconv2d_bias(x, kernel, bias):
    """Differentiable s1 conv with the bias fused into the kernel's
    output-row write (no separate bias-add materialization; the GRU cells
    run 7 biased convs per depth plane). d(bias) is an exact reduction of
    the cotangent."""
    return _rowconv2d_fwd_impl(x, kernel, bias,
                               interpret=_auto_interpret())


def _vjp2db_fwd(x, kernel, bias):
    return rowconv2d_bias(x, kernel, bias), (x, kernel)


def _vjp2db_bwd(res, g):
    x, kernel = res
    gq = g.astype(x.dtype)
    dx = _rowconv2d_fwd_impl(gq, _flip2d(kernel),
                             interpret=_auto_interpret())
    _, wgrad = jax.vjp(lambda k: _xla_conv2d(x, k), kernel)
    (dk,) = wgrad(gq)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dk, db


rowconv2d_bias.defvjp(_vjp2db_fwd, _vjp2db_bwd)


@jax.custom_vjp
def rowconv2d_s2_bias(x, kernel, bias):
    """Differentiable s2 conv with the fused bias epilogue (see
    rowconv2d_bias)."""
    return _rowconv2d_s2_fwd_impl(x, kernel, bias,
                                  interpret=_auto_interpret())


def _s2b_vjp_fwd(x, kernel, bias):
    return rowconv2d_s2_bias(x, kernel, bias), (x, kernel)


def _s2b_vjp_bwd(res, g):
    dx, dk = _s2_vjp_bwd(res, g)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dk, db


rowconv2d_s2_bias.defvjp(_s2b_vjp_fwd, _s2b_vjp_bwd)


def rowconv2d_fused(x, kernel, bias=None, relu: bool = False,
                    cw_in: bool = False, cw_out: bool = False):
    """Eval-only fused conv + per-channel bias + ReLU in one Pallas pass.

    The bias add and ReLU ride the carry kernel's single output-row write
    (like conv3d.rowconv3d_fused) — a folded eval-mode batch norm or a
    conv bias costs zero extra HBM traffic. NOT differentiable — training
    uses `rowconv2d` + unfused epilogues. cw_in/cw_out take/return the
    channel-second-minor (B, H, C, W) layout.
    """
    return _rowconv2d_fwd_impl(x, kernel, bias, relu=relu,
                               interpret=_auto_interpret(),
                               cw_in=cw_in, cw_out=cw_out)
