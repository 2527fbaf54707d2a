"""3x3 stride-2 2D transposed conv (Pallas TPU): parity-split row kernel.

The 2D sibling of ops/pallas/deconv3d.py, for the UNetDS2GN decoder's
four DeconvGN upsamples (models/feature_net.py; reference topology:
cnn_wrapper/mvsnetworks.py:53-115, TF conv2d_transpose) — XLA's
transpose-conv lowering pads Cin/Cout to the 128-lane MXU per tap.

Semantics (== flax nn.ConvTranspose SAME k=3 s=2, measured):
out[2i + d] += k[2 - d] * x[i] per spatial dim. Per source row ONE
matmul computes all 9 taps:

  P[(dy, dx, co), x] = sum_ci W[(dy, dx, co), ci] * src[i, x, ci]

then output row 2i = dx-combine(dy=0 of P(i)) + dx-combine(dy=2 of
P(i-1)) and row 2i+1 = dx-combine(dy=1 of P(i)), where dx-combine
builds the [even-x | odd-x] lane-split row (even lanes take two taps,
odd take one — see deconv3d.py). The dy=2 row rides a one-row carry
scratch, which also makes the kernel bandable: the grid walks row bands
sequentially and the carry flows across the band boundary for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvsnet_tpu.ops.pallas.conv3d import _unroll_for

_VMEM_LIMIT = 100 * 2 ** 20
_ARBITRARY1 = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                   vmem_limit_bytes=_VMEM_LIMIT)


def _make_kernel(HB: int, W: int, C: int, Cout: int,
                 has_bias: bool = False, relu: bool = False,
                 B: int = 1):
    """B > 1: batch lane-pack (lane = b*W + x; one call serves the whole
    batch — see conv2d._make_kernel2d_bpack). The only packed-specific
    op is the per-segment mask on the dx=2 lane shift."""
    WB = B * W

    def kernel(x_ref, w_ref, *rest):
        # x_ref: (1, HB, C, WB) one source row band, channel-second-minor;
        # w_ref: (9*Cout, C) — rows ordered (dy*3+dx)*Cout + co, kernel
        #   pre-flipped spatially XLA-side;
        # b_ref (when has_bias): (Cout, 2*WB) f32;
        # out_ref: (1, 2*HB, Cout, 2*WB) parity-split lanes
        #   (lane = px*WB + b*W + x);
        # carry_ref: (1, Cout, 2*WB) f32 — the dy=2 row of this band's last
        #   source row, consumed by the next band's first output row.
        if has_bias:
            b_ref, out_ref, carry_ref = rest
        else:
            (out_ref, carry_ref), b_ref = rest, None
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            carry_ref[...] = jnp.zeros_like(carry_ref)

        w = w_ref[...]
        if B > 1:
            lane_o = jax.lax.broadcasted_iota(jnp.int32, (Cout, WB), 1)
            m_seg = (lane_o % W != 0).astype(jnp.float32)  # kill x=0 leak

        def blk(P, dy, dx):
            i = (dy * 3 + dx) * Cout
            return P[i:i + Cout]                       # (Cout, WB) f32

        def combine_dx(P, dy):
            # even-x plane: out[2x] = c0[x] + c2[x-1]; odd-x: c1[x]
            c0, c1, c2 = (blk(P, dy, dx) for dx in range(3))
            c2s = jnp.concatenate(
                [jnp.zeros((Cout, 1), jnp.float32), c2[:, :WB - 1]], axis=1)
            if B > 1:
                c2s = c2s * m_seg
            return jnp.concatenate([c0 + c2s, c1], axis=1)  # (Cout, 2WB)

        def emit(v):
            if b_ref is not None:
                v = v + b_ref[...]
            if relu:
                v = jnp.maximum(v, 0.0)
            return v.astype(out_ref.dtype)

        UN = _unroll_for(HB)

        def row(i, _):
            for r in range(UN):
                j = i * UN + r
                x = x_ref[0, pl.ds(j, 1)].reshape(C, WB)
                P = jax.lax.dot_general(
                    w, x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (9*Cout, W)
                prev = carry_ref[0]                      # dy=2 of row j-1
                out_ref[0, pl.ds(2 * j, 1)] = emit(combine_dx(P, 0)
                                                   + prev)[None]
                out_ref[0, pl.ds(2 * j + 1, 1)] = emit(combine_dx(P, 1))[None]
                carry_ref[0] = combine_dx(P, 2)
            return 0

        jax.lax.fori_loop(0, HB // UN, row, 0)

    return kernel


def _band_split(H: int, W: int, C: int, Cout: int, item: int):
    """Smallest band count NB (dividing H) whose VMEM footprint fits."""
    wpad = -(-W // 128) * 128
    w2pad = -(-(2 * W) // 128) * 128
    cpad = -(-C // 8) * 8
    copad = -(-Cout // 8) * 8
    for nb in (1, 2, 3, 4, 6, 8, 12, 16):
        if H % nb:
            continue
        hb = H // nb
        total = (2 * hb * cpad * wpad * item          # input band, dbl-buf
                 + 2 * 2 * hb * copad * w2pad * item  # output band, dbl-buf
                 + copad * w2pad * 4)                 # carry row
        if total < _VMEM_LIMIT - 8 * 2 ** 20:
            return nb
    return 0


def rowdeconv2d_supported(H: int, W: int, C: int, Cout: int,
                          dtype=jnp.bfloat16) -> bool:
    item = jnp.dtype(dtype).itemsize
    return (W % 8 == 0 and C <= 128 and Cout <= 64 and Cout % 8 == 0
            and _band_split(H, W, C, Cout, item) > 0)


def _weights_wide(kernel):
    """(3,3,Cin,Cout) nn.ConvTranspose layout -> (9*Cout, Cin), rows
    ordered (dy,dx,co), kernel spatially flipped."""
    kf = kernel[::-1, ::-1]
    kh, kw, cin, cout = kf.shape
    return jnp.transpose(kf, (0, 1, 3, 2)).reshape(kh * kw * cout, cin)


@functools.partial(jax.jit, static_argnames=("relu", "interpret",
                                             "cw_in", "cw_out"))
def _rowdeconv2d_fwd_impl(x, kernel, bias=None, relu: bool = False,
                          interpret: bool = False, cw_in: bool = False,
                          cw_out: bool = False):
    # cw_in/cw_out: channel-second-minor (B, H, C, W) in/out (see
    # conv2d._rowconv2d_fwd_impl).
    if cw_in:
        B, H, C, W = x.shape
        xin = x
    else:
        B, H, W, C = x.shape
        xin = jnp.transpose(x, (0, 1, 3, 2))         # (B, H, C, W)
    import os  # noqa: PLC0415

    cout = kernel.shape[-1]
    wr = _weights_wide(kernel).astype(x.dtype)
    has_bias = bias is not None
    item = jnp.dtype(x.dtype).itemsize
    # batch lane-pack: one call for the whole batch (env-gated, chip A/B)
    bp = (B if (B > 1 and os.environ.get("MVSNET_TPU_CONV_BPACK") == "1"
                and _band_split(H, B * W, C, cout, item) > 0)
          else 1)
    WB = bp * W
    nb = _band_split(H, WB, C, cout, item)
    hb = H // nb
    in_specs = [
        pl.BlockSpec((1, hb, C, WB), lambda g: (0, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wr.shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [wr]
    if has_bias:
        b2d = jnp.broadcast_to(bias.astype(jnp.float32)[:, None],
                               (cout, 2 * WB))
        in_specs.append(pl.BlockSpec(b2d.shape, lambda g: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(b2d)
    kern = _make_kernel(hb, W, C, cout, has_bias, relu, B=bp)

    def one(xb):
        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 2 * hb, cout, 2 * WB),
                                   lambda g: (0, g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 2 * H, cout, 2 * WB),
                                           x.dtype),
            scratch_shapes=[pltpu.VMEM((1, cout, 2 * WB), jnp.float32)],
            interpret=interpret,
            compiler_params=_ARBITRARY1,
            cost_estimate=pl.CostEstimate(
                flops=2 * bp * H * W * 9 * C * cout,
                bytes_accessed=(bp * H * W * C * item
                                + 4 * bp * H * W * cout * item),
                transcendentals=0,
            ),
        )(xb[None], *operands)[0]

    if bp > 1:
        xp = jnp.transpose(xin, (1, 2, 0, 3)).reshape(H, C, WB)
        out = one(xp)                                # (2H, Cout, 2*WB)
        out = out.reshape(2 * H, cout, 2, B, W)
        if cw_out:
            # (…, co, [even|odd], b, W) -> (B, 2H, co, 2W) interleaved
            return jnp.transpose(out, (3, 0, 1, 4, 2)).reshape(
                B, 2 * H, cout, 2 * W)
        return jnp.transpose(out, (3, 0, 4, 2, 1)).reshape(
            B, 2 * H, 2 * W, cout)

    out = jnp.stack([one(xin[b]) for b in range(B)], axis=0)
    out = out.reshape(B, 2 * H, cout, 2, W)
    if cw_out:
        # parity interleave only: (…, co, [even|odd], W) -> (…, co, 2W)
        return jnp.transpose(out, (0, 1, 2, 4, 3)).reshape(
            B, 2 * H, cout, 2 * W)
    # (B, 2H, co, [even-x W | odd-x W]) -> (B, 2H, 2W, co)
    return jnp.transpose(out, (0, 1, 4, 3, 2)).reshape(B, 2 * H, 2 * W, cout)


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


def rowdeconv2d_interpret(x, kernel):
    """Interpreter-mode variant for CPU tests."""
    return _rowdeconv2d_fwd_impl(x, kernel, interpret=True)


def _conv_grad_kernel(kernel):
    return jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))


def _xla_deconv2d(x, kernel):
    return jax.lax.conv_transpose(
        x, kernel, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def _rowdeconv2d(x, kernel):
    return _rowdeconv2d_fwd_impl(x, kernel, interpret=_auto_interpret())


def _vjp_fwd(x, kernel):
    return _rowdeconv2d_fwd_impl(x, kernel, interpret=_auto_interpret()), \
        (x, kernel)


def _vjp_bwd(res, g):
    x, kernel = res
    g = g.astype(x.dtype)
    # dx = the SAME s2 forward conv whose adjoint this deconv is
    q = _conv_grad_kernel(kernel).astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(g.shape, q.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    dx = jax.lax.conv_general_dilated(g, q, (2, 2), "SAME",
                                      dimension_numbers=dn)
    _, wgrad = jax.vjp(lambda k: _xla_deconv2d(x, k), kernel)
    (dk,) = wgrad(g)
    return dx, dk


_rowdeconv2d.defvjp(_vjp_fwd, _vjp_bwd)


def rowdeconv2d(x, kernel):
    """SAME 3x3 stride-2 transposed conv, (B,H,W,Cin) @ (3,3,Cin,Cout).

    Drop-in for flax nn.ConvTranspose(k=3, s=2, padding='SAME').
    Differentiable (dx = XLA s2 conv with the flipped/transposed filter,
    dk = XLA's native transpose-conv grad).
    """
    return _rowdeconv2d(x, kernel)


def rowdeconv2d_fused(x, kernel, bias=None, relu: bool = False,
                      cw_in: bool = False, cw_out: bool = False):
    """Eval-only fused deconv + per-channel bias + ReLU (one Pallas pass).
    cw_in/cw_out: channel-second-minor (B, H, C, W) in/out."""
    return _rowdeconv2d_fwd_impl(x, kernel, bias, relu=relu,
                                 interpret=_auto_interpret(),
                                 cw_in=cw_in, cw_out=cw_out)
