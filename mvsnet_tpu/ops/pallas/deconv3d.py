"""3x3x3 stride-2 transposed conv (Pallas TPU): parity-split ring kernel.

Why: the RegNetUS0 regularizer's three s2 deconvs (reference topology:
cnn_wrapper/mvsnetworks.py:122-158, TF conv3d_transpose) lower through
XLA's conv-transpose path with the same small-channel MXU lane waste as
the forward convs (ops/pallas/conv3d.py) — Cin/Cout pad to 128 lanes per
tap while Cout is 8..32.

Semantics (measured against flax nn.ConvTranspose SAME k=3 s=2, the
layer the model zoo uses): out[2i + dz] += k[2 - dz] * x[i] per spatial
dim — the adjoint of the SAME s2 conv, with the kernel spatially
flipped. Per OUTPUT parity that means even rows/lanes take two taps and
odd rows/lanes take one, so the whole deconv decomposes into cheap
shift-adds of one wide tap matmul per SOURCE row:

  P[(dz, dy, dx, co), x] = sum_ci W[(dz, dy, dx, co), ci] * src[i, x, ci]

with the x-interleave deferred: the kernel writes each output slab as
[even-x plane | odd-x plane] on the lane axis ((co, 2W), lane = px*W+x)
and the XLA wrapper does the final (free, fused) interleave transpose.

z structure: source slab g contributes to output slabs 2g (dz=0),
2g+1 (dz=1), 2g+2 (dz=2). Cell g of a (D',) sequential grid therefore
finishes BOTH output slabs 2g and 2g+1 (slab 2g needs only the dz=2
carry staged by cell g-1), so there is no multi-slot accumulator at
all — one carry slab of VMEM, each output row written exactly once.
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


def _make_kernel(D: int, H: int, W: int, C: int, Cout: int,
                 has_bias: bool = False, relu: bool = False):
    def kernel(x_ref, w_ref, *rest):
        # x_ref: (1, H, C, W) source slab g, channel-second-minor;
        # w_ref: (27*Cout, C) — rows ordered ((dz*3+dy)*3+dx)*Cout + co,
        #   kernel pre-flipped spatially XLA-side;
        # b_ref (when has_bias): (Cout, 2W) f32 per-channel bias;
        # out_ref: (2, 2H, Cout, 2W) output slabs [2g, 2g+1], parity-split
        #   lanes (lane = px*W + x) — the wrapper interleaves back;
        # carry_ref: (2H, Cout, 2W) f32 — dz=2 contributions staged for
        #   output slab 2g+2, consumed by cell g+1.
        if has_bias:
            b_ref, out_ref, carry_ref = rest
        else:
            (out_ref, carry_ref), b_ref = rest, None
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            carry_ref[...] = jnp.zeros_like(carry_ref)

        w = w_ref[...]

        def blk(P, dz, dy, dx):
            i = ((dz * 3 + dy) * 3 + dx) * Cout
            return P[i:i + Cout]                       # (Cout, W) f32

        def combine_dx(c0, c1, c2):
            # even-x plane: out[2x] = c0[x] + c2[x-1]; odd-x: out[2x+1]
            # = c1[x]. Returns (Cout, 2W) = [even | odd] on lanes.
            c2s = jnp.concatenate(
                [jnp.zeros((Cout, 1), jnp.float32), c2[:, :W - 1]], axis=1)
            return jnp.concatenate([c0 + c2s, c1], axis=1)

        def emit(v):
            if b_ref is not None:
                v = v + b_ref[...]
            if relu:
                v = jnp.maximum(v, 0.0)
            return v.astype(out_ref.dtype)

        def tap_matmul(j):
            x = x_ref[0, pl.ds(j, 1)].reshape(C, W)
            return jax.lax.dot_general(
                w, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (27*Cout, W)

        # UN source rows per fori iteration (manual unroll — Mosaic's
        # per-iteration loop machinery costs ~210 ns, r3b_rowprobe.log)
        UN = _unroll_for(H)

        def row(i, p_prev):
            for r in range(UN):
                j = i * UN + r
                # output rows 2j (dy=0 of src j + dy=2 of src j-1) and
                # 2j+1 (dy=1 of src j), for each target slab dz.
                p_cur = tap_matmul(j)
                for dz in range(3):
                    r_even = combine_dx(*(blk(p_cur, dz, 0, dx)
                                          + blk(p_prev, dz, 2, dx)
                                          for dx in range(3)))
                    r_odd = combine_dx(*(blk(p_cur, dz, 1, dx)
                                         for dx in range(3)))
                    if dz == 0:
                        # slab 2g: read the dz=2 carry staged by cell g-1
                        out_ref[0, pl.ds(2 * j, 1)] = emit(
                            r_even + carry_ref[pl.ds(2 * j, 1)].reshape(
                                Cout, 2 * W))[None]
                        out_ref[0, pl.ds(2 * j + 1, 1)] = emit(
                            r_odd + carry_ref[pl.ds(2 * j + 1, 1)].reshape(
                                Cout, 2 * W))[None]
                    elif dz == 1:
                        out_ref[1, pl.ds(2 * j, 1)] = emit(r_even)[None]
                        out_ref[1, pl.ds(2 * j + 1, 1)] = emit(r_odd)[None]
                    else:
                        # stage dz=2 for slab 2g+2 (read back at dz=0
                        # above — same rows were read earlier this
                        # iteration)
                        carry_ref[pl.ds(2 * j, 1)] = r_even[None]
                        carry_ref[pl.ds(2 * j + 1, 1)] = r_odd[None]
                p_prev = p_cur
            return p_prev

        jax.lax.fori_loop(0, H // UN, row,
                          jnp.zeros((27 * Cout, W), jnp.float32))

    return kernel


def rowdeconv3d_supported(D: int, H: int, W: int, C: int, Cout: int,
                          dtype=jnp.bfloat16) -> bool:
    """VMEM model (tile-padded): input slab channel-second-minor (W pads
    to 128 lanes), output/carry slabs (co, 2W) parity-split lanes."""
    item = jnp.dtype(dtype).itemsize
    wpad = -(-W // 128) * 128
    w2pad = -(-(2 * W) // 128) * 128
    cpad = -(-C // 8) * 8
    copad = -(-Cout // 8) * 8
    slab_in = 2 * H * cpad * wpad * item            # double-buffered
    out = 2 * 2 * (2 * H) * copad * w2pad * item    # 2 slabs, dbl-buffered
    carry = (2 * H) * copad * w2pad * 4
    total = slab_in + out + carry
    return (D >= 1 and W % 8 == 0 and C <= 64 and Cout <= 32
            and Cout % 8 == 0
            and total < _VMEM_LIMIT - 8 * 2 ** 20)


def _weights_wide(kernel):
    """(3,3,3,Cin,Cout) nn.ConvTranspose layout -> (27*Cout, Cin), rows
    ordered (dz,dy,dx,co), kernel spatially flipped (see module doc)."""
    kf = kernel[::-1, ::-1, ::-1]
    kd, kh, kw, cin, cout = kf.shape
    return jnp.transpose(kf, (0, 1, 2, 4, 3)).reshape(kd * kh * kw * cout,
                                                      cin)


@functools.partial(jax.jit, static_argnames=("relu", "interpret",
                                             "cw_in", "cw_out"))
def _rowdeconv3d_fwd_impl(x, kernel, bias=None, relu: bool = False,
                          interpret: bool = False, cw_in: bool = False,
                          cw_out: bool = False):
    # cw_in/cw_out: channel-second-minor (B, D, H, C, W) in/out (see
    # conv3d._rowconv3d_fwd_impl) — the CW output still pays the small
    # parity interleave, but keeps channels off the minor dim.
    if cw_in:
        B, D, H, C, W = x.shape
        xin = x
    else:
        B, D, H, W, C = x.shape
        xin = jnp.transpose(x, (0, 1, 2, 4, 3))      # (B, D, H, C, W)
    cout = kernel.shape[-1]
    wr = _weights_wide(kernel).astype(x.dtype)
    has_bias = bias is not None
    out_shape = (2 * D, 2 * H, cout, 2 * W)          # parity-split lanes
    in_specs = [
        pl.BlockSpec((1, H, C, W), lambda g: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wr.shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [wr]
    if has_bias:
        b2d = jnp.broadcast_to(bias.astype(jnp.float32)[:, None],
                               (cout, 2 * W))
        in_specs.append(pl.BlockSpec(b2d.shape, lambda g: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(b2d)
    kern = _make_kernel(D, H, W, C, cout, has_bias, relu)

    def one(xb):
        return pl.pallas_call(
            kern,
            grid=(D,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((2, 2 * H, cout, 2 * W),
                                   lambda g: (g, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
            scratch_shapes=[pltpu.VMEM((2 * H, cout, 2 * W), jnp.float32)],
            interpret=interpret,
            compiler_params=_ARBITRARY1,
            cost_estimate=pl.CostEstimate(
                flops=2 * D * H * W * 27 * C * cout,
                bytes_accessed=(D * H * W * C * x.dtype.itemsize
                                + 8 * D * H * W * cout * x.dtype.itemsize),
                transcendentals=0,
            ),
        )(xb, *operands)

    out = jnp.stack([one(xin[b]) for b in range(B)], axis=0)
    out = out.reshape(B, 2 * D, 2 * H, cout, 2, W)
    if cw_out:
        # parity interleave only: (…, co, [even|odd], W) -> (…, co, 2W)
        return jnp.transpose(out, (0, 1, 2, 3, 5, 4)).reshape(
            B, 2 * D, 2 * H, cout, 2 * W)
    # (B, 2D, 2H, co, [even-x W | odd-x W]) -> (B, 2D, 2H, 2W, co)
    return jnp.transpose(out, (0, 1, 2, 5, 4, 3)).reshape(
        B, 2 * D, 2 * H, 2 * W, cout)


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


def rowdeconv3d_interpret(x, kernel):
    """Interpreter-mode variant for CPU tests."""
    return _rowdeconv3d_fwd_impl(x, kernel, interpret=True)


def _conv_grad_kernel(kernel):
    # d(deconv)/dx is the SAME s2 forward conv whose adjoint the deconv
    # is: kernel q[dz,dy,dx, co_g, ci] = k[2-dz, 2-dy, 2-dx, ci, co_g]
    return jnp.transpose(kernel[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))


def _xla_deconv3d(x, kernel):
    return jax.lax.conv_transpose(
        x, kernel, (2, 2, 2), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _swap_cw(x):
    return jnp.swapaxes(x, -1, -2)


@functools.lru_cache(maxsize=None)
def _make_rowdeconv3d(cw_in: bool, cw_out: bool):
    """Differentiable deconv for a fixed (cw_in, cw_out) layout contract
    (see conv3d._make_rowconv3d_s1): dx runs the stride-2 Pallas forward
    conv with the flipped filter in the transposed contract; dk uses
    XLA's transpose-conv grad on NDHWC views."""

    @jax.custom_vjp
    def f(x, kernel):
        return _rowdeconv3d_fwd_impl(x, kernel, interpret=_auto_interpret(),
                                     cw_in=cw_in, cw_out=cw_out)

    def fwd(x, kernel):
        return f(x, kernel), (x, kernel)

    def bwd(res, g):
        from mvsnet_tpu.ops.pallas.conv3d import (  # noqa: PLC0415
            _rowconv3d_fwd_impl, rowconv3d_supported)
        x, kernel = res
        g = g.astype(x.dtype)
        q = _conv_grad_kernel(kernel).astype(x.dtype)
        if cw_out:
            gD, gH, gW = g.shape[1], g.shape[2], g.shape[4]
        else:
            gD, gH, gW = g.shape[1], g.shape[2], g.shape[3]
        if rowconv3d_supported(gD, gH, gW, q.shape[3], q.shape[4], g.dtype) \
                and gD % 2 == 0 and gH % 2 == 0 and gW % 2 == 0:
            dx = _rowconv3d_fwd_impl(g, q, stride=2,
                                     interpret=_auto_interpret(),
                                     cw_in=cw_out, cw_out=cw_in)
        else:
            g_n = _swap_cw(g) if cw_out else g
            dn = jax.lax.conv_dimension_numbers(g_n.shape, q.shape,
                                                ("NDHWC", "DHWIO", "NDHWC"))
            dx = jax.lax.conv_general_dilated(g_n, q, (2, 2, 2), "SAME",
                                              dimension_numbers=dn)
            if cw_in:
                dx = _swap_cw(dx)
        x_n = _swap_cw(x) if cw_in else x
        g_n = _swap_cw(g) if cw_out else g
        from mvsnet_tpu.ops.pallas.conv3d import (  # noqa: PLC0415
            _PWGRAD_S2, _XWGRAD, _pallas_wgrad_s2, _wgrad_matmul_s2,
            rowconv3d_dks2_supported)
        if _PWGRAD_S2 and rowconv3d_dks2_supported(
                gD, gH, gW, kernel.shape[4], kernel.shape[3], g.dtype):
            # <deconv(x,k), g> = <x, conv_s2(g, q(k))> (q = flip+swap,
            # involutive): dk is the q-image of the Pallas s2 wgrad with
            # the roles reversed — "source" = full-res cotangent g,
            # "cotangent" = half-res input x.
            gx_cw = g if cw_out else _swap_cw(g)
            xi_cw = x if cw_in else _swap_cw(x)
            dq = _pallas_wgrad_s2(gx_cw, xi_cw,
                                  interpret=_auto_interpret())
            dk = jnp.transpose(dq[::-1, ::-1, ::-1],
                               (0, 1, 2, 4, 3)).astype(kernel.dtype)
        elif _XWGRAD:
            # <deconv(x,k), g> = <x, conv_s2(g, q(k))> with the involutive
            # q = flip+swap (see _conv_grad_kernel), so dk is the q-image
            # of the s2 conv's wgrad with the roles reversed.
            dq = _wgrad_matmul_s2(g_n, x_n, (3, 3, 3, kernel.shape[4],
                                             kernel.shape[3]))
            dk = jnp.transpose(dq[::-1, ::-1, ::-1],
                               (0, 1, 2, 4, 3)).astype(kernel.dtype)
        else:
            _, wgrad = jax.vjp(lambda k: _xla_deconv3d(x_n, k), kernel)
            (dk,) = wgrad(g_n)
        return dx, dk

    f.defvjp(fwd, bwd)
    return f


def rowdeconv3d(x, kernel, cw_in: bool = False, cw_out: bool = False):
    """SAME 3x3x3 stride-2 transposed conv, (B,D,H,W,Cin) @ (3,3,3,Cin,Cout).

    Drop-in for flax nn.ConvTranspose(k=3, s=2, padding='SAME') /
    lax.conv_transpose. Differentiable: dx runs the existing stride-2
    Pallas forward conv (ops/pallas/conv3d.py) with the flipped/transposed
    filter; dk uses XLA's native transpose-conv grad. cw_in/cw_out:
    channel-second-minor layout contract, honored by the gradients.
    """
    return _make_rowdeconv3d(cw_in, cw_out)(x, kernel)


def rowdeconv3d_fused(x, kernel, bias=None, relu: bool = False,
                      cw_in: bool = False, cw_out: bool = False):
    """Eval-only fused deconv + per-channel bias + ReLU in one Pallas pass.

    Like conv3d.rowconv3d_fused: a folded eval-mode batch norm rides the
    output-row writes for zero extra HBM traffic. NOT differentiable —
    training uses `rowdeconv3d` + the unfused norm (reference semantics:
    network.py:300-348 deconv -> BN -> ReLU). cw_in/cw_out take/return the
    channel-second-minor (B, D, H, C, W) layout.
    """
    return _rowdeconv3d_fwd_impl(x, kernel, bias, relu=relu,
                                 interpret=_auto_interpret(),
                                 cw_in=cw_in, cw_out=cw_out)
