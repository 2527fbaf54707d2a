"""Layer primitives with reference-matching numerics.

Re-implements the semantics of the reference layer DSL
(reference: cnn_wrapper/network.py) as Flax modules:

  * ConvGN / DeconvGN — conv (2D, no bias) + channel-wise group norm with
    groups = max(1, C // group_channel), eps 1e-5, per-channel gamma/beta,
    then ReLU (network.py:217-276, 350-409).
  * ConvBN / DeconvBN — conv (2D or 3D by rank, no bias) + batch norm with
    running stats (momentum 0.99, eps 1e-5), then ReLU (network.py:278-298,
    331-348, 492-509).
  * Conv / Deconv — plain conv, rank-dispatched, optional bias/ReLU
    (network.py:171-215, 300-329).
  * flexible group_norm with the ConvGRU fallbacks: G==1 -> layer norm,
    G>=C -> instance norm (convgru.py:9-52).

All convs run in the configured compute dtype (bf16 on TPU for MXU
throughput) with f32 parameters and f32 normalization statistics.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvsnet_tpu.ops.conv_lowering import (
    conv3d_wide_n,
    deconv3d_wide_n,
    wide_n_applicable,
)

Dtype = Union[str, jnp.dtype]


def _pair(k, n):
    if isinstance(k, (tuple, list)):
        return tuple(k)
    return (k,) * n


def _swap_cw(x):
    """N…WC <-> channel-second-minor N…CW: swap the two minor axes (an
    involution, any rank)."""
    return jnp.swapaxes(x, -1, -2)


def _force_pallas() -> bool:
    """Test knob: route the Pallas conv dispatches regardless of backend /
    mesh / work-size (kernels auto-run in interpret mode off-TPU), so CPU
    tests can exercise the exact dispatch path the chip runs."""
    import os  # noqa: PLC0415
    return bool(os.environ.get("MVSNET_TPU_FORCE_PALLAS_CONV"))


def cw_pipeline_enabled() -> bool:
    """Whether eval graphs should chain Pallas 3D convs in their native
    channel-second-minor (B, D, H, C, W) layout (models/regnet.py), paying
    zero NDHWC relayouts between layers. MVSNET_TPU_CW=0 disables; =1
    forces (CPU interpret tests); default: single-device TPU."""
    import os  # noqa: PLC0415
    env = os.environ.get("MVSNET_TPU_CW")
    if env == "0":
        return False
    if env == "1":
        return True
    if jax.default_backend() != "tpu":
        return False
    from mvsnet_tpu.parallel import mesh as mesh_lib  # noqa: PLC0415
    mesh = mesh_lib.active_mesh()
    return mesh is None or mesh.devices.size == 1


def cw_train_enabled() -> bool:
    """Whether TRAINING graphs chain the 3D regularizer in CW layout too
    (models/regnet.py): the conv custom-VJPs honor the layout contract
    through the backward pass (ops/pallas/conv3d.py). MVSNET_TPU_CW_TRAIN
    overrides (=0/=1); default follows cw_pipeline_enabled()."""
    import os  # noqa: PLC0415
    env = os.environ.get("MVSNET_TPU_CW_TRAIN")
    if env == "0":
        return False
    if env == "1":
        return True
    return cw_pipeline_enabled()


def _fold_affine(kernel, bias, post_scale, post_shift):
    """Fold a per-channel eval affine (a batch norm's scale/shift) into the
    conv kernel + a combined shift, for the fused Pallas epilogues."""
    k = kernel
    shift = bias
    if post_scale is not None:
        k = kernel * post_scale
        if shift is not None:
            shift = shift * post_scale
    if post_shift is not None:
        shift = post_shift if shift is None else shift + post_shift
    return k, shift


def _post_affine(y, post_scale, post_shift, post_relu):
    """Unfused epilogue for the non-Pallas branches: per-channel affine +
    ReLU in f32 (XLA fuses it), matching BatchNormRef numerics."""
    if post_scale is None and post_shift is None and not post_relu:
        return y
    y32 = y.astype(jnp.float32)
    if post_scale is not None:
        y32 = y32 * post_scale
    if post_shift is not None:
        y32 = y32 + post_shift
    if post_relu:
        y32 = jnp.maximum(y32, 0.0)
    return y32.astype(y.dtype)


# Work-size gate (spatial * filters) for the Pallas conv dispatches: tiny
# layers (smoke shapes, the driver's 64x64 entry() compile check) stay on
# XLA — each Pallas kernel costs ~90 s of remote compile through the tunnel
# and wins nothing at toy sizes. Every real operating-point layer clears
# this by >10x (smallest: RegNet eighth-res 24x27x36x32 = 746k; the 64x64
# smoke shapes top out at ~33k).
_WORTH_MIN = 65536


def _pallas_conv3d_available(x, filters, kernel, stride, dilation,
                             cw: bool = False) -> bool:
    """Route 3x3x3 s1 3D convs through ops/pallas/conv3d.rowconv3d on TPU.

    Skipped under a >1-device mesh (a naked pallas_call there would force
    full replication through GSPMD — same rule as the cost-volume kernel).
    Set MVSNET_TPU_NO_PALLAS_CONV=1 to force the XLA lowering.
    `cw`: x is channel-second-minor (B, D, H, C, W)."""
    import os  # noqa: PLC0415

    if os.environ.get("MVSNET_TPU_NO_PALLAS_CONV"):
        return False
    force = _force_pallas()
    ndim = x.ndim - 2
    if not (ndim == 3
            and tuple(_pair(kernel, ndim)) == (3, 3, 3)
            and tuple(_pair(stride, ndim)) in ((1, 1, 1), (2, 2, 2))
            and tuple(_pair(dilation, ndim)) == (1, 1, 1)
            and (force or jax.default_backend() == "tpu")):
        return False
    from mvsnet_tpu.ops.pallas.conv3d import rowconv3d_supported  # noqa: PLC0415
    from mvsnet_tpu.parallel import mesh as mesh_lib  # noqa: PLC0415

    mesh = mesh_lib.active_mesh()
    if not force and mesh is not None and mesh.devices.size > 1:
        return False
    if cw:
        B, D, H, C, W = x.shape
    else:
        B, D, H, W, C = x.shape
    if not force and D * H * W * filters < _WORTH_MIN:
        return False
    s = _pair(stride, ndim)[0]
    if s == 2 and not (D % 2 == 0 and H % 2 == 0 and W % 2 == 0):
        return False
    return rowconv3d_supported(D, H, W, C, filters, x.dtype)


def _pallas_deconv3d_available(x, filters, kernel, stride,
                               cw: bool = False) -> bool:
    """Route 3x3x3 s2 3D transposed convs through
    ops/pallas/deconv3d.rowdeconv3d on TPU (same gating rules as the
    forward-conv dispatch). `cw`: x is channel-second-minor."""
    import os  # noqa: PLC0415

    if os.environ.get("MVSNET_TPU_NO_PALLAS_CONV"):
        return False
    force = _force_pallas()
    ndim = x.ndim - 2
    if not (ndim == 3
            and tuple(_pair(kernel, ndim)) == (3, 3, 3)
            and tuple(_pair(stride, ndim)) == (2, 2, 2)
            and (force or jax.default_backend() == "tpu")):
        return False
    from mvsnet_tpu.ops.pallas.deconv3d import (  # noqa: PLC0415
        rowdeconv3d_supported)
    from mvsnet_tpu.parallel import mesh as mesh_lib  # noqa: PLC0415

    mesh = mesh_lib.active_mesh()
    if not force and mesh is not None and mesh.devices.size > 1:
        return False
    if cw:
        B, D, H, C, W = x.shape
    else:
        B, D, H, W, C = x.shape
    if not force and D * H * W * filters < _WORTH_MIN:
        return False
    return rowdeconv3d_supported(D, H, W, C, filters, x.dtype)


def _pallas_deconv2d_available(x, filters, kernel, stride,
                               cw: bool = False) -> bool:
    """Route 3x3 s2 2D transposed convs through
    ops/pallas/deconv2d.rowdeconv2d on TPU (same gating rules).
    `cw`: x is (B, H, C, W)."""
    import os  # noqa: PLC0415

    if os.environ.get("MVSNET_TPU_NO_PALLAS_CONV"):
        return False
    force = _force_pallas()
    ndim = x.ndim - 2
    if not (ndim == 2
            and tuple(_pair(kernel, ndim)) == (3, 3)
            and tuple(_pair(stride, ndim)) == (2, 2)
            and (force or jax.default_backend() == "tpu")):
        return False
    from mvsnet_tpu.ops.pallas.deconv2d import (  # noqa: PLC0415
        rowdeconv2d_supported)
    from mvsnet_tpu.parallel import mesh as mesh_lib  # noqa: PLC0415

    mesh = mesh_lib.active_mesh()
    if not force and mesh is not None and mesh.devices.size > 1:
        return False
    if cw:
        B, H, C, W = x.shape
    else:
        B, H, W, C = x.shape
    if not force and H * W * filters < _WORTH_MIN:
        return False
    return rowdeconv2d_supported(H, W, C, filters, x.dtype)


def _pallas_conv2d_available(x, filters, kernel, stride, dilation,
                             cw: bool = False) -> bool:
    """Route 3x3 s1/s2 2D convs through ops/pallas/conv2d on TPU
    (same gating rules as the 3D dispatch). `cw`: x is (B, H, C, W)."""
    import os  # noqa: PLC0415

    if os.environ.get("MVSNET_TPU_NO_PALLAS_CONV"):
        return False
    force = _force_pallas()
    ndim = x.ndim - 2
    k = tuple(_pair(kernel, ndim))
    s = tuple(_pair(stride, ndim))
    ok = (k == (3, 3) and s in ((1, 1), (2, 2))) or (k == (5, 5)
                                                     and s == (2, 2))
    if not (ndim == 2 and ok
            and tuple(_pair(dilation, ndim)) == (1, 1)
            and (force or jax.default_backend() == "tpu")):
        return False
    from mvsnet_tpu.ops.pallas.conv2d import (  # noqa: PLC0415
        rowconv2d_s2_supported,
        rowconv2d_supported,
    )
    from mvsnet_tpu.parallel import mesh as mesh_lib  # noqa: PLC0415

    mesh = mesh_lib.active_mesh()
    if not force and mesh is not None and mesh.devices.size > 1:
        return False
    if cw:
        B, H, C, W = x.shape
    else:
        B, H, W, C = x.shape
    if not force and H * W * filters < _WORTH_MIN:
        return False
    if s[0] == 2:
        return rowconv2d_s2_supported(H, W, C, filters, x.dtype, K=k[0])
    return rowconv2d_supported(H, W, C, filters, x.dtype)


class _PallasConv2D(nn.Module):
    """3x3 s1/s2 and 5x5 s2 convs via the per-row wide-N Pallas kernels;
    param layout matches nn.Conv so checkpoints are interchangeable."""

    features: int
    stride: int = 1
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, post_scale=None, post_shift=None,
                 post_relu: bool = False, cw_in: bool = False,
                 cw_out: bool = False):
        from mvsnet_tpu.ops.pallas.conv2d import (  # noqa: PLC0415
            rowconv2d,
            rowconv2d_bias,
            rowconv2d_fused,
            rowconv2d_s2,
            rowconv2d_s2_bias,
            rowconv2d_s2_fused,
        )

        if self.stride == 2:
            conv_fn, bias_fn, fused_fn = (rowconv2d_s2, rowconv2d_s2_bias,
                                          rowconv2d_s2_fused)
        else:
            conv_fn, bias_fn, fused_fn = (rowconv2d, rowconv2d_bias,
                                          rowconv2d_fused)

        cin = x.shape[-2] if cw_in else x.shape[-1]
        ks = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (ks, ks, cin, self.features), jnp.float32)
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
        fold = (post_scale is not None or post_shift is not None
                or post_relu)
        if not fold and not (cw_in or cw_out):
            k = kernel
            if self.dtype is not None:
                x = x.astype(self.dtype)
                k = kernel.astype(self.dtype)
            if bias is not None:
                # differentiable fused-bias epilogue (zero extra passes)
                return bias_fn(x, k, bias)
            return conv_fn(x, k)
        # eval-only fused path (folded batch norm / the CW layout chain),
        # mirrors _PallasConv3D
        k, shift = _fold_affine(kernel, bias, post_scale, post_shift)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return fused_fn(x, k.astype(x.dtype), bias=shift,
                        relu=post_relu, cw_in=cw_in, cw_out=cw_out)


def _im2col_conv2d_available(x, filters, kernel, stride, dilation) -> bool:
    """Tiny-Cin 2D convs via im2col — REJECTED by measurement, opt-in
    only. Theory said the s2 3->16 image stem (4.6 ms, 0.1 TF/s: XLA pads
    Cin to 128 lanes per tap) should drop to ~0.5 ms by paying the pad
    once on K = k*k*Cin; on-chip the strided patch build dominates
    instead (22.5 ms, 5x WORSE - nine strided copies through the same
    3->128 padded layout). Kept for the record + the exact-SAME-pad
    lowering; enable with MVSNET_TPU_IM2COL=1."""
    import os  # noqa: PLC0415

    if not os.environ.get("MVSNET_TPU_IM2COL"):
        return False
    if os.environ.get("MVSNET_TPU_NO_PALLAS_CONV"):
        return False
    ndim = x.ndim - 2
    if not (ndim == 2
            and tuple(_pair(dilation, ndim)) == (1, 1)
            and jax.default_backend() == "tpu"):
        return False
    kh, kw = _pair(kernel, ndim)
    return kh * kw * x.shape[-1] <= 48


def _im2col_conv2d(x, kernel, stride):
    """SAME conv as shifted-copy patches + ONE matmul (TF pad semantics)."""
    kh, kw, cin, cout = kernel.shape
    B, H, W, _ = x.shape
    sh, sw = stride
    oh, ow = -(-H // sh), -(-W // sw)
    ph = max((oh - 1) * sh + kh - H, 0)
    pw = max((ow - 1) * sw + kw - W, 0)
    xp = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                     (pw // 2, pw - pw // 2), (0, 0)))
    cols = [xp[:, dy:dy + (oh - 1) * sh + 1:sh,
               dx:dx + (ow - 1) * sw + 1:sw, :]
            for dy in range(kh) for dx in range(kw)]
    patches = jnp.concatenate(cols, axis=-1)         # (B, oh, ow, k*k*cin)
    return jax.lax.dot_general(
        patches, kernel.reshape(kh * kw * cin, cout),
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


class _Im2ColConv2D(nn.Module):
    """im2col lowering; param layout matches nn.Conv."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kh, kw = _pair(self.kernel, 2)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features), jnp.float32)
        k = kernel
        if self.dtype is not None:
            x = x.astype(self.dtype)
            k = kernel.astype(self.dtype)
        y = _im2col_conv2d(x, k, _pair(self.stride, 2))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class _PallasConv3D(nn.Module):
    """3x3x3 s1/s2 conv via the per-slab wide-N Pallas kernel.

    Param layout matches nn.Conv (kernel (3,3,3,Cin,Cout) f32 lecun-normal,
    optional zeros bias) so checkpoints are interchangeable."""

    features: int
    stride: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, post_scale=None, post_shift=None,
                 post_relu: bool = False, cw_in: bool = False,
                 cw_out: bool = False):
        from mvsnet_tpu.ops.pallas.conv3d import (  # noqa: PLC0415
            rowconv3d, rowconv3d_fused)

        cin = x.shape[-2] if cw_in else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, cin, self.features), jnp.float32)
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
        fold = (post_scale is not None or post_shift is not None
                or post_relu)
        if not fold:
            # differentiable path (training) — the custom-VJP conv honors
            # the CW layout contract through the backward pass
            k = kernel
            if self.dtype is not None:
                x = x.astype(self.dtype)
                k = kernel.astype(self.dtype)
            y = rowconv3d(x, k, self.stride, cw_in=cw_in, cw_out=cw_out)
            if bias is not None:
                b = bias.astype(y.dtype)
                y = y + (b[:, None] if cw_out else b)
            return y
        # eval-only fused path: fold the per-channel scale into the f32
        # kernel, combine shifts, and ride bias+ReLU on the Pallas
        # epilogue (zero extra HBM passes). Not differentiable.
        k, shift = _fold_affine(kernel, bias, post_scale, post_shift)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return rowconv3d_fused(x, k.astype(x.dtype), bias=shift,
                               relu=post_relu, stride=self.stride,
                               cw_in=cw_in, cw_out=cw_out)


class _WideConv3D(nn.Module):
    """3x3x3 conv via the wide-N MXU lowering (ops/conv_lowering.py).

    Parameter layout matches nn.Conv exactly (kernel (3,3,3,Cin,Cout) f32,
    lecun-normal init; optional zeros bias), so checkpoints are
    interchangeable with the direct lowering.
    """

    features: int
    stride: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, cin, self.features), jnp.float32)
        k = kernel
        if self.dtype is not None:
            x = x.astype(self.dtype)
            k = kernel.astype(self.dtype)
        y = conv3d_wide_n(x, k, self.stride)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class Conv(nn.Module):
    """2D/3D conv dispatched by input rank (reference: network.py:203-215).

    `wide_lowering=True` opts into the XLA wide-N re-association
    (ops/conv_lowering.py) — same math, same param tree. Measured SLOWER
    than the direct conv on v5e (the 1x1x3 conv it builds lowers through
    the same bad path), so it stays off by default; the fast path for the
    regularizer's 3x3x3 convs is the Pallas kernel (ops/pallas/conv3d.py),
    dispatched by RegNetUS0 itself."""

    filters: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    use_bias: bool = True
    dilation: int = 1
    dtype: Optional[Dtype] = None
    wide_lowering: Optional[bool] = None

    @nn.compact
    def __call__(self, x, post_scale=None, post_shift=None,
                 post_relu: bool = False, cw_in: bool = False,
                 cw_out: bool = False):
        # post_scale/post_shift/post_relu: eval-only per-channel affine +
        # ReLU applied AFTER the conv (a folded batch norm). The Pallas 3D
        # branch fuses them into the kernel epilogue; other branches apply
        # them as (XLA-fused) elementwise ops in f32, matching the unfused
        # BatchNormRef numerics.
        # cw_in/cw_out: the input/output is channel-second-minor
        # (B, D, H, C, W) — the Pallas 3D kernels' native layout. The
        # contract is layout-only: branches that can't run CW natively
        # transpose at their own edges, so numerics never depend on it.
        ndim = x.ndim - 2  # spatial dims
        use_wide = self.wide_lowering is True
        post_done = False
        cw_native = False
        if (not use_wide
                and _pallas_conv3d_available(x, self.filters, self.kernel,
                                             self.stride, self.dilation,
                                             cw=cw_in)):
            # name='Conv_0' keeps the param path identical to the nn.Conv
            # branch (its auto-assigned name).
            y = _PallasConv3D(self.filters, stride=_pair(self.stride, ndim)[0],
                              use_bias=self.use_bias, dtype=self.dtype,
                              name="Conv_0")(x, post_scale, post_shift,
                                             post_relu, cw_in=cw_in,
                                             cw_out=cw_out)
            post_done = True
            cw_native = True
        elif (not use_wide
              and _pallas_conv2d_available(x, self.filters, self.kernel,
                                           self.stride, self.dilation,
                                           cw=cw_in)):
            y = _PallasConv2D(self.filters,
                              stride=_pair(self.stride, ndim)[0],
                              kernel_size=_pair(self.kernel, ndim)[0],
                              use_bias=self.use_bias, dtype=self.dtype,
                              name="Conv_0")(x, post_scale, post_shift,
                                             post_relu, cw_in=cw_in,
                                             cw_out=cw_out)
            post_done = True
            cw_native = True
        else:
            if cw_in:
                x = _swap_cw(x)
            if (not use_wide
                  and _im2col_conv2d_available(x, self.filters, self.kernel,
                                               self.stride, self.dilation)):
                y = _Im2ColConv2D(self.filters, kernel=self.kernel,
                                  stride=_pair(self.stride, ndim)[0],
                                  use_bias=self.use_bias, dtype=self.dtype,
                                  name="Conv_0")(x)
            elif use_wide and wide_n_applicable(ndim, self.kernel,
                                                self.stride, self.dilation,
                                                self.filters):
                y = _WideConv3D(self.filters,
                                stride=_pair(self.stride, ndim)[0],
                                use_bias=self.use_bias, dtype=self.dtype,
                                name="Conv_0")(x)
            else:
                y = nn.Conv(
                    features=self.filters,
                    kernel_size=_pair(self.kernel, ndim),
                    strides=_pair(self.stride, ndim),
                    kernel_dilation=_pair(self.dilation, ndim),
                    padding="SAME",
                    use_bias=self.use_bias,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name="Conv_0",
                )(x)
        if not post_done and (post_scale is not None or post_shift is not None
                              or post_relu):
            y = _post_affine(y, post_scale, post_shift, post_relu)
        if self.relu:
            y = nn.relu(y)
        if cw_out and not cw_native:
            y = _swap_cw(y)
        return y


class _PallasDeconv2D(nn.Module):
    """3x3 s2 transposed conv via the parity-split 2D Pallas kernel
    (ops/pallas/deconv2d.py). Param layout matches nn.ConvTranspose."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, post_scale=None, post_shift=None,
                 post_relu: bool = False, cw_in: bool = False,
                 cw_out: bool = False):
        from mvsnet_tpu.ops.pallas.deconv2d import (  # noqa: PLC0415
            rowdeconv2d, rowdeconv2d_fused)

        cin = x.shape[-2] if cw_in else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
        fold = (post_scale is not None or post_shift is not None
                or post_relu)
        if not fold and not (cw_in or cw_out):
            k = kernel
            if self.dtype is not None:
                x = x.astype(self.dtype)
                k = kernel.astype(self.dtype)
            y = rowdeconv2d(x, k)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
        k, shift = _fold_affine(kernel, bias, post_scale, post_shift)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return rowdeconv2d_fused(x, k.astype(x.dtype), bias=shift,
                                 relu=post_relu, cw_in=cw_in, cw_out=cw_out)


class _PallasDeconv3D(nn.Module):
    """3x3x3 s2 transposed conv via the parity-split Pallas ring kernel
    (ops/pallas/deconv3d.py). Param layout matches nn.ConvTranspose
    (kernel (3,3,3,Cin,Cout) f32 lecun-normal, optional zeros bias) so
    checkpoints are interchangeable."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, post_scale=None, post_shift=None,
                 post_relu: bool = False, cw_in: bool = False,
                 cw_out: bool = False):
        from mvsnet_tpu.ops.pallas.deconv3d import (  # noqa: PLC0415
            rowdeconv3d, rowdeconv3d_fused)

        cin = x.shape[-2] if cw_in else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, cin, self.features), jnp.float32)
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
        fold = (post_scale is not None or post_shift is not None
                or post_relu)
        if not fold:
            # differentiable path (training), CW contract honored (see
            # _PallasConv3D)
            k = kernel
            if self.dtype is not None:
                x = x.astype(self.dtype)
                k = kernel.astype(self.dtype)
            y = rowdeconv3d(x, k, cw_in=cw_in, cw_out=cw_out)
            if bias is not None:
                b = bias.astype(y.dtype)
                y = y + (b[:, None] if cw_out else b)
            return y
        # eval-only fused path (folded batch norm), mirrors _PallasConv3D
        k, shift = _fold_affine(kernel, bias, post_scale, post_shift)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return rowdeconv3d_fused(x, k.astype(x.dtype), bias=shift,
                                 relu=post_relu, cw_in=cw_in, cw_out=cw_out)


class _WideDeconv3D(nn.Module):
    """3x3x3 s2 transposed conv via the wide-N polyphase lowering
    (ops/conv_lowering.py). Param layout matches nn.ConvTranspose."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, cin, self.features), jnp.float32)
        k = kernel
        if self.dtype is not None:
            x = x.astype(self.dtype)
            k = kernel.astype(self.dtype)
        y = deconv3d_wide_n(x, k)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class Deconv(nn.Module):
    """2D/3D transposed conv, SAME padding: out = in * stride
    (reference: network.py:300-329).

    `wide_lowering=True` opts into the wide-N polyphase lowering (same
    math, same param tree; off by default for the same reason as Conv)."""

    filters: int
    kernel: int = 3
    stride: int = 2
    relu: bool = True
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    wide_lowering: Optional[bool] = None

    @nn.compact
    def __call__(self, x, post_scale=None, post_shift=None,
                 post_relu: bool = False, cw_in: bool = False,
                 cw_out: bool = False):
        # post_*: eval-only folded batch norm, same semantics as Conv's.
        # The Pallas deconv branch fuses them into the kernel's output-row
        # writes; other branches lower them as XLA elementwise ops — there
        # the win is the output staying in the conv dtype (bf16) instead
        # of BatchNormRef's f32.
        # cw_in/cw_out: channel-second-minor layout contract (see Conv).
        ndim = x.ndim - 2
        use_wide = self.wide_lowering is True
        post_done = False
        cw_native = False
        if (not use_wide
                and _pallas_deconv3d_available(x, self.filters, self.kernel,
                                               self.stride, cw=cw_in)):
            y = _PallasDeconv3D(self.filters, use_bias=self.use_bias,
                                dtype=self.dtype,
                                name="ConvTranspose_0")(x, post_scale,
                                                        post_shift, post_relu,
                                                        cw_in=cw_in,
                                                        cw_out=cw_out)
            post_done = True
            cw_native = True
        elif (not use_wide
              and _pallas_deconv2d_available(x, self.filters, self.kernel,
                                             self.stride, cw=cw_in)):
            y = _PallasDeconv2D(self.filters, use_bias=self.use_bias,
                                dtype=self.dtype,
                                name="ConvTranspose_0")(x, post_scale,
                                                        post_shift, post_relu,
                                                        cw_in=cw_in,
                                                        cw_out=cw_out)
            post_done = True
            cw_native = True
        else:
            if cw_in:
                x = _swap_cw(x)
            if (use_wide and ndim == 3
                    and tuple(_pair(self.kernel, ndim)) == (3, 3, 3)
                    and tuple(_pair(self.stride, ndim)) == (2, 2, 2)
                    and self.filters <= 32):
                y = _WideDeconv3D(self.filters, use_bias=self.use_bias,
                                  dtype=self.dtype, name="ConvTranspose_0")(x)
            else:
                y = nn.ConvTranspose(
                    features=self.filters,
                    kernel_size=_pair(self.kernel, ndim),
                    strides=_pair(self.stride, ndim),
                    padding="SAME",
                    use_bias=self.use_bias,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name="ConvTranspose_0",
                )(x)
        if not post_done and (post_scale is not None or post_shift is not None
                              or post_relu):
            y = _post_affine(y, post_scale, post_shift, post_relu)
        if self.relu:
            y = nn.relu(y)
        if cw_out and not cw_native:
            y = _swap_cw(y)
        return y


def group_norm_core(x, gamma, beta, num_groups: int, eps: float,
                    channel_axis: int = -1):
    """Normalize (N, ..., C) over [channels-within-group + all spatial dims].

    Grouping matches the reference reshape [N, G, C//G, H, W] on a NCHW
    transpose (network.py:240-254): channel c belongs to group c // (C//G).

    Implemented layout-native (reduce whichever axes are spatial, keep the
    channel axis where it is): no transposes, so XLA fuses the whole norm
    into neighboring convs instead of materializing relaid-out feature
    maps. channel_axis=-2 serves the CW (…, C, W) pipeline.
    """
    orig_dtype = x.dtype
    ca = channel_axis % x.ndim
    N = x.shape[0]
    C = x.shape[ca]
    G = num_groups
    spatial_axes = tuple(i for i in range(1, x.ndim) if i != ca)
    count = C // G  # channels per group
    bshape = [1] * x.ndim
    bshape[0] = N
    bshape[ca] = C
    gshape = [1] * x.ndim
    gshape[ca] = C

    # Two-pass moments via per-CHANNEL spatial reductions first, then a
    # group combine on the tiny (N, C) array. The obvious
    # reshape(N, *spatial, G, C//G) instead relays out the whole tensor at
    # an 8/16-lane minor dim — measured 8x the cost of the conv it
    # normalizes at the UNetDS2GN full-res layers (tools/bench_featnet.py).
    xf = x.astype(jnp.float32)

    def group_mean(per_channel):                      # (N, C) -> (N, C)
        g = per_channel.reshape(N, G, count).mean(axis=2, keepdims=True)
        return jnp.broadcast_to(g, (N, G, count)).reshape(N, C)

    mean_c = group_mean(xf.mean(axis=spatial_axes))   # E[x] per (N, C-group)
    mean_b = mean_c.reshape(bshape)
    var_c = group_mean(jnp.square(xf - mean_b).mean(axis=spatial_axes))
    var_b = var_c.reshape(bshape)
    y = ((xf - mean_b) * jax.lax.rsqrt(var_b + eps) * gamma.reshape(gshape)
         + beta.reshape(gshape))
    return y.astype(orig_dtype)


class GroupNormRef(nn.Module):
    """conv_gn-style group norm: channel-wise groups of `group_channel`
    channels, eps 1e-5 (reference: network.py:240-276)."""

    group_channel: int = 8
    eps: float = 1e-5
    scale: bool = True
    center: bool = True

    @nn.compact
    def __call__(self, x, cw: bool = False):
        C = x.shape[-2] if cw else x.shape[-1]
        G = max(1, C // self.group_channel)
        gamma = (self.param("scale", nn.initializers.ones, (C,), jnp.float32)
                 if self.scale else jnp.ones((C,), jnp.float32))
        beta = (self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
                if self.center else jnp.zeros((C,), jnp.float32))
        return group_norm_core(x, gamma, beta, G, self.eps,
                               channel_axis=-2 if cw else -1)


class GroupNormFlexible(nn.Module):
    """ConvGRU group_norm with fallbacks (reference: convgru.py:9-52):
      G == 1  -> layer norm over (spatial, C), eps 1e-12
      G >= C  -> instance norm (per-channel over spatial), eps 1e-6
      else    -> group norm, eps 1e-5
    Always learns per-channel gamma/beta (tf.contrib defaults)."""

    group_channel: int = 16
    channel_wise: bool = True
    group: int = 32

    @nn.compact
    def __call__(self, x, cw: bool = False):
        # cw: x is channel-second-minor (…, C, W) — normalize channel
        # axis -2 in place (the CW GRU eval pipeline, models/gru.py).
        ca = (x.ndim - 2) if cw else (x.ndim - 1)
        C = x.shape[ca]
        G = max(1, C // self.group_channel) if self.channel_wise else min(self.group, C)
        gamma = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        gshape = [1] * x.ndim
        gshape[ca] = C
        if G == 1:
            eps = 1e-12
            x32 = x.astype(jnp.float32)
            axes = tuple(range(1, x.ndim))
            mean = x32.mean(axis=axes, keepdims=True)
            var = x32.var(axis=axes, keepdims=True)
            y = ((x32 - mean) / jnp.sqrt(var + eps) * gamma.reshape(gshape)
                 + beta.reshape(gshape))
            return y.astype(x.dtype)
        if G >= C:
            eps = 1e-6
            x32 = x.astype(jnp.float32)
            axes = tuple(i for i in range(1, x.ndim) if i != ca)
            mean = x32.mean(axis=axes, keepdims=True)
            var = x32.var(axis=axes, keepdims=True)
            y = ((x32 - mean) / jnp.sqrt(var + eps) * gamma.reshape(gshape)
                 + beta.reshape(gshape))
            return y.astype(x.dtype)
        return group_norm_core(x, gamma, beta, G, 1e-5, channel_axis=ca)


class BatchNormRef(nn.Module):
    """Batch norm with running stats, matching tf.layers.batch_normalization
    defaults used by the reference (momentum 0.99, eps 1e-5; center/scale
    per call site) (reference: network.py:492-509)."""

    center: bool = True
    scale: bool = True
    eps: float = 1e-5
    momentum: float = 0.99

    @nn.compact
    def __call__(self, x, training: bool, cw: bool = False):
        # cw: x is channel-second-minor (…, C, W) — normalize feature
        # axis -2 in place (params/batch_stats stay (C,), so checkpoints
        # are layout-independent).
        return nn.BatchNorm(
            use_running_average=not training,
            momentum=self.momentum,
            epsilon=self.eps,
            use_bias=self.center,
            use_scale=self.scale,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            axis=-2 if cw else -1,
        )(x)


class Fc(nn.Module):
    """Dense layer with optional flatten (reference: network.py:462-476)."""

    num_out: int
    relu: bool = True
    use_bias: bool = True
    flatten: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.flatten:
            x = x.reshape(x.shape[0], -1)
        y = nn.Dense(self.num_out, use_bias=self.use_bias, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        return nn.relu(y) if self.relu else y


def max_pool(x, pool_size: int = 2, strides: int = 2, padding: str = "SAME"):
    """(reference: network.py:417-423)"""
    k = (1, pool_size, pool_size, 1)
    s = (1, strides, strides, 1)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, k, s, padding)


def avg_pool(x, pool_size: int = 2, strides: int = 2, padding: str = "SAME"):
    """(reference: network.py:426-432)"""
    k = (1, pool_size, pool_size, 1)
    s = (1, strides, strides, 1)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, k, s, padding)
    counts = jax.lax.reduce_window(jnp.ones_like(x), 0.0, jax.lax.add, k, s, padding)
    return summed / counts


def l2_pool(x, pool_size: int = 2, strides: int = 2, padding: str = "SAME"):
    """sqrt(avg_pool(x^2)) + eps (reference: network.py:435-442)"""
    return jnp.sqrt(avg_pool(jnp.square(x), pool_size, strides, padding) + 1e-6)


class Dropout(nn.Module):
    """(reference: network.py:511-517)"""

    rate: float = 0.5

    @nn.compact
    def __call__(self, x, training: bool = False):
        return nn.Dropout(self.rate, deterministic=not training)(x)


class ConvGN(nn.Module):
    """conv (no bias) -> group norm -> ReLU (reference: network.py:217-276)."""

    filters: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    center: bool = True
    scale: bool = True
    group_channel: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, cw_in: bool = False, cw_out: bool = False):
        # CW chaining: the conv emits its native (…, C, W) layout and the
        # group norm runs channel-axis=-2 in place — zero relayouts.
        y = Conv(self.filters, self.kernel, self.stride, relu=False,
                 use_bias=False, dtype=self.dtype, name="conv")(
                     x, cw_in=cw_in, cw_out=cw_out)
        y = GroupNormRef(self.group_channel, scale=self.scale, center=self.center,
                         name="gn")(y, cw=cw_out)
        if self.relu:
            y = nn.relu(y)
        return y


class DeconvGN(nn.Module):
    """deconv (no bias) -> group norm [-> ReLU; reference default relu=False]
    (reference: network.py:350-409)."""

    filters: int
    kernel: int = 3
    stride: int = 2
    relu: bool = False
    center: bool = True
    scale: bool = True
    group_channel: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, cw_in: bool = False, cw_out: bool = False):
        y = Deconv(self.filters, self.kernel, self.stride, relu=False,
                   use_bias=False, dtype=self.dtype, name="deconv")(
                       x, cw_in=cw_in, cw_out=cw_out)
        y = GroupNormRef(self.group_channel, scale=self.scale, center=self.center,
                         name="gn")(y, cw=cw_out)
        if self.relu:
            y = nn.relu(y)
        return y


def _bn_affine_probe(bn, ndim: int, channels: int):
    """Extract eval-mode batch norm as a per-channel (scale, shift) pair by
    probing it with zeros and ones: bn(0) = shift, bn(1) - bn(0) = scale.
    Works for any center/scale flag combination and keeps the param tree
    identical to the unfused call (the probe IS a call to the module)."""
    probe0 = jnp.zeros((1,) + (1,) * (ndim - 2) + (channels,), jnp.float32)
    shift = bn(probe0, False).reshape(channels)
    scale = bn(probe0 + 1.0, False).reshape(channels) - shift
    return scale, shift


class ConvBN(nn.Module):
    """conv (no bias) -> batch norm -> ReLU (reference: network.py:278-298)."""

    filters: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    center: bool = True
    scale: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, training: bool = False, cw_in: bool = False,
                 cw_out: bool = False):
        bn = BatchNormRef(center=self.center, scale=self.scale, name="bn")
        conv = Conv(self.filters, self.kernel, self.stride, relu=False,
                    use_bias=False, dtype=self.dtype, name="conv")
        if not training:
            # Fold the eval-mode BN (a per-channel affine of the running
            # stats) into the conv: probe the affine with zeros/ones, then
            # let Conv apply it — the Pallas 3D path fuses it into the
            # kernel + slab-write epilogue (zero extra HBM passes), and
            # the output stays in the conv dtype instead of BN's f32.
            scale, shift = _bn_affine_probe(bn, x.ndim, self.filters)
            return conv(x, post_scale=scale, post_shift=shift,
                        post_relu=self.relu, cw_in=cw_in, cw_out=cw_out)
        # training: the differentiable conv + the batch norm both run
        # CW-native (feature axis -2), so the chain stays relayout-free
        # through fwd AND bwd (the conv custom-VJPs honor the contract)
        y = conv(x, cw_in=cw_in, cw_out=cw_out)
        y = bn(y, training, cw=cw_out)
        if self.relu:
            y = nn.relu(y)
        return y


class DeconvBN(nn.Module):
    """deconv (no bias) -> batch norm -> ReLU (reference: network.py:331-348)."""

    filters: int
    kernel: int = 3
    stride: int = 2
    relu: bool = True
    center: bool = True
    scale: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, training: bool = False, cw_in: bool = False,
                 cw_out: bool = False):
        bn = BatchNormRef(center=self.center, scale=self.scale, name="bn")
        deconv = Deconv(self.filters, self.kernel, self.stride, relu=False,
                        use_bias=False, dtype=self.dtype, name="deconv")
        if not training:
            scale, shift = _bn_affine_probe(bn, x.ndim, self.filters)
            return deconv(x, post_scale=scale, post_shift=shift,
                          post_relu=self.relu, cw_in=cw_in, cw_out=cw_out)
        # training: CW-native chain, see ConvBN
        y = deconv(x, cw_in=cw_in, cw_out=cw_out)
        y = bn(y, training, cw=cw_out)
        if self.relu:
            y = nn.relu(y)
        return y
