"""2D feature towers.

Exact topology parity with the reference zoo
(reference: cnn_wrapper/mvsnetworks.py:17-115):

  * UNetDS2GN — the production tower used by all five graphs: a full 2D
    U-Net (4x down with skip concats, GN) followed by two stride-2 GN conv
    blocks; output = 4*base filters at 1/4 x 1/4 resolution.
  * UniNetDS2 / UniNetDS2GN — the simpler original 8-layer towers.

Filter counts scale by the network_mode divisor: base = max(1, int(8/div))
(reference: mvsnetworks.py:23,41,58).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from mvsnet_tpu.config import scaled_filters
from mvsnet_tpu.models.layers import Conv, ConvBN, ConvGN, DeconvGN


class UniNetDS2(nn.Module):
    """8-layer downsample-by-4 tower with BN (reference: mvsnetworks.py:17-32)."""

    network_mode: str = "normal"
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        b = scaled_filters(8, self.network_mode)
        d = self.dtype
        x = ConvBN(b, 3, 1, name="conv0_0", dtype=d)(x, training)
        x = ConvBN(b, 3, 1, name="conv0_1", dtype=d)(x, training)
        x = ConvBN(b * 2, 5, 2, name="conv1_0", dtype=d)(x, training)
        x = ConvBN(b * 2, 3, 1, name="conv1_1", dtype=d)(x, training)
        x = ConvBN(b * 2, 3, 1, name="conv1_2", dtype=d)(x, training)
        x = ConvBN(b * 4, 5, 2, name="conv2_0", dtype=d)(x, training)
        x = ConvBN(b * 4, 3, 1, name="conv2_1", dtype=d)(x, training)
        x = Conv(b * 4, 3, 1, relu=False, use_bias=False, name="conv2_2", dtype=d)(x)
        return x


class UniNetDS2GN(nn.Module):
    """Same as UniNetDS2 with group norm (reference: mvsnetworks.py:35-50)."""

    network_mode: str = "normal"
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        b = scaled_filters(8, self.network_mode)
        d = self.dtype
        x = ConvGN(b, 3, 1, name="conv0_0", dtype=d)(x)
        x = ConvGN(b, 3, 1, name="conv0_1", dtype=d)(x)
        x = ConvGN(b * 2, 5, 2, name="conv1_0", dtype=d)(x)
        x = ConvGN(b * 2, 3, 1, name="conv1_1", dtype=d)(x)
        x = ConvGN(b * 2, 3, 1, name="conv1_2", dtype=d)(x)
        x = ConvGN(b * 4, 5, 2, name="conv2_0", dtype=d)(x)
        x = ConvGN(b * 4, 3, 1, name="conv2_1", dtype=d)(x)
        x = Conv(b * 4, 3, 1, relu=False, use_bias=False, name="conv2_2", dtype=d)(x)
        return x


class UNetDS2GN(nn.Module):
    """U-Net + 2 downsample stages; the production feature extractor
    (reference: mvsnetworks.py:53-115; consumed at model.py:272,392,520,617).

    Input (B, H, W, 3) -> output (B, H/4, W/4, 4*base) in compute dtype.
    """

    network_mode: str = "normal"
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, cw: bool = False):
        # cw: eval-only channel-second-minor pipeline — every conv/deconv
        # runs in the Pallas kernels' native (B, H, C, W) layout with the
        # group norms channel-axis=-2 in place, skipping the per-layer
        # NHWC relayouts (models/layers.py ConvGN/DeconvGN). Input and
        # output stay NHWC; skip concats run on axis -2. The CW fused conv
        # path is non-differentiable — callers gate cw on inference.
        b = scaled_filters(8, self.network_mode)
        d = self.dtype
        if d is not None:
            x = x.astype(d)
        cat_ax = -2 if cw else -1

        # encoder trunk (stride-2 chain)
        c1_0 = ConvGN(b * 2, 3, 2, name="2dconv1_0", dtype=d)(x, cw_out=cw)
        c2_0 = ConvGN(b * 4, 3, 2, name="2dconv2_0", dtype=d)(
            c1_0, cw_in=cw, cw_out=cw)
        c3_0 = ConvGN(b * 8, 3, 2, name="2dconv3_0", dtype=d)(
            c2_0, cw_in=cw, cw_out=cw)
        c4_0 = ConvGN(b * 16, 3, 2, name="2dconv4_0", dtype=d)(
            c3_0, cw_in=cw, cw_out=cw)

        # full-res side branch
        c0_1 = ConvGN(b, 3, 1, name="2dconv0_1", dtype=d)(x, cw_out=cw)
        c0_2 = ConvGN(b, 3, 1, name="2dconv0_2", dtype=d)(
            c0_1, cw_in=cw, cw_out=cw)

        # per-level refinement pairs
        c1_1 = ConvGN(b * 2, 3, 1, name="2dconv1_1", dtype=d)(
            c1_0, cw_in=cw, cw_out=cw)
        c1_2 = ConvGN(b * 2, 3, 1, name="2dconv1_2", dtype=d)(
            c1_1, cw_in=cw, cw_out=cw)
        c2_1 = ConvGN(b * 4, 3, 1, name="2dconv2_1", dtype=d)(
            c2_0, cw_in=cw, cw_out=cw)
        c2_2 = ConvGN(b * 4, 3, 1, name="2dconv2_2", dtype=d)(
            c2_1, cw_in=cw, cw_out=cw)
        c3_1 = ConvGN(b * 8, 3, 1, name="2dconv3_1", dtype=d)(
            c3_0, cw_in=cw, cw_out=cw)
        c3_2 = ConvGN(b * 8, 3, 1, name="2dconv3_2", dtype=d)(
            c3_1, cw_in=cw, cw_out=cw)

        # bottleneck + decoder with skip concats
        c4_1 = ConvGN(b * 16, 3, 1, name="2dconv4_1", dtype=d)(
            c4_0, cw_in=cw, cw_out=cw)
        c4_2 = ConvGN(b * 16, 3, 1, name="2dconv4_2", dtype=d)(
            c4_1, cw_in=cw, cw_out=cw)
        c5_0 = DeconvGN(b * 8, 3, 2, name="2dconv5_0", dtype=d)(
            c4_2, cw_in=cw, cw_out=cw)

        cat5 = jnp.concatenate([c5_0, c3_2], axis=cat_ax)
        c5_1 = ConvGN(b * 8, 3, 1, name="2dconv5_1", dtype=d)(
            cat5, cw_in=cw, cw_out=cw)
        c5_2 = ConvGN(b * 8, 3, 1, name="2dconv5_2", dtype=d)(
            c5_1, cw_in=cw, cw_out=cw)
        c6_0 = DeconvGN(b * 4, 3, 2, name="2dconv6_0", dtype=d)(
            c5_2, cw_in=cw, cw_out=cw)

        cat6 = jnp.concatenate([c6_0, c2_2], axis=cat_ax)
        c6_1 = ConvGN(b * 4, 3, 1, name="2dconv6_1", dtype=d)(
            cat6, cw_in=cw, cw_out=cw)
        c6_2 = ConvGN(b * 4, 3, 1, name="2dconv6_2", dtype=d)(
            c6_1, cw_in=cw, cw_out=cw)
        c7_0 = DeconvGN(b * 2, 3, 2, name="2dconv7_0", dtype=d)(
            c6_2, cw_in=cw, cw_out=cw)

        cat7 = jnp.concatenate([c7_0, c1_2], axis=cat_ax)
        c7_1 = ConvGN(b * 2, 3, 1, name="2dconv7_1", dtype=d)(
            cat7, cw_in=cw, cw_out=cw)
        c7_2 = ConvGN(b * 2, 3, 1, name="2dconv7_2", dtype=d)(
            c7_1, cw_in=cw, cw_out=cw)
        c8_0 = DeconvGN(b, 3, 2, name="2dconv8_0", dtype=d)(
            c7_2, cw_in=cw, cw_out=cw)

        cat8 = jnp.concatenate([c8_0, c0_2], axis=cat_ax)
        c8_1 = ConvGN(b, 3, 1, name="2dconv8_1", dtype=d)(
            cat8, cw_in=cw, cw_out=cw)
        # end of U-Net; final downsampling tail to 1/4 resolution
        c8_2 = ConvGN(b, 3, 1, name="2dconv8_2", dtype=d)(
            c8_1, cw_in=cw, cw_out=cw)
        c9_0 = ConvGN(b * 2, 5, 2, name="conv9_0", dtype=d)(
            c8_2, cw_in=cw, cw_out=cw)
        c9_1 = ConvGN(b * 2, 3, 1, name="conv9_1", dtype=d)(
            c9_0, cw_in=cw, cw_out=cw)
        c9_2 = ConvGN(b * 2, 3, 1, name="conv9_2", dtype=d)(
            c9_1, cw_in=cw, cw_out=cw)
        c10_0 = ConvGN(b * 4, 5, 2, name="conv10_0", dtype=d)(
            c9_2, cw_in=cw, cw_out=cw)
        c10_1 = ConvGN(b * 4, 3, 1, name="conv10_1", dtype=d)(
            c10_0, cw_in=cw, cw_out=cw)
        # output NHWC always: the warp/cost consumers read (h, w, C)
        out = Conv(b * 4, 3, 1, relu=False, use_bias=False, name="conv10_2",
                   dtype=d)(c10_1, cw_in=cw)
        return out
