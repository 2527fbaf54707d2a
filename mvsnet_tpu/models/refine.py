"""Depth-map refinement networks.

Reference parity (cnn_wrapper/mvsnetworks.py:161-325):
  * RefineNet / RefineNetConv — 3 convs (BN / plain) + 1-channel output on
    concat(color image, depth[, prob][, stereo]); base filter 32.
  * RefineUNet / RefineUNetConv — full U-Net variant (GN / plain);
    base filter 8.

Selected by config.refinement_network in {'original','unet'}
(reference: model.py:794-801). The conv variants (no norm) are the ones the
reference graphs actually instantiate.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from mvsnet_tpu.config import scaled_filters
from mvsnet_tpu.models.layers import Conv, ConvBN, ConvGN, Deconv, DeconvGN


class RefineNet(nn.Module):
    """3x conv_bn + output conv (reference: mvsnetworks.py:161-175)."""

    network_mode: str = "normal"
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, color_image, depth_image, training: bool = False):
        b = scaled_filters(32, self.network_mode)
        d = self.dtype
        x = jnp.concatenate([color_image, depth_image], axis=-1)
        if d is not None:
            x = x.astype(d)
        x = ConvBN(b, 3, 1, name="refine_conv0", dtype=d)(x, training)
        x = ConvBN(b, 3, 1, name="refine_conv1", dtype=d)(x, training)
        x = ConvBN(b, 3, 1, name="refine_conv2", dtype=d)(x, training)
        return Conv(1, 3, 1, relu=False, name="refine_conv3", dtype=d)(x)


class RefineNetConv(nn.Module):
    """Same, no normalization (reference: mvsnetworks.py:178-193)."""

    network_mode: str = "normal"
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, color_image, depth_image, training: bool = False):
        b = scaled_filters(32, self.network_mode)
        d = self.dtype
        x = jnp.concatenate([color_image, depth_image], axis=-1)
        if d is not None:
            x = x.astype(d)
        x = Conv(b, 3, 1, name="refine_conv0", dtype=d)(x)
        x = Conv(b, 3, 1, name="refine_conv1", dtype=d)(x)
        x = Conv(b, 3, 1, name="refine_conv2", dtype=d)(x)
        return Conv(1, 3, 1, relu=False, name="refine_conv3", dtype=d)(x)


class _RefineUNetBody(nn.Module):
    """Shared U-Net topology for RefineUNet (GN) and RefineUNetConv (plain).

    (reference: mvsnetworks.py:196-325 — identical wiring, norm toggled)
    """

    network_mode: str = "normal"
    use_gn: bool = True
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, color_image, depth_image, training: bool = False):
        b = scaled_filters(8, self.network_mode)
        d = self.dtype

        def conv(f, k, s, name):
            if self.use_gn:
                return ConvGN(f, k, s, name=name, dtype=d)
            return Conv(f, k, s, name=name, dtype=d)

        def deconv(f, k, s, name):
            if self.use_gn:
                return DeconvGN(f, k, s, name=name, dtype=d)
            return Deconv(f, k, s, name=name, dtype=d)

        x = jnp.concatenate([color_image, depth_image], axis=-1)
        if d is not None:
            x = x.astype(d)

        c1_0 = conv(b * 2, 3, 2, "2dconv1_0_refine")(x)
        c2_0 = conv(b * 4, 3, 2, "2dconv2_0_refine")(c1_0)
        c3_0 = conv(b * 8, 3, 2, "2dconv3_0_refine")(c2_0)
        c4_0 = conv(b * 16, 3, 2, "2dconv4_0_refine")(c3_0)

        c0_1 = conv(b, 3, 1, "2dconv0_1_refine")(x)
        c0_2 = conv(b, 3, 1, "2dconv0_2_refine")(c0_1)

        c1_1 = conv(b * 2, 3, 1, "2dconv1_1_refine")(c1_0)
        c1_2 = conv(b * 2, 3, 1, "2dconv1_2_refine")(c1_1)
        c2_1 = conv(b * 4, 3, 1, "2dconv2_1_refine")(c2_0)
        c2_2 = conv(b * 4, 3, 1, "2dconv2_2_refine")(c2_1)
        c3_1 = conv(b * 8, 3, 1, "2dconv3_1_refine")(c3_0)
        c3_2 = conv(b * 8, 3, 1, "2dconv3_2_refine")(c3_1)

        c4_1 = conv(b * 16, 3, 1, "2dconv4_1_refine")(c4_0)
        c4_2 = conv(b * 16, 3, 1, "2dconv4_2_refine")(c4_1)
        c5_0 = deconv(b * 8, 3, 2, "2dconv5_0_refine")(c4_2)

        cat5 = jnp.concatenate([c5_0, c3_2], axis=-1)
        c5_1 = conv(b * 8, 3, 1, "2dconv5_1_refine")(cat5)
        c5_2 = conv(b * 8, 3, 1, "2dconv5_2_refine")(c5_1)
        c6_0 = deconv(b * 4, 3, 2, "2dconv6_0_refine")(c5_2)

        cat6 = jnp.concatenate([c6_0, c2_2], axis=-1)
        c6_1 = conv(b * 4, 3, 1, "2dconv6_1_refine")(cat6)
        c6_2 = conv(b * 4, 3, 1, "2dconv6_2_refine")(c6_1)
        c7_0 = deconv(b * 2, 3, 2, "2dconv7_0_refine")(c6_2)

        cat7 = jnp.concatenate([c7_0, c1_2], axis=-1)
        c7_1 = conv(b * 2, 3, 1, "2dconv7_1_refine")(cat7)
        c7_2 = conv(b * 2, 3, 1, "2dconv7_2_refine")(c7_1)
        c8_0 = deconv(b, 3, 2, "2dconv8_0_refine")(c7_2)

        cat8 = jnp.concatenate([c8_0, c0_2], axis=-1)
        c8_1 = conv(b, 3, 1, "2dconv8_1_refine")(cat8)
        c8_2 = conv(b, 3, 1, "2dconv8_2_refine")(c8_1)
        c8_3 = conv(b * 4, 3, 1, "2dconv8_3_refine")(c8_2)
        return Conv(1, 3, 1, relu=False, name="2dconv8_4_refine", dtype=d)(c8_3)


class RefineUNet(_RefineUNetBody):
    use_gn: bool = True


class RefineUNetConv(_RefineUNetBody):
    use_gn: bool = False
