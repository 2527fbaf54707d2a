"""3D-CNN cost-volume regularizer.

RegNetUS0 (reference: cnn_wrapper/mvsnetworks.py:122-158): a 3-level 3D
U-Net over (D, H/4, W/4) with *additive* skips, batch norm, and a final
1-channel 3x3x3 conv. Consumes (B, D, H, W, C) variance cost, emits
(B, D, H, W, 1) regularized cost.

TPU notes: 3D convs lower to MXU contractions; keeping channels a multiple
of 8/16 preserves lane packing. Sharding the D axis across the mesh `depth`
axis is handled by GSPMD halo exchange — the module itself stays unsharded.
"""

from __future__ import annotations

from typing import Optional

from flax import linen as nn

from mvsnet_tpu.config import scaled_filters
from mvsnet_tpu.models.layers import Conv, ConvBN, DeconvBN


class RegNetUS0(nn.Module):
    network_mode: str = "normal"
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        b = scaled_filters(8, self.network_mode)
        d = self.dtype
        if d is not None:
            x = x.astype(d)

        # encoder (stride-2 chain over (D, H, W))
        c1_0 = ConvBN(b * 2, 3, 2, name="3dconv1_0", dtype=d)(x, training)
        c2_0 = ConvBN(b * 4, 3, 2, name="3dconv2_0", dtype=d)(c1_0, training)
        c3_0 = ConvBN(b * 8, 3, 2, name="3dconv3_0", dtype=d)(c2_0, training)

        # skip branches
        c0_1 = ConvBN(b, 3, 1, name="3dconv0_1", dtype=d)(x, training)
        c1_1 = ConvBN(b * 2, 3, 1, name="3dconv1_1", dtype=d)(c1_0, training)
        c2_1 = ConvBN(b * 4, 3, 1, name="3dconv2_1", dtype=d)(c2_0, training)

        # decoder with additive skips
        c3_1 = ConvBN(b * 8, 3, 1, name="3dconv3_1", dtype=d)(c3_0, training)
        c4_0 = DeconvBN(b * 4, 3, 2, name="3dconv4_0", dtype=d)(c3_1, training)

        c4_1 = c4_0 + c2_1
        c5_0 = DeconvBN(b * 2, 3, 2, name="3dconv5_0", dtype=d)(c4_1, training)

        c5_1 = c5_0 + c1_1
        c6_0 = DeconvBN(b, 3, 2, name="3dconv6_0", dtype=d)(c5_1, training)

        c6_1 = c6_0 + c0_1
        out = Conv(1, 3, 1, relu=False, use_bias=False, name="3dconv6_2", dtype=d)(c6_1)
        return out
