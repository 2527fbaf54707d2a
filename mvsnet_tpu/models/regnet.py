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

import jax.numpy as jnp
from flax import linen as nn

from mvsnet_tpu.config import scaled_filters
from mvsnet_tpu.models.layers import (
    Conv,
    ConvBN,
    DeconvBN,
    cw_pipeline_enabled,
    cw_train_enabled,
)


class RegNetUS0(nn.Module):
    """x_cw (call arg): the input is channel-second-minor (B, D, H, C, W) —
    the Pallas cost kernel's native output layout (ops/pallas/sweep.py) —
    so the eval pipeline consumes it without any relayout. Output is
    always NDHWC (the final C=1 swap is a pure reshape: the data order of
    (..., 1, W) and (..., W, 1) is identical)."""

    network_mode: str = "normal"
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, training: bool = False, x_cw: bool = False):
        b = scaled_filters(8, self.network_mode)
        d = self.dtype
        if d is not None:
            x = x.astype(d)

        # CW pipeline: chain every layer in the Pallas kernels'
        # channel-second-minor layout — zero NDHWC relayouts between
        # layers (each layer otherwise pays up to two; additive skips are
        # layout-agnostic). Layers that fall back to XLA transpose at
        # their own edges, so numerics are layout-independent. Training
        # chains CW too (cw_train_enabled): the conv custom-VJPs honor
        # the layout contract through the backward pass, and the batch
        # norms normalize feature axis -2 in place.
        cw = (cw_train_enabled() if training else cw_pipeline_enabled())
        if x_cw != cw:
            x = jnp.swapaxes(x, -1, -2)
        in_cw = cw

        # encoder (stride-2 chain over (D, H, W))
        c1_0 = ConvBN(b * 2, 3, 2, name="3dconv1_0", dtype=d)(
            x, training, cw_in=in_cw, cw_out=cw)
        c2_0 = ConvBN(b * 4, 3, 2, name="3dconv2_0", dtype=d)(
            c1_0, training, cw_in=cw, cw_out=cw)
        c3_0 = ConvBN(b * 8, 3, 2, name="3dconv3_0", dtype=d)(
            c2_0, training, cw_in=cw, cw_out=cw)

        # skip branches
        c0_1 = ConvBN(b, 3, 1, name="3dconv0_1", dtype=d)(
            x, training, cw_in=in_cw, cw_out=cw)
        c1_1 = ConvBN(b * 2, 3, 1, name="3dconv1_1", dtype=d)(
            c1_0, training, cw_in=cw, cw_out=cw)
        c2_1 = ConvBN(b * 4, 3, 1, name="3dconv2_1", dtype=d)(
            c2_0, training, cw_in=cw, cw_out=cw)

        # decoder with additive skips
        c3_1 = ConvBN(b * 8, 3, 1, name="3dconv3_1", dtype=d)(
            c3_0, training, cw_in=cw, cw_out=cw)
        c4_0 = DeconvBN(b * 4, 3, 2, name="3dconv4_0", dtype=d)(
            c3_1, training, cw_in=cw, cw_out=cw)

        c4_1 = c4_0 + c2_1
        c5_0 = DeconvBN(b * 2, 3, 2, name="3dconv5_0", dtype=d)(
            c4_1, training, cw_in=cw, cw_out=cw)

        c5_1 = c5_0 + c1_1
        c6_0 = DeconvBN(b, 3, 2, name="3dconv6_0", dtype=d)(
            c5_1, training, cw_in=cw, cw_out=cw)

        c6_1 = c6_0 + c0_1
        out = Conv(1, 3, 1, relu=False, use_bias=False, name="3dconv6_2",
                   dtype=d)(c6_1, cw_in=cw, cw_out=cw)
        if cw:
            out = jnp.swapaxes(out, -1, -2)    # (..., 1, W) -> (..., W, 1)
        return out
