"""Convolutional GRU cost regularizer (R-MVSNet).

ConvGRUCell (reference: mvsnet/convgru.py:54-121):
  gates:  conv2d(concat(x, h), 2f) -> split -> group_norm(gc=16) -> sigmoid
  output: conv2d(concat(x, r*h), f) -> group_norm -> tanh
  h' = u*h + (1-u)*y
Both convs have biases (tf.layers.conv2d default).

GRURegularizer stacks 3 cells (16 -> 4 -> 2 filters; /2 when network_mode
!= 'normal') plus a 1-channel 3x3 projection 'prob_conv'
(reference: model.py:540-599). The depth sweep itself lives in
models/mvsnet.py as a lax.scan (O(1) memory in D; remat for training).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mvsnet_tpu.models.layers import Conv, GroupNormFlexible


def gru_filter_sizes(network_mode: str) -> Tuple[int, int, int]:
    """(16, 4, 2) in normal mode, halved otherwise (reference: model.py:540-544)."""
    div = 1 if network_mode == "normal" else 2
    return (16 // div, 4 // div, 2 // div)


class ConvGRUCell(nn.Module):
    """cw (call arg): x, h, and the output are channel-second-minor
    (B, H, C, W) — the Pallas 2D conv kernels' native layout. The whole
    cell (concat, convs, group norms, gates) runs in that layout so the
    depth scan pays zero relayouts per plane. Layout-only: numerics are
    identical either way (tests/test_cw_pipeline.py)."""

    filters: int
    kernel: int = 3
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, h, cw: bool = False):
        d = self.dtype
        cat_ax = -2 if cw else -1
        inputs = jnp.concatenate([x, h.astype(x.dtype)], axis=cat_ax)
        gates = Conv(2 * self.filters, self.kernel, 1, relu=False, use_bias=True,
                     name="gates_conv", dtype=d)(inputs, cw_in=cw, cw_out=cw)
        reset, update = jnp.split(gates, 2, axis=cat_ax)
        reset = nn.sigmoid(GroupNormFlexible(group_channel=16, name="reset_norm")(reset, cw=cw))
        update = nn.sigmoid(GroupNormFlexible(group_channel=16, name="update_norm")(update, cw=cw))

        inputs2 = jnp.concatenate([x, (reset * h).astype(x.dtype)], axis=cat_ax)
        y = Conv(self.filters, self.kernel, 1, relu=False, use_bias=True,
                 name="output_conv", dtype=d)(inputs2, cw_in=cw, cw_out=cw)
        y = jnp.tanh(GroupNormFlexible(group_channel=16, name="output_norm")(y, cw=cw))
        out = update * h + (1 - update) * y
        return out, out


class GRURegularizer(nn.Module):
    """One depth-step of the 3-cell GRU stack + prob projection.

    Call with the *negated* cost slice (-cost) and the 3 hidden states;
    returns (reg_cost (B,H,W,1), new_states).
    (reference: model.py:586-594)
    """

    network_mode: str = "normal"
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, neg_cost, states: Sequence, cw: bool = False):
        # cw: neg_cost/states/reg are channel-second-minor (B, H, C, W) —
        # see ConvGRUCell. The returned reg is (B, H, 1, W); its data order
        # is identical to (B, H, W, 1), so the caller's swap is free.
        f1, f2, f3 = gru_filter_sizes(self.network_mode)
        d = self.dtype
        c1, s1 = ConvGRUCell(f1, name="conv_gru1", dtype=d)(neg_cost, states[0], cw=cw)
        c2, s2 = ConvGRUCell(f2, name="conv_gru2", dtype=d)(c1, states[1], cw=cw)
        c3, s3 = ConvGRUCell(f3, name="conv_gru3", dtype=d)(c2, states[2], cw=cw)
        reg = Conv(1, 3, 1, relu=False, use_bias=True, name="prob_conv",
                   dtype=d)(c3, cw_in=cw, cw_out=cw)
        return reg, (s1, s2, s3)

    @staticmethod
    def init_states(batch: int, height: int, width: int, network_mode: str,
                    dtype=jnp.float32, cw: bool = False):
        f1, f2, f3 = gru_filter_sizes(network_mode)
        shape = ((lambda f: (batch, height, f, width)) if cw
                 else (lambda f: (batch, height, width, f)))
        return (
            jnp.zeros(shape(f1), dtype),
            jnp.zeros(shape(f2), dtype),
            jnp.zeros(shape(f3), dtype),
        )
