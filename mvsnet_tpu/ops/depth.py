"""Depth regression: soft-argmin, confidence maps, winner-take-all.

Reference equivalents: soft-argmin expectation over softmax(-cost)
(model.py:343-366), 2/4-bucket probability ("confidence") map
(model.py:20-144), and the WTA running-argmax update used by the R-MVSNet
decode loop (model.py:676-751).

All ops are batched, gather-light (one take_along_axis over the depth axis
per bucket) and static-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvsnet_tpu.ops.geometry import depth_values, inv_depth_values


def soft_argmin(reg_cost, depth_start, depth_interval, depth_num: int,
                inverse_depth: bool = False, depth_end=None):
    """Soft-argmin depth regression.

    Args:
      reg_cost: (B, D, H, W) regularized cost (lower = better).
      depth_start, depth_interval: (B,) sweep parameters.
      depth_end: (B,) required when inverse_depth; else derived.
    Returns:
      depth_map: (B, H, W, 1) f32 expectation over softmax(-cost).
      prob_volume: (B, D, H, W) softmax probabilities.
    """
    B, D = reg_cost.shape[:2]
    assert D == depth_num
    prob_volume = jax.nn.softmax(-jnp.asarray(reg_cost, jnp.float32), axis=1)

    depth_start = jnp.broadcast_to(jnp.asarray(depth_start, jnp.float32), (B,))
    if inverse_depth:
        depth_end = jnp.broadcast_to(jnp.asarray(depth_end, jnp.float32), (B,))
        samples = inv_depth_values(depth_start, depth_end, depth_num)       # (B, D)
    else:
        depth_interval = jnp.broadcast_to(jnp.asarray(depth_interval, jnp.float32), (B,))
        samples = depth_values(depth_start, depth_interval, depth_num)      # (B, D)

    depth_map = jnp.sum(samples[:, :, None, None] * prob_volume, axis=1)
    return depth_map[..., None], prob_volume


def probability_map(prob_volume, depth_map, depth_start, depth_interval,
                    inverse_depth: bool = False, num_buckets: int = 4):
    """Confidence = summed probability of the 2/4 buckets nearest the depth.

    Args:
      prob_volume: (B, D, H, W).
      depth_map: (B, H, W, 1).
      depth_start, depth_interval: (B,).
    Returns:
      (B, H, W, 1) probability map.
    (reference: model.py:45-144; inverse-depth indexing :83-107)
    """
    assert num_buckets in (2, 4)
    B, D = prob_volume.shape[:2]
    depth = jnp.asarray(depth_map, jnp.float32)[..., 0]                     # (B,H,W)
    start = jnp.broadcast_to(jnp.asarray(depth_start, jnp.float32), (B,))[:, None, None]
    interval = jnp.broadcast_to(jnp.asarray(depth_interval, jnp.float32), (B,))[:, None, None]

    if inverse_depth:
        # Bucket index computed in inverse-depth space then linearly flipped
        # back to a depth-axis index (reference: model.py:83-107).
        depth_end = start + (D - 1) * interval
        inv_start = 1.0 / start
        inv_end = 1.0 / depth_end
        inv_interval = (inv_start - inv_end) / (D - 1)
        inv_d = (1.0 / depth - inv_end) / inv_interval                      # (B,H,W)
        left0 = jnp.clip(D - jnp.ceil(inv_d).astype(jnp.int32) - 1, 0, D - 1)
        right0 = jnp.clip(D - jnp.floor(inv_d).astype(jnp.int32) - 1, 0, D - 1)
    else:
        d = (depth - start) / interval
        left0 = jnp.clip(jnp.floor(d).astype(jnp.int32), 0, D - 1)
        right0 = jnp.clip(jnp.ceil(d).astype(jnp.int32), 0, D - 1)

    left1 = jnp.clip(left0 - 1, 0, D - 1)
    right1 = jnp.clip(right0 + 1, 0, D - 1)

    # Gather-free: TPU per-pixel take_along_axis over the depth axis costs
    # ~1 row/cycle; an indicator-weighted sum is one fused pass over the
    # volume instead. Summing per-bucket indicators preserves the
    # reference's double-count when floor(d) == ceil(d) (model.py:45-144).
    iota_d = jnp.arange(D)[None, :, None, None]                         # (1,D,1,1)

    def indicator(idx):
        return (iota_d == idx[:, None]).astype(prob_volume.dtype)

    weight = indicator(left0) + indicator(right0)
    if num_buckets == 4:
        weight = weight + indicator(left1) + indicator(right1)
    prob = jnp.sum(prob_volume * weight, axis=1)
    return prob[..., None]


def soft_argmin_prob_map(reg_cost, depth_start, depth_interval,
                         depth_num: int, inverse_depth: bool = False,
                         depth_end=None, num_buckets: int = 4):
    """Fused soft-argmin + probability map without materializing softmax.

    Equivalent to `probability_map(*soft_argmin(...))` (reference:
    model.py:343-366 + model.py:45-144) but never writes the (B, D, H, W)
    f32 probability volume to HBM: the exp(-cost - max) term is expressed
    as an elementwise producer feeding three depth-axis reductions
    (sum-exp, depth expectation, bucket mass), which XLA fuses into two
    streaming passes over the cost volume instead of softmax's
    write + two reads. Differentiable; used where the probability volume
    itself is not needed downstream (the 3DCNN inference tail).
    """
    assert num_buckets in (2, 4)
    B, D = reg_cost.shape[:2]
    assert D == depth_num
    x = -jnp.asarray(reg_cost, jnp.float32)                           # (B,D,H,W)
    m = jnp.max(x, axis=1, keepdims=True)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=1)                                            # (B,H,W)

    start = jnp.broadcast_to(jnp.asarray(depth_start, jnp.float32), (B,))
    interval = jnp.broadcast_to(jnp.asarray(depth_interval, jnp.float32),
                                (B,))
    if inverse_depth:
        end = jnp.broadcast_to(jnp.asarray(depth_end, jnp.float32), (B,))
        samples = inv_depth_values(start, end, depth_num)             # (B, D)
    else:
        samples = depth_values(start, interval, depth_num)            # (B, D)
    depth = jnp.sum(e * samples[:, :, None, None], axis=1) / s        # (B,H,W)

    startb = start[:, None, None]
    intervalb = interval[:, None, None]
    if inverse_depth:
        d_end = startb + (D - 1) * intervalb
        inv_start = 1.0 / startb
        inv_end = 1.0 / d_end
        inv_interval = (inv_start - inv_end) / (D - 1)
        inv_d = (1.0 / depth - inv_end) / inv_interval
        left0 = jnp.clip(D - jnp.ceil(inv_d).astype(jnp.int32) - 1, 0, D - 1)
        right0 = jnp.clip(D - jnp.floor(inv_d).astype(jnp.int32) - 1, 0, D - 1)
    else:
        d = (depth - startb) / intervalb
        left0 = jnp.clip(jnp.floor(d).astype(jnp.int32), 0, D - 1)
        right0 = jnp.clip(jnp.ceil(d).astype(jnp.int32), 0, D - 1)
    left1 = jnp.clip(left0 - 1, 0, D - 1)
    right1 = jnp.clip(right0 + 1, 0, D - 1)

    iota_d = jnp.arange(D)[None, :, None, None]

    def indicator(idx):
        return (iota_d == idx[:, None]).astype(e.dtype)

    weight = indicator(left0) + indicator(right0)
    if num_buckets == 4:
        weight = weight + indicator(left1) + indicator(right1)
    prob = jnp.sum(e * weight, axis=1) / s
    return depth[..., None], prob[..., None]


def winner_take_all_update(carry, prob, depth_value):
    """One WTA step: keep per-pixel argmax prob + its depth, accumulate sums.

    Args:
      carry: (max_prob, depth_image, exp_sum), each (B, H, W, 1).
      prob: (B, H, W, 1) unnormalized probability exp(reg_cost) at this plane.
      depth_value: (B,) depth of this plane.
    Returns updated carry. (reference: model.py:716-732)
    """
    max_prob, depth_image, exp_sum = carry
    d_img = jnp.broadcast_to(depth_value[:, None, None, None], depth_image.shape)
    d_img = d_img.astype(depth_image.dtype)
    update = prob > max_prob
    return (
        jnp.where(update, prob, max_prob),
        jnp.where(update, d_img, depth_image),
        exp_sum + prob,
    )
