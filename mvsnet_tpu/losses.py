"""Losses and accuracy metrics.

Ports the reference formulations (mvsnet/loss.py) to pure JAX:
  * original_loss — masked MAE in depth-interval units (loss.py:15-28)
  * power_loss — N*(|dy|+0.005y)^alpha / y^beta with the 10*mean^beta /
    interval^alpha normalization (loss.py:31-90)
  * gaussian_loss — -exp(-dy^2 / 2(eta*y)^2) (loss.py:93-131)
  * gradient_loss — log-gradient-difference over the *spatial* axes.
    The reference sliced axis 0 (the batch axis, loss.py:144-150), which
    degenerates at batch_size=1; we implement the intended spatial form
    and document the divergence.
  * <1px / <3px metrics in interval units (loss.py:162-187)
  * regression wrapper with the fixed 191-bucket interval (loss.py:190-220)
  * GRU classification loss + the masked-MAE helper the reference calls
    but never defines (`non_zero_mean_absolute_diff`, loss.py:258 — a
    latent NameError upstream; implemented properly here).

Masking: pixels with y_true == 0 are invalid everywhere.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _mask_and_count(y_true):
    mask = (y_true != 0.0).astype(jnp.float32)
    count = jnp.abs(jnp.sum(mask, axis=(1, 2, 3))) + 1e-6
    return mask, count


def non_zero_mean_absolute_diff(y_true, y_pred, interval):
    """Masked MAE in interval units, averaged over valid pixels then summed
    over batch (the helper missing from the reference; semantics match
    original_loss, loss.py:15-28)."""
    interval = jnp.reshape(interval, (y_pred.shape[0],))
    mask, count = _mask_and_count(y_true)
    mae = jnp.sum(jnp.abs(mask * (y_true - y_pred)), axis=(1, 2, 3))
    return jnp.sum((mae / interval) / count)


def original_loss(y_true, y_pred, interval):
    """(reference: loss.py:15-28)"""
    return non_zero_mean_absolute_diff(y_true, y_pred, interval)


def power_loss(y_true, y_pred, interval, alpha: float, beta: float,
               no_interval_norm: bool = False):
    """(reference: loss.py:31-90)"""
    interval = jnp.reshape(interval, (y_pred.shape[0],))
    mask, count = _mask_and_count(y_true)

    if beta == 0.0:
        denominator = count[:, None, None, None]
    else:
        denominator = jnp.power(y_true + 1e-9, beta) * count[:, None, None, None]

    epsilon = 0.005 * y_true
    numerator = jnp.abs(y_true - y_pred) + epsilon
    if alpha != 1.0:
        numerator = jnp.power(numerator, alpha)
    numerator = numerator * mask
    loss = jnp.sum(numerator / denominator, axis=(1, 2, 3))

    mean_true_depth = jnp.sum(y_true * mask) / count
    if no_interval_norm:
        normalization = jnp.power(mean_true_depth, beta)
    else:
        normalization = 10.0 * jnp.power(mean_true_depth, beta) / jnp.power(interval, alpha)
    return jnp.sum(loss * normalization)


def gaussian_loss(y_true, y_pred, interval, eta: float):
    """(reference: loss.py:93-131)"""
    mask, count = _mask_and_count(y_true)
    sigma = eta * y_true + 1e-6
    error = (y_true - y_pred) * mask
    x = -jnp.power(error / sigma, 2.0) / 2.0
    loss = -jnp.exp(x)
    return jnp.sum(jnp.sum(loss) / count)


def gradient_loss(y_true, y_pred, log: bool = True):
    """Log-gradient-difference loss over spatial axes
    (intended behavior of reference loss.py:134-159; see module docstring).

    y_true/y_pred: (B, H, W, 1).
    """
    mask = (y_true != 0.0).astype(jnp.float32)
    num_valid = jnp.sum(mask)
    diff = y_true - y_pred

    v_grad = diff[:, :-2, :] - diff[:, 2:, :]
    v_mask = mask[:, :-2, :] * mask[:, 2:, :]
    v_grad = jnp.abs(v_grad * v_mask)

    h_grad = diff[:, :, :-2] - diff[:, :, 2:]
    h_mask = mask[:, :, :-2] * mask[:, :, 2:]
    h_grad = jnp.abs(h_grad * h_mask)

    if log:
        v_grad = jnp.log(1.0 + v_grad)
        h_grad = jnp.log(1.0 + h_grad)
    return (jnp.sum(v_grad) + jnp.sum(h_grad)) / num_valid


def less_one_percentage(y_true, y_pred, interval):
    """Fraction of valid pixels with |err| <= 1 interval (loss.py:162-173)."""
    return _less_x_percentage(y_true, y_pred, interval, 1.0)


def less_three_percentage(y_true, y_pred, interval):
    """(reference: loss.py:176-187)"""
    return _less_x_percentage(y_true, y_pred, interval, 3.0)


def _less_x_percentage(y_true, y_pred, interval, x: float):
    interval = jnp.reshape(interval, (y_pred.shape[0],))[:, None, None, None]
    mask = (y_true != 0.0).astype(jnp.float32)
    denom = jnp.abs(jnp.sum(mask)) + 1e-6
    abs_diff = jnp.abs(y_true - y_pred) / interval
    good = mask * (abs_diff <= x).astype(jnp.float32)
    return jnp.sum(good) / denom


def mvsnet_regression_loss(estimated_depth, depth_image, depth_start, depth_end,
                           loss_type: str = "original", alpha: float = 1.0,
                           beta: float = 0.0, eta: float = 0.02,
                           grad_loss: bool = True):
    """Loss + <1px/<3px with the fixed (end-start)/191 interval
    (reference: loss.py:190-220).

    Returns (loss, less_one, less_three, debug) where debug is the gradient
    loss term (or 0) — mirroring the reference's debug-tensor plumbing.
    """
    depth_interval = (depth_end - depth_start) / 191.0
    if loss_type == "original":
        loss = original_loss(depth_image, estimated_depth, depth_interval)
    elif loss_type == "power":
        loss = power_loss(depth_image, estimated_depth, depth_interval, alpha, beta)
    elif loss_type == "gaussian":
        loss = gaussian_loss(depth_image, estimated_depth, depth_interval, eta)
    else:
        raise NotImplementedError(loss_type)

    debug = jnp.zeros(())
    if grad_loss:
        gamma = 0.5
        g = gradient_loss(depth_image, estimated_depth)
        loss = loss + gamma * g
        debug = g

    less_one = less_one_percentage(depth_image, estimated_depth, depth_interval)
    less_three = less_three_percentage(depth_image, estimated_depth, depth_interval)
    return loss, less_one, less_three, debug


def mvsnet_classification_loss(prob_volume, gt_depth_image, depth_num: int,
                               depth_start, depth_interval):
    """R-MVSNet cross-entropy + WTA metrics (reference: loss.py:223-267).

    Args:
      prob_volume: (B, D, H, W) softmax probabilities.
      gt_depth_image: (B, H, W, 1).
      depth_start, depth_interval: (B,).
    Returns (xent, masked_mae, less_one, less_three, wta_depth_map).
    """
    B = gt_depth_image.shape[0]
    mask = (gt_depth_image != 0.0).astype(jnp.float32)
    valid = jnp.sum(mask, axis=(1, 2, 3)) + 1e-7

    start = jnp.reshape(depth_start, (B, 1, 1, 1))
    interval = jnp.reshape(depth_interval, (B, 1, 1, 1))
    gt_index = (gt_depth_image - start) / interval
    gt_index = mask * gt_index
    gt_index = jnp.round(gt_index).astype(jnp.int32)[..., 0]      # (B, H, W)
    gt_index = jnp.clip(gt_index, 0, depth_num - 1)

    # cross entropy: -log p at the gt bucket (one_hot * log prob summed)
    logp = jnp.log(jnp.clip(prob_volume, 1e-20, None))            # (B, D, H, W)
    picked = jnp.take_along_axis(logp, gt_index[:, None], axis=1)[:, 0]
    xent_image = -picked[..., None] * mask
    xent = jnp.sum(jnp.sum(xent_image, axis=(1, 2, 3)) / valid)

    wta_index = jnp.argmax(prob_volume, axis=1).astype(jnp.float32)[..., None]
    wta_depth = wta_index * interval + start

    abs_interval = jnp.abs(interval[..., 0, 0, 0])
    masked_mae = non_zero_mean_absolute_diff(gt_depth_image, wta_depth, abs_interval)
    less_one = less_one_percentage(gt_depth_image, wta_depth, abs_interval)
    less_three = less_three_percentage(gt_depth_image, wta_depth, abs_interval)
    return xent, masked_mae, less_one, less_three, wta_depth
