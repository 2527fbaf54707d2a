"""Differentiable homography warping (bilinear, zero-fill).

Replaces the reference's two warp paths:
  * `tf_transform_homography` — tf.contrib.image.transform, bilinear,
    out-of-image taps filled with 0 (reference: homography_warping.py:211-253).
    This was the production path ("2x faster", README.md:229-230) and is the
    semantics implemented here.
  * `homography_warping` — manual gather warp with *clamped* border
    coordinates (reference: homography_warping.py:108-210), available via
    `fill_mode="edge"` for parity experiments.

Coordinate conventions: the homographies are built for *image* coordinates
(pixel center at integer + 0.5). We evaluate H at (x+0.5, y+0.5, 1) for the
pixel grid and subtract 0.5 from the projected result to return to pixel
coordinates before sampling — the same fixup tf_transform_homography encodes
into its 8-parameter form (reference: homography_warping.py:213-234).

TPU notes: sampling is expressed as a flat row-gather from (HW, C) feature
matrices: XLA lowers this to a dynamic-gather on sublanes which keeps the C
axis vectorized on lanes. The per-tap zero-fill mask folds into the bilinear
weights, so out-of-view handling costs nothing extra. For the fused
warp+variance cost-volume path see ops/pallas/sweep.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pixel_grid(height: int, width: int, dtype):
    """Homogeneous image-coordinate grid, shape (3, H*W): rows x+0.5, y+0.5, 1."""
    x = jnp.arange(width, dtype=dtype) + 0.5
    y = jnp.arange(height, dtype=dtype) + 0.5
    xx, yy = jnp.meshgrid(x, y)                       # (H, W)
    ones = jnp.ones_like(xx)
    return jnp.stack([xx.ravel(), yy.ravel(), ones.ravel()], axis=0)


def projected_coords(homography, height: int, width: int, eps: float = 1e-7):
    """Project the ref pixel grid through H.

    Args:
      homography: (..., 3, 3) image-coordinate homography.
    Returns:
      (x, y): each (..., H*W) source *pixel* coordinates (centers at integers).

    Coordinate math is forced to f32: bf16 cannot represent sub-pixel
    positions at image scale (~0.5 px error at x~300), which silently
    destroys cost-volume quality.
    """
    dtype = jnp.promote_types(homography.dtype, jnp.float32)
    homography = homography.astype(dtype)
    grid = _pixel_grid(height, width, dtype)          # (3, HW)
    uvw = homography @ grid                           # (..., 3, HW)
    w = uvw[..., 2, :]
    w = jnp.where(jnp.abs(w) < eps, jnp.where(w < 0, -eps, eps), w)
    x = uvw[..., 0, :] / w - 0.5
    y = uvw[..., 1, :] / w - 0.5
    return x, y


def bilinear_sample_pairs(image, x, y):
    """Bilinear sample with zero-fill using two (1,2,C)-slice gathers.

    Fetches each (y, x0..x0+1) horizontal pair in ONE lax.gather slice (the
    taps are adjacent in memory), halving gather count vs the 4-tap form —
    the dominant cost of the plane sweep on TPU.

    Args:
      image: (H, W, C); x, y: (N,) pixel coords.
    Returns (N, C), out-of-image taps contributing 0.
    """
    H, W, C = image.shape
    compute_dtype = image.dtype
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f).astype(compute_dtype)[:, None]
    fy = (y - y0f).astype(compute_dtype)[:, None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    # Slice start clamped so the 2-wide window stays in-bounds; the positions
    # of taps x0 / x0+1 inside the window are tracked explicitly.
    xs = jnp.clip(x0, 0, max(W - 2, 0))
    pos0 = x0 - xs           # position of tap x0 in the window (valid iff 0/1)
    pos1 = x0 + 1 - xs       # position of tap x0+1

    def row_pair(yi):
        """(N, 2, C) window [xs, xs+1] on row yi."""
        yc = jnp.clip(yi, 0, H - 1)
        starts = jnp.stack([yc, xs], axis=-1)                      # (N, 2)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))
        return jax.lax.gather(
            image, starts, dnums, slice_sizes=(1, 2, C),
            mode=jax.lax.GatherScatterMode.CLIP)                   # (N, 2, C)

    top = row_pair(y0)
    bot = row_pair(y0 + 1)

    zero = jnp.zeros((), compute_dtype)
    x0_in = (x0 >= 0) & (x0 < W)
    x1_in = (x0 + 1 >= 0) & (x0 + 1 < W)
    y0_in = (y0 >= 0) & (y0 < H)
    y1_in = (y0 + 1 >= 0) & (y0 + 1 < H)

    def pick(window, pos, valid):
        v = jnp.where((pos == 1)[:, None], window[:, 1], window[:, 0])
        return jnp.where(valid[:, None], v, zero)

    v00 = pick(top, pos0, x0_in & y0_in)
    v01 = pick(top, pos1, x1_in & y0_in)
    v10 = pick(bot, pos0, x0_in & y1_in)
    v11 = pick(bot, pos1, x1_in & y1_in)

    one = jnp.asarray(1, compute_dtype)
    return ((one - fy) * ((one - fx) * v00 + fx * v01)
            + fy * ((one - fx) * v10 + fx * v11))


def bilinear_sample(image, x, y, fill_mode: str = "zeros"):
    """Bilinear sample `image` (H, W, C) at pixel coords x, y (each (N,)).

    fill_mode:
      "zeros": taps outside the image contribute 0 (tf.contrib.image.transform).
      "edge":  coordinates clamped to the border (reference manual warp,
               homography_warping.py:146-149).
    Returns (N, C).
    """
    if fill_mode == "zeros":
        return bilinear_sample_pairs(image, x, y)
    H, W, C = image.shape
    compute_dtype = image.dtype
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(compute_dtype)[:, None]
    fy = (y - y0).astype(compute_dtype)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = image.reshape(H * W, C)

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        vals = jnp.take(flat, yc * W + xc, axis=0)    # (N, C) row gather
        if fill_mode == "zeros":
            vals = jnp.where(inb[:, None], vals, jnp.zeros_like(vals))
        return vals

    if fill_mode == "edge":
        x0i = jnp.clip(x0i, 0, W - 1)
        y0i = jnp.clip(y0i, 0, H - 1)
        x1i = jnp.clip(x0i + 1, 0, W - 1)
        y1i = jnp.clip(y0i + 1, 0, H - 1)
        v00 = tap(y0i, x0i)
        v01 = tap(y0i, x1i)
        v10 = tap(y1i, x0i)
        v11 = tap(y1i, x1i)
    else:
        v00 = tap(y0i, x0i)
        v01 = tap(y0i, x0i + 1)
        v10 = tap(y0i + 1, x0i)
        v11 = tap(y0i + 1, x0i + 1)

    one = jnp.asarray(1, compute_dtype)
    return ((one - fy) * ((one - fx) * v00 + fx * v01)
            + fy * ((one - fx) * v10 + fx * v11))


def homography_warp(image, homography, fill_mode: str = "zeros"):
    """Warp (B, H, W, C) by per-batch homography (B, 3, 3).

    output[b, y, x] = image[b] sampled at H_b * (x+0.5, y+0.5, 1).
    """
    B, H, W, C = image.shape

    def one(img, hom):
        x, y = projected_coords(hom, H, W)
        return bilinear_sample(img, x, y, fill_mode).reshape(H, W, C)

    return jax.vmap(one)(image, homography)


def warp_by_homographies(image, homographies, fill_mode: str = "zeros"):
    """Warp one image by many homographies (the plane sweep).

    Args:
      image: (B, H, W, C) source feature map.
      homographies: (B, D, 3, 3).
    Returns:
      (B, D, H, W, C) warped stack. Prefer the scanned cost-volume builder
      over materializing this for large D.
    """
    B, H, W, C = image.shape

    def one(img, homs):                               # (H,W,C), (D,3,3)
        x, y = projected_coords(homs, H, W)           # (D, HW)
        samp = jax.vmap(lambda xs, ys: bilinear_sample(img, xs, ys, fill_mode))(x, y)
        return samp.reshape(-1, H, W, C)

    return jax.vmap(one)(image, homographies)
