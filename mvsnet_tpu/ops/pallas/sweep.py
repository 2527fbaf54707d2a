"""Plane-sweep homography warp as one-hot banded matmuls (Pallas TPU).

Why not gather: TPU has no fast vectorized gather, and Mosaic/Pallas does
not lower `jnp.take` at all. The XLA fallback (ops/warp.py) pays ~1 row per
cycle on its gathers — the dominant cost of MVSNet inference.

Kernel idea: bilinear warping of one output row is a *banded linear map* of
a handful of source rows:

  out[y] = sum_r  M_{y,r}^T @ src[r]
  M_{y,r}[j, x] = rowweight_r(x) * ( [j == x0(x)] (1-fx(x)) + [j == x0(x)+1] fx(x) )
  rowweight_r(x) = [r == r0(x)] (1-fy(x)) + [r == r0(x)+1] fy(x)

The one-hot matrices are built in-register from broadcasted iota compares
(VPU) and immediately contracted on the MXU against source rows resident in
VMEM — the whole 1/4-resolution feature map (e.g. 216x288x32 bf16 ~ 4 MB)
fits in VMEM, so source rows are register-speed. The band [min r0, max r0+1]
per output row is walked with a dynamic fori_loop, so cost scales with the
actual vertical shear of the homography (~2-6 rows for plane sweeps)
instead of the worst case.

The one-hot index j lives on SUBLANES and the output pixel x on LANES
(M stored transposed, contraction over dim 0 of both operands) so all
block shapes satisfy Mosaic's (8,128)-divisible-or-full constraint.

Zero-fill out-of-image semantics match tf.contrib.image.transform
(reference: homography_warping.py:211-253) exactly: out-of-range taps get
zero weight in the one-hot construction.

Grid: (D, h/ROWS_PER_CELL); the source block's index map is constant so
Pallas keeps it in VMEM across the whole sweep (fetched once).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvsnet_tpu.ops.warp import projected_coords

ROWS_PER_CELL = 8


def _row_warp(src_view_fn, xrow, yrow, iota_i, H, W, C, src_dtype):
    """Warp one output row: returns (W, C) f32.

    src_view_fn(r) must return source row r as (W, C).
    xrow/yrow: (1, W) f32 source coords for this output row.
    iota_i: (W, W) int32 iota along dim 0 (the one-hot j axis, on sublanes).
    """
    x0f = jnp.floor(xrow)
    fx = xrow - x0f
    r0f = jnp.floor(yrow)
    fy = yrow - r0f
    x0 = x0f.astype(jnp.int32)
    r0 = r0f.astype(jnp.int32)

    in_x0 = (x0 >= 0) & (x0 < W)
    in_x1 = (x0 + 1 >= 0) & (x0 + 1 < W)
    # transposed one-hot: wx[j, x] — j on sublanes, output pixel x on lanes
    wx = (jnp.where((iota_i == x0) & in_x0, 1.0 - fx, 0.0)
          + jnp.where((iota_i == (x0 + 1)) & in_x1, fx, 0.0))    # (W, W)

    rmin = jnp.maximum(jnp.min(r0), 0)
    rmax = jnp.minimum(jnp.max(r0) + 1, H - 1)

    # f32 sources get full-precision MXU passes (the default would silently
    # run bf16 and cost ~0.3% error); bf16 sources use the fast path.
    precision = (jax.lax.Precision.HIGHEST if src_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    def body(r, acc):
        roww = (jnp.where(r0 == r, 1.0 - fy, 0.0)
                + jnp.where(r0 == (r - 1), fy, 0.0))             # (1, W)
        m = (roww * wx).astype(src_dtype)                        # (W, W) [j, x]
        srow = src_view_fn(r)                                    # (W, C) [j, c]
        # contract j (dim 0 of both): out[x, c]
        return acc + jax.lax.dot_general(
            m, srow, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    return jax.lax.fori_loop(rmin, rmax + 1, body,
                             jnp.zeros((W, C), jnp.float32))


def _sweep_kernel(x_ref, y_ref, src_ref, out_ref):
    """One (depth, row-block) cell of the plain warp.

    x_ref/y_ref: (1, ROWS, W) f32 source coords.
    src_ref: (H, W, C) source features (whole map, VMEM-resident).
    out_ref: (1, ROWS, W, C) warped output rows.
    """
    H, W, C = src_ref.shape
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)

    def src_row(r):
        return src_ref[pl.ds(r, 1), :, :].reshape(W, C)

    for y in range(ROWS_PER_CELL):
        acc = _row_warp(src_row, x_ref[0, y:y + 1, :], y_ref[0, y:y + 1, :],
                        iota_i, H, W, C, src_ref.dtype)
        out_ref[0, y, :, :] = acc.astype(out_ref.dtype)


def _make_cost_kernel(view_count_minus_1: int):
    """Fused kernel: per (depth, row-block), warp every source view row and
    accumulate the across-view variance with the reference included —
    cost = E[f^2] - E[f]^2 (reference: model.py:314-334) — entirely in
    VMEM/registers. No per-view warped volumes ever touch HBM.
    """

    def kernel(x_ref, y_ref, ref_ref, views_ref, out_ref):
        # x/y: (Vm1, 1, ROWS, W); ref: (H, W, C); views: (Vm1, H, W, C)
        # out: (1, ROWS, W, C)
        H, W, C = ref_ref.shape
        view_num = view_count_minus_1 + 1
        rb = pl.program_id(1)
        iota_i = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)

        for y in range(ROWS_PER_CELL):
            ref_row = ref_ref[pl.ds(rb * ROWS_PER_CELL + y, 1), :, :]
            ref_row = ref_row.reshape(W, C).astype(jnp.float32)
            s = ref_row
            s2 = ref_row * ref_row

            for v in range(view_count_minus_1):
                def src_row(r, v=v):
                    return views_ref[v, pl.ds(r, 1), :, :].reshape(W, C)

                warped = _row_warp(src_row, x_ref[v, 0, y:y + 1, :],
                                   y_ref[v, 0, y:y + 1, :], iota_i,
                                   H, W, C, ref_ref.dtype)
                s = s + warped
                s2 = s2 + warped * warped

            mean = s / view_num
            cost = s2 / view_num - mean * mean
            out_ref[0, y, :, :] = cost.astype(out_ref.dtype)

    return kernel


def pallas_sweep_supported(height: int, width: int, channels: int,
                           dtype=jnp.bfloat16) -> bool:
    """Whether the kernel's VMEM-residency / tiling assumptions hold."""
    src_bytes = height * width * channels * jnp.dtype(dtype).itemsize
    onehot_bytes = width * width * 4 * 2
    out_bytes = ROWS_PER_CELL * width * channels * 4
    budget = 100 * 2 ** 20 if jax.default_backend() == "cpu" else 12 * 2 ** 20
    return (height % ROWS_PER_CELL == 0
            and width % 8 == 0
            and src_bytes + onehot_bytes + out_bytes < budget)


def pallas_cost_supported(height: int, width: int, channels: int,
                          view_count_minus_1: int, dtype=jnp.bfloat16) -> bool:
    src_bytes = (view_count_minus_1 + 1) * height * width * channels * jnp.dtype(dtype).itemsize
    work_bytes = width * width * 4 * 2 + 3 * ROWS_PER_CELL * width * channels * 4
    # 14 MiB: V=3 at the 1152x864 operating point (12.9 MiB) measured to fit
    # alongside the double-buffered blocks; V>=4 falls back to the per-view
    # warp kernel (one source map resident at a time).
    budget = 100 * 2 ** 20 if jax.default_backend() == "cpu" else 14 * 2 ** 20
    return (height % ROWS_PER_CELL == 0
            and width % 8 == 0
            and src_bytes + work_bytes < budget)


def _coords_by_cell(homographies, H, W):
    """(D,3,3) -> x, y as (D, H, W) f32."""
    x, y = projected_coords(homographies, H, W)
    D = homographies.shape[0]
    return x.reshape(D, H, W), y.reshape(D, H, W)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_warp_all_depths(img, homographies, interpret: bool = False):
    """Warp (H, W, C) by (D, 3, 3) homographies -> (D, H, W, C).

    Drop-in for ops.cost_volume._warp_all_depths (zero-fill bilinear).
    """
    H, W, C = img.shape
    D = homographies.shape[0]
    assert H % ROWS_PER_CELL == 0, (H, ROWS_PER_CELL)

    x, y = _coords_by_cell(homographies, H, W)

    grid = (D, H // ROWS_PER_CELL)
    return pl.pallas_call(
        _sweep_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ROWS_PER_CELL, W),
                         lambda d, rb: (d, rb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS_PER_CELL, W),
                         lambda d, rb: (d, rb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W, C), lambda d, rb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS_PER_CELL, W, C),
                               lambda d, rb: (d, rb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, H, W, C), img.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * D * H * 4 * W * W * C,   # ~4-row bands
            bytes_accessed=(D * H * W * C * img.dtype.itemsize
                            + H * W * C * img.dtype.itemsize
                            + 2 * D * H * W * 4),
            transcendentals=0,
        ),
    )(x, y, img)


def _transpose_kernel(x_ref, y_ref, g_ref, out_ref):
    """Transposed warp (the VJP of _sweep_kernel wrt the source image).

    Per (depth, row-block) grid cell, scatter the block's output-row
    cotangents back through the SAME one-hot banded matrices, transposed —
    accumulating into the (H, W, C) cotangent block, whose constant index
    map persists across the (sequential) grid.

    x_ref/y_ref: (1, ROWS, W) coords; g_ref: (1, ROWS, W, C) cotangent
    rows; out_ref: (H, W, C) f32 accumulator.
    """
    H, W, C = out_ref.shape
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    iota_i = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)

    for y in range(ROWS_PER_CELL):
        xrow = x_ref[0, y:y + 1, :]
        yrow = y_ref[0, y:y + 1, :]
        x0f = jnp.floor(xrow)
        fx = xrow - x0f
        r0f = jnp.floor(yrow)
        fy = yrow - r0f
        x0 = x0f.astype(jnp.int32)
        r0 = r0f.astype(jnp.int32)
        in_x0 = (x0 >= 0) & (x0 < W)
        in_x1 = (x0 + 1 >= 0) & (x0 + 1 < W)
        wx = (jnp.where((iota_i == x0) & in_x0, 1.0 - fx, 0.0)
              + jnp.where((iota_i == (x0 + 1)) & in_x1, fx, 0.0))  # (W, W) [j, x]

        g_row = g_ref[0, y, :, :].astype(jnp.float32)              # (W, C) [x, c]
        rmin = jnp.maximum(jnp.min(r0), 0)
        rmax = jnp.minimum(jnp.max(r0) + 1, H - 1)

        def body(r, _):
            roww = (jnp.where(r0 == r, 1.0 - fy, 0.0)
                    + jnp.where(r0 == (r - 1), fy, 0.0))           # (1, W) over x
            m = roww * wx                                          # (W, W) [j, x]
            # d_src[r, j, c] += sum_x m[j, x] g[x, c]
            contrib = jax.lax.dot_general(
                m, g_row, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[pl.ds(r, 1), :, :] += contrib[None]
            return 0

        jax.lax.fori_loop(rmin, rmax + 1, body, 0)


@functools.partial(jax.jit, static_argnames=("H", "W", "C", "interpret"))
def _pallas_warp_transpose(g, homographies, H, W, C, interpret: bool = False):
    """dL/dsrc for the all-depths warp: (D, H, W, C) cotangent -> (H, W, C)."""
    D = homographies.shape[0]
    x, y = _coords_by_cell(homographies, H, W)
    out = pl.pallas_call(
        _transpose_kernel,
        grid=(D, H // ROWS_PER_CELL),
        in_specs=[
            pl.BlockSpec((1, ROWS_PER_CELL, W), lambda d, rb: (d, rb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS_PER_CELL, W), lambda d, rb: (d, rb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS_PER_CELL, W, C), lambda d, rb: (d, rb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, W, C), lambda d, rb: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, C), jnp.float32),
        interpret=interpret,
    )(x, y, g)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_warp_all_depths_ad(img, homographies, interpret: bool = False):
    """Differentiable Pallas warp: custom VJP via the transposed-warp kernel.

    The warp is linear in `img`, so the VJP is exact (the same one-hot
    matrices, transposed). Homography/camera cotangents are NOT propagated
    (cameras are data in every training path; a zero tangent is returned).
    """
    return pallas_warp_all_depths(img, homographies, interpret=interpret)


def _warp_ad_fwd(img, homographies, interpret):
    out = pallas_warp_all_depths(img, homographies, interpret=interpret)
    # dtype token: residuals must be JAX values
    return out, (homographies, jnp.zeros((), img.dtype))


def _warp_ad_bwd(interpret, residuals, g):
    homographies, dtype_token = residuals
    _, H, W, C = g.shape
    d_img = _pallas_warp_transpose(g, homographies, H, W, C, interpret=interpret)
    return d_img.astype(dtype_token.dtype), jnp.zeros_like(homographies)


pallas_warp_all_depths_ad.defvjp(_warp_ad_fwd, _warp_ad_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_sweep_cost_volume(ref_feature, view_features, homographies,
                             interpret: bool = False):
    """Fused variance cost volume for one batch element.

    Args:
      ref_feature: (H, W, C); view_features: (V-1, H, W, C);
      homographies: (V-1, D, 3, 3).
    Returns (D, H, W, C) cost in ref_feature.dtype.
    """
    H, W, C = ref_feature.shape
    Vm1, D = homographies.shape[:2]
    assert H % ROWS_PER_CELL == 0

    x, y = jax.vmap(lambda h_: _coords_by_cell(h_, H, W))(homographies)
    # (Vm1, D, H, W)

    grid = (D, H // ROWS_PER_CELL)
    return pl.pallas_call(
        _make_cost_kernel(Vm1),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Vm1, 1, ROWS_PER_CELL, W),
                         lambda d, rb: (0, d, rb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vm1, 1, ROWS_PER_CELL, W),
                         lambda d, rb: (0, d, rb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W, C), lambda d, rb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Vm1, H, W, C), lambda d, rb: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS_PER_CELL, W, C),
                               lambda d, rb: (d, rb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, H, W, C), ref_feature.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * D * H * 4 * W * W * C * Vm1,
            bytes_accessed=(D * H * W * C * ref_feature.dtype.itemsize
                            + (Vm1 + 1) * H * W * C * ref_feature.dtype.itemsize),
            transcendentals=0,
        ),
    )(x, y, ref_feature, view_features)
