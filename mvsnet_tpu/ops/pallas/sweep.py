"""Plane-sweep homography warp as banded tent matmuls (Pallas TPU).

Why not gather: TPU has no fast vectorized gather, and Mosaic/Pallas does
not lower `jnp.take` at all. The XLA fallback (ops/warp.py) pays ~1 row per
cycle on its gathers — the dominant cost of MVSNet inference.

Kernel idea: bilinear zero-fill warping of one output row is a *banded
linear map* of a static block of BAND source rows:

  out[x, c] = sum_r rw[r, x] * hw[x, r, c]
  hw[x, r, c] = sum_j wx[j, x] * src[rbase + r, j, c]
  wx[j, x] = relu(1 - |j - x_src(x)|)          (horizontal tent)
  rw[r, x] = relu(1 - |(rbase + r) - y_src(x)|)  (vertical tent)

The tent form *is* zero-fill bilinear exactly: for fractional coordinates
it reproduces the (1-f, f) two-tap weights, and any tap outside [0, N-1]
simply never appears as an in-range one-hot column, contributing 0 — the
tf.contrib.image.transform semantics (reference: homography_warping.py:
211-253) with no masks at all.

The hw contraction is ONE MXU matmul per output row with
N = BAND*C lanes (128/256 for C=16/32 at BAND=8): the source band rows are
lane-concatenated into a (W, BAND*C) operand, so the matmul fills the MXU
instead of wasting 3/4 of its lanes on a (W, C<=32) output. The vertical
combine is a cheap VPU weighted sum. Round 1 instead folded the vertical
weight into the one-hot matrix and walked a *dynamic* band with one
(W, W) @ (W, C) matmul per band row — 25% lane utilization and a
pipeline-stalling data-dependent loop; this layout removed both.

rbase = clamp(min floor(y_src), 0, H-BAND) covers the whole row's vertical
taps whenever the in-row shear is < BAND-1; a data-dependent fori_loop
adds further masked BAND-row blocks for rows that shear more. Realistic
rigs DO exceed BAND=8 routinely (the 3DCNN bench rig reaches in-row spans
of 22 with mean 9), so the extra blocks are a real cost — about +60%
matmuls at that operating point — not a cold path.

Two fused cost kernels implement this decomposition:

  * the slab-table kernel (_make_cost_kernel_preload): source
    views are pre-concatenated XLA-side into (H, W, BAND*C) tables,
    preloaded once into persistent VMEM scratch by a single DMA; the
    matmul outputs (BAND*C, x) so the vertical combine is sublane-aligned;
    band starts come precomputed via SMEM. Measured (v5e, 216x288x32,
    D=192, V=3, bf16): 94.7 ms realistic rig / 58.9 ms trivial rig.
  * the block-resident kernel (_make_cost_kernel, higher V or huge H*W):
    whole source maps live in VMEM blocks and each band is assembled by
    an 8-way lane-concat, with the matmul outputting (x, BAND*C) and a
    lane-sliced combine. Slower (242.8/170.9 ms at the same point) but
    needs only the raw feature maps resident.

In both, the one-hot index j lives on SUBLANES and all shapes satisfy
Mosaic's (8,128)-divisible-or-full constraint.

Grid: (D, h/ROWS_PER_CELL).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvsnet_tpu.ops.warp import projected_coords

import os as _os

ROWS_PER_CELL = 8
# Vertical band granularity (env-tunable for experiments). Measured at
# the 3DCNN point (span mean 9.1): BAND=8 94.6 ms, BAND=4 120.5 ms —
# fewer, larger vertical blocks beat finer ones despite ~20% more padded
# MXU slots, because per-block overheads (slab read, tent build, loop
# step) dominate; BAND=16 would blow the preload VMEM scratch.
BAND = int(_os.environ.get("MVSNET_TPU_SWEEP_BAND", "8"))
# A/B knob: restore the fully dynamic vertical-band loop (pre straight-line
# second block) to isolate the pipeline-stall fix on chip. At BAND >= 12
# one block already covers the realistic span range (single-row mean 9.1,
# pair union ~11 at the 3DCNN rig -> nextra==0 for most rows), so the
# unconditional second block would be pure waste — BAND >= 12 runs
# single-block + zero-trip residual loop instead. BAND=12 x 1 block is
# 25% fewer MXU taps than BAND=8 x 2 blocks, and (unlike the BAND=16
# experiment, which lost 130.5 vs 97.3 ms) its slab tables still fit
# VMEM un-chunked at the 3DCNN point under the 112 MiB limit, so the
# horizontal tents are built once, not per C-chunk.
_STATIC2 = (not _os.environ.get("MVSNET_TPU_SWEEP_DYNBAND")) and BAND < 12
# A/B knob: build the horizontal tent's elementwise tail (abs / 1- / max)
# in the slab dtype (bf16) instead of f32. The SUBTRACTION cols - x stays
# f32 always (bf16 coords at |x|~W have ulp 1.0 — they destroy the tent);
# only the already-small difference d (tent support is |d| < 1) is
# downcast before the tail. Today the tent is computed in f32 and cast to
# bf16 at the end, so the weights are bf16-rounded either way — this just
# moves the cast before the 3 cheap ops. Win iff the VPU runs packed
# bf16 elementwise at ~2x f32 rate (native bf16 tile is (16,128)).
_TENT16 = bool(int(_os.environ.get("MVSNET_TPU_SWEEP_TENT16", "0")))


def _tent_cols(cols_f32, x_f32, dtype):
    """max(0, 1 - |cols - x|) with the sub in f32, tail in `dtype`."""
    d = cols_f32 - x_f32
    if _TENT16 and dtype != jnp.float32:
        d = d.astype(dtype)
        return jnp.maximum(jnp.asarray(0, dtype),
                           jnp.asarray(1, dtype) - jnp.abs(d))
    return jnp.maximum(0.0, 1.0 - jnp.abs(d)).astype(dtype)

# v5e/v5p have 128 MiB VMEM per core; the compiler's default scoped-vmem
# limit is 16 MiB, far below hardware. Raising it lets the fused kernel keep
# ALL source view maps resident (V=5 at the 1152x864 point is ~26 MiB
# double-buffered) instead of falling back at V>=4. 112 MiB leaves 16 MiB
# for the streamed x/y/reft/out blocks (~1 MiB double-buffered at the
# bench points) and admits the BAND=12 slab tables (95.5 MB at 216x288
# C32 V3) without C-chunking.
_VMEM_LIMIT = 112 * 2 ** 20
_PARALLEL2 = pltpu.CompilerParams(dimension_semantics=("parallel", "parallel"),
                                  vmem_limit_bytes=_VMEM_LIMIT)
_ARBITRARY2 = pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary"),
                                   vmem_limit_bytes=_VMEM_LIMIT)
# experiment knob: parallel-D semantics for the preload kernel (cells still
# run row-major on the one core, so the (0,0) preload-DMA guard holds, but
# Mosaic may pipeline cross-cell block transfers more aggressively)
if _os.environ.get("MVSNET_TPU_SWEEP_PARSEM"):
    _ARBITRARY2 = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=_VMEM_LIMIT)


def _precision_for(src_dtype):
    # f32 sources get full-precision MXU passes (the default would silently
    # run bf16 and cost ~0.3% error); bf16 sources use the fast path.
    return (jax.lax.Precision.HIGHEST if src_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _band_starts(ycol, H):
    """Vertical band decomposition for one output row.

    ycol: (W, 1) f32 source y coordinates.
    Returns (rbase, nextra): first BAND-block start (int32 scalar, clamped
    to [0, H-BAND]) and how many further blocks are needed to cover all
    in-image taps (0 in practice).
    """
    r0f = jnp.floor(ycol)
    rlo = jnp.clip(jnp.min(r0f), 0.0, float(H - 1))
    rhi = jnp.clip(jnp.max(r0f) + 1.0, 0.0, float(H - 1))
    rbase = jnp.minimum(rlo.astype(jnp.int32), H - BAND)
    nextra = (rhi.astype(jnp.int32) - rbase) // BAND
    return rbase, nextra


def _warp_row(src_band_fn, xrow, ycol, iota_j, iota_b, H, W, C, src_dtype):
    """Warp one output row: returns (W, C) f32.

    src_band_fn(start) must return rows [start, start+BAND) lane-concatenated
    as (W, BAND*C).
    xrow: (1, W) f32 source x coords; ycol: (W, 1) f32 source y coords.
    iota_j: (W, W) f32 iota along dim 0 (source column j, on sublanes).
    iota_b: (W, BAND) f32 iota along dim 1 (band row index, on lanes).
    """
    precision = _precision_for(src_dtype)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(iota_j - xrow)).astype(src_dtype)
    rbase, nextra = _band_starts(ycol, H)

    def block(start, masked):
        rows = start.astype(jnp.float32) + iota_b                   # (W, BAND)
        rw = jnp.maximum(0.0, 1.0 - jnp.abs(rows - ycol))           # (W, BAND)
        if masked is not None:
            lo, hi = masked
            keep = (rows >= lo.astype(jnp.float32)) & (rows <= hi.astype(jnp.float32))
            rw = jnp.where(keep, rw, 0.0)
        cat = src_band_fn(start)                                    # (W, BAND*C)
        hw = jax.lax.dot_general(
            wx, cat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)  # (W, BAND*C)
        acc = jnp.zeros((W, C), jnp.float32)
        for r in range(BAND):
            acc = acc + rw[:, r:r + 1] * hw[:, r * C:(r + 1) * C]
        return acc

    # Straight-line second vertical block (exact zero when unneeded — the
    # tent mask kills it): realistic rigs exceed BAND-1 spans routinely,
    # and removing the data-dependent loop from the hot path lets Mosaic
    # pipeline the two matmuls (same rationale as the preload kernel).
    out = block(rbase, None)
    if _STATIC2:
        lo1 = rbase + BAND
        out = out + block(jnp.minimum(lo1, H - BAND),
                          (lo1, lo1 + (BAND - 1)))

    def extra(k, acc):
        lo = rbase + k * BAND
        start = jnp.minimum(lo, H - BAND)
        return acc + block(start, (lo, lo + (BAND - 1)))

    # Engages only when the in-row vertical shear exceeds 2*BAND-2 rows
    # (never, for plane-sweep homographies of real rigs); zero-trip
    # otherwise.
    return jax.lax.fori_loop(2 if _STATIC2 else 1, nextra + 1, extra, out)


def _make_band_cat(src_slice_fn, W, C):
    """Rows [start, start+BAND) of a (H, W, C) ref, lane-concatenated."""
    def cat(start):
        return jnp.concatenate(
            [src_slice_fn(start + r) for r in range(BAND)], axis=1)
    return cat


def _sweep_kernel(x_ref, yt_ref, src_ref, out_ref):
    """One (depth, row-block) cell of the plain warp.

    x_ref: (1, ROWS, W) f32 source x coords.
    yt_ref: (1, 1, W, ROWS) f32 source y coords, block-transposed.
    src_ref: (H, W, C) source features (whole map, VMEM-resident).
    out_ref: (1, ROWS, W, C) warped output rows.
    """
    H, W, C = src_ref.shape
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0).astype(jnp.float32)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (W, BAND), 1).astype(jnp.float32)
    band_cat = _make_band_cat(
        lambda r: src_ref[pl.ds(r, 1), :, :].reshape(W, C), W, C)

    for y in range(ROWS_PER_CELL):
        acc = _warp_row(band_cat, x_ref[0, y:y + 1, :],
                        yt_ref[0, 0, :, y:y + 1],
                        iota_j, iota_b, H, W, C, src_ref.dtype)
        out_ref[0, y, :, :] = acc.astype(out_ref.dtype)


def _make_cost_kernel(view_count_minus_1: int):
    """Fused kernel: per (depth, row-block), warp every source view row and
    accumulate the across-view variance with the reference included —
    cost = E[f^2] - E[f]^2 (reference: model.py:314-334) — entirely in
    VMEM/registers. No per-view warped volumes ever touch HBM.
    """

    def kernel(x_ref, yt_ref, ref_ref, views_ref, out_ref):
        # x: (Vm1, 1, ROWS, W); yt: (Vm1, 1, 1, W, ROWS); ref: (Hl, W, C);
        # views: (Vm1, H, W, C); out: (1, ROWS, W, C).
        # H comes from the VIEWS (full source height): under the sharded
        # wrapper the ref block holds only this shard's rows while sources
        # stay full so the warp can read arbitrary rows.
        _, W, C = ref_ref.shape
        H = views_ref.shape[1]
        view_num = view_count_minus_1 + 1
        rb = pl.program_id(1)
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0).astype(jnp.float32)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (W, BAND), 1).astype(jnp.float32)

        for y in range(ROWS_PER_CELL):
            ref_row = ref_ref[pl.ds(rb * ROWS_PER_CELL + y, 1), :, :]
            ref_row = ref_row.reshape(W, C).astype(jnp.float32)
            s = ref_row
            s2 = ref_row * ref_row

            for v in range(view_count_minus_1):
                band_cat = _make_band_cat(
                    lambda r, v=v: views_ref[v, pl.ds(r, 1), :, :].reshape(W, C),
                    W, C)
                warped = _warp_row(band_cat, x_ref[v, 0, y:y + 1, :],
                                   yt_ref[v, 0, 0, :, y:y + 1], iota_j,
                                   iota_b, H, W, C, views_ref.dtype)
                s = s + warped
                s2 = s2 + warped * warped

            mean = s / view_num
            cost = s2 / view_num - mean * mean
            out_ref[0, y, :, :] = cost.astype(out_ref.dtype)

    return kernel


def _band_table(y, H):
    """Vectorized _band_starts over leading dims.

    y: (..., H, W) f32 source y coordinates.
    Returns (rbase, nextra): (..., H) int32 each.
    """
    r0f = jnp.floor(y)
    rlo = jnp.clip(jnp.min(r0f, axis=-1), 0.0, float(H - 1))
    rhi = jnp.clip(jnp.max(r0f, axis=-1) + 1.0, 0.0, float(H - 1))
    rbase = jnp.minimum(rlo.astype(jnp.int32), H - BAND)
    nextra = (rhi.astype(jnp.int32) - rbase) // BAND
    return rbase, nextra


def _band_cats_n(src, nb):
    """(H, W, C) -> (H, W, nb*C) band-concatenated slab table.

    cats[h][j, r*C + c] = src[h + r, j, c] (zero past the bottom edge), so
    the kernel's horizontal matmul operand for any band start is ONE
    contiguous dynamic row of this table — no in-kernel concat/relayout.
    """
    H, W, C = src.shape
    pad = jnp.pad(src, ((0, nb - 1), (0, 0), (0, 0)))
    sh = jnp.stack([pad[r:r + H] for r in range(nb)], axis=2)  # (H,W,nb,C)
    return sh.reshape(H, W, nb * C)


def _band_cats(src):
    return _band_cats_n(src, BAND)


def _make_cost_kernel_preload(view_count_minus_1: int, H: int, W: int,
                              NT: int, KBLK: int):
    """Fused warp+variance kernel, tiled slab-table edition.

    Structure (per output row, per view):
      * Source views are pre-concatenated into (H, W, BAND*C) slab tables
        (XLA-side, _band_cats) and preloaded ONCE into a persistent VMEM
        scratch by a single DMA at grid cell (0,0); a vertical band of any
        start is then one dynamic-index read.
      * The row is split into NT lane-tiles of TW = W/NT columns. Per
        tile, the horizontal tent matmul contracts only a KBLK-wide
        source-column window (per-tile jbase from SMEM): the tent matrix
        wx is x-banded (j ~ x + bounded shift for real rigs), so the
        (W, W) matmul wastes most of K. Windows beyond KBLK (extreme
        shear) accumulate via a masked kextra loop, mirroring the
        vertical nextra loop — zero-trip normally.
      * Tiling also halves the per-tile VERTICAL span (span is mostly
        linear in x for rotational rigs): fewer nextra blocks.
      * The vertical tent is built compact at (BAND, TW) and applied as
        BAND sublane-broadcast FMAs onto the Cout-aligned tap slices.
      * Outputs are (C, W)-transposed; the wrapper transposes back (a
        cheap HBM-bandwidth pass in XLA).

    Band starts / extra-block counts for BOTH axes come precomputed from
    SMEM (XLA-side _band_table / _hwin_table).
    """
    view_num = view_count_minus_1 + 1
    TW = W // NT

    def kernel(x_ref, y_ref, rb_ref, ne_ref, jb_ref, ke_ref, reft_ref,
               cats_hbm, out_ref, cats_vmem, sem):
        # x/y: (Vm1, 1, ROWS, W) f32; rb/ne/jb/ke: (Vm1, 1, 1, NT, ROWS)
        # i32 in SMEM (the two unit dims satisfy Mosaic's
        # full-or-divisible block constraint on the trailing dims);
        # reft: (ROWS, C, W); cats_hbm: (Vm1, H, W, BAND*C) in ANY;
        # out: (1, ROWS, C, W); cats_vmem: persistent VMEM scratch.
        C = reft_ref.shape[1]
        src_dtype = cats_vmem.dtype
        precision = _precision_for(src_dtype)

        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            dma = pltpu.make_async_copy(cats_hbm, cats_vmem, sem)
            dma.start()
            dma.wait()

        iota_k = jax.lax.broadcasted_iota(jnp.int32, (KBLK, TW), 0)
        iota_k = iota_k.astype(jnp.float32)                  # (KBLK, TW)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (BAND, TW), 0)
        iota_b = iota_b.astype(jnp.float32)                  # (BAND, TW)

        for y in range(ROWS_PER_CELL):
            s = None
            s2 = None
            for v in range(view_count_minus_1):
                tiles = []
                for t in range(NT):
                    xrow = x_ref[v, 0, y:y + 1, t * TW:(t + 1) * TW]
                    yrow = y_ref[v, 0, y:y + 1, t * TW:(t + 1) * TW]
                    rbase = rb_ref[v, 0, 0, t, y]
                    nex = ne_ref[v, 0, 0, t, y]
                    jb8 = jb_ref[v, 0, 0, t, y]          # jbase / 8
                    kex = ke_ref[v, 0, 0, t, y]

                    # Horizontal tent for the base K-window: depends only
                    # on (row, tile) — built ONCE and shared by every
                    # vertical block (it was rebuilt per block, ~1.6x the
                    # VPU work per row-view at the 3DCNN rig).
                    if KBLK == W:
                        base_cols = iota_k
                    else:
                        base_cols = (jb8 * 8).astype(jnp.float32) + iota_k
                    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(base_cols - xrow))
                    wx0 = wx0.astype(src_dtype)          # (KBLK, TW)

                    def hwin(start, jb8k, jlo, wx0=wx0, xrow=xrow, v=v):
                        # one (vertical band, K-window) tap matmul;
                        # jb8k*8 keeps the W-dim slice provably 8-aligned.
                        # KBLK == W: the window is the whole row — jb0 is
                        # statically 0, skip the per-block (KBLK, TW) add
                        # (measured +13 ms at the 3DCNN point).
                        if jlo is None:
                            if KBLK == W:
                                slab = cats_vmem[v, pl.ds(start, 1)]
                            else:
                                slab = cats_vmem[v, pl.ds(start, 1),
                                                 pl.ds(jb8 * 8, KBLK)]
                            wx = wx0
                        else:
                            jb0 = jb8k * 8
                            slab = cats_vmem[v, pl.ds(start, 1),
                                             pl.ds(jb0, KBLK)]
                            cols = jb0.astype(jnp.float32) + iota_k
                            wxf = jnp.maximum(0.0,
                                              1.0 - jnp.abs(cols - xrow))
                            # clamped extra window: drop cols the previous
                            # window already covered
                            wxf = jnp.where(cols >= jlo.astype(jnp.float32),
                                            wxf, 0.0)
                            wx = wxf.astype(src_dtype)
                        slab = slab.reshape(KBLK, BAND * C)
                        return jax.lax.dot_general(
                            slab, wx,
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)             # (BAND*C, x)

                    def block(start, masked, yrow=yrow, jb8=jb8,
                              kex=kex, hwin=hwin):
                        hw = hwin(start, jb8, None)

                        def hextra(k, a, start=start, jb8=jb8,
                                   hwin=hwin):
                            jlo8 = jb8 + k * (KBLK // 8)
                            jb8k = jnp.minimum(jlo8, (W - KBLK) // 8)
                            return a + hwin(start, jb8k, jlo8 * 8)

                        if KBLK < W:     # kextra == 0 always when KBLK == W
                            hw = jax.lax.fori_loop(1, kex + 1, hextra, hw)
                        # vertical tent, compact (BAND, TW), applied as
                        # sublane-broadcast FMAs on Cout-aligned slices
                        rows = start.astype(jnp.float32) + iota_b
                        rw = jnp.maximum(0.0, 1.0 - jnp.abs(rows - yrow))
                        if masked is not None:
                            lo, hi = masked
                            keep = ((rows >= lo.astype(jnp.float32))
                                    & (rows <= hi.astype(jnp.float32)))
                            rw = jnp.where(keep, rw, 0.0)
                        acc = rw[0:1, :] * hw[0:C, :]
                        for r in range(1, BAND):
                            acc = acc + rw[r:r + 1, :] * hw[r * C:(r + 1) * C, :]
                        return acc                           # (C, TW)

                    # Straight-line second vertical block: realistic rigs
                    # have in-row spans around BAND (mean 9.1 at the 3DCNN
                    # bench rig), so the k=1 extra block runs for MOST rows
                    # anyway. Executing it unconditionally (the tent mask
                    # makes it an exact zero when not needed) removes the
                    # data-dependent fori_loop from the hot path — the
                    # diagnosed MXU pipeline stall — leaving a zero-trip
                    # residual loop only for spans > 2*BAND-1 (rare).
                    warped_t = block(rbase, None)
                    if _STATIC2:
                        lo1 = rbase + BAND
                        warped_t = warped_t + block(
                            jnp.minimum(lo1, H - BAND),
                            (lo1, lo1 + (BAND - 1)))

                    def extra(k, a, rbase=rbase, block=block):
                        lo = rbase + k * BAND
                        start = jnp.minimum(lo, H - BAND)
                        return a + block(start, (lo, lo + (BAND - 1)))

                    tiles.append(jax.lax.fori_loop(2 if _STATIC2 else 1,
                                                   nex + 1, extra,
                                                   warped_t))

                warped = tiles[0] if NT == 1 else jnp.concatenate(tiles,
                                                                  axis=1)
                if s is None:
                    s, s2 = warped, warped * warped
                else:
                    s = s + warped
                    s2 = s2 + warped * warped

            ref_row = reft_ref[y].astype(jnp.float32)        # (C, W)
            s = s + ref_row
            s2 = s2 + ref_row * ref_row
            mean = s / view_num
            cost = s2 / view_num - mean * mean
            out_ref[0, y] = cost.astype(out_ref.dtype)

    return kernel


# Pair-row edition (MVSNET_TPU_SWEEP_PAIR): two adjacent output rows share
# their horizontal tent matrix — built ONCE at (KBLK, 2*TW) with both
# rows' tents lane-concatenated on the matmul N axis — and the two
# straight-line vertical blocks that cover the pair's union span. The
# round-3 stage model puts the kernel at ~0.34 us of wx BUILD (VPU) +
# ~0.3 us vertical tents serialized against ~0.42 us MXU per row-view
# (= the measured 1.14 us). Pairing halves the matmul calls and drops
# the N-padding from 33% to 11% at W=288. Uses the SAME BAND-row slab
# tables / VMEM budget as the single-row kernel.
#
# Chip A/B (round 3, same window, bench_logs/r3_pair_nt_ab.log):
#   3DCNN point (W=288): base/NT1 97.2, PAIR/NT1 82.8, PAIR/NT2 171.9,
#     base/NT2 208.9 ms
#   GRU point (W=400):   base/NT2 204.4 (old default), PAIR/NT2 102.4,
#     PAIR/NT1 85.7 ms
# => pair ON by default; NT=1 everywhere (lane-tiled K-windows lose ~2x
# on the lane-dynamic slab reads, refuting the r2 padded-slot model).
_PAIR = _os.environ.get("MVSNET_TPU_SWEEP_PAIR", "1") not in ("0", "")
# Group size: how many adjacent output rows share one tent matrix + one
# set of vertical blocks. 4 = default (chip A/B bench_logs/r3b_queue.log:
# 71.1 ms vs pair's 82.6/82.8 bracket at the 3DCNN cost point — per-row
# block/slab/call overhead halves vs pair and N = 4*288 = 1152 = 9*128
# tiles exactly). Eligibility W % 16 == 0 with G-divisible row cells
# (_preload_group_cchunk; relaxed from W % (8*G) in round 3 — the GRU
# point W=400 now runs the quad kernel too, 85.8 -> 74.0 ms). 1/0
# disables (single-row kernel).
_GROUP = int(_os.environ.get("MVSNET_TPU_SWEEP_GROUP", "4")) if _PAIR else 1
# A/B knob: bf16 vertical combine. The group kernel's roofline puts the
# VPU — tent build + the 2*BAND broadcast-FMA taps per row — above the
# MXU (~0.43 + 0.34 vs ~0.23 us/row-view at the 3DCNN point), so halving
# the combine's element width targets the dominant term. The matmul
# emits hw directly in the source dtype (MXU accumulates f32 internally
# either way) and each tap FMA runs packed bf16; the per-(g,view) result
# is cast back to f32 BEFORE the cross-view variance accumulation
# (E[f^2]-E[f]^2 cancellation stays f32). Off by default until the chip
# A/B and the quality gates say otherwise.
_COMB16 = bool(int(_os.environ.get("MVSNET_TPU_SWEEP_COMB16", "0")))
# A/B knob: issue BOTH static vertical blocks' tap matmuls before either
# block's vertical combine ([mm0, mm1, comb0, comb1] instead of
# [mm0, comb0, mm1, comb1]). Mosaic schedules roughly in program order,
# so the reorder lets the MXU run block 1's matmul underneath block 0's
# VPU combine instead of serializing the units.
_MM2 = bool(int(_os.environ.get("MVSNET_TPU_SWEEP_MM2", "0")))
# A/B knob: TRANSPOSED slab tables (H, BAND*C, W). The tap matmul has
# always contracted the slab's MAJOR dim (slab (KBLK, BAND*C) on dim 0
# against wx (KBLK, G*TW) on dim 0) — a transposed-LHS dot that Mosaic
# may lower with an internal per-block relayout of the 73k-element slab,
# which would explain the uniform ~2x gap vs the op-level model that
# TENT16/MM2 nulls left unexplained. With the tables stored transposed
# the dot contracts lhs LANES x rhs SUBLANES — the MXU-native
# orientation, no relayout. Costs lane-padding W in the table scratch
# (288 -> 384 at the 3DCNN point; the padded VMEM model gates it).
# KBLK == W (the NT=1 default) only.
# Chip A/B (r4c, def bracket 71.3/71.4/71.4/71.4): 3DCNN 69.0,
# GRU 69.0 (def 73.9) — wins both points; DEFAULT ON since r4.
_TSLAB = bool(int(_os.environ.get("MVSNET_TPU_SWEEP_TSLAB", "1")))
# Diagnostic ablations (WRONG NUMERICS — bench-only, --skip-check):
#   tent  = skip the horizontal tent build (wx0 := iota)
#   mm    = skip the tap matmuls (hw := a wx0 slice)
#   comb  = skip the vertical combine + rw build (acc := one hw slice)
# One chip run each decomposes the kernel's true time budget — the
# op-level model has been ~2x off since round 1 and TENT16/MM2 nulls
# say the guesses were wrong.
_ABLATE = _os.environ.get("MVSNET_TPU_SWEEP_ABLATE", "")
# A/B knob: FULL-WIDTH vertical combine. The r4 chip TENT16 null result
# (71.3 vs 71.4 ms — halving tent elementwise width changed nothing)
# says the kernel is bound by vector-op ISSUE count, not element
# throughput. The per-g combine slices hw into G (C, TW) pieces per tap
# (G rw builds + G*2*BAND FMA ops per block); WIDE builds ONE rw at
# (BAND, G*TW) from the lane-concatenated y coords and runs each tap FMA
# at (C, G*TW) — ~G-fold fewer vector ops for identical element counts.
# The variance epilogue runs wide too. NT==1 only (the default).
# Chip A/B (r4c): 3DCNN 69.8 alone, 66.9 stacked with TSLAB (def
# 71.3-71.4); GRU 72.0 alone (def 73.9) — DEFAULT ON since r4.
_WIDE = bool(int(_os.environ.get("MVSNET_TPU_SWEEP_WIDE", "1")))
# Cross-instance tent/matmul software pipeline. The r4c ABLATE
# decomposition attributed the 71.4 ms cost stage to tent build ~44 ms
# (VPU — f32 ALU; TENT16 was null because VPU throughput is per 32-bit
# lane, bf16 only narrows memory/MXU) + tap matmuls ~45 ms (MXU) +
# combine 1.7, i.e. the two big stages run nearly SERIALIZED
# (27.6 + 43.8 ≈ 71.4). XPIPE reorders the straight-line body: issue
# instance n's static-block matmuls, then build instance n+1's tent
# (VPU runs under the MXU), then run n's combines. NT=1 only (KBLK==W,
# so wx0 is the instance's only tent).
# Chip A/B (r4d, def bracket 67.0/67.1): 3DCNN 71.5, GRU 76.2 vs def
# 66.1 — REFUTED. The ablation marginals (43.8 + 45.5 vs 71.4 total)
# show Mosaic already overlaps ~18 ms; holding two live tents only adds
# scratch pressure. Default OFF, kept for the record like FSTORE.
_XPIPE = bool(int(_os.environ.get("MVSNET_TPU_SWEEP_XPIPE", "0")))
# A/B knob: per-instance CONDITIONAL second static block. Host-side span
# stats at the 3DCNN point (tools/span_stats): 38% of (group, view, depth)
# instances have union span <= BAND (nextra == 0) — for them the masked
# second block is pure MXU/VPU waste (~19% of the tap-matmul budget).
# One lax.cond per instance around the whole hw1+combine1 — a single
# scalar-predicated region, NOT the per-row dynamic while-loop that
# stalled the pipeline in rounds 1-2. WIDE path (the default) only.
# Chip A/B (r5 queue, 01:45-01:57 UTC): 3DCNN point 67.1 / 62.6 / 66.8
# (bracketed, -6.5%); GRU point 63.6 vs 66.2 (-4%). DEFAULT ON.
_COND2 = bool(int(_os.environ.get("MVSNET_TPU_SWEEP_COND2", "1")))
# A/B knob: avoid C-chunking at the GRU point by admitting FULL-C slab
# tables in the UNTRANSPOSED layout at an extended VMEM limit. The GRU
# point's full-C tables are 121 MiB non-TSLAB ((H, W, BAND*C): lanes =
# BAND*C = 256 exact, no pad) vs 155 MiB TSLAB (W 400 -> 512 lane pad) —
# the 112 MiB scoped limit C-chunks them, and every chunk REBUILDS the
# horizontal tents (~40% of kernel time at r4c's attribution). v5e has
# 128 MiB VMEM/core; 126 MiB leaves ~7 MB for the streamed blocks.
# Trade: tents built once (-~30% at the GRU point if the model holds)
# vs losing TSLAB's MXU-native orientation (+3% win at 3DCNN).
_CFULL = bool(int(_os.environ.get("MVSNET_TPU_SWEEP_CFULL", "0")))
_VMEM_EXT = 126 * 2 ** 20
# A/B knob: WITHIN-instance tent/matmul pipeline by splitting the group's
# N axis in half. Where XPIPE (refuted) held TWO full instances' tents
# live across the body, HSPLIT builds half-tents (KBLK, G/2*TW) and
# interleaves in program order [tent_a, mm0_a, tent_b, mm0_b, mm1_a,
# comb_a, mm1_b, comb_b] — the VPU builds half b's tent under half a's
# MXU pass at only 1.5 tents of peak scratch. WIDE+STATIC2, NT=1,
# G even only.
# Chip A/B (r5 queue): 3DCNN 68.1 vs def 67.2 — REFUTED, like XPIPE:
# Mosaic's natural cross-instance overlap already captures what's
# available; splitting N just halves the matmul tile efficiency.
# Default OFF, kept for the record.
_HSPLIT = bool(int(_os.environ.get("MVSNET_TPU_SWEEP_HSPLIT", "0")))


def _make_cost_kernel_preload_group(view_count_minus_1: int, H: int, W: int,
                                    NT: int, KBLK: int, G: int,
                                    tslab=None):
    """Group-row slab-table cost kernel (see _PAIR/_GROUP note above).

    Tables (rb/ne/jb/ke) are per (view, tile, GROUP): the vertical band and
    K-window cover ALL G rows' taps (adjacent rows shear by ~1 source row,
    so the union costs ~G extra rows/columns of slack).
    """
    view_num = view_count_minus_1 + 1
    TW = W // NT
    RP = ROWS_PER_CELL // G
    if tslab is None:
        tslab = _TSLAB and KBLK == W

    def kernel(x_ref, y_ref, rb_ref, ne_ref, jb_ref, ke_ref, reft_ref,
               cats_hbm, out_ref, cats_vmem, sem):
        # x/y: (Vm1, 1, ROWS, W) f32; rb/ne/jb/ke: (Vm1, 1, 1, NT, RP) i32
        # SMEM; reft: (ROWS, C, W); cats_hbm: (Vm1, H, W, BAND*C) ANY
        # ((Vm1, H, BAND*C, W) under _TSLAB); out: (1, ROWS, C, W);
        # cats_vmem: persistent scratch.
        C = reft_ref.shape[1]
        src_dtype = cats_vmem.dtype
        precision = _precision_for(src_dtype)
        hw_dtype = (src_dtype if (_COMB16 and src_dtype != jnp.float32)
                    else jnp.float32)

        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            dma = pltpu.make_async_copy(cats_hbm, cats_vmem, sem)
            dma.start()
            dma.wait()

        iota_kg = jax.lax.broadcasted_iota(jnp.int32, (KBLK, G * TW), 0)
        iota_kg = iota_kg.astype(jnp.float32)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (BAND, TW), 0)
        iota_b = iota_b.astype(jnp.float32)

        wide = _WIDE and NT == 1
        iota_bg = None
        if wide:
            iota_bg = jax.lax.broadcasted_iota(jnp.int32, (BAND, G * TW), 0)
            iota_bg = iota_bg.astype(jnp.float32)

        # cross-instance tent pipeline (see _XPIPE): tent(n+1) is built
        # between instance n's matmul issues and its combines
        xpipe = _XPIPE and NT == 1 and not _ABLATE
        hsplit = (_HSPLIT and wide and _STATIC2 and G % 2 == 0
                  and NT == 1 and not _ABLATE and not xpipe)

        def xcat_of(p2, v2):
            ys2 = [G * p2 + g for g in range(G)]
            return jnp.concatenate(
                [x_ref[v2, 0, yy:yy + 1, :] for yy in ys2], axis=1)

        seq = [(p2, v2) for p2 in range(RP) for v2 in range(view_count_minus_1)]
        tent_next = None
        if xpipe:
            tent_next = _tent_cols(iota_kg, xcat_of(*seq[0]), src_dtype)
        inst_idx = 0

        for p in range(RP):
            ys = [G * p + g for g in range(G)]
            sums, sqs = [None] * G, [None] * G
            sums_w, sqs_w = None, None
            for v in range(view_count_minus_1):
                tiles = [[] for _ in range(G)]
                for t in range(NT):
                    # all G rows' x coords lane-concatenated: ONE tent
                    # build at (KBLK, G*TW) serves the group
                    xcat = jnp.concatenate(
                        [x_ref[v, 0, yy:yy + 1, t * TW:(t + 1) * TW]
                         for yy in ys], axis=1)              # (1, G*TW)
                    yrows = [y_ref[v, 0, yy:yy + 1, t * TW:(t + 1) * TW]
                             for yy in ys]
                    rbase = rb_ref[v, 0, 0, t, p]
                    nex = ne_ref[v, 0, 0, t, p]
                    jb8 = jb_ref[v, 0, 0, t, p]
                    kex = ke_ref[v, 0, 0, t, p]

                    if KBLK == W:
                        base_cols = iota_kg
                    else:
                        base_cols = (jb8 * 8).astype(jnp.float32) + iota_kg
                    if _ABLATE == "tent":
                        wx0 = (base_cols * 1e-3).astype(src_dtype)
                    elif xpipe:
                        wx0 = tent_next                  # built last instance
                    elif hsplit:
                        wx0 = None                       # per-half tents below
                    else:
                        wx0 = _tent_cols(base_cols, xcat, src_dtype)
                    # (KBLK, G*TW)

                    def hwin(start, jb8k, jlo, wx0=wx0, xcat=xcat, v=v,
                             jb8=jb8):
                        if jlo is None:
                            if KBLK == W:
                                slab = cats_vmem[v, pl.ds(start, 1)]
                            else:
                                slab = cats_vmem[v, pl.ds(start, 1),
                                                 pl.ds(jb8 * 8, KBLK)]
                            wx = wx0
                        else:
                            jb0 = jb8k * 8
                            slab = cats_vmem[v, pl.ds(start, 1),
                                             pl.ds(jb0, KBLK)]
                            cols = jb0.astype(jnp.float32) + iota_kg
                            wxf = _tent_cols(cols, xcat, src_dtype)
                            wx = jnp.where(cols >= jlo.astype(jnp.float32),
                                           wxf, jnp.asarray(0, src_dtype))
                        # Mosaic tpu.matmul requires a 32-bit accumulator
                        # (bf16 preferred_element_type fails verification
                        # on chip) — COMB16 downcasts AFTER the matmul.
                        if tslab:
                            # table stored (H, BAND*C, W): contract lhs
                            # LANES x rhs SUBLANES — MXU-native, no
                            # slab relayout (see _TSLAB)
                            slab = slab.reshape(BAND * C, KBLK)
                            return jax.lax.dot_general(
                                slab, wx, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=precision)         # (BAND*C, G*TW)
                        slab = slab.reshape(KBLK, BAND * C)
                        return jax.lax.dot_general(
                            slab, wx, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)             # (BAND*C, G*TW)

                    def hwfull(start, jb8=jb8, kex=kex, hwin=hwin,
                               wx0=wx0):
                        if _ABLATE == "mm":
                            # hw := a wx0 slice (no matmul, no slab read)
                            if KBLK >= BAND * C:
                                return wx0[:BAND * C, :].astype(hw_dtype)
                            return jnp.broadcast_to(
                                wx0[:1, :], (BAND * C, G * TW)
                            ).astype(hw_dtype)
                        hw = hwin(start, jb8, None)

                        def hextra(k, a, start=start, jb8=jb8, hwin=hwin):
                            jlo8 = jb8 + k * (KBLK // 8)
                            jb8k = jnp.minimum(jlo8, (W - KBLK) // 8)
                            return a + hwin(start, jb8k, jlo8 * 8)

                        if KBLK < W:
                            hw = jax.lax.fori_loop(1, kex + 1, hextra, hw)
                        return hw.astype(hw_dtype)

                    def vertw(hw, start, masked, ycat_=None,
                              iota_=None):
                        if _ABLATE == "comb":
                            return hw[0:C, :].astype(jnp.float32)
                        # full-width combine: one rw build + BAND FMAs at
                        # (C, G*TW) instead of G sliced ones (see _WIDE)
                        rows = start.astype(jnp.float32) + (
                            iota_bg if iota_ is None else iota_)
                        rw = jnp.maximum(0.0, 1.0 - jnp.abs(rows - ycat_))
                        if masked is not None:
                            lo, hi = masked
                            keep = ((rows >= lo.astype(jnp.float32))
                                    & (rows <= hi.astype(jnp.float32)))
                            rw = jnp.where(keep, rw, 0.0)
                        rw = rw.astype(hw.dtype)
                        a = rw[0:1, :] * hw[0:C, :]
                        for r in range(1, BAND):
                            a = a + rw[r:r + 1, :] * hw[r * C:(r + 1) * C, :]
                        return a.astype(jnp.float32)         # (C, G*TW)

                    def vert(hw, start, masked, yrows=yrows):
                        if _ABLATE == "comb":
                            return tuple(
                                hw[0:C, g * TW:(g + 1) * TW].astype(
                                    jnp.float32) for g in range(G))
                        rows = start.astype(jnp.float32) + iota_b  # (BAND,TW)
                        keep = None
                        if masked is not None:
                            lo, hi = masked
                            keep = ((rows >= lo.astype(jnp.float32))
                                    & (rows <= hi.astype(jnp.float32)))
                        accs = []
                        for g in range(G):
                            rw = jnp.maximum(0.0,
                                             1.0 - jnp.abs(rows - yrows[g]))
                            if keep is not None:
                                rw = jnp.where(keep, rw, 0.0)
                            rw = rw.astype(hw.dtype)
                            a = rw[0:1, :] * hw[0:C, g * TW:(g + 1) * TW]
                            for r in range(1, BAND):
                                a = a + (rw[r:r + 1, :]
                                         * hw[r * C:(r + 1) * C,
                                              g * TW:(g + 1) * TW])
                            # cross-view variance accumulation stays f32
                            accs.append(a.astype(jnp.float32))
                        return tuple(accs)                   # (C, TW) x G

                    def block(start, masked, hwfull=hwfull, vert=vert):
                        return vert(hwfull(start), start, masked)

                    # straight-line BAND blocks cover the group's union
                    # span (~11 rows for pairs, ~13 for quads at realistic
                    # rigs): two at BAND=8, one at BAND>=12 (_STATIC2);
                    # residual masked blocks are zero-trip
                    if wide:
                        ycat = jnp.concatenate(yrows, axis=1)  # (1, G*TW)
                        if hsplit:
                            # within-instance N-split pipeline (_HSPLIT):
                            # half b's tent builds on the VPU while half
                            # a's tap matmuls run on the MXU
                            gh = G // 2
                            TWh = gh * TW
                            iota_kh = jax.lax.broadcasted_iota(
                                jnp.int32, (KBLK, TWh), 0).astype(jnp.float32)
                            iota_bh = jax.lax.broadcasted_iota(
                                jnp.int32, (BAND, TWh), 0).astype(jnp.float32)
                            xc = [jnp.concatenate(
                                [x_ref[v, 0, yy:yy + 1, :]
                                 for yy in ys[h2 * gh:(h2 + 1) * gh]],
                                axis=1) for h2 in range(2)]
                            yc = [jnp.concatenate(
                                yrows[h2 * gh:(h2 + 1) * gh], axis=1)
                                for h2 in range(2)]
                            lo1 = rbase + BAND
                            start1 = jnp.minimum(lo1, H - BAND)
                            m1 = (lo1, lo1 + (BAND - 1))
                            wx_a = _tent_cols(iota_kh, xc[0], src_dtype)
                            hw0_a = hwin(rbase, jb8, None, wx0=wx_a)
                            wx_b = _tent_cols(iota_kh, xc[1], src_dtype)
                            hw0_b = hwin(rbase, jb8, None, wx0=wx_b)
                            hw1_a = hwin(start1, jb8, None, wx0=wx_a)
                            wv_a = (vertw(hw0_a.astype(hw_dtype), rbase,
                                          None, yc[0], iota_=iota_bh)
                                    + vertw(hw1_a.astype(hw_dtype), start1,
                                            m1, yc[0], iota_=iota_bh))
                            hw1_b = hwin(start1, jb8, None, wx0=wx_b)
                            wv_b = (vertw(hw0_b.astype(hw_dtype), rbase,
                                          None, yc[1], iota_=iota_bh)
                                    + vertw(hw1_b.astype(hw_dtype), start1,
                                            m1, yc[1], iota_=iota_bh))
                            wv = jnp.concatenate([wv_a, wv_b], axis=1)

                            def extraw2(k, acc, rbase=rbase, wx_a=wx_a,
                                        wx_b=wx_b, yc=yc, jb8=jb8,
                                        hwin=hwin, vertw=vertw,
                                        iota_bh=iota_bh):
                                lo = rbase + k * BAND
                                start = jnp.minimum(lo, H - BAND)
                                m = (lo, lo + (BAND - 1))
                                e_a = vertw(
                                    hwin(start, jb8, None,
                                         wx0=wx_a).astype(hw_dtype),
                                    start, m, yc[0], iota_=iota_bh)
                                e_b = vertw(
                                    hwin(start, jb8, None,
                                         wx0=wx_b).astype(hw_dtype),
                                    start, m, yc[1], iota_=iota_bh)
                                return acc + jnp.concatenate([e_a, e_b],
                                                             axis=1)

                            wv = jax.lax.fori_loop(2, nex + 1, extraw2, wv)
                        elif xpipe:
                            # matmuls first, tent(n+1) under them, then
                            # the combines (which await the matmuls)
                            hw0 = hwfull(rbase)
                            hw1 = None
                            if _STATIC2:
                                lo1 = rbase + BAND
                                start1 = jnp.minimum(lo1, H - BAND)
                                hw1 = hwfull(start1)
                            if inst_idx + 1 < len(seq):
                                tent_next = _tent_cols(
                                    iota_kg, xcat_of(*seq[inst_idx + 1]),
                                    src_dtype)
                            wv = vertw(hw0, rbase, None, ycat)
                            if hw1 is not None:
                                wv = wv + vertw(hw1, start1,
                                                (lo1, lo1 + (BAND - 1)),
                                                ycat)
                        else:
                            wv = vertw(hwfull(rbase), rbase, None, ycat)
                            if _STATIC2 and _COND2:
                                def blk1(_, rbase=rbase, ycat=ycat,
                                         hwfull=hwfull, vertw=vertw):
                                    lo1 = rbase + BAND
                                    start1 = jnp.minimum(lo1, H - BAND)
                                    return vertw(hwfull(start1), start1,
                                                 (lo1, lo1 + (BAND - 1)),
                                                 ycat)

                                wv = wv + jax.lax.cond(
                                    nex >= 1, blk1,
                                    lambda _: jnp.zeros_like(wv), 0)
                            elif _STATIC2:
                                lo1 = rbase + BAND
                                start1 = jnp.minimum(lo1, H - BAND)
                                wv = wv + vertw(hwfull(start1), start1,
                                                (lo1, lo1 + (BAND - 1)),
                                                ycat)

                        if not hsplit:
                            def extraw(k, acc, rbase=rbase, hwfull=hwfull,
                                       vertw=vertw, ycat=ycat):
                                lo = rbase + k * BAND
                                start = jnp.minimum(lo, H - BAND)
                                return acc + vertw(hwfull(start), start,
                                                   (lo, lo + (BAND - 1)),
                                                   ycat)

                            wv = jax.lax.fori_loop(2 if _STATIC2 else 1,
                                                   nex + 1, extraw, wv)
                        if sums_w is None:
                            sums_w, sqs_w = wv, wv * wv
                        else:
                            sums_w = sums_w + wv
                            sqs_w = sqs_w + wv * wv
                        continue
                    if _STATIC2 and (_MM2 or xpipe):
                        # both tap matmuls issue back-to-back so block 1's
                        # MXU pass overlaps block 0's VPU combine; under
                        # xpipe the NEXT instance's tent slots between the
                        # matmul issues and the combines
                        lo1 = rbase + BAND
                        start1 = jnp.minimum(lo1, H - BAND)
                        hw0 = hwfull(rbase)
                        hw1 = hwfull(start1)
                        if xpipe and inst_idx + 1 < len(seq):
                            tent_next = _tent_cols(
                                iota_kg, xcat_of(*seq[inst_idx + 1]),
                                src_dtype)
                        w0 = vert(hw0, rbase, None)
                        e = vert(hw1, start1, (lo1, lo1 + (BAND - 1)))
                        w = [a + b for a, b in zip(w0, e)]
                    else:
                        w = list(block(rbase, None))
                        if _STATIC2:
                            lo1 = rbase + BAND
                            e = block(jnp.minimum(lo1, H - BAND),
                                      (lo1, lo1 + (BAND - 1)))
                            w = [a + b for a, b in zip(w, e)]
                        if xpipe and inst_idx + 1 < len(seq):
                            tent_next = _tent_cols(
                                iota_kg, xcat_of(*seq[inst_idx + 1]),
                                src_dtype)

                    def extra(k, acc, rbase=rbase, block=block):
                        lo = rbase + k * BAND
                        start = jnp.minimum(lo, H - BAND)
                        e = block(start, (lo, lo + (BAND - 1)))
                        return tuple(a + b for a, b in zip(acc, e))

                    w = jax.lax.fori_loop(2 if _STATIC2 else 1,
                                          nex + 1, extra, tuple(w))
                    for g in range(G):
                        tiles[g].append(w[g])

                inst_idx += 1
                if wide:
                    continue
                for g in range(G):
                    wd = (tiles[g][0] if NT == 1
                          else jnp.concatenate(tiles[g], axis=1))
                    if sums[g] is None:
                        sums[g], sqs[g] = wd, wd * wd
                    else:
                        sums[g] = sums[g] + wd
                        sqs[g] = sqs[g] + wd * wd

            if wide:
                # wide variance epilogue; per-g lane slices only at the
                # final output writes
                ref_cat = jnp.concatenate(
                    [reft_ref[yy] for yy in ys], axis=1).astype(jnp.float32)
                ss = sums_w + ref_cat
                qq = sqs_w + ref_cat * ref_cat
                mean = ss / view_num
                cost = qq / view_num - mean * mean
                cost = cost.astype(out_ref.dtype)
                for g in range(G):
                    out_ref[0, ys[g]] = cost[:, g * TW:(g + 1) * TW]
                continue
            for g in range(G):
                ref_row = reft_ref[ys[g]].astype(jnp.float32)  # (C, W)
                ss = sums[g] + ref_row
                qq = sqs[g] + ref_row * ref_row
                mean = ss / view_num
                cost = qq / view_num - mean * mean
                out_ref[0, ys[g]] = cost.astype(out_ref.dtype)

    return kernel


def _group_tables(x, y, H, W, NT, KBLK, rows_blocks, G):
    """Per-(view, depth, GROUP, tile) band/window tables (SMEM layout
    (Vm1, D, RB, NT, ROWS_PER_CELL // G))."""
    Vm1, D, rows = y.shape[:3]
    TW = W // NT
    y2 = y.reshape(Vm1, D, rows // G, G, NT, TW)
    x2 = x.reshape(Vm1, D, rows // G, G, NT, TW)
    r0f = jnp.floor(y2)
    rlo = jnp.clip(jnp.min(r0f, axis=(3, 5)), 0.0, float(H - 1))
    rhi = jnp.clip(jnp.max(r0f, axis=(3, 5)) + 1.0, 0.0, float(H - 1))
    rbase = jnp.minimum(rlo.astype(jnp.int32), H - BAND)
    nextra = (rhi.astype(jnp.int32) - rbase) // BAND
    jlo = jnp.clip(jnp.floor(jnp.min(x2, axis=(3, 5))), 0.0, float(W - 1))
    jhi = jnp.clip(jnp.floor(jnp.max(x2, axis=(3, 5))) + 1.0, 0.0,
                   float(W - 1))
    jb8 = jnp.minimum(jlo.astype(jnp.int32) // 8, (W - KBLK) // 8)
    kextra = jnp.maximum(0, (jhi.astype(jnp.int32) - jb8 * 8) // KBLK)

    def tbl(a):                      # (Vm1, D, P, NT) -> (.., RB, NT, RP)
        rp = ROWS_PER_CELL // G
        a = a.reshape(Vm1, D, rows_blocks, rp, NT)
        return jnp.transpose(a, (0, 1, 2, 4, 3))

    return tbl(rbase), tbl(nextra), tbl(jb8), tbl(kextra)


def _preload_group_cchunk(height, width, channels, view_count_minus_1, G,
                          dtype=jnp.bfloat16) -> int:
    """Group kernel uses the SAME BAND-row slab tables/VMEM budget as the
    single-row preload; it only additionally needs G-divisible row cells
    and pair-splittable W (W % 16 — the in-kernel lane concats/slices at
    g*W offsets are static, and non-128-multiple offsets are the same
    lowering class the pair kernel already runs at W=288/400)."""
    if (G < 2 or ROWS_PER_CELL % G != 0 or width % 16 != 0
            or height < (2 * BAND if _STATIC2 else BAND)):
        return 0
    return _preload_cchunk(height, width, channels, view_count_minus_1,
                           dtype)


def _group_full_c_layout(height, width, channels, view_count_minus_1,
                         dtype=jnp.bfloat16):
    """(tslab, vmem_limit) if FULL-C tables fit under _CFULL's extended
    budget in the untransposed layout, else None (see _CFULL)."""
    if not _CFULL:
        return None
    item = jnp.dtype(dtype).itemsize
    scratch = (view_count_minus_1 * height * width
               * _lane_pad(BAND * channels) * item)
    work = (width * width * 4 * 2
            + 3 * BAND * channels * width * 4
            + 4 * ROWS_PER_CELL * width * 4 * 2
            + 4 * ROWS_PER_CELL * channels * width * 4)
    if scratch + work < _VMEM_EXT - 4 * 2 ** 20:
        return False, _VMEM_EXT
    return None


def _group_params(height, width, channels, view_count_minus_1,
                  dtype=jnp.bfloat16):
    """(G, cchunk) for the best eligible group size (G=1/cchunk=0: none).

    Falls back 4 -> 2 when the requested _GROUP fails eligibility (e.g.
    W=400 is pair- but not quad-splittable)."""
    g = _GROUP
    while g >= 2:
        c = _preload_group_cchunk(height, width, channels,
                                  view_count_minus_1, g, dtype)
        if c:
            return g, c
        g //= 2
    return 1, 0


def _preload_call_group(ref_feature, view_features, x, y, tables, H, W,
                        out_rows, NT, KBLK, Vm1, interpret, cw_out=False,
                        G=2, tslab=None, vmem_limit=None):
    D = x.shape[1]
    C = ref_feature.shape[-1]
    rows_blocks = out_rows // ROWS_PER_CELL
    rp = ROWS_PER_CELL // G
    if tslab is None:
        tslab = _TSLAB and KBLK == W
    if tslab:
        cats = jax.vmap(_band_cats)(view_features)
        cats = jnp.transpose(cats, (0, 1, 3, 2))     # (Vm1, H, BAND*C, W)
    else:
        cats = jax.vmap(_band_cats)(view_features)   # (Vm1, H, W, BAND*C)
    reft = jnp.transpose(ref_feature, (0, 2, 1))     # (rows, C, W)
    params = _ARBITRARY2
    if vmem_limit is not None and vmem_limit != _VMEM_LIMIT:
        params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit)

    grid = (D, rows_blocks)
    smem_spec = pl.BlockSpec((Vm1, 1, 1, NT, rp),
                             lambda d, rb: (0, d, rb, 0, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _make_cost_kernel_preload_group(Vm1, H, W, NT, KBLK, G,
                                        tslab=tslab),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Vm1, 1, ROWS_PER_CELL, W),
                         lambda d, rb: (0, d, rb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vm1, 1, ROWS_PER_CELL, W),
                         lambda d, rb: (0, d, rb, 0), memory_space=pltpu.VMEM),
            smem_spec, smem_spec, smem_spec, smem_spec,
            pl.BlockSpec((ROWS_PER_CELL, C, W), lambda d, rb: (rb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, ROWS_PER_CELL, C, W),
                               lambda d, rb: (d, rb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, out_rows, C, W),
                                       ref_feature.dtype),
        scratch_shapes=[
            pltpu.VMEM(cats.shape, view_features.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=2 * D * out_rows * W * KBLK * BAND * C * Vm1,
            bytes_accessed=(D * out_rows * W * C * ref_feature.dtype.itemsize
                            + Vm1 * H * W * BAND * C
                            * view_features.dtype.itemsize),
            transcendentals=0,
        ),
    )(x, y, *tables, reft, cats)
    if cw_out:
        return out                                   # (D, rows, C, W) native
    return jnp.transpose(out, (0, 1, 3, 2))          # -> (D, rows, W, C)


def _tile_params_pair(W: int):
    """Pair-kernel tiling: NT=1 unless forced — chip A/Bs (see _PAIR
    comment) measured lane-tiled K-windows ~2x SLOWER at both operating
    points (the lane-dynamic slab reads dominate whatever the padded-slot
    arithmetic saves)."""
    def kblk(tw):
        return min(W, -(-(tw + 64) // 8) * 8)

    forced = _os.environ.get("MVSNET_TPU_SWEEP_NT")
    if forced:
        NT = int(forced)
        return NT, W // NT, kblk(W // NT)
    return 1, W, W


def _tile_params(W: int):
    """(NT, TW, KBLK): lane-tile count, tile width, K-window width.

    KBLK = tile width + 64 slack columns for the x-shift range (larger
    shifts fall into the masked kextra loop, still exact). NT=1 unless
    forced: the r2 padded-MAC-slot model (tile when K shrinks faster
    than N pads) was refuted on chip in round 3 — same-window A/Bs
    measured NT=2 ~2x SLOWER at BOTH operating points (W=288: 208.9 vs
    97.2; W=400: 204.4 vs the pair kernel's NT=1 85.7), the lane-dynamic
    slab reads dominating any slot savings."""
    def kblk(tw):
        return min(W, -(-(tw + 64) // 8) * 8)

    forced = _os.environ.get("MVSNET_TPU_SWEEP_NT")
    if forced:
        NT = int(forced)
        return NT, W // NT, kblk(W // NT)
    return 1, W, W


def _hwin_table(x, W, KBLK):
    """Horizontal K-window table over the last (tile-column) axis.

    x: (..., TW) f32 source x coordinates.
    Returns (jbase, kextra) int32: first window start (8-aligned, clamped
    to [0, W-KBLK]) and how many further masked windows cover the rest
    (0 unless the in-tile x-span exceeds KBLK)."""
    jlo = jnp.clip(jnp.floor(jnp.min(x, axis=-1)), 0.0, float(W - 1))
    jhi = jnp.clip(jnp.floor(jnp.max(x, axis=-1)) + 1.0, 0.0, float(W - 1))
    # jbase travels as jbase/8: the kernel rebuilds jbase = jb8 * 8, which
    # is how Mosaic statically proves the W-dim slice is 8-aligned.
    jb8 = jnp.minimum(jlo.astype(jnp.int32) // 8, (W - KBLK) // 8)
    kextra = jnp.maximum(0, (jhi.astype(jnp.int32) - jb8 * 8) // KBLK)
    return jb8, kextra


def _lane_pad(n: int) -> int:
    """VMEM tiles pad the minor (lane) dim to a multiple of 128. The r3
    BAND=12 GRU-point chip crash (interpret-clean) was this: slab tables
    at the C=16 chunk are (H, W, 12*16=192) -> 256 padded lanes, +33%
    over the unpadded model, blowing the 112 MiB scoped-vmem limit the
    predicate had 'verified'."""
    return -(-n // 128) * 128


def _preload_cost_supported(height, width, channels, view_count_minus_1,
                            dtype=jnp.bfloat16) -> bool:
    """VMEM model of the slab-table kernel: one persistent single-buffered
    scratch of all views' (H, W, BAND*C) tables + small streamed blocks.
    The table's minor dim (BAND*C, or W under _TSLAB) lane-pads to 128."""
    item = jnp.dtype(dtype).itemsize
    if _TSLAB:
        scratch = (view_count_minus_1 * height * BAND * channels
                   * _lane_pad(width) * item)
    else:
        scratch = (view_count_minus_1 * height * width
                   * _lane_pad(BAND * channels) * item)
    work = (width * width * 4 * 2                    # iota_j + wx
            + 3 * BAND * channels * width * 4        # sub_r, rw, prod
            + 4 * ROWS_PER_CELL * width * 4 * 2      # x/y blocks (dbuf)
            + 4 * ROWS_PER_CELL * channels * width * 4)  # reft + out blocks
    budget = _VMEM_LIMIT - 8 * 2 ** 20
    return (height % ROWS_PER_CELL == 0
            and height >= BAND
            and width % 8 == 0
            and scratch + work < budget)


def _preload_cchunk(height, width, channels, view_count_minus_1,
                    dtype=jnp.bfloat16) -> int:
    """Largest channel chunk whose slab tables fit VMEM (0 = none).

    The variance cost is per-channel independent, so when the full-C
    tables overflow (the GRU point: 2 x 296x400x(8*32) bf16 = 121 MiB)
    the wrapper runs the kernel per C-chunk and concatenates — same
    numerics, one extra pass over the coords."""
    c = channels
    while c >= 8 and channels % c == 0:
        if _preload_cost_supported(height, width, c, view_count_minus_1,
                                   dtype):
            return c
        c //= 2
    return 0


def _pallas_cost_volume_preload(ref_feature, view_features, homographies,
                                interpret: bool = False, row_offset=None,
                                out_rows: int = 0, cw_out: bool = False):
    """Slab-table fused cost volume (the fast path; C-chunks to fit).

    row_offset/out_rows: compute only output rows
    [row_offset, row_offset + out_rows) — ref_feature then holds just those
    rows while view_features stays full-height (the sharded multi-chip
    wrapper's row decomposition; row_offset may be traced).
    cw_out: return the kernel's NATIVE (D, rows, C, W) channel-second-minor
    layout, skipping the NDHWC relayout entirely (the CW RegNet eval
    pipeline consumes it directly, models/regnet.py).
    """
    Vm1, D = homographies.shape[:2]
    H, W, C = view_features.shape[1:]
    out_rows = out_rows or H
    if row_offset is None:
        row_offset = jnp.zeros((), jnp.int32)
    assert out_rows % ROWS_PER_CELL == 0 and H >= BAND
    assert ref_feature.shape == (out_rows, W, C)

    def coords(h):                                   # (D, 3, 3)
        x, y = projected_coords(h, H, W)
        x = x.reshape(D, H, W)
        y = y.reshape(D, H, W)
        if out_rows != H:
            x = jax.lax.dynamic_slice_in_dim(x, row_offset, out_rows, axis=1)
            y = jax.lax.dynamic_slice_in_dim(y, row_offset, out_rows, axis=1)
        return x, y

    # coords + band/window tables are channel-independent: computed ONCE
    # and shared by every C-chunk call (the GRU point runs 2 chunks).
    x, y = jax.vmap(coords)(homographies)            # (Vm1, D, rows, W) f32
    rows_blocks = out_rows // ROWS_PER_CELL

    G, group_cchunk = _group_params(H, W, C, Vm1, view_features.dtype)
    if group_cchunk:
        NT, TW, KBLK = _tile_params_pair(W)
        tables = _group_tables(x, y, H, W, NT, KBLK, rows_blocks, G)
        call = functools.partial(_preload_call_group, G=G)
        cchunk = group_cchunk
        if cchunk < C and NT == 1:
            # C-chunking rebuilds every horizontal tent per chunk; a
            # full-C untransposed-table call at the extended VMEM limit
            # builds them once (_CFULL, GRU-point A/B)
            full = _group_full_c_layout(H, W, C, Vm1, view_features.dtype)
            if full is not None:
                tslab_f, vmem_f = full
                call = functools.partial(_preload_call_group, G=G,
                                         tslab=tslab_f, vmem_limit=vmem_f)
                cchunk = C
    else:
        NT, TW, KBLK = _tile_params(W)
        xt = x.reshape(Vm1, D, out_rows, NT, TW)
        rbase, nextra = _band_table(y.reshape(Vm1, D, out_rows, NT, TW), H)
        jbase, kextra = _hwin_table(xt, W, KBLK)     # (Vm1, D, rows, NT) i32

        def tbl(a):                                  # -> (.., RB, NT, ROWS)
            a = a.reshape(Vm1, D, rows_blocks, ROWS_PER_CELL, NT)
            return jnp.transpose(a, (0, 1, 2, 4, 3))

        tables = (tbl(rbase), tbl(nextra), tbl(jbase), tbl(kextra))
        call = _preload_call
        cchunk = _preload_cchunk(H, W, C, Vm1, view_features.dtype) or C

    if cchunk < C:
        parts = [
            call(ref_feature[..., c0:c0 + cchunk],
                 view_features[..., c0:c0 + cchunk],
                 x, y, tables, H, W, out_rows, NT, KBLK, Vm1,
                 interpret, cw_out)
            for c0 in range(0, C, cchunk)
        ]
        return jnp.concatenate(parts, axis=-2 if cw_out else -1)
    return call(ref_feature, view_features, x, y, tables,
                H, W, out_rows, NT, KBLK, Vm1, interpret, cw_out)


def _preload_call(ref_feature, view_features, x, y, tables, H, W,
                  out_rows, NT, KBLK, Vm1, interpret, cw_out=False):
    D = x.shape[1]
    C = ref_feature.shape[-1]
    rows_blocks = out_rows // ROWS_PER_CELL
    cats = jax.vmap(_band_cats)(view_features)       # (Vm1, H, W, BAND*C)
    reft = jnp.transpose(ref_feature, (0, 2, 1))     # (rows, C, W)

    grid = (D, rows_blocks)
    smem_spec = pl.BlockSpec((Vm1, 1, 1, NT, ROWS_PER_CELL),
                             lambda d, rb: (0, d, rb, 0, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _make_cost_kernel_preload(Vm1, H, W, NT, KBLK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Vm1, 1, ROWS_PER_CELL, W),
                         lambda d, rb: (0, d, rb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vm1, 1, ROWS_PER_CELL, W),
                         lambda d, rb: (0, d, rb, 0), memory_space=pltpu.VMEM),
            smem_spec, smem_spec, smem_spec, smem_spec,
            pl.BlockSpec((ROWS_PER_CELL, C, W), lambda d, rb: (rb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, ROWS_PER_CELL, C, W),
                               lambda d, rb: (d, rb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, out_rows, C, W),
                                       ref_feature.dtype),
        scratch_shapes=[
            pltpu.VMEM((Vm1, H, W, BAND * C), view_features.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=_ARBITRARY2,
        cost_estimate=pl.CostEstimate(
            flops=2 * D * out_rows * W * KBLK * BAND * C * Vm1,
            bytes_accessed=(D * out_rows * W * C * ref_feature.dtype.itemsize
                            + Vm1 * H * W * BAND * C
                            * view_features.dtype.itemsize),
            transcendentals=0,
        ),
    )(x, y, *tables, reft, cats)
    if cw_out:
        return out                                   # (D, rows, C, W) native
    return jnp.transpose(out, (0, 1, 3, 2))          # -> (D, rows, W, C)


def pallas_sweep_supported(height: int, width: int, channels: int,
                           dtype=jnp.bfloat16) -> bool:
    """Whether the kernel's VMEM-residency / tiling assumptions hold."""
    # x2: Mosaic may double-buffer blocks even with constant index maps;
    # the (H, W, C) block's minor dim C lane-pads to 128
    src_bytes = (2 * height * width * _lane_pad(channels)
                 * jnp.dtype(dtype).itemsize)
    work_bytes = width * width * 4 * 4 + 8 * ROWS_PER_CELL * width * channels * 4
    budget = _VMEM_LIMIT - 8 * 2 ** 20
    return (height % ROWS_PER_CELL == 0
            and height >= BAND
            and width % 8 == 0
            and src_bytes + work_bytes < budget)


def _blockres_cost_supported(height: int, width: int, channels: int,
                             view_count_minus_1: int,
                             dtype=jnp.bfloat16) -> bool:
    # x2: Mosaic may double-buffer blocks even with constant index maps
    # (the r2 1152x864 V=3 compile demanded 32.1 MiB for ~12.9 MiB of
    # blocks). With the 100 MiB scoped-vmem limit the fused kernel also
    # takes V=4/5 (the benchmark driver's default view_num=4, test.py:34).
    # The (H, W, C) blocks' minor dim C lane-pads to 128.
    src_bytes = 2 * (view_count_minus_1 + 1) * height * width \
        * _lane_pad(channels) * jnp.dtype(dtype).itemsize
    work_bytes = width * width * 4 * 4 + 8 * ROWS_PER_CELL * width * channels * 4
    budget = _VMEM_LIMIT - 8 * 2 ** 20
    return (height % ROWS_PER_CELL == 0
            and height >= BAND
            and width % 8 == 0
            and src_bytes + work_bytes < budget)


def pallas_cost_supported(height: int, width: int, channels: int,
                          view_count_minus_1: int, dtype=jnp.bfloat16) -> bool:
    """Whether SOME fused cost kernel (slab-table or block-resident) fits."""
    if _preload_cchunk(height, width, channels, view_count_minus_1,
                        dtype):
        return True
    return _blockres_cost_supported(height, width, channels,
                                    view_count_minus_1, dtype)


def _coords_by_cell(homographies, H, W):
    """(D,3,3) -> x (D, H, W), y_t (D, H/ROWS, W, ROWS), both f32.

    y comes transposed within each row-block — y_t[d, rb, :, y] is the
    (W,)-column of source y coords for output row rb*ROWS+y — so the kernel
    reads its vertical tent operand in (W, 1) orientation without an
    in-kernel vector transpose, and the block's trailing dim (ROWS) is full
    (Mosaic's divisible-or-full constraint).
    """
    x, y = projected_coords(homographies, H, W)
    D = homographies.shape[0]
    x = x.reshape(D, H, W)
    y_t = jnp.transpose(y.reshape(D, H // ROWS_PER_CELL, ROWS_PER_CELL, W),
                        (0, 1, 3, 2))
    return x, y_t


def _make_warp_kernel_preload_group(H: int, W: int, G: int, C: int,
                                    tslab: bool):
    """Warp-only edition of the group slab-table kernel: same tents,
    bands, and tap matmuls as _make_cost_kernel_preload_group at Vm1=1,
    but emits the warped rows instead of the cross-view variance.

    Exists for the fused-cost VJP (r5 chip ablation: the backward's
    per-view warp recompute through the OLD single-row _sweep_kernel was
    ~120 ms of the 208 ms train cost stage — ~2.6 us/row vs the group
    kernel's ~0.6 us/row-view)."""
    RP = ROWS_PER_CELL // G
    TW = W

    def kernel(x_ref, y_ref, rb_ref, ne_ref, cats_hbm, out_ref,
               cats_vmem, sem):
        # x/y: (1, 1, ROWS, W) f32; rb/ne: (1, 1, 1, 1, RP) i32 SMEM;
        # cats_hbm: (1, H, W, BAND*C) ANY ((1, H, BAND*C, W) tslab);
        # out: (1, ROWS, C, W); cats_vmem: persistent scratch.
        src_dtype = cats_vmem.dtype
        precision = _precision_for(src_dtype)

        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            dma = pltpu.make_async_copy(cats_hbm, cats_vmem, sem)
            dma.start()
            dma.wait()

        iota_kg = jax.lax.broadcasted_iota(jnp.int32, (W, G * TW), 0)
        iota_kg = iota_kg.astype(jnp.float32)
        iota_bg = jax.lax.broadcasted_iota(jnp.int32, (BAND, G * TW), 0)
        iota_bg = iota_bg.astype(jnp.float32)

        for p in range(RP):
            ys = [G * p + g for g in range(G)]
            xcat = jnp.concatenate(
                [x_ref[0, 0, yy:yy + 1, :] for yy in ys], axis=1)
            yrows = [y_ref[0, 0, yy:yy + 1, :] for yy in ys]
            ycat = jnp.concatenate(yrows, axis=1)          # (1, G*TW)
            rbase = rb_ref[0, 0, 0, 0, p]
            nex = ne_ref[0, 0, 0, 0, p]
            wx0 = _tent_cols(iota_kg, xcat, src_dtype)     # (W, G*TW)

            def hw_of(start, wx0=wx0):
                slab = cats_vmem[0, pl.ds(start, 1)]
                if tslab:
                    slab = slab.reshape(BAND * C, W)
                    return jax.lax.dot_general(
                        slab, wx0, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision)               # (BAND*C, G*TW)
                slab = slab.reshape(W, BAND * C)
                return jax.lax.dot_general(
                    slab, wx0, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)

            def vertw(hw, start, masked, ycat=ycat):
                rows = start.astype(jnp.float32) + iota_bg
                rw = jnp.maximum(0.0, 1.0 - jnp.abs(rows - ycat))
                if masked is not None:
                    lo, hi = masked
                    keep = ((rows >= lo.astype(jnp.float32))
                            & (rows <= hi.astype(jnp.float32)))
                    rw = jnp.where(keep, rw, 0.0)
                rw = rw.astype(jnp.float32)
                a = rw[0:1, :] * hw[0:C, :]
                for r in range(1, BAND):
                    a = a + rw[r:r + 1, :] * hw[r * C:(r + 1) * C, :]
                return a                                   # (C, G*TW)

            wv = vertw(hw_of(rbase), rbase, None)
            if _STATIC2:
                lo1 = rbase + BAND
                start1 = jnp.minimum(lo1, H - BAND)
                wv = wv + vertw(hw_of(start1), start1,
                                (lo1, lo1 + (BAND - 1)))

            def extraw(k, acc, rbase=rbase):
                lo = rbase + k * BAND
                start = jnp.minimum(lo, H - BAND)
                return acc + vertw(hw_of(start), start,
                                   (lo, lo + (BAND - 1)))

            wv = jax.lax.fori_loop(2 if _STATIC2 else 1, nex + 1,
                                   extraw, wv)
            for g in range(G):
                out_ref[0, ys[g]] = wv[:, g * TW:(g + 1) * TW].astype(
                    out_ref.dtype)

    return kernel


def _warp_preload_params(H, W, C, dtype):
    """(G, tslab) when the group slab-table warp can run (else (0, _))."""
    g, cchunk = _group_params(H, W, C, 1, dtype)
    if not cchunk or cchunk < C:
        return 0, False
    return g, (_TSLAB or False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_warp_all_depths_preload(img, homographies,
                                    interpret: bool = False):
    """Group slab-table warp: (H, W, C) by (D, 3, 3) -> (D, H, W, C)."""
    H, W, C = img.shape
    D = homographies.shape[0]
    G, tslab = _warp_preload_params(H, W, C, img.dtype)
    x, y = projected_coords(homographies, H, W)
    x = x.reshape(1, D, H, W)
    y = y.reshape(1, D, H, W)
    rows_blocks = H // ROWS_PER_CELL
    rb, ne, _jb, _ke = _group_tables(x, y, H, W, 1, W, rows_blocks, G)
    cats = _band_cats(img)[None]                 # (1, H, W, BAND*C)
    if tslab:
        cats = jnp.transpose(cats, (0, 1, 3, 2))  # (1, H, BAND*C, W)
    RP = ROWS_PER_CELL // G
    smem_spec = pl.BlockSpec((1, 1, 1, 1, RP),
                             lambda d, rbk: (0, d, rbk, 0, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _make_warp_kernel_preload_group(H, W, G, C, tslab),
        grid=(D, rows_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, ROWS_PER_CELL, W),
                         lambda d, rbk: (0, d, rbk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ROWS_PER_CELL, W),
                         lambda d, rbk: (0, d, rbk, 0),
                         memory_space=pltpu.VMEM),
            smem_spec, smem_spec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, ROWS_PER_CELL, C, W),
                               lambda d, rbk: (d, rbk, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, H, C, W), img.dtype),
        scratch_shapes=[
            pltpu.VMEM(cats.shape, img.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=_ARBITRARY2,
        cost_estimate=pl.CostEstimate(
            flops=2 * D * H * W * W * BAND * C,
            bytes_accessed=(D * H * W * C * img.dtype.itemsize
                            + H * W * BAND * C * img.dtype.itemsize),
            transcendentals=0,
        ),
    )(x, y, rb, ne, cats)
    return jnp.transpose(out, (0, 1, 3, 2))      # (D, H, W, C)


# The VJP's warp recompute routes the group kernel when it fits (r5
# ablation: the single-row recompute was ~120 ms of the 208 ms train
# cost stage). MVSNET_TPU_COSTAD_GWARP=0 restores the old path.
_GWARP = _os.environ.get("MVSNET_TPU_COSTAD_GWARP", "1") not in ("0", "")


def _warp_for_bwd(img, homographies, interpret: bool = False):
    H, W, C = img.shape
    if (_GWARP and not interpret
            and _warp_preload_params(H, W, C, img.dtype)[0] >= 2):
        return _pallas_warp_all_depths_preload(img, homographies,
                                               interpret=interpret)
    return pallas_warp_all_depths(img, homographies, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_warp_all_depths(img, homographies, interpret: bool = False):
    """Warp (H, W, C) by (D, 3, 3) homographies -> (D, H, W, C).

    Drop-in for ops.cost_volume._warp_all_depths (zero-fill bilinear).
    """
    H, W, C = img.shape
    D = homographies.shape[0]
    assert H % ROWS_PER_CELL == 0, (H, ROWS_PER_CELL)

    x, y_t = _coords_by_cell(homographies, H, W)

    grid = (D, H // ROWS_PER_CELL)
    return pl.pallas_call(
        _sweep_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ROWS_PER_CELL, W),
                         lambda d, rb: (d, rb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, ROWS_PER_CELL),
                         lambda d, rb: (d, rb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W, C), lambda d, rb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS_PER_CELL, W, C),
                               lambda d, rb: (d, rb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, H, W, C), img.dtype),
        interpret=interpret,
        compiler_params=_PARALLEL2,
        cost_estimate=pl.CostEstimate(
            flops=2 * D * H * W * W * BAND * C,
            bytes_accessed=(D * H * W * C * img.dtype.itemsize
                            + H * W * C * img.dtype.itemsize
                            + 2 * D * H * W * 4),
            transcendentals=0,
        ),
    )(x, y_t, img)


def _transpose_kernel(x_ref, yt_ref, g_ref, out_ref):
    """Transposed warp (the VJP of _sweep_kernel wrt the source image).

    Per (depth, row-block) grid cell, scatter the block's output-row
    cotangents back through the SAME tent matrices, transposed —
    accumulating into the (H, C, W) channel-second-minor cotangent block,
    whose constant index map persists across the (sequential) grid:

      d_src[start+r, c, j] += sum_x wx[j, x] * rw[r, x] * g[x, c]

    computed as ONE (W, BAND*C) x (W, W) matmul per output row emitted in
    (BAND*C, W) orientation, so the band lands as a SINGLE dynamic
    block-accumulate out[ds(start, BAND)] += contrib.reshape(BAND, C, W)
    — the prior (H, W, C) edition issued BAND accumulating row-writes
    per block (16 dynamic RMW stores per output row at _STATIC2), and
    that scalar-address scatter dominated the train-time cost stage
    (~120 ms fwd+bwd regardless of the forward's formulation).

    x_ref: (1, ROWS, W) coords; yt_ref: (1, 1, W, ROWS) transposed y;
    g_ref: (1, ROWS, W, C) cotangent rows; out_ref: (H, C, W) f32
    accumulator (the wrapper transposes back to (H, W, C)).
    """
    H, C, W = out_ref.shape
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    iota_j = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0).astype(jnp.float32)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (W, BAND), 1).astype(jnp.float32)

    for y in range(ROWS_PER_CELL):
        xrow = x_ref[0, y:y + 1, :]
        ycol = yt_ref[0, 0, :, y:y + 1]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(iota_j - xrow))         # (W, W)
        g_row = g_ref[0, y, :, :].astype(jnp.float32)               # (W, C)
        rbase, nextra = _band_starts(ycol, H)

        def block(start, masked):
            rows = start.astype(jnp.float32) + iota_b               # (W, BAND)
            rw = jnp.maximum(0.0, 1.0 - jnp.abs(rows - ycol))
            if masked is not None:
                lo, hi = masked
                keep = ((rows >= lo.astype(jnp.float32))
                        & (rows <= hi.astype(jnp.float32)))
                rw = jnp.where(keep, rw, 0.0)
            rhs = jnp.concatenate(
                [rw[:, r:r + 1] * g_row for r in range(BAND)], axis=1)
            # d_band[(r, c), j] = sum_x rhs[x, (r, c)] wx[j, x]
            contrib = jax.lax.dot_general(
                rhs, wx, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # (BAND*C, W)
            out_ref[pl.ds(start, BAND)] += contrib.reshape(BAND, C, W)

        # straight-line second block, residual loop from k=2 (see _warp_row)
        block(rbase, None)
        if _STATIC2:
            lo1 = rbase + BAND
            block(jnp.minimum(lo1, H - BAND), (lo1, lo1 + (BAND - 1)))

        def extra(k, _):
            lo = rbase + k * BAND
            start = jnp.minimum(lo, H - BAND)
            block(start, (lo, lo + (BAND - 1)))
            return 0

        jax.lax.fori_loop(2 if _STATIC2 else 1, nextra + 1, extra, 0)


@functools.partial(jax.jit, static_argnames=("H", "W", "C", "interpret"))
def _pallas_warp_transpose(g, homographies, H, W, C, interpret: bool = False):
    """dL/dsrc for the all-depths warp: (D, H, W, C) cotangent -> (H, W, C)."""
    D = homographies.shape[0]
    x, y_t = _coords_by_cell(homographies, H, W)
    out = pl.pallas_call(
        _transpose_kernel,
        grid=(D, H // ROWS_PER_CELL),
        in_specs=[
            pl.BlockSpec((1, ROWS_PER_CELL, W), lambda d, rb: (d, rb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, ROWS_PER_CELL),
                         lambda d, rb: (d, rb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS_PER_CELL, W, C), lambda d, rb: (d, rb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, C, W), lambda d, rb: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, C, W), jnp.float32),
        interpret=interpret,
        compiler_params=_ARBITRARY2,
    )(x, y_t, g)
    return jnp.transpose(out, (0, 2, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_warp_all_depths_ad(img, homographies, interpret: bool = False):
    """Differentiable Pallas warp: custom VJP via the transposed-warp kernel.

    The warp is linear in `img`, so the VJP is exact (the same tent
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


# Peak f32 bwd working set for the fused-cost VJP (all V volumes of one
# depth chunk live at once); matches cost_volume.py's accumulator bound.
_COST_AD_CHUNK_BYTES = 2 * 1024 ** 3
# Diagnostic ablations for the VJP backward (WRONG NUMERICS — bench-only,
# VERDICT r5 #2: decompose the 208 ms train cost stage the way r4c
# ablated the forward):
#   warp  = skip the per-view warp recompute (warped := ref broadcast)
#   elem  = skip the mean/cotangent elementwise (cot := gd)
#   tpose = skip the transposed-warp scatter (d_view := cot depth-sum)
_COSTAD_ABLATE = _os.environ.get("MVSNET_TPU_COSTAD_ABLATE", "")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_sweep_cost_volume_ad(ref_feature, view_features, homographies,
                                interpret: bool = False,
                                cw_out: bool = False):
    """Differentiable fused variance cost volume (custom VJP).

    Forward runs the fused warp+variance kernel — no per-view warped
    volumes in HBM and no autodiff residuals beyond the inputs (the
    plain differentiable path makes JAX save every warped volume for
    the backward). Backward recomputes each view's warp with the
    forward sweep kernel and routes the variance cotangent through the
    transposed-warp kernel:

        cost_d = (1/V) (ref^2 + sum_v w_vd^2) - mean_d^2
        d cost_d / d ref   = (2/V) (ref  - mean_d)
        d cost_d / d w_vd  = (2/V) (w_vd - mean_d)

    Camera/homography cotangents are zero (cameras are data in every
    training path; same contract as pallas_warp_all_depths_ad).
    Replaces the reference's train-time cost assembly
    (mvsnet/model.py:314-334) with an O(inputs)-residual formulation.
    """
    return pallas_sweep_cost_volume(ref_feature, view_features, homographies,
                                    interpret=interpret, cw_out=cw_out)


def _cost_ad_fwd(ref_feature, view_features, homographies, interpret, cw_out):
    out = pallas_sweep_cost_volume(ref_feature, view_features, homographies,
                                   interpret=interpret, cw_out=cw_out)
    return out, (ref_feature, view_features, homographies)


def _cost_ad_bwd(interpret, cw_out, residuals, g):
    ref, views, homs = residuals
    H, W, C = ref.shape
    Vm1, D = homs.shape[:2]
    V = Vm1 + 1
    if cw_out:
        g = jnp.swapaxes(g, -1, -2)                     # -> (D, H, W, C)
    g32 = g.astype(jnp.float32)
    ref32 = ref.astype(jnp.float32)

    n_chunks = max(1, -(-(V * D * H * W * C * 4) // _COST_AD_CHUNK_BYTES))
    dc = -(-D // n_chunks)

    d_ref = jnp.zeros((H, W, C), jnp.float32)
    d_views = [jnp.zeros((H, W, C), jnp.float32) for _ in range(Vm1)]
    scale = 2.0 / V
    for c0 in range(0, D, dc):
        gd = g32[c0:c0 + dc]
        if _COSTAD_ABLATE == "warp":
            nd = gd.shape[0]
            warped = [jnp.broadcast_to(ref32[None] * (v + 2.0),
                                       (nd, H, W, C)) for v in range(Vm1)]
        else:
            warped = [_warp_for_bwd(
                views[v], homs[v, c0:c0 + dc],
                interpret=interpret).astype(jnp.float32) for v in range(Vm1)]
        if _COSTAD_ABLATE == "elem":
            # cheap per-volume anchor so XLA can't DCE the warp recompute
            anchor = sum(w[0, 0, 0, 0] for w in warped)
            d_ref = d_ref + jnp.sum(gd, axis=0) + anchor * 1e-30
            cots = [gd for _ in range(Vm1)]
        else:
            mean = ref32[None]
            for w in warped:
                mean = mean + w
            mean = mean / V
            d_ref = d_ref + scale * jnp.sum((ref32[None] - mean) * gd,
                                            axis=0)
            cots = [scale * (warped[v] - mean) * gd for v in range(Vm1)]
        for v in range(Vm1):
            if _COSTAD_ABLATE == "tpose":
                d_views[v] = d_views[v] + jnp.sum(cots[v], axis=0)
            else:
                d_views[v] = d_views[v] + _pallas_warp_transpose(
                    cots[v], homs[v, c0:c0 + dc], H, W, C,
                    interpret=interpret)
    return (d_ref.astype(ref.dtype),
            jnp.stack(d_views).astype(views.dtype),
            jnp.zeros_like(homs))


pallas_sweep_cost_volume_ad.defvjp(_cost_ad_fwd, _cost_ad_bwd)


@functools.partial(jax.jit, static_argnames=("interpret", "cw_out"))
def pallas_sweep_cost_volume(ref_feature, view_features, homographies,
                             interpret: bool = False, cw_out: bool = False):
    """Fused variance cost volume for one batch element.

    Dispatches to the slab-table preload kernel (C-chunked to fit VMEM
    at any view count) or the block-resident kernel (huge H*W).

    Args:
      ref_feature: (H, W, C); view_features: (V-1, H, W, C);
      homographies: (V-1, D, 3, 3).
    Returns (D, H, W, C) cost in ref_feature.dtype — or (D, H, C, W)
    channel-second-minor when cw_out (free on the preload path: that IS
    the kernel's output layout).
    """
    H, W, C = ref_feature.shape
    Vm1 = homographies.shape[0]
    # The slab tables C-chunk to fit VMEM at any view count (the Vm1<=2
    # cap was round-2a conservatism; the C-chunked preload beat blockres
    # 2.6x on-chip at Vm1=2 and the per-chunk coord recompute is cheap).
    if (_group_params(H, W, C, Vm1, view_features.dtype)[1]
            or _preload_cchunk(H, W, C, Vm1, view_features.dtype)):
        return _pallas_cost_volume_preload(ref_feature, view_features,
                                           homographies, interpret=interpret,
                                           cw_out=cw_out)
    out = _pallas_cost_volume_blockres(ref_feature, view_features,
                                       homographies, interpret=interpret)
    return jnp.swapaxes(out, -1, -2) if cw_out else out


def _pallas_cost_volume_blockres(ref_feature, view_features, homographies,
                                 interpret: bool = False):
    """Block-resident fused cost volume (round-2a layout; higher-V path)."""
    H, W, C = ref_feature.shape
    Vm1, D = homographies.shape[:2]
    assert H % ROWS_PER_CELL == 0

    x, y_t = jax.vmap(lambda h_: _coords_by_cell(h_, H, W))(homographies)
    # x: (Vm1, D, H, W); y_t: (Vm1, D, H/ROWS, W, ROWS)

    grid = (D, H // ROWS_PER_CELL)
    return pl.pallas_call(
        _make_cost_kernel(Vm1),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Vm1, 1, ROWS_PER_CELL, W),
                         lambda d, rb: (0, d, rb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vm1, 1, 1, W, ROWS_PER_CELL),
                         lambda d, rb: (0, d, rb, 0, 0),
                         memory_space=pltpu.VMEM),
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
        compiler_params=_PARALLEL2,
        cost_estimate=pl.CostEstimate(
            flops=2 * D * H * W * W * BAND * C * Vm1,
            bytes_accessed=(D * H * W * C * ref_feature.dtype.itemsize
                            + (Vm1 + 1) * H * W * C * ref_feature.dtype.itemsize),
            transcendentals=0,
        ),
    )(x, y_t, ref_feature, view_features)


def pallas_cost_sharded_supported(B: int, height: int, width: int,
                                  channels: int, view_count_minus_1: int,
                                  max_d: int, mesh,
                                  dtype=jnp.bfloat16) -> bool:
    """Whether the shard_map'ed fused cost kernel can run on `mesh`.

    Each device holds the FULL source view maps (all-gathered over 'space')
    plus its local output rows, so the single-device VMEM model applies; the
    mesh axes must divide (batch, depth, rows) evenly.
    """
    if mesh is None or mesh.devices.size <= 1:
        return False
    dd = mesh.shape.get("data", 1)
    dp = mesh.shape.get("depth", 1)
    sp = mesh.shape.get("space", 1)
    if not (B % dd == 0
            and max_d % dp == 0
            and height % (sp * ROWS_PER_CELL) == 0):
        return False
    if _preload_cchunk(height, width, channels, view_count_minus_1,
                        dtype):
        return True
    return _blockres_cost_supported(height, width, channels,
                                    view_count_minus_1, dtype)


def _pallas_cost_volume_preload_sharded(ref_feature, view_features,
                                        homographies, mesh,
                                        interpret: bool = False):
    """shard_map'ed slab-table cost volume (the fast path, ~2.6x
    the block-resident kernel on-chip).

    Row decomposition: each device computes the output rows of its 'space'
    shard via the preload wrapper's row_offset path — the slab tables are
    built from the all-gathered full-height views, and the coords/SMEM
    band tables are sliced to the shard's rows.
    """
    from jax.sharding import PartitionSpec as P

    B, H, W, C = ref_feature.shape
    Vm1, _, D = homographies.shape[:3]
    sp = mesh.shape.get("space", 1)
    H_l = H // sp

    def local_fn(homs_l, ref_l, views_l):
        # homs_l: (Vm1, Bl, Dl, 3, 3); ref_l: (Bl, Hl, W, C);
        # views_l: (Vm1, Bl, Hl, W, C)
        views_full = jax.lax.all_gather(views_l, "space", axis=2, tiled=True)
        row0 = (jax.lax.axis_index("space") * H_l).astype(jnp.int32)
        Bl = ref_l.shape[0]
        outs = [
            _pallas_cost_volume_preload(
                ref_l[b], views_full[:, b], homs_l[:, b],
                interpret=interpret, row_offset=row0, out_rows=H_l)
            for b in range(Bl)
        ]
        return jnp.stack(outs, axis=0)                # (Bl, Dl, Hl, W, C)

    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, "data", "depth", None, None),
                  P("data", "space", None, None),
                  P(None, "data", "space", None, None)),
        out_specs=P("data", "depth", "space", None, None),
        # pallas_call does not propagate varying-mesh-axes metadata
        check_vma=False,
    )(homographies, ref_feature, view_features)


def pallas_sweep_cost_volume_sharded(ref_feature, view_features, homographies,
                                     mesh, interpret: bool = False):
    """Fused variance cost volume sharded over a ('data','depth','space')
    mesh (removes the round-1 multi-chip use_pallas=False cliff,
    parallel/infer_step.py).

    Decomposition: output rows shard over 'space' and depth planes over
    'depth' — both trivially independent in the sweep — while each device
    all-gathers the (small) source feature maps over 'space' via ICI so its
    warp can read arbitrary source rows. Batch shards over 'data'.

    Args:
      ref_feature: (B, H, W, C); view_features: (V-1, B, H, W, C);
      homographies: (V-1, B, D, 3, 3).
    Returns (B, D, H, W, C) cost in ref_feature.dtype.
    """
    from jax.sharding import PartitionSpec as P

    B, H, W, C = ref_feature.shape
    Vm1, _, D = homographies.shape[:3]
    dd = mesh.shape.get("data", 1)
    dp = mesh.shape.get("depth", 1)
    sp = mesh.shape.get("space", 1)
    assert B % dd == 0 and D % dp == 0 and H % (sp * ROWS_PER_CELL) == 0

    if _preload_cchunk(H, W, C, Vm1, view_features.dtype):
        return _pallas_cost_volume_preload_sharded(
            ref_feature, view_features, homographies, mesh,
            interpret=interpret)

    def coords(h_):                                   # (D, 3, 3) per (v, b)
        return _coords_by_cell(h_, H, W)
    x, y_t = jax.vmap(jax.vmap(coords))(homographies)
    # x: (Vm1, B, D, H, W); y_t: (Vm1, B, D, H/ROWS, W, ROWS)

    kernel = _make_cost_kernel(Vm1)

    def local_fn(x_l, yt_l, ref_l, views_l):
        # local shapes: x (Vm1, Bl, Dl, Hl, W); ref (Bl, Hl, W, C);
        # views (Vm1, Bl, Hl, W, C)
        views_full = jax.lax.all_gather(views_l, "space", axis=2, tiled=True)
        Bl, Hl = ref_l.shape[:2]
        Dl = x_l.shape[2]
        grid = (Dl, Hl // ROWS_PER_CELL)

        def one(xb, ytb, refb, viewsb):
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((Vm1, 1, ROWS_PER_CELL, W),
                                 lambda d, rb: (0, d, rb, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Vm1, 1, 1, W, ROWS_PER_CELL),
                                 lambda d, rb: (0, d, rb, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Hl, W, C), lambda d, rb: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Vm1, H, W, C), lambda d, rb: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, ROWS_PER_CELL, W, C),
                                       lambda d, rb: (d, rb, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Dl, Hl, W, C), refb.dtype),
                interpret=interpret,
                compiler_params=_PARALLEL2,
            )(xb, ytb, refb, viewsb)

        return jnp.stack([one(x_l[:, b], yt_l[:, b], ref_l[b], views_full[:, b])
                          for b in range(Bl)], axis=0)

    out = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, "data", "depth", "space", None),
                  P(None, "data", "depth", "space", None, None),
                  P("data", "space", None, None),
                  P(None, "data", "space", None, None)),
        out_specs=P("data", "depth", "space", None, None),
        # pallas_call does not propagate varying-mesh-axes metadata
        check_vma=False,
    )(x, y_t, ref_feature, view_features)
    return out
