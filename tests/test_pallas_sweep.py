"""Pallas sweep kernel vs the XLA gather warp (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mvsnet_tpu.ops.pallas.sweep import pallas_warp_all_depths, pallas_sweep_supported
from mvsnet_tpu.ops.cost_volume import _warp_all_depths


def make_homs(D, scale=1.0, rot=0.02, shift_range=12.0):
    homs = np.tile(np.eye(3, dtype=np.float32), (D, 1, 1))
    for d in range(D):
        c, s = np.cos(rot), np.sin(rot)
        homs[d] = [[scale * c, -s, shift_range * (d / max(D - 1, 1) - 0.5)],
                   [s, scale * c, 0.3 * d / max(D - 1, 1)],
                   [1e-5, -5e-6, 1.0]]
    return jnp.asarray(homs)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_xla_warp(dtype):
    rng = np.random.default_rng(0)
    H, W, C, D = 16, 24, 8, 6
    img = jnp.asarray(rng.standard_normal((H, W, C)), dtype)
    homs = make_homs(D)
    got = pallas_warp_all_depths(img, homs, interpret=True)
    expected = _warp_all_depths(img, homs, "zeros")
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(expected, np.float32),
                               atol=tol, rtol=tol)


def test_kernel_identity():
    rng = np.random.default_rng(1)
    H, W, C = 16, 16, 4
    img = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    homs = jnp.broadcast_to(jnp.eye(3), (3, 3, 3))
    out = pallas_warp_all_depths(img, homs, interpret=True)
    for d in range(3):
        np.testing.assert_allclose(np.asarray(out[d]), np.asarray(img), atol=1e-5)


def test_kernel_zero_fill_border():
    img = jnp.ones((8, 16, 4), jnp.float32)
    # shift sampling far right: right part of output reads outside -> 0
    homs = jnp.asarray(np.array([[[1, 0, 10], [0, 1, 0], [0, 0, 1]]], np.float32))
    out = np.asarray(pallas_warp_all_depths(img, homs, interpret=True))[0]
    np.testing.assert_allclose(out[:, :6, :], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[:, 6:, :], 0.0, atol=1e-6)


def test_kernel_large_vertical_shear():
    """Rotation strong enough that r0 spans many rows per output row."""
    rng = np.random.default_rng(2)
    H, W, C, D = 24, 32, 4, 2
    img = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    homs = make_homs(D, rot=0.3)
    got = pallas_warp_all_depths(img, homs, interpret=True)
    expected = _warp_all_depths(img, homs, "zeros")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)


def test_supported_predicate():
    assert pallas_sweep_supported(216, 288, 32)
    assert not pallas_sweep_supported(217, 288, 32)      # rows not divisible


def test_fused_cost_volume_matches_xla():
    from mvsnet_tpu.ops.pallas.sweep import pallas_sweep_cost_volume
    from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
    rng = np.random.default_rng(3)
    H, W, C, D, Vm1 = 16, 24, 8, 5, 2
    ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    views = jnp.asarray(rng.standard_normal((Vm1, H, W, C)), jnp.float32)
    homs = jnp.stack([make_homs(D), make_homs(D, rot=-0.03, shift_range=8.0)])
    got = pallas_sweep_cost_volume(ref, views, homs, interpret=True)
    expected = plane_sweep_cost_volume(ref[None], views[:, None], homs[:, None])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)


def test_fused_cost_volume_tiled_wide(monkeypatch):
    """NT=2 lane-tiles with banded-K windows (opt-in since round 3 —
    chip A/Bs measured tiling ~2x slower, but the masked kextra/nextra
    extra loops must stay exact for the env-forced experiments); a
    zoomed-out + rotated homography overflows both the K-window (kextra)
    and the vertical band (nextra)."""
    from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
    from mvsnet_tpu.ops.pallas.sweep import _tile_params, pallas_sweep_cost_volume

    monkeypatch.setenv("MVSNET_TPU_SWEEP_NT", "2")
    assert _tile_params(256)[0] == 2
    rng = np.random.default_rng(7)
    H, W, C, D, Vm1 = 16, 256, 4, 3, 2
    ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    views = jnp.asarray(rng.standard_normal((Vm1, H, W, C)), jnp.float32)
    homs = jnp.stack([make_homs(D, scale=1.8, rot=0.25, shift_range=30.0),
                      make_homs(D, rot=-0.05)])
    got = pallas_sweep_cost_volume(ref, views, homs, interpret=True)
    expected = plane_sweep_cost_volume(ref[None], views[:, None],
                                       homs[:, None])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("pair", ["1", "0"])
def test_fused_cost_volume_pair_rows(monkeypatch, pair):
    """Pair-row preload kernel (default since round 3; =0 restores the
    single-row kernel — both need coverage). Two output rows share one
    tent matrix + the straight-line vertical blocks. Must match the XLA
    cost volume exactly, including through the masked kextra/nextra
    loops (zoomed + rotated homography) and C-chunking."""
    import importlib

    from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
    from mvsnet_tpu.ops.pallas import sweep

    monkeypatch.setenv("MVSNET_TPU_SWEEP_PAIR", pair)
    importlib.reload(sweep)
    try:
        rng = np.random.default_rng(11)
        H, W, C, D, Vm1 = 32, 256, 8, 3, 2
        ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
        views = jnp.asarray(rng.standard_normal((Vm1, H, W, C)), jnp.float32)
        homs = jnp.stack([make_homs(D, scale=1.8, rot=0.25, shift_range=30.0),
                          make_homs(D, rot=-0.05)])
        assert sweep._PAIR == (pair == "1")
        if pair == "1":
            # default group size is 4 since the r3b chip A/B; W=256 is
            # quad-splittable so the quad kernel dispatches
            assert sweep._group_params(H, W, C, Vm1, jnp.float32) == (4, C)
        got = sweep._pallas_cost_volume_preload(ref, views, homs,
                                                interpret=True)
        expected = plane_sweep_cost_volume(ref[None], views[:, None],
                                           homs[:, None])[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   atol=1e-4, rtol=1e-4)
    finally:
        monkeypatch.delenv("MVSNET_TPU_SWEEP_PAIR")
        importlib.reload(sweep)


@pytest.mark.parametrize("group,width", [("4", 256), ("4", 272), ("8", 256),
                                         ("4", 400)])
def test_fused_cost_volume_group_rows(monkeypatch, group, width):
    """MVSNET_TPU_SWEEP_GROUP=4/8: G adjacent output rows share one tent
    matrix + vertical blocks. Eligibility is W % 16 == 0 at any G (the
    GRU point W=400 class: lane offsets at non-128 multiples), so
    W=272/408 take the quad too. Strong zoom+rotation forces the masked
    nextra/kextra extras to really run over the G-row union span."""
    import importlib

    from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
    from mvsnet_tpu.ops.pallas import sweep

    monkeypatch.setenv("MVSNET_TPU_SWEEP_GROUP", group)
    importlib.reload(sweep)
    try:
        rng = np.random.default_rng(17)
        H, W, C, D, Vm1 = 32, width, 8, 3, 2
        expect_g = int(group) if W % 16 == 0 else 2
        assert sweep._group_params(H, W, C, Vm1, jnp.float32)[0] == expect_g
        ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
        views = jnp.asarray(rng.standard_normal((Vm1, H, W, C)),
                            jnp.float32)
        homs = jnp.stack([make_homs(D, scale=1.8, rot=0.25,
                                    shift_range=30.0),
                          make_homs(D, rot=-0.05)])
        got = sweep._pallas_cost_volume_preload(ref, views, homs,
                                                interpret=True)
        expected = plane_sweep_cost_volume(ref[None], views[:, None],
                                           homs[:, None])[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   atol=1e-4, rtol=1e-4)
    finally:
        monkeypatch.delenv("MVSNET_TPU_SWEEP_GROUP")
        importlib.reload(sweep)


@pytest.mark.parametrize("tent16", ["0", "1"])
def test_fused_cost_volume_group_bf16_tent16(monkeypatch, tent16):
    """bf16 group kernel with the tent tail computed in bf16
    (MVSNET_TPU_SWEEP_TENT16=1) vs f32-then-cast (=0). The subtraction
    cols - x stays f32 in both; weights are bf16-rounded in both — the
    two paths must agree with the XLA cost volume at bf16 tolerance."""
    import importlib

    from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
    from mvsnet_tpu.ops.pallas import sweep

    monkeypatch.setenv("MVSNET_TPU_SWEEP_TENT16", tent16)
    importlib.reload(sweep)
    try:
        assert sweep._TENT16 == (tent16 == "1")
        rng = np.random.default_rng(23)
        H, W, C, D, Vm1 = 32, 256, 8, 3, 2
        ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.bfloat16)
        views = jnp.asarray(rng.standard_normal((Vm1, H, W, C)),
                            jnp.bfloat16)
        homs = jnp.stack([make_homs(D, scale=1.8, rot=0.25,
                                    shift_range=30.0),
                          make_homs(D, rot=-0.05)])
        got = sweep._pallas_cost_volume_preload(ref, views, homs,
                                                interpret=True)
        expected = plane_sweep_cost_volume(
            ref[None].astype(jnp.float32), views[:, None].astype(jnp.float32),
            homs[:, None])[0]
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(expected), atol=5e-2,
                                   rtol=5e-2)
    finally:
        monkeypatch.delenv("MVSNET_TPU_SWEEP_TENT16")
        importlib.reload(sweep)


@pytest.mark.parametrize("comb16,mm2,dtype,wide", [
    ("1", "0", jnp.bfloat16, "0"),   # bf16 vertical combine
    ("0", "1", jnp.bfloat16, "0"),   # reordered block matmuls
    ("1", "1", jnp.bfloat16, "0"),   # both
    ("0", "1", jnp.float32, "0"),    # MM2 must be layout-only at f32
    ("0", "0", jnp.float32, "1"),    # WIDE full-width combine
    ("1", "0", jnp.bfloat16, "1"),   # WIDE + bf16 combine
    ("0", "0", jnp.bfloat16, "2"),   # TSLAB transposed tables
    ("0", "0", jnp.float32, "3"),    # TSLAB + WIDE
])
def test_fused_cost_volume_group_comb16_mm2(monkeypatch, comb16, mm2,
                                            dtype, wide):
    """MVSNET_TPU_SWEEP_COMB16 (bf16 vertical combine, f32 variance
    accumulation), MVSNET_TPU_SWEEP_MM2 (both static blocks' tap
    matmuls issued before either combine), and MVSNET_TPU_SWEEP_WIDE
    (full-width combine + wide variance epilogue) against the XLA cost
    volume. MM2/WIDE are op-count/order changes only."""
    import importlib

    from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
    from mvsnet_tpu.ops.pallas import sweep

    tslab = wide in ("2", "3")
    monkeypatch.setenv("MVSNET_TPU_SWEEP_COMB16", comb16)
    monkeypatch.setenv("MVSNET_TPU_SWEEP_MM2", mm2)
    monkeypatch.setenv("MVSNET_TPU_SWEEP_WIDE",
                       "1" if wide in ("1", "3") else "0")
    monkeypatch.setenv("MVSNET_TPU_SWEEP_TSLAB", "1" if tslab else "0")
    importlib.reload(sweep)
    try:
        assert sweep._COMB16 == (comb16 == "1")
        assert sweep._MM2 == (mm2 == "1")
        assert sweep._WIDE == (wide in ("1", "3"))
        assert sweep._TSLAB == tslab
        rng = np.random.default_rng(29)
        H, W, C, D, Vm1 = 32, 256, 8, 3, 2
        ref = jnp.asarray(rng.standard_normal((H, W, C)), dtype)
        views = jnp.asarray(rng.standard_normal((Vm1, H, W, C)), dtype)
        homs = jnp.stack([make_homs(D, scale=1.8, rot=0.25,
                                    shift_range=30.0),
                          make_homs(D, rot=-0.05)])
        got = sweep._pallas_cost_volume_preload(ref, views, homs,
                                                interpret=True)
        expected = plane_sweep_cost_volume(
            ref[None].astype(jnp.float32), views[:, None].astype(jnp.float32),
            homs[:, None])[0]
        tol = 1e-4 if dtype == jnp.float32 else 5e-2
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(expected), atol=tol, rtol=tol)
    finally:
        monkeypatch.delenv("MVSNET_TPU_SWEEP_COMB16")
        monkeypatch.delenv("MVSNET_TPU_SWEEP_MM2")
        monkeypatch.delenv("MVSNET_TPU_SWEEP_WIDE")
        monkeypatch.delenv("MVSNET_TPU_SWEEP_TSLAB")
        importlib.reload(sweep)


@pytest.mark.parametrize("shape,cw", [
    ((3, 16, 24, 8, 8), False), ((2, 16, 24, 16, 16), False),
    ((3, 9, 16, 3, 8), False), ((3, 16, 24, 8, 8), True),
])
def test_conv2d_bpack_matches_xla(monkeypatch, shape, cw):
    """MVSNET_TPU_CONV_BPACK=1: the batch rides the lane axis (one call
    per layer instead of B sequential pallas_calls, roll-free seam-masked
    dx). Forward + CW layout + fused bias/ReLU vs XLA."""
    from mvsnet_tpu.ops.pallas import conv2d

    monkeypatch.setenv("MVSNET_TPU_CONV_BPACK", "1")
    B, H, W, C, Co = shape
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Co,)), jnp.float32)
    exp = jnp.maximum(conv2d._xla_conv2d(x, k) + b, 0.0)
    if cw:
        got = conv2d._rowconv2d_fwd_impl(
            jnp.swapaxes(x, -1, -2), k, b, relu=True, interpret=True,
            cw_in=True, cw_out=True)
        got = jnp.swapaxes(got, -1, -2)
    else:
        got = conv2d._rowconv2d_fwd_impl(x, k, b, relu=True,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("K,cin,cout", [(3, 3, 16), (5, 8, 16)])
def test_conv2d_s2_tap_split_matches_xla(monkeypatch, K, cin, cout):
    """MVSNET_TPU_CONV2D_S2SPLIT: parity-split s2 tap matmuls (2D analog
    of the chip-won conv3d split), 3x3 and 5x5, fused bias/ReLU."""
    import importlib

    from mvsnet_tpu.ops.pallas import conv2d

    monkeypatch.setenv("MVSNET_TPU_CONV2D_S2SPLIT", "1")
    importlib.reload(conv2d)
    try:
        assert conv2d._S2SPLIT2D
        rng = np.random.default_rng(19)
        x = jnp.asarray(rng.standard_normal((2, 16, 32, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((K, K, cin, cout)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        got = conv2d._rowconv2d_s2_fwd_impl(x, k, b, relu=True,
                                            interpret=True)
        exp = jnp.maximum(conv2d._xla_conv2d_s2(x, k) + b, 0.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   atol=2e-5, rtol=1e-5)
    finally:
        monkeypatch.delenv("MVSNET_TPU_CONV2D_S2SPLIT")
        importlib.reload(conv2d)


def test_s2_and_deconv2d_bpack_match_xla(monkeypatch):
    """BPACK for the s2 conv (lane-shift-free tables, pack is free) and
    the parity-split deconv (seam-masked dx=2 shift)."""
    from mvsnet_tpu.ops.pallas import conv2d, deconv2d

    monkeypatch.setenv("MVSNET_TPU_CONV_BPACK", "1")
    rng = np.random.default_rng(37)
    for K in (3, 5):
        x = jnp.asarray(rng.standard_normal((3, 16, 32, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((K, K, 8, 16)) * 0.2,
                        jnp.float32)
        got = conv2d._rowconv2d_s2_fwd_impl(x, k, interpret=True)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(conv2d._xla_conv2d_s2(x, k)),
                                   atol=1e-4, rtol=1e-4)
    x = jnp.asarray(rng.standard_normal((3, 8, 16, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    got = deconv2d._rowdeconv2d_fwd_impl(
        jnp.swapaxes(x, -1, -2), k, b, relu=True, interpret=True,
        cw_in=True, cw_out=True)
    exp = jnp.maximum(deconv2d._xla_deconv2d(x, k) + b, 0.0)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(got, -1, -2)),
                               np.asarray(exp), atol=1e-4, rtol=1e-4)


def test_feature_tower_bpack_matches_default(monkeypatch):
    """The full UNetDS2GN tower (B=3 views) under MVSNET_TPU_CONV_BPACK=1
    must match the default path bit-for-bit-ish at f32."""
    import jax

    from mvsnet_tpu.models.feature_net import UNetDS2GN

    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.standard_normal((3, 64, 64, 3)), jnp.float32)
    net = UNetDS2GN("normal", dtype=jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x[:1])
    base = np.asarray(net.apply(params, x))
    monkeypatch.setenv("MVSNET_TPU_CONV_BPACK", "1")
    monkeypatch.setenv("MVSNET_TPU_FORCE_PALLAS_CONV", "1")
    got = np.asarray(net.apply(params, x))
    np.testing.assert_allclose(got, base, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("band,pair", [("12", "1"), ("12", "0"),
                                       ("16", "1")])
def test_fused_cost_volume_single_block_band(monkeypatch, band, pair):
    """BAND >= 12 switches both kernels to ONE static vertical block +
    masked fori extras (_STATIC2 False). A strong rotation makes the
    per-row span exceed BAND so the extra blocks actually run, and the
    shifts overflow the right edge for the zero-fill masks."""
    import importlib

    from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
    from mvsnet_tpu.ops.pallas import sweep

    monkeypatch.setenv("MVSNET_TPU_SWEEP_BAND", band)
    monkeypatch.setenv("MVSNET_TPU_SWEEP_PAIR", pair)
    importlib.reload(sweep)
    try:
        assert sweep.BAND == int(band) and not sweep._STATIC2
        rng = np.random.default_rng(13)
        H, W, C, D, Vm1 = 32, 32, 4, 3, 2
        ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
        views = jnp.asarray(rng.standard_normal((Vm1, H, W, C)),
                            jnp.float32)
        homs = jnp.stack([make_homs(D, rot=0.5, shift_range=20.0),
                          make_homs(D, rot=-0.06)])
        got = sweep._pallas_cost_volume_preload(ref, views, homs,
                                                interpret=True)
        expected = plane_sweep_cost_volume(ref[None], views[:, None],
                                           homs[:, None])[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   atol=1e-4, rtol=1e-4)
    finally:
        monkeypatch.delenv("MVSNET_TPU_SWEEP_BAND")
        monkeypatch.delenv("MVSNET_TPU_SWEEP_PAIR")
        importlib.reload(sweep)


def test_fused_cost_volume_cchunked():
    """When the slab tables overflow VMEM (GRU point), the preload wrapper
    splits channels; numerics must match the unsplit kernel exactly."""
    import unittest.mock as mock

    from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
    from mvsnet_tpu.ops.pallas import sweep

    rng = np.random.default_rng(8)
    # C=32 so the half-chunk's lane-padded tables (8*16=128 lanes) really
    # are half the full-C ones (256 lanes) under the padded VMEM model
    H, W, C, D, Vm1 = 16, 24, 32, 4, 2
    ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    views = jnp.asarray(rng.standard_normal((Vm1, H, W, C)), jnp.float32)
    homs = jnp.stack([make_homs(D), make_homs(D, rot=-0.03)])
    expected = plane_sweep_cost_volume(ref[None], views[:, None],
                                       homs[:, None])[0]
    # full-C f32 slab-table bytes under the active layout (TSLAB stores
    # (H, BAND*C, W) and lane-pads W; the classic layout pads BAND*C)
    if sweep._TSLAB:
        table = Vm1 * H * sweep.BAND * C * sweep._lane_pad(W) * 4
    else:
        table = Vm1 * H * W * sweep._lane_pad(sweep.BAND * C) * 4
    with mock.patch.object(sweep, "_VMEM_LIMIT",
                           8 * 2 ** 20 + table // 2 + 100 * 1024):
        assert sweep._preload_cchunk(H, W, C, Vm1, jnp.float32) == C // 2
        got = sweep._pallas_cost_volume_preload(ref, views, homs,
                                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)


def test_fused_cost_volume_identity_views_zero():
    from mvsnet_tpu.ops.pallas.sweep import pallas_sweep_cost_volume
    rng = np.random.default_rng(4)
    H, W, C, D = 8, 16, 4, 3
    ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    views = jnp.stack([ref, ref])
    homs = jnp.broadcast_to(jnp.eye(3), (2, D, 3, 3))
    out = np.asarray(pallas_sweep_cost_volume(ref, views, homs, interpret=True))
    np.testing.assert_allclose(out, 0.0, atol=1e-5)


def test_warp_vjp_matches_xla():
    """Custom VJP (transposed-warp kernel) == autodiff of the XLA warp."""
    from mvsnet_tpu.ops.pallas.sweep import pallas_warp_all_depths_ad
    rng = np.random.default_rng(5)
    H, W, C, D = 16, 24, 8, 4
    img = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    homs = make_homs(D)
    g = jnp.asarray(rng.standard_normal((D, H, W, C)), jnp.float32)

    def loss_p(im):
        return jnp.sum(pallas_warp_all_depths_ad(im, homs, True) * g)

    def loss_x(im):
        return jnp.sum(_warp_all_depths(im, homs, "zeros") * g)

    gp = jax.grad(loss_p)(img)
    gx = jax.grad(loss_x)(img)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=2e-4, rtol=2e-4)


def test_warp_vjp_forward_unchanged():
    from mvsnet_tpu.ops.pallas.sweep import pallas_warp_all_depths_ad, pallas_warp_all_depths
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.standard_normal((8, 16, 4)), jnp.float32)
    homs = make_homs(3)
    np.testing.assert_allclose(
        np.asarray(pallas_warp_all_depths_ad(img, homs, True)),
        np.asarray(pallas_warp_all_depths(img, homs, interpret=True)), atol=1e-6)


@pytest.mark.parametrize("cw_out", [False, True])
def test_fused_cost_vjp_matches_xla(cw_out):
    """Fused-cost custom VJP (MVSNET_TPU_COST_AD path) == autodiff of the
    XLA gather cost volume, values and grads, NHWC and CW layouts."""
    from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
    from mvsnet_tpu.ops.pallas.sweep import pallas_sweep_cost_volume_ad
    rng = np.random.default_rng(11)
    H, W, C, D, Vm1 = 16, 24, 8, 5, 2
    ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    views = jnp.asarray(rng.standard_normal((Vm1, H, W, C)), jnp.float32)
    homs = jnp.stack([make_homs(D), make_homs(D, rot=-0.03, shift_range=8.0)])
    g = jnp.asarray(rng.standard_normal((D, H, W, C)), jnp.float32)
    gk = jnp.swapaxes(g, -1, -2) if cw_out else g

    def loss_p(r, v):
        return jnp.sum(pallas_sweep_cost_volume_ad(r, v, homs, True,
                                                   cw_out) * gk)

    def loss_x(r, v):
        cost = plane_sweep_cost_volume(r[None], v[:, None], homs[:, None],
                                       use_pallas=False,
                                       differentiable=True)[0]
        return jnp.sum(cost * g)

    got = pallas_sweep_cost_volume_ad(ref, views, homs, True, cw_out)
    if cw_out:
        got = jnp.swapaxes(got, -1, -2)
    exp = plane_sweep_cost_volume(ref[None], views[:, None], homs[:, None],
                                  use_pallas=False)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               atol=1e-4, rtol=1e-4)
    gr_p, gv_p = jax.grad(loss_p, (0, 1))(ref, views)
    gr_x, gv_x = jax.grad(loss_x, (0, 1))(ref, views)
    np.testing.assert_allclose(np.asarray(gr_p), np.asarray(gr_x),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_x),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("extra_env", [
    {}, {"MVSNET_TPU_SWEEP_WIDE": "1"},
    {"MVSNET_TPU_SWEEP_TSLAB": "1", "MVSNET_TPU_SWEEP_WIDE": "1"},
])
def test_cost_volume_xpipe_matches_xla(monkeypatch, extra_env):
    """MVSNET_TPU_SWEEP_XPIPE (cross-instance tent pipeline) is a pure
    reorder: results match XLA under every knob combo it composes with."""
    import importlib

    from mvsnet_tpu.ops.pallas import sweep as sweep_mod
    from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume

    monkeypatch.setenv("MVSNET_TPU_SWEEP_XPIPE", "1")
    for k, v in extra_env.items():
        monkeypatch.setenv(k, v)
    importlib.reload(sweep_mod)
    try:
        assert sweep_mod._XPIPE
        rng = np.random.default_rng(17)
        H, W, C, D, Vm1 = 16, 32, 8, 5, 2
        ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
        views = jnp.asarray(rng.standard_normal((Vm1, H, W, C)), jnp.float32)
        homs = jnp.stack([make_homs(D), make_homs(D, rot=-0.04,
                                                  shift_range=9.0)])
        got = sweep_mod.pallas_sweep_cost_volume(ref, views, homs,
                                                 interpret=True)
        exp = plane_sweep_cost_volume(ref[None], views[:, None],
                                      homs[:, None], use_pallas=False)[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   atol=1e-4, rtol=1e-4)
    finally:
        monkeypatch.delenv("MVSNET_TPU_SWEEP_XPIPE")
        for k in extra_env:
            monkeypatch.delenv(k)
        importlib.reload(sweep_mod)


def test_fused_cost_vjp_depth_chunked(monkeypatch):
    """The bwd's D-chunk loop is exact: force 3 chunks and compare grads
    against the single-chunk run."""
    from mvsnet_tpu.ops.pallas import sweep as sweep_mod
    rng = np.random.default_rng(12)
    H, W, C, D, Vm1 = 16, 24, 4, 6, 2
    ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    views = jnp.asarray(rng.standard_normal((Vm1, H, W, C)), jnp.float32)
    homs = jnp.stack([make_homs(D), make_homs(D, rot=0.04)])
    g = jnp.asarray(rng.standard_normal((D, H, W, C)), jnp.float32)

    def loss(r, v):
        return jnp.sum(sweep_mod.pallas_sweep_cost_volume_ad(
            r, v, homs, True, False) * g)

    g1 = jax.grad(loss, (0, 1))(ref, views)
    vol_bytes = (Vm1 + 1) * D * H * W * C * 4
    monkeypatch.setattr(sweep_mod, "_COST_AD_CHUNK_BYTES", vol_bytes // 3 + 1)
    g3 = jax.grad(loss, (0, 1))(ref, views)
    for a, b in zip(g1, g3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("vm1", [2, 3])
def test_sharded_cost_volume_matches_single_device(vm1):
    """shard_map'ed fused kernel on the 8-device CPU mesh == the XLA cost
    volume (VERDICT r1 weak #4: multi-chip inference used to abandon the
    Pallas kernel entirely). Vm1=2 routes the slab-table preload kernel
    (row_offset sharding); Vm1=3 the block-resident kernel."""
    from mvsnet_tpu.ops.pallas.sweep import (
        pallas_sweep_cost_volume_sharded, pallas_cost_sharded_supported)
    from mvsnet_tpu.ops.cost_volume import plane_sweep_cost_volume
    from mvsnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)                          # ('data','depth','space')=(2,2,2)
    rng = np.random.default_rng(7)
    B, H, W, C, D = 2, 16, 24, 8, 4
    assert pallas_cost_sharded_supported(B, H, W, C, vm1, D, mesh, jnp.float32)
    ref = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    views = jnp.asarray(rng.standard_normal((vm1, B, H, W, C)), jnp.float32)
    per_view = [
        jnp.stack([make_homs(D), make_homs(D, rot=-0.03, shift_range=8.0)]),
        jnp.stack([make_homs(D, rot=0.05), make_homs(D, shift_range=4.0)]),
        jnp.stack([make_homs(D, rot=-0.02), make_homs(D, shift_range=2.0)]),
    ]
    homs = jnp.stack(per_view[:vm1], axis=0)     # (Vm1, B, D, 3, 3)
    got = pallas_sweep_cost_volume_sharded(ref, views, homs, mesh,
                                           interpret=True)
    expected = plane_sweep_cost_volume(ref, views, homs, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)


def test_sharded_supported_predicate():
    from mvsnet_tpu.ops.pallas.sweep import pallas_cost_sharded_supported
    from mvsnet_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(8)
    assert not pallas_cost_sharded_supported(1, 16, 24, 8, 2, 4, mesh)   # B % data
    assert not pallas_cost_sharded_supported(2, 16, 24, 8, 2, 3, mesh)   # D % depth
    assert not pallas_cost_sharded_supported(2, 24, 24, 8, 2, 4, mesh)   # H % (sp*8)
    assert not pallas_cost_sharded_supported(2, 16, 24, 8, 2, 4, None)


class TestRowConv3D:
    """Per-slab wide-N conv kernel (ops/pallas/conv3d.py) vs the XLA conv."""

    @pytest.mark.parametrize("cin,cout", [(32, 8), (16, 16), (8, 1)])
    def test_matches_xla_conv(self, cin, cout):
        from mvsnet_tpu.ops.pallas.conv3d import (
            _xla_conv3d,
            rowconv3d_interpret,
        )

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((1, 5, 16, 24, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        ref = np.asarray(_xla_conv3d(x, k))
        got = np.asarray(rowconv3d_interpret(x, k))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    @pytest.mark.parametrize("H", [6, 9])  # PACK=2 and PACK=1 fallbacks
    def test_pack_fallbacks_match_xla(self, H):
        from mvsnet_tpu.ops.pallas.conv3d import (
            _xla_conv3d,
            rowconv3d_interpret,
        )

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((1, 4, H, 16, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 8)) * 0.1,
                        jnp.float32)
        np.testing.assert_allclose(np.asarray(rowconv3d_interpret(x, k)),
                                   np.asarray(_xla_conv3d(x, k)),
                                   atol=2e-5, rtol=1e-5)

    def test_batched(self):
        from mvsnet_tpu.ops.pallas.conv3d import (
            _xla_conv3d,
            rowconv3d_interpret,
        )

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 4, 8, 16, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 8)) * 0.1,
                        jnp.float32)
        np.testing.assert_allclose(np.asarray(rowconv3d_interpret(x, k)),
                                   np.asarray(_xla_conv3d(x, k)),
                                   atol=2e-5, rtol=1e-5)

    def test_custom_vjp_matches_xla_grads(self):
        from mvsnet_tpu.ops.pallas.conv3d import _xla_conv3d, rowconv3d

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 5, 16, 24, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)) * 0.1,
                        jnp.float32)
        g = jnp.asarray(rng.standard_normal((1, 5, 16, 24, 8)), jnp.float32)

        gx1, gk1 = jax.grad(
            lambda a, b: jnp.sum(_xla_conv3d(a, b) * g), (0, 1))(x, k)
        gx2, gk2 = jax.grad(
            lambda a, b: jnp.sum(rowconv3d(a, b) * g), (0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gk2), np.asarray(gk1),
                                   atol=2e-4, rtol=1e-5)

    @pytest.mark.parametrize("cin,cout,dtype", [
        (32, 8, jnp.float32), (16, 16, jnp.float32), (8, 1, jnp.float32),
        (32, 8, jnp.bfloat16),
    ])
    def test_dpack_matches_xla(self, monkeypatch, cin, cout, dtype):
        """MVSNET_TPU_CONV3D_DPACK=1: two depth slabs per grid cell,
        lane-concatenated in-kernel; the dz scatter is 2 lane-rolls + 3
        selects per row. Forward + custom-VJP grads + CW layouts +
        bias/ReLU epilogue against XLA."""
        import importlib

        from mvsnet_tpu.ops.pallas import conv3d

        monkeypatch.setenv("MVSNET_TPU_CONV3D_DPACK", "1")
        importlib.reload(conv3d)
        try:
            assert conv3d._DPACK
            rng = np.random.default_rng(7)
            x = jnp.asarray(rng.standard_normal((1, 6, 16, 24, cin)), dtype)
            k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1,
                            dtype)
            assert conv3d.rowconv3d_dpack_supported(6, 16, 24, cin, cout,
                                                    dtype)
            ref = np.asarray(conv3d._xla_conv3d(x, k), np.float32)
            got = np.asarray(conv3d.rowconv3d_interpret(x, k), np.float32)
            tol = 2e-5 if dtype == jnp.float32 else 3e-2
            np.testing.assert_allclose(got, ref, atol=tol, rtol=tol)
            if dtype != jnp.float32:
                return
            # grads through the custom VJP (dx reruns the dpack kernel)
            g = jnp.asarray(rng.standard_normal((1, 6, 16, 24, cout)),
                            jnp.float32)
            gx1, gk1 = jax.grad(
                lambda a, b: jnp.sum(conv3d._xla_conv3d(a, b) * g),
                (0, 1))(x, k)
            gx2, gk2 = jax.grad(
                lambda a, b: jnp.sum(conv3d.rowconv3d(a, b) * g),
                (0, 1))(x, k)
            np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                                       atol=2e-5, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(gk2), np.asarray(gk1),
                                       atol=2e-4, rtol=1e-5)
            # CW layout contract + fused bias/ReLU epilogue
            b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
            got_cw = conv3d.rowconv3d_fused(
                jnp.swapaxes(x, -1, -2), k, b, relu=True,
                cw_in=True, cw_out=True)
            exp = jnp.maximum(conv3d._xla_conv3d(x, k) + b, 0.0)
            np.testing.assert_allclose(
                np.asarray(jnp.swapaxes(got_cw, -1, -2)), np.asarray(exp),
                atol=2e-5, rtol=1e-5)
            # odd D is ineligible and must fall back, still exact
            x5 = jnp.asarray(rng.standard_normal((1, 5, 16, 24, cin)),
                             jnp.float32)
            np.testing.assert_allclose(
                np.asarray(conv3d.rowconv3d_interpret(x5, k)),
                np.asarray(conv3d._xla_conv3d(x5, k)), atol=2e-5, rtol=1e-5)
        finally:
            monkeypatch.delenv("MVSNET_TPU_CONV3D_DPACK")
            importlib.reload(conv3d)

    def test_supported_model(self):
        from mvsnet_tpu.ops.pallas.conv3d import rowconv3d_supported

        # the 3DCNN operating point layers
        assert rowconv3d_supported(192, 216, 288, 32, 8)
        assert rowconv3d_supported(192, 216, 288, 8, 1)
        assert rowconv3d_supported(96, 108, 144, 16, 16)
        # unaligned multi-row tap slices relayout: keep those on XLA
        assert not rowconv3d_supported(96, 108, 144, 16, 4)
        # 64-channel level-3 falls back to XLA
        assert not rowconv3d_supported(24, 27, 36, 64, 64)

    @pytest.mark.parametrize("cin,cout", [(32, 8), (16, 16)])
    def test_stride2_matches_xla_conv(self, cin, cout):
        from mvsnet_tpu.ops.pallas.conv3d import (
            _xla_conv3d,
            rowconv3d_interpret,
        )

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 6, 16, 24, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        ref = np.asarray(_xla_conv3d(x, k, 2))
        got = np.asarray(rowconv3d_interpret(x, k, 2))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_stride2_grads_match_xla(self):
        from mvsnet_tpu.ops.pallas.conv3d import _xla_conv3d, rowconv3d

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((1, 6, 16, 24, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)) * 0.1,
                        jnp.float32)
        g = jnp.asarray(rng.standard_normal((1, 3, 8, 12, 8)), jnp.float32)
        gx1, gk1 = jax.grad(
            lambda a, b: jnp.sum(_xla_conv3d(a, b, 2) * g), (0, 1))(x, k)
        gx2, gk2 = jax.grad(
            lambda a, b: jnp.sum(rowconv3d(a, b, 2) * g), (0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gk2), np.asarray(gk1),
                                   atol=2e-4, rtol=1e-5)

    @pytest.mark.parametrize("cw", [False, True])
    def test_stride2_pallas_dx_matches_xla(self, cw):
        """s2 dx via the Pallas deconv kernel (the adjoint involution):
        predicate-eligible shape (gW % 8 == 0, Cout % 8 == 0) so the
        Pallas branch actually runs, NHWC and CW contracts."""
        from mvsnet_tpu.ops.pallas.conv3d import _xla_conv3d, rowconv3d
        from mvsnet_tpu.ops.pallas.deconv3d import rowdeconv3d_supported

        assert rowdeconv3d_supported(3, 8, 8, 8, 16, jnp.float32)
        rng = np.random.default_rng(13)
        x = jnp.asarray(rng.standard_normal((1, 6, 16, 16, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)) * 0.1,
                        jnp.float32)
        g = jnp.asarray(rng.standard_normal((1, 3, 8, 8, 8)), jnp.float32)

        def loss_p(a, b):
            if cw:
                out = rowconv3d(jnp.swapaxes(a, -1, -2), b, 2,
                                cw_in=True, cw_out=True)
                out = jnp.swapaxes(out, -1, -2)
            else:
                out = rowconv3d(a, b, 2)
            return jnp.sum(out * g)

        gx1, gk1 = jax.grad(
            lambda a, b: jnp.sum(_xla_conv3d(a, b, 2) * g), (0, 1))(x, k)
        gx2, gk2 = jax.grad(loss_p, (0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gk2), np.asarray(gk1),
                                   atol=2e-4, rtol=1e-5)

    @pytest.mark.parametrize("cw", [False, True])
    def test_pwgrad_s1_matches_xla(self, monkeypatch, cw):
        """MVSNET_TPU_CONV3D_PWGRAD: Pallas s1 weight grad (in-VMEM 9-row
        G build + one MXU dot per source row) == XLA's conv wgrad."""
        import importlib

        from mvsnet_tpu.ops.pallas import conv3d

        monkeypatch.setenv("MVSNET_TPU_CONV3D_PWGRAD", "1")
        importlib.reload(conv3d)
        try:
            assert conv3d._PWGRAD
            rng = np.random.default_rng(29)
            x = jnp.asarray(rng.standard_normal((2, 6, 16, 24, 16)),
                            jnp.float32)
            k = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)) * 0.1,
                            jnp.float32)
            g = jnp.asarray(rng.standard_normal((2, 6, 16, 24, 8)),
                            jnp.float32)

            def loss_p(b):
                if cw:
                    out = conv3d.rowconv3d(jnp.swapaxes(x, -1, -2), b, 1,
                                           cw_in=True, cw_out=True)
                    out = jnp.swapaxes(out, -1, -2)
                else:
                    out = conv3d.rowconv3d(x, b, 1)
                return jnp.sum(out * g)

            gk1 = jax.grad(lambda b: jnp.sum(
                conv3d._xla_conv3d(x, b, 1) * g))(k)
            gk2 = jax.grad(loss_p)(k)
            np.testing.assert_allclose(np.asarray(gk2), np.asarray(gk1),
                                       atol=2e-4, rtol=1e-5)
        finally:
            monkeypatch.delenv("MVSNET_TPU_CONV3D_PWGRAD")
            importlib.reload(conv3d)

    def test_group_warp_preload_matches_single_row(self):
        """The VJP's group slab-table warp (_GWARP) == the single-row
        warp kernel (same tents/bands; emits rows instead of variance).
        r5 chip ablation: the single-row recompute was ~120 ms of the
        208 ms train cost stage."""
        from bench import make_rig
        from mvsnet_tpu.ops.geometry import homographies_for_views
        import mvsnet_tpu.ops.pallas.sweep as sw

        H, W, C, D = 32, 48, 16, 8
        cams = make_rig(2, W * 4, H * 4, 425.0, 2.5, D)
        cams[:, :, 1, :3, :3] *= 0.25
        cams[:, :, 1, 2, 2] = 1.0
        homs = homographies_for_views(
            jnp.asarray(cams), D, jnp.array([425.0]), jnp.array([2.5]),
            jnp.array([425.0 + 7 * 2.5]))
        h0 = jnp.asarray(np.asarray(homs)[0, 0])
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
        assert sw._warp_preload_params(H, W, C, img.dtype)[0] >= 2
        old = sw.pallas_warp_all_depths(img, h0, interpret=True)
        new = sw._pallas_warp_all_depths_preload(img, h0, interpret=True)
        np.testing.assert_allclose(np.asarray(new), np.asarray(old),
                                   atol=2e-5, rtol=1e-5)

    @pytest.mark.parametrize("case", ["s2", "s2_cw", "deconv", "deconv_cw"])
    def test_pwgrad_s2_matches_xla(self, monkeypatch, case):
        """MVSNET_TPU_CONV3D_PWGRAD_S2: Pallas s2/deconv weight grad
        (g-centric in-VMEM kernel over lane-parity pre-split source) ==
        XLA's native conv/deconv wgrad."""
        import importlib

        from mvsnet_tpu.ops.pallas import conv3d, deconv3d

        monkeypatch.setenv("MVSNET_TPU_CONV3D_PWGRAD_S2", "1")
        importlib.reload(conv3d)
        importlib.reload(deconv3d)
        try:
            assert conv3d._PWGRAD_S2
            rng = np.random.default_rng(31)
            k = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)) * 0.1,
                            jnp.float32)
            cwf = case.endswith("_cw")
            if case.startswith("deconv"):
                assert conv3d.rowconv3d_dks2_supported(8, 16, 32, 8, 16,
                                                       jnp.float32)
                x = jnp.asarray(rng.standard_normal((2, 4, 8, 16, 16)),
                                jnp.float32)
                g = jnp.asarray(rng.standard_normal((2, 8, 16, 32, 8)),
                                jnp.float32)
                if cwf:
                    fn = lambda a, b: jnp.swapaxes(deconv3d.rowdeconv3d(
                        jnp.swapaxes(a, -1, -2), b, cw_in=True,
                        cw_out=True), -1, -2)
                else:
                    fn = lambda a, b: deconv3d.rowdeconv3d(a, b)
                ref = lambda a, b: deconv3d._xla_deconv3d(a, b)
            else:
                assert conv3d.rowconv3d_dks2_supported(6, 16, 24, 16, 8,
                                                       jnp.float32)
                x = jnp.asarray(rng.standard_normal((2, 6, 16, 24, 16)),
                                jnp.float32)
                g = jnp.asarray(rng.standard_normal((2, 3, 8, 12, 8)),
                                jnp.float32)
                if cwf:
                    fn = lambda a, b: jnp.swapaxes(conv3d.rowconv3d(
                        jnp.swapaxes(a, -1, -2), b, 2, cw_in=True,
                        cw_out=True), -1, -2)
                else:
                    fn = lambda a, b: conv3d.rowconv3d(a, b, 2)
                ref = lambda a, b: conv3d._xla_conv3d(a, b, 2)
            gx1, gk1 = jax.grad(
                lambda a, b: jnp.sum(ref(a, b) * g), (0, 1))(x, k)
            gx2, gk2 = jax.grad(
                lambda a, b: jnp.sum(fn(a, b) * g), (0, 1))(x, k)
            np.testing.assert_allclose(np.asarray(gk2), np.asarray(gk1),
                                       atol=2e-4, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                                       atol=2e-5, rtol=1e-5)
        finally:
            monkeypatch.delenv("MVSNET_TPU_CONV3D_PWGRAD_S2")
            importlib.reload(conv3d)
            importlib.reload(deconv3d)

    @pytest.mark.parametrize("case", ["s1", "s2", "s1_cw", "deconv"])
    def test_xwgrad_matmul_matches_xla(self, monkeypatch, case):
        """MVSNET_TPU_CONV3D_XWGRAD: dk as one huge-K matmul over
        shifted-view lane concats (s1/s2 conv + the adjoint-derived
        deconv) == XLA's native conv wgrad."""
        import importlib

        from mvsnet_tpu.ops.pallas import conv3d, deconv3d

        monkeypatch.setenv("MVSNET_TPU_CONV3D_XWGRAD", "1")
        importlib.reload(conv3d)
        importlib.reload(deconv3d)
        try:
            assert conv3d._XWGRAD
            rng = np.random.default_rng(23)
            k = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)) * 0.1,
                            jnp.float32)
            if case == "deconv":
                x = jnp.asarray(rng.standard_normal((2, 4, 8, 16, 16)),
                                jnp.float32)
                g = jnp.asarray(rng.standard_normal((2, 8, 16, 32, 8)),
                                jnp.float32)
                fn = lambda a, b: deconv3d.rowdeconv3d(a, b)
                ref = lambda a, b: deconv3d._xla_deconv3d(a, b)
            else:
                s = 2 if case == "s2" else 1
                cwf = case == "s1_cw"
                x = jnp.asarray(rng.standard_normal((2, 6, 16, 24, 16)),
                                jnp.float32)
                g = jnp.asarray(
                    rng.standard_normal((2, 6 // s, 16 // s, 24 // s, 8)),
                    jnp.float32)
                if cwf:
                    fn = lambda a, b: jnp.swapaxes(conv3d.rowconv3d(
                        jnp.swapaxes(a, -1, -2), b, s, cw_in=True,
                        cw_out=True), -1, -2)
                else:
                    fn = lambda a, b: conv3d.rowconv3d(a, b, s)
                ref = lambda a, b: conv3d._xla_conv3d(a, b, s)
            gx1, gk1 = jax.grad(
                lambda a, b: jnp.sum(ref(a, b) * g), (0, 1))(x, k)
            gx2, gk2 = jax.grad(
                lambda a, b: jnp.sum(fn(a, b) * g), (0, 1))(x, k)
            np.testing.assert_allclose(np.asarray(gk2), np.asarray(gk1),
                                       atol=2e-4, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                                       atol=2e-5, rtol=1e-5)
        finally:
            monkeypatch.delenv("MVSNET_TPU_CONV3D_XWGRAD")
            importlib.reload(conv3d)
            importlib.reload(deconv3d)

    @pytest.mark.parametrize("cin,cout,cw", [(32, 16, False), (16, 8, True)])
    def test_stride2_tap_split_matches_xla(self, monkeypatch, cin, cout, cw):
        """MVSNET_TPU_CONV3D_S2SPLIT: parity-split tap matmuls (odd rows
        dy=1 only, even rows dy=0/2) — half the issued MACs, identical
        output. Fwd + fused bias/ReLU + CW layouts."""
        import importlib

        from mvsnet_tpu.ops.pallas import conv3d

        monkeypatch.setenv("MVSNET_TPU_CONV3D_S2SPLIT", "1")
        importlib.reload(conv3d)
        try:
            assert conv3d._S2SPLIT
            rng = np.random.default_rng(8)
            x = jnp.asarray(rng.standard_normal((1, 6, 16, 24, cin)),
                            jnp.float32)
            k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1,
                            jnp.float32)
            b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
            exp = jnp.maximum(conv3d._xla_conv3d(x, k, 2) + b, 0.0)
            if cw:
                got = conv3d.rowconv3d_fused(
                    jnp.swapaxes(x, -1, -2), k, b, stride=2, relu=True,
                    cw_in=True, cw_out=True)
                got = jnp.swapaxes(got, -1, -2)
            else:
                got = conv3d.rowconv3d_fused(x, k, b, stride=2, relu=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                       atol=2e-5, rtol=1e-5)
            # plain fwd too (no bias/relu epilogue)
            np.testing.assert_allclose(
                np.asarray(conv3d.rowconv3d_interpret(x, k, 2)),
                np.asarray(conv3d._xla_conv3d(x, k, 2)),
                atol=2e-5, rtol=1e-5)
        finally:
            monkeypatch.delenv("MVSNET_TPU_CONV3D_S2SPLIT")
            importlib.reload(conv3d)


class TestRowConv2D:
    """Per-row wide-N 2D conv kernel (ops/pallas/conv2d.py) vs XLA."""

    @pytest.mark.parametrize("cin,cout", [(48, 32), (48, 16), (8, 8), (3, 8)])
    def test_matches_xla_conv(self, cin, cout):
        from mvsnet_tpu.ops.pallas.conv2d import (
            _xla_conv2d,
            rowconv2d_interpret,
        )

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 12, 24, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        np.testing.assert_allclose(np.asarray(rowconv2d_interpret(x, k)),
                                   np.asarray(_xla_conv2d(x, k)),
                                   atol=2e-5, rtol=1e-5)

    def test_fused_epilogue_matches_xla(self):
        """Carry-kernel fused bias + ReLU epilogue (rowconv2d_fused)."""
        from mvsnet_tpu.ops.pallas.conv2d import _xla_conv2d, rowconv2d_fused

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((2, 10, 24, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal(8), jnp.float32)
        ref = np.maximum(np.asarray(_xla_conv2d(x, k)) + np.asarray(b), 0.0)
        got = np.asarray(rowconv2d_fused(x, k, bias=b, relu=True))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_staging_kernel_matches_carry(self):
        """The env-gated legacy staging kernel stays equivalent to the
        default carry kernel (chip A/B safety)."""
        import unittest.mock as mock

        from mvsnet_tpu.ops.pallas import conv2d

        rng = np.random.default_rng(6)
        # unique shape: the env knob is read at trace time, so a cached jit
        # from another test would silently bypass it
        x = jnp.asarray(rng.standard_normal((1, 14, 16, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
        ref = np.asarray(conv2d._xla_conv2d(x, k))
        with mock.patch.dict("os.environ",
                             {"MVSNET_TPU_CONV2D_STAGING": "1"}):
            got_staging = np.asarray(
                conv2d._rowconv2d_fwd_impl(x, k, interpret=True))
        np.testing.assert_allclose(got_staging, ref, atol=2e-5, rtol=1e-5)

        # staging env + bias routes the carry kernel and must still feed
        # it the bias operand (review regression: unpack crash)
        b = jnp.asarray(rng.standard_normal(8), jnp.float32)
        refb = ref + np.asarray(b)
        with mock.patch.dict("os.environ",
                             {"MVSNET_TPU_CONV2D_STAGING": "1"}):
            got_b = np.asarray(
                conv2d._rowconv2d_fwd_impl(x, k, b, interpret=True))
        np.testing.assert_allclose(got_b, refb, atol=2e-5, rtol=1e-5)

    @pytest.mark.parametrize("stride", [1, 2])
    def test_bias_fused_grads(self, stride):
        """rowconv2d_bias / rowconv2d_s2_bias: fused-bias epilogue with
        exact (dx, dk, dbias) — the GRU cells' biased convs ride it."""
        from mvsnet_tpu.ops.pallas.conv2d import (
            _xla_conv2d,
            _xla_conv2d_s2,
            rowconv2d_bias,
            rowconv2d_s2_bias,
        )

        fn = rowconv2d_bias if stride == 1 else rowconv2d_s2_bias
        ref_fn = _xla_conv2d if stride == 1 else _xla_conv2d_s2
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((2, 8, 16, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal(8), jnp.float32)
        ref = np.asarray(ref_fn(x, k)) + np.asarray(b)
        got = np.asarray(fn(x, k, b))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

        g1 = jax.grad(lambda a, c, d: jnp.sum((ref_fn(a, c) + d) ** 2),
                      (0, 1, 2))(x, k, b)
        g2 = jax.grad(lambda a, c, d: jnp.sum(fn(a, c, d) ** 2),
                      (0, 1, 2))(x, k, b)
        for i in range(3):
            np.testing.assert_allclose(np.asarray(g2[i]), np.asarray(g1[i]),
                                       atol=2e-4, rtol=1e-5)

    @pytest.mark.parametrize("pack,cin,cout,shape",
                             [(4, 8, 8, (16, 24)), (2, 16, 16, (10, 16)),
                              (4, 3, 8, (12, 40))])
    def test_packed_matches_xla(self, pack, cin, cout, shape):
        """Lane-packed s1 kernel (PACK rows on lanes, roll ring combine)."""
        import unittest.mock as mock

        from mvsnet_tpu.ops.pallas import conv2d

        rng = np.random.default_rng(8)
        H, W = shape
        x = jnp.asarray(rng.standard_normal((1, H, W, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        ref = np.maximum(np.asarray(conv2d._xla_conv2d(x, k))
                         + np.asarray(b), 0.0)
        with mock.patch.dict("os.environ",
                             {"MVSNET_TPU_CONV_PACK2D": str(pack)}):
            assert conv2d._pack2d(H, W, cin, cout, 4) == pack
            got = np.asarray(conv2d._rowconv2d_fwd_impl(
                x, k, b, relu=True, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_banded_matches_whole(self):
        """H-banding (VMEM overflow fallback) is exact: force banding by
        shrinking the VMEM limit."""
        import unittest.mock as mock

        from mvsnet_tpu.ops.pallas import conv2d

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 16, 24, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
        ref = np.asarray(conv2d._xla_conv2d(x, k))
        with mock.patch.object(conv2d, "_VMEM_LIMIT",
                               8 * 2 ** 20 + 200 * 1024):
            nb = conv2d._num_bands(16, 24, 8, 8, 4)
            got = np.asarray(conv2d.rowconv2d_interpret(x, k))
        assert nb > 1
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_grads_match_xla(self):
        from mvsnet_tpu.ops.pallas.conv2d import _xla_conv2d, rowconv2d

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 12, 24, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1, jnp.float32)
        g = jnp.asarray(rng.standard_normal((1, 12, 24, 8)), jnp.float32)
        gx1, gk1 = jax.grad(
            lambda a, b: jnp.sum(_xla_conv2d(a, b) * g), (0, 1))(x, k)
        gx2, gk2 = jax.grad(
            lambda a, b: jnp.sum(rowconv2d(a, b) * g), (0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gk2), np.asarray(gk1),
                                   atol=2e-4, rtol=1e-5)


class TestRowConv2DS2:
    """Stride-2 2D conv kernel over the pre-folded dx-tap table."""

    @pytest.mark.parametrize("kk,cin,cout,shape",
                             [(3, 3, 16, (8, 32)), (3, 16, 32, (6, 16)),
                              (3, 8, 8, (10, 48)), (5, 8, 16, (10, 32)),
                              (5, 16, 32, (12, 16)), (5, 3, 8, (14, 48))])
    def test_matches_xla_conv(self, kk, cin, cout, shape):
        from mvsnet_tpu.ops.pallas.conv2d import (
            _xla_conv2d_s2,
            rowconv2d_s2_interpret,
        )

        rng = np.random.default_rng(0)
        H, W = shape
        x = jnp.asarray(rng.standard_normal((2, H, W, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((kk, kk, cin, cout)) * 0.1,
                        jnp.float32)
        ref = np.asarray(_xla_conv2d_s2(x, k))
        got = np.asarray(rowconv2d_s2_interpret(x, k))
        assert got.shape == ref.shape == (2, H // 2, W // 2, cout)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_grads_match_xla_k5(self):
        from mvsnet_tpu.ops.pallas.conv2d import _xla_conv2d_s2, rowconv2d_s2

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 12, 16, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((5, 5, 8, 8)) * 0.1, jnp.float32)
        g1 = jax.grad(lambda a, c: jnp.sum(_xla_conv2d_s2(a, c) ** 2),
                      (0, 1))(x, k)
        g2 = jax.grad(lambda a, c: jnp.sum(rowconv2d_s2(a, c) ** 2),
                      (0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(g1[0]),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                                   atol=2e-4, rtol=1e-5)

    def test_fused_epilogue(self):
        from mvsnet_tpu.ops.pallas.conv2d import (
            _xla_conv2d_s2,
            rowconv2d_s2_fused,
        )

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal(16), jnp.float32)
        ref = np.maximum(np.asarray(_xla_conv2d_s2(x, k)) + np.asarray(b),
                         0.0)
        got = np.asarray(rowconv2d_s2_fused(x, k, bias=b, relu=True))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_grads_match_xla(self):
        from mvsnet_tpu.ops.pallas.conv2d import _xla_conv2d_s2, rowconv2d_s2

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 12, 16, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
        g1 = jax.grad(lambda a, c: jnp.sum(_xla_conv2d_s2(a, c) ** 2),
                      (0, 1))(x, k)
        g2 = jax.grad(lambda a, c: jnp.sum(rowconv2d_s2(a, c) ** 2),
                      (0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(g1[0]),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                                   atol=2e-4, rtol=1e-5)

    def test_supported_model(self):
        from mvsnet_tpu.ops.pallas.conv2d import rowconv2d_s2_supported

        # the UNetDS2GN encoder at 1152x864 (3 views batched)
        assert rowconv2d_s2_supported(864, 1152, 3, 16)   # 2dconv1_0 stem
        assert rowconv2d_s2_supported(432, 576, 16, 32)   # 2dconv2_0
        assert rowconv2d_s2_supported(216, 288, 32, 64)   # 2dconv3_0
        # 4_0's 64->128 exceeds the Cout gate: stays on XLA (MXU-decent)
        assert not rowconv2d_s2_supported(108, 144, 64, 128)
        # the 5x5 s2 tail convs (conv9_0 / conv10_0)
        assert rowconv2d_s2_supported(864, 1152, 8, 16, K=5)
        assert rowconv2d_s2_supported(432, 576, 16, 32, K=5)


class TestRowDeconv3D:
    """Parity-split s2 deconv kernel (ops/pallas/deconv3d.py) vs
    flax/lax conv_transpose (the nn.ConvTranspose path it replaces)."""

    @pytest.mark.parametrize("cin,cout,shape",
                             [(64, 32, (2, 5, 8)), (32, 16, (3, 6, 16)),
                              (16, 8, (4, 7, 8))])
    def test_matches_xla_conv_transpose(self, cin, cout, shape):
        from mvsnet_tpu.ops.pallas.deconv3d import (
            _xla_deconv3d,
            rowdeconv3d_interpret,
        )

        rng = np.random.default_rng(0)
        D, H, W = shape
        x = jnp.asarray(rng.standard_normal((1, D, H, W, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        ref = np.asarray(_xla_deconv3d(x, k))
        got = np.asarray(rowdeconv3d_interpret(x, k))
        assert got.shape == ref.shape == (1, 2 * D, 2 * H, 2 * W, cout)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_batched_and_fused_epilogue(self):
        from mvsnet_tpu.ops.pallas.deconv3d import (
            _xla_deconv3d,
            rowdeconv3d_fused,
        )

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 3, 4, 8, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal(8), jnp.float32)
        ref = np.maximum(np.asarray(_xla_deconv3d(x, k)) + np.asarray(b), 0.0)
        got = np.asarray(rowdeconv3d_fused(x, k, bias=b, relu=True))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_custom_vjp_matches_xla_grads(self):
        from mvsnet_tpu.ops.pallas.deconv3d import _xla_deconv3d, rowdeconv3d

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 4, 8, 16, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)) * 0.1,
                        jnp.float32)
        g = jnp.asarray(rng.standard_normal((1, 8, 16, 32, 8)), jnp.float32)

        gx1, gk1 = jax.grad(
            lambda a, b: jnp.sum(_xla_deconv3d(a, b) * g), (0, 1))(x, k)
        gx2, gk2 = jax.grad(
            lambda a, b: jnp.sum(rowdeconv3d(a, b) * g), (0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gk2), np.asarray(gk1),
                                   atol=2e-4, rtol=1e-5)

    def test_supported_model(self):
        from mvsnet_tpu.ops.pallas.deconv3d import rowdeconv3d_supported

        # the RegNetUS0 deconvs at the 3DCNN operating point
        assert rowdeconv3d_supported(48, 54, 72, 32, 16)   # quarter -> half
        assert rowdeconv3d_supported(96, 108, 144, 16, 8)  # half -> full
        # eighth-res W=36 is not 8-aligned: stays on XLA (tiny anyway)
        assert not rowdeconv3d_supported(24, 27, 36, 64, 32)


class TestRowDeconv2D:
    """Parity-split 2D s2 deconv kernel (ops/pallas/deconv2d.py)."""

    @pytest.mark.parametrize("cin,cout,shape",
                             [(16, 8, (6, 8)), (32, 16, (5, 16)),
                              (128, 64, (12, 8))])
    def test_matches_xla_conv_transpose(self, cin, cout, shape):
        from mvsnet_tpu.ops.pallas.deconv2d import (
            _xla_deconv2d,
            rowdeconv2d_interpret,
        )

        rng = np.random.default_rng(0)
        H, W = shape
        x = jnp.asarray(rng.standard_normal((1, H, W, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                        jnp.float32)
        ref = np.asarray(_xla_deconv2d(x, k))
        got = np.asarray(rowdeconv2d_interpret(x, k))
        assert got.shape == ref.shape == (1, 2 * H, 2 * W, cout)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    def test_fused_epilogue_and_vjp(self):
        from mvsnet_tpu.ops.pallas.deconv2d import (
            _xla_deconv2d,
            rowdeconv2d,
            rowdeconv2d_fused,
        )

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 4, 8, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal(8), jnp.float32)
        ref = np.maximum(np.asarray(_xla_deconv2d(x, k)) + np.asarray(b), 0.0)
        got = np.asarray(rowdeconv2d_fused(x, k, bias=b, relu=True))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

        g1 = jax.grad(lambda a, c: jnp.sum(_xla_deconv2d(a, c) ** 2),
                      (0, 1))(x, k)
        g2 = jax.grad(lambda a, c: jnp.sum(rowdeconv2d(a, c) ** 2),
                      (0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(g1[0]),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]),
                                   atol=2e-4, rtol=1e-5)

    def test_supported_model(self):
        from mvsnet_tpu.ops.pallas.deconv2d import rowdeconv2d_supported

        # the UNetDS2GN decoder deconvs at 1152x864
        assert rowdeconv2d_supported(432, 576, 16, 8)    # 2dconv8_0
        assert rowdeconv2d_supported(216, 288, 32, 16)   # 2dconv7_0
        assert rowdeconv2d_supported(54, 72, 128, 64)    # 2dconv5_0
