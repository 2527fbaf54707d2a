"""Native C++ point-cloud ops vs numpy fallback."""

import numpy as np
import pytest

from mvsnet_tpu import native


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    # two dense blobs + sparse outliers
    a = rng.normal([0, 0, 0], 0.5, (2000, 3)).astype(np.float32)
    b = rng.normal([10, 0, 0], 0.5, (2000, 3)).astype(np.float32)
    outliers = rng.uniform(-50, 50, (30, 3)).astype(np.float32)
    points = np.concatenate([a, b, outliers])
    colors = rng.integers(0, 255, (len(points), 3)).astype(np.uint8)
    return points, colors


def test_native_lib_builds():
    """g++ is in the image; the library must compile and load."""
    assert native.has_native()


def test_voxel_downsample_merges(cloud):
    points, colors = cloud
    out_p, out_c = native.voxel_downsample(points, colors, voxel_size=0.5)
    assert 0 < len(out_p) < len(points)
    assert out_c.shape == (len(out_p), 3)
    # centroids preserved approximately: each blob keeps its center of mass
    blob_a = out_p[np.linalg.norm(out_p - [0, 0, 0], axis=1) < 3]
    assert np.abs(blob_a.mean(axis=0)).max() < 0.3


def test_voxel_downsample_exact_small():
    """Two points in one voxel average; separated voxels pass through."""
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.0, 5.0, 5.0]], np.float32)
    out_p, _ = native.voxel_downsample(pts, None, voxel_size=1.0)
    out_sorted = out_p[np.argsort(out_p[:, 0])]
    np.testing.assert_allclose(out_sorted[0], [0.15, 0.15, 0.15], atol=1e-6)
    np.testing.assert_allclose(out_sorted[1], [5.0, 5.0, 5.0], atol=1e-6)


def test_outlier_removal(cloud):
    points, _ = cloud
    keep = native.radius_outlier_removal(points, radius=1.5, min_neighbors=20)
    # blobs survive, far-flung outliers don't
    assert keep[:4000].mean() > 0.99
    assert keep[4000:].mean() < 0.2


def test_native_matches_numpy_fallback(cloud, monkeypatch):
    points, colors = cloud
    n_p, n_c = native.voxel_downsample(points, colors, 0.5)
    n_mask = native.radius_outlier_removal(points, 1.5, 20)
    # force the numpy path
    monkeypatch.setattr(native, "_load", lambda: None)
    f_p, f_c = native.voxel_downsample(points, colors, 0.5)
    f_mask = native.radius_outlier_removal(points, 1.5, 20)
    # same voxel set (order may differ): compare sorted
    np.testing.assert_allclose(
        np.sort(np.round(n_p.astype(np.float64), 4), axis=0),
        np.sort(np.round(f_p.astype(np.float64), 4), axis=0), atol=1e-3)
    np.testing.assert_array_equal(np.sort(n_mask), np.sort(f_mask))
    assert n_mask.sum() == f_mask.sum()
