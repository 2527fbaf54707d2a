"""Loss/metric numerics vs direct numpy evaluation."""

import numpy as np
import jax.numpy as jnp
import pytest

from mvsnet_tpu import losses


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    y_true = rng.uniform(5, 10, (2, 8, 9, 1)).astype(np.float32)
    y_true[0, :2] = 0.0   # invalid region
    y_pred = (y_true + rng.normal(0, 0.5, y_true.shape)).astype(np.float32)
    return jnp.asarray(y_true), jnp.asarray(y_pred)


def test_original_loss(data):
    y_true, y_pred = data
    interval = jnp.array([0.2, 0.3])
    got = float(losses.original_loss(y_true, y_pred, interval))
    yt, yp = np.asarray(y_true), np.asarray(y_pred)
    expected = 0.0
    for b in range(2):
        mask = yt[b] != 0
        mae = np.abs(yt[b][mask] - yp[b][mask]).sum()
        expected += (mae / float(interval[b])) / (mask.sum() + 1e-6)
    assert got == pytest.approx(expected, rel=1e-5)


def test_original_loss_perfect_prediction(data):
    y_true, _ = data
    assert float(losses.original_loss(y_true, y_true, jnp.array([0.2, 0.3]))) == pytest.approx(0.0)


def test_masked_pixels_ignored(data):
    """Predictions on invalid (y_true==0) pixels must not affect the loss."""
    y_true, y_pred = data
    y_pred2 = np.asarray(y_pred).copy()
    y_pred2[0, :2] = 1e6
    interval = jnp.array([0.2, 0.3])
    a = float(losses.original_loss(y_true, y_pred, interval))
    b = float(losses.original_loss(y_true, jnp.asarray(y_pred2), interval))
    assert a == pytest.approx(b, rel=1e-6)


def test_power_loss_alpha1_beta0_close_to_original_form(data):
    """With alpha=1, beta=0 the power loss reduces to
    10/interval * mean(|dy| + 0.005*y)."""
    y_true, y_pred = data
    interval = jnp.array([0.2, 0.3])
    got = float(losses.power_loss(y_true, y_pred, interval, alpha=1.0, beta=0.0))
    yt, yp = np.asarray(y_true), np.asarray(y_pred)
    mask = (yt != 0).astype(np.float64)
    count = mask.sum(axis=(1, 2, 3)) + 1e-6
    per_b = ((np.abs(yt - yp) + 0.005 * yt) * mask).sum(axis=(1, 2, 3)) / count
    mean_depth = (yt * mask).sum() / count
    norm = 10.0 * 1.0 / np.asarray(interval)
    expected = (per_b * norm).sum()
    assert got == pytest.approx(expected, rel=1e-4)


def test_gaussian_loss_bounded(data):
    y_true, y_pred = data
    v = float(losses.gaussian_loss(y_true, y_pred, jnp.array([0.2, 0.3]), eta=0.02))
    # each valid pixel contributes in [-1, 0]
    assert -2.0 <= v <= 0.0
    perfect = float(losses.gaussian_loss(y_true, y_true, jnp.array([0.2, 0.3]), eta=0.02))
    assert perfect < v  # perfect prediction = most negative


def test_gradient_loss_zero_for_constant_offset():
    """A constant depth offset has identical gradients -> loss 0."""
    rng = np.random.default_rng(1)
    y = rng.uniform(5, 10, (1, 8, 8, 1)).astype(np.float32)
    got = float(losses.gradient_loss(jnp.asarray(y), jnp.asarray(y + 3.0)))
    assert got == pytest.approx(0.0, abs=1e-5)


def test_gradient_loss_positive_for_noise():
    rng = np.random.default_rng(2)
    y = rng.uniform(5, 10, (1, 8, 8, 1)).astype(np.float32)
    noisy = y + rng.normal(0, 1, y.shape).astype(np.float32)
    assert float(losses.gradient_loss(jnp.asarray(y), jnp.asarray(noisy))) > 0.01


def test_less_one_three_percentages():
    y_true = jnp.ones((1, 4, 4, 1)) * 10.0
    y_pred = y_true.at[0, 0, 0, 0].add(0.5).at[0, 0, 1, 0].add(2.0).at[0, 0, 2, 0].add(50.0)
    interval = jnp.array([1.0])
    l1 = float(losses.less_one_percentage(y_true, y_pred, interval))
    l3 = float(losses.less_three_percentage(y_true, y_pred, interval))
    assert l1 == pytest.approx(14 / 16)   # two pixels off by >1
    assert l3 == pytest.approx(15 / 16)   # one pixel off by >3


def test_regression_loss_wrapper_191(data):
    """Wrapper must use interval = (end-start)/191 regardless of depth_num
    (reference: loss.py:193-194)."""
    y_true, y_pred = data
    start, end = jnp.array([5.0, 5.0]), jnp.array([10.0, 10.0])
    loss, l1, l3, debug = losses.mvsnet_regression_loss(
        y_pred, y_true, start, end, loss_type="original", grad_loss=False)
    expected = float(losses.original_loss(y_true, y_pred, (end - start) / 191.0))
    assert float(loss) == pytest.approx(expected, rel=1e-6)
    assert 0.0 <= float(l1) <= float(l3) <= 1.0
    assert float(debug) == 0.0


def test_regression_loss_grad_term(data):
    y_true, y_pred = data
    start, end = jnp.array([5.0, 5.0]), jnp.array([10.0, 10.0])
    l_no, *_ = losses.mvsnet_regression_loss(y_pred, y_true, start, end,
                                             loss_type="original", grad_loss=False)
    l_yes, _, _, dbg = losses.mvsnet_regression_loss(y_pred, y_true, start, end,
                                                     loss_type="original", grad_loss=True)
    assert float(l_yes) == pytest.approx(float(l_no) + 0.5 * float(dbg), rel=1e-5)


def test_classification_loss_perfect_volume():
    """A prob volume with all mass on the GT bucket: xent ~ 0, WTA exact."""
    B, D, H, W = 1, 8, 4, 4
    start, interval = jnp.array([2.0]), jnp.array([0.5])
    rng = np.random.default_rng(3)
    idx = rng.integers(0, D, (B, H, W))
    gt = (2.0 + idx * 0.5).astype(np.float32)[..., None]
    prob = np.full((B, D, H, W), 1e-12, np.float32)
    for b in range(B):
        for i in range(H):
            for j in range(W):
                prob[b, idx[b, i, j], i, j] = 1.0
    xent, mae, l1, l3, wta = losses.mvsnet_classification_loss(
        jnp.asarray(prob), jnp.asarray(gt), D, start, interval)
    assert float(xent) == pytest.approx(0.0, abs=1e-5)
    np.testing.assert_allclose(np.asarray(wta), gt, atol=1e-6)
    assert float(mae) == pytest.approx(0.0, abs=1e-6)
    assert float(l1) == pytest.approx(1.0)


def test_classification_loss_masks_invalid():
    B, D, H, W = 1, 4, 3, 3
    gt = np.zeros((B, H, W, 1), np.float32)  # everything invalid
    prob = np.full((B, D, H, W), 1.0 / D, np.float32)
    xent, mae, l1, l3, _ = losses.mvsnet_classification_loss(
        jnp.asarray(prob), jnp.asarray(gt), D, jnp.array([1.0]), jnp.array([0.5]))
    assert float(xent) == pytest.approx(0.0, abs=1e-5)
    assert np.isfinite(float(mae))


def test_flipped_sweep_classification():
    """Negative interval (GRU reverse sweep) still produces valid indices."""
    B, D, H, W = 1, 8, 4, 4
    start, interval = jnp.array([5.5]), jnp.array([-0.5])
    gt = np.full((B, H, W, 1), 4.0, np.float32)   # bucket (4.0-5.5)/-0.5 = 3
    prob = np.full((B, D, H, W), 1e-12, np.float32)
    prob[:, 3] = 1.0
    xent, mae, l1, _, wta = losses.mvsnet_classification_loss(
        jnp.asarray(prob), jnp.asarray(gt), D, start, interval)
    assert float(xent) == pytest.approx(0.0, abs=1e-5)
    np.testing.assert_allclose(np.asarray(wta), 4.0, atol=1e-6)
