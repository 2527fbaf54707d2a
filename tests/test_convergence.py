"""Full-stack learning gate: multi-depth synthetic scenes, 600 train steps.

This is the strongest quality signal runnable without real data: sessions
render the textured plane at DIFFERENT depths (1700/2000/2300mm), so the
model must exploit parallax geometry — regressing the dataset mean cannot
pass. Measured trajectory (CPU, ~6 min): loss 41.9 -> 0.88, <3px 0 -> 0.99.

Slow; opt-in via RUN_SLOW_TESTS=1 (the driver's default suite stays fast).
"""

import itertools
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="slow convergence gate; set RUN_SLOW_TESTS=1")


def test_gru_classification_convergence(tmp_path):
    """R-MVSNet training gate: cross-entropy through the 3-cell ConvGRU
    depth scan (remat'd nn.scan + custom-VJP Pallas warp path) with
    flipped sweeps, on the same multi-depth parallax scenes. Measured
    trajectory (CPU, ~2.5 min): xent 2.78 (= ln16, random) -> 0.056,
    WTA <3px 0.50 -> 0.9998 at 2400 steps."""
    import itertools as it

    import jax
    from mvsnet_tpu import train_lib
    from mvsnet_tpu.config import ModelConfig, TrainConfig
    from mvsnet_tpu.data import ClusterGenerator, batch_iterator
    from mvsnet_tpu.models import MVSNet
    from tests.synthetic_session import make_session

    for i, d in enumerate([1700.0, 2000.0, 2300.0]):
        make_session(str(tmp_path / "train" / f"s{i}"), n_images=4,
                     plane_depth_mm=d, seed=i)
    gen = ClusterGenerator(str(tmp_path), view_num=3, image_width=64,
                           image_height=64, depth_num=16, base_image_size=32,
                           mode="train", flip_cams=True)
    batches = list(batch_iterator(gen.iterate_once(), 1))
    mcfg = ModelConfig(view_num=3, max_d=16, width=64, height=64,
                       network_mode="ultralite", compute_dtype="float32",
                       regularization="GRU")
    tcfg = TrainConfig(optimizer="adam", base_lr=2e-3, loss_type="original",
                       grad_loss=False)
    model = MVSNet(mcfg)
    state = train_lib.create_train_state(model, mcfg, tcfg,
                                         jax.random.PRNGKey(0), batches[0])
    step_fn = train_lib.make_train_step(model, mcfg, tcfg, donate=False)
    losses, l3s = [], []
    for b in it.islice(it.cycle(batches), 2400):
        state, m = step_fn(state, b)
        losses.append(float(m["loss"]))
        l3s.append(float(m["less_three"]))
    first, last = np.mean(losses[:24]), np.mean(losses[-24:])
    assert last < 0.1 * first, (first, last)
    assert np.mean(l3s[-24:]) > 0.95, np.mean(l3s[-24:])


def test_multi_depth_convergence(tmp_path):
    import jax
    from mvsnet_tpu import train_lib
    from mvsnet_tpu.config import ModelConfig, TrainConfig
    from mvsnet_tpu.data import ClusterGenerator, batch_iterator
    from mvsnet_tpu.models import MVSNet
    from tests.synthetic_session import make_session

    for i, d in enumerate([1700.0, 2000.0, 2300.0]):
        make_session(str(tmp_path / "train" / f"s{i}"), n_images=4,
                     plane_depth_mm=d, seed=i)
    gen = ClusterGenerator(str(tmp_path), view_num=3, image_width=64,
                           image_height=64, depth_num=16, base_image_size=32,
                           mode="train", flip_cams=False)
    batches = list(batch_iterator(gen.iterate_once(), 1))
    mcfg = ModelConfig(view_num=3, max_d=16, width=64, height=64,
                       network_mode="ultralite", compute_dtype="float32")
    tcfg = TrainConfig(optimizer="adam", base_lr=2e-3, loss_type="original",
                       grad_loss=False)
    model = MVSNet(mcfg)
    state = train_lib.create_train_state(model, mcfg, tcfg,
                                         jax.random.PRNGKey(0), batches[0])
    step_fn = train_lib.make_train_step(model, mcfg, tcfg, donate=False)
    losses, l3s = [], []
    for b in itertools.islice(itertools.cycle(batches), 600):
        state, m = step_fn(state, b)
        losses.append(float(m["loss"]))
        l3s.append(float(m["less_three"]))
    first, last = np.mean(losses[:12]), np.mean(losses[-12:])
    assert last < 0.1 * first, (first, last)
    assert np.mean(l3s[-12:]) > 0.9, np.mean(l3s[-12:])
