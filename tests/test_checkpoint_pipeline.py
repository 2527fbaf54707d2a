"""Train -> checkpoint -> Predictor restore -> inference, both model families.

Closes the full production loop: params written by the training driver must
load into the inference-time Predictor templates (different init methods).
"""

import os

import jax
import numpy as np
import pytest

from mvsnet_tpu import checkpoint as ckpt
from mvsnet_tpu import train_lib
from mvsnet_tpu.config import ModelConfig, TrainConfig
from mvsnet_tpu.data import ClusterGenerator, batch_iterator
from mvsnet_tpu.models import MVSNet
from mvsnet_tpu.predict import Predictor, depth_params_from_cams
from tests.synthetic_session import make_dataset, make_session


def _train_one_and_save(tmp_path, regularization):
    root = str(tmp_path / "data")
    make_dataset(root, n_sessions=1, split="train", n_images=3)
    gen = ClusterGenerator(root, view_num=3, image_width=64, image_height=64,
                           depth_num=8, base_image_size=32, mode="train",
                           flip_cams=(regularization == "GRU"))
    batch = next(batch_iterator(gen.iterate_once(), 1))
    mode = "lite" if regularization == "GRU" else "ultralite"
    mcfg = ModelConfig(view_num=3, max_d=8, width=64, height=64,
                       network_mode=mode, regularization=regularization,
                       compute_dtype="float32")
    tcfg = TrainConfig(optimizer="adam", base_lr=1e-3, loss_type="original",
                       grad_loss=False)
    model = MVSNet(mcfg)
    state = train_lib.create_train_state(model, mcfg, tcfg,
                                         jax.random.PRNGKey(0), batch)
    step_fn = train_lib.make_train_step(model, mcfg, tcfg, donate=False)
    state, metrics = step_fn(state, batch)
    model_dir = str(tmp_path / "models")
    ckpt.save_checkpoint(model_dir, mcfg.regularization, mcfg.network_mode, 1, state)
    return mcfg, model_dir, state


@pytest.mark.parametrize("regularization", ["3DCNN", "GRU"])
def test_train_save_restore_infer(tmp_path, regularization):
    mcfg, model_dir, state = _train_one_and_save(tmp_path, regularization)

    session = make_session(str(tmp_path / "sess"), n_images=3, with_depths=False)
    gen = ClusterGenerator(session, view_num=3, image_width=64, image_height=64,
                           depth_num=8, base_image_size=32, mode="inference")
    batch = next(batch_iterator(gen.iterate_once(), 1))
    scaled_images, input_images, scaled_cams, full_cams, idx, _ = batch
    ds, di, dn, de = depth_params_from_cams(scaled_cams)

    predictor = Predictor(mcfg, model_dir=model_dir, ckpt_step=1)
    depth, prob, residual = predictor.predict(input_images, scaled_cams, ds, di, de)
    assert depth.shape == (1, 16, 16, 1)
    assert np.isfinite(depth).all()

    # restored params actually used: fresh-init predictor differs
    predictor2 = Predictor(mcfg, model_dir=None)
    depth2, *_ = predictor2.predict(input_images, scaled_cams, ds, di, de)
    # trained-one-step params differ from the random init (different seed path)
    trained = np.concatenate([np.ravel(x) for x in
                              jax.tree_util.tree_leaves(predictor.variables["params"])])
    fresh = np.concatenate([np.ravel(x) for x in
                            jax.tree_util.tree_leaves(predictor2.variables["params"])])
    assert trained.shape == fresh.shape
    assert not np.allclose(trained, fresh)
