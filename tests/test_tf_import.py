"""TF-checkpoint importer: reference Saver variables -> Flax tree
(quality-parity harness, VERDICT r1 missing #1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mvsnet_tpu.config import ModelConfig
from mvsnet_tpu.models import MVSNet
from mvsnet_tpu.tf_import import (flax_path_to_tf_name, import_tf_vars,
                                  load_tf_checkpoint)


def _tiny_model(**kw):
    cfg = ModelConfig(view_num=3, max_d=8, width=64, height=64,
                      network_mode="ultralite", compute_dtype="float32", **kw)
    model = MVSNet(cfg)
    imgs = np.zeros((1, 3, 64, 64, 3), np.float32)
    cam = np.zeros((2, 4, 4), np.float32)
    cam[0] = np.eye(4)
    cam[1, :3, :3] = np.diag([20.0, 20.0, 1.0])
    cam[1, 3] = [400.0, 2.0, 8, 414.0]
    cams = np.broadcast_to(cam, (1, 3, 2, 4, 4)).copy()
    args = (imgs, cams, np.array([400.0]), np.array([2.0]))
    return cfg, model, args


def _fake_tf_ckpt(variables, seed=0):
    """Reverse-map the model tree into a TF-style {name: array} dict with
    TF layouts (conv*_transpose kernels stored (..., out, in))."""
    rng = np.random.default_rng(seed)
    var_dict = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        candidates, _transform = flax_path_to_tf_name(path)
        assert candidates, path
        name = candidates[0]
        val = rng.standard_normal(leaf.shape).astype(np.float32)
        if name.endswith("moving_variance"):
            val = np.abs(val) + 0.5              # variances must be positive
        parts = [str(getattr(k, "key", k)) for k in path]
        if any(p.startswith("ConvTranspose") for p in parts):
            val_tf = np.swapaxes(val, -1, -2)       # store in TF layout
        else:
            val_tf = val
        var_dict[name] = val_tf
    return var_dict


def test_import_roundtrip_3dcnn():
    cfg, model, args = _tiny_model()
    variables = model.init(jax.random.PRNGKey(0), *args, training=False,
                           method=MVSNet.forward_3dcnn)
    var_dict = _fake_tf_ckpt(variables)
    # every TF name unique (no silent collisions between nets)
    n_leaves = len(jax.tree_util.tree_leaves(variables))
    assert len(var_dict) == n_leaves

    loaded = import_tf_vars(var_dict, variables, strict=True)
    for path, leaf in jax.tree_util.tree_flatten_with_path(loaded)[0]:
        candidates, transform = flax_path_to_tf_name(path)
        expect = transform(var_dict[candidates[0]])
        np.testing.assert_array_equal(np.asarray(leaf), expect), path

    # deconv kernels really were transposed back
    k = loaded["params"]["feature_net"]["2dconv5_0"]["deconv"]["ConvTranspose_0"]["kernel"]
    tf_k = var_dict["2dconv5_0/kernel"]
    np.testing.assert_array_equal(np.asarray(k), np.swapaxes(tf_k, -1, -2))

    # imported weights drive a working forward
    d, p = model.apply(loaded, *args, training=False,
                       method=MVSNet.forward_3dcnn)
    assert np.isfinite(np.asarray(d)).all()


def test_import_roundtrip_gru():
    cfg, model, args = _tiny_model(regularization="GRU")
    variables = model.init(jax.random.PRNGKey(0), *args, training=True)
    var_dict = _fake_tf_ckpt(variables)
    loaded = import_tf_vars(var_dict, variables, strict=True)
    gates = loaded["params"]["gru_sweep"]["gru"]["conv_gru1"]["gates_conv"]["Conv_0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(gates),
                                  var_dict["conv_gru1/Gates/conv/kernel"])


def test_import_layer_norm_fallback_names():
    """Standard GRU widths collapse reference group_norm to layer_norm
    (convgru.py:29-31): LayerNorm/LayerNorm_1 variable spellings load."""
    cfg, model, args = _tiny_model(regularization="GRU")
    variables = model.init(jax.random.PRNGKey(0), *args, training=True)
    var_dict = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        candidates, _t = flax_path_to_tf_name(path)
        parts = [str(getattr(k, "key", k)) for k in path]
        # norms under conv_gru cells: use the layer_norm (2nd) spelling
        name = candidates[1] if (len(candidates) > 1 and "norm" in str(parts)) \
            else candidates[0]
        val = np.random.default_rng(1).standard_normal(leaf.shape).astype(np.float32)
        if any(p.startswith("ConvTranspose") for p in parts):
            val = np.swapaxes(val, -1, -2)
        var_dict[name] = val
    loaded = import_tf_vars(var_dict, variables, strict=True)
    ln = loaded["params"]["gru_sweep"]["gru"]["conv_gru2"]["update_norm"]["scale"]
    np.testing.assert_array_equal(np.asarray(ln),
                                  var_dict["conv_gru2/Gates/LayerNorm_1/gamma"])


def test_import_strict_missing_raises():
    cfg, model, args = _tiny_model()
    variables = model.init(jax.random.PRNGKey(0), *args, training=False,
                           method=MVSNet.forward_3dcnn)
    var_dict = _fake_tf_ckpt(variables)
    var_dict.pop("2dconv1_0/kernel")
    with pytest.raises(KeyError):
        import_tf_vars(var_dict, variables, strict=True)
    loaded = import_tf_vars(var_dict, variables, strict=False)
    assert loaded is not None


def test_load_npz_checkpoint(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    np.savez(path, **{"a/kernel": np.ones((2, 2), np.float32)})
    d = load_tf_checkpoint(path)
    assert set(d) == {"a/kernel"}


def test_load_saver_bundle_checkpoint(tmp_path):
    """load_tf_checkpoint reads a REAL-format Saver V2 bundle (index +
    data shard) through the pure-numpy reader — the branch the DTU
    parity runbook hits with reference GCS weights, previously only
    reachable with tensorflow installed."""
    from mvsnet_tpu.io import tf_bundle

    cfg, model, args = _tiny_model()
    variables = model.init(jax.random.PRNGKey(0), *args, training=False,
                           method=MVSNet.forward_3dcnn)
    var_dict = _fake_tf_ckpt(variables)
    # reference checkpoints also carry optimizer slots; they must be
    # ignored by import_tf_vars' unused-variable filter
    var_dict["2dconv1_0/kernel/Adam"] = np.zeros_like(
        var_dict["2dconv1_0/kernel"])
    var_dict["global_step"] = np.asarray(150000, np.int64)
    prefix = str(tmp_path / "tf_model_150000.ckpt")
    tf_bundle.write_bundle(prefix, var_dict)

    loaded_dict = load_tf_checkpoint(prefix)
    assert set(loaded_dict) == set(var_dict)
    loaded = import_tf_vars(loaded_dict, variables, strict=True)
    d, _ = model.apply(loaded, *args, training=False,
                       method=MVSNet.forward_3dcnn)
    assert np.isfinite(np.asarray(d)).all()


def test_import_checkpoint_saver_bundle_to_model_dir(tmp_path):
    """import_checkpoint end-to-end off a Saver-format prefix (not .npz):
    bundle -> Flax tree -> orbax model dir -> Predictor restore."""
    from mvsnet_tpu import predict as pl
    from mvsnet_tpu.io import tf_bundle
    from mvsnet_tpu.tf_import import import_checkpoint

    cfg, model, args = _tiny_model()
    variables = model.init(jax.random.PRNGKey(0), *args, training=False,
                           method=MVSNet.forward_3dcnn)
    var_dict = _fake_tf_ckpt(variables)
    prefix = str(tmp_path / "tf_model_80000.ckpt")
    tf_bundle.write_bundle(prefix, var_dict)

    model_dir = str(tmp_path / "model")
    out = import_checkpoint(prefix, model_dir, regularization="3DCNN",
                            network_mode="ultralite")
    assert "80000" in out
    p = pl.Predictor(cfg, model_dir=model_dir)
    images, cams, ds, di = args
    de = cams[:, 0, 1, 3, 3]
    depth, prob, _ = p.predict(images, cams, ds, di, de)
    assert np.isfinite(depth).all() and np.isfinite(prob).all()
    # variables restore lazily on first predict; they must be the bundle
    # values, not the re-init
    got = np.asarray(
        p.variables["params"]["feature_net"]["2dconv1_0"]["conv"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(got, var_dict["2dconv1_0/kernel"])


def test_import_checkpoint_to_model_dir(tmp_path):
    """Full import path: TF-style .npz -> orbax model dir -> Predictor
    restore (the one-command DTU parity runbook's step 2,
    tools/dtu_scan9_parity.sh)."""
    from mvsnet_tpu import predict as pl
    from mvsnet_tpu.tf_import import import_checkpoint

    # template matching import_checkpoint's internal init (ultralite)
    cfg, model, args = _tiny_model()
    variables = model.init(jax.random.PRNGKey(0), *args, training=False,
                           method=MVSNet.forward_3dcnn)
    var_dict = _fake_tf_ckpt(variables)
    npz = str(tmp_path / "tf_model_19307.ckpt.npz")
    np.savez(npz, **var_dict)

    model_dir = str(tmp_path / "model")
    out = import_checkpoint(npz, model_dir, regularization="3DCNN",
                            network_mode="ultralite")
    assert "19307" in out          # step parsed from the reference name

    p = pl.Predictor(cfg, model_dir=model_dir)
    images, cams, ds, di = args
    de = cams[:, 0, 1, 3, 3]
    depth, prob, _ = p.predict(images, cams, ds, di, de)
    assert np.isfinite(depth).all() and np.isfinite(prob).all()
    # the restored params ARE the checkpoint values, not the re-init
    got = np.asarray(
        p.variables["params"]["feature_net"]["2dconv1_0"]["conv"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(got, var_dict["2dconv1_0/kernel"])
