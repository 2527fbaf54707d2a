"""Golden regression: tiny deterministic forwards vs stored fixtures.

Guards against unintended numeric drift in the model graphs across
refactors (weights from a fixed PRNG seed, CPU backend, f32). Regenerate
deliberately with tests/golden/regenerate.py when numerics change ON
PURPOSE, and say why in the commit message.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mvsnet_tpu.config import ModelConfig
from mvsnet_tpu.models import MVSNet

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_forward.npz")


def tiny_inputs(V=3, H=64, W=64, D=8):
    rng = np.random.default_rng(42)
    images = jnp.asarray(rng.standard_normal((1, V, H, W, 3)), jnp.float32)
    K = np.array([[15.0, 0, W / 8], [0, 15.0, H / 8], [0, 0, 1]])
    cam = np.zeros((2, 4, 4))
    cam[0] = np.eye(4)
    cam[0, 0, 3] = 2.0
    cam[1, :3, :3] = K
    cam[1, 3] = [5.0, 0.5, D, 8.5]
    cams = jnp.asarray(np.stack([cam] * V))[None]
    return images, cams, jnp.array([5.0]), jnp.array([0.5])


@pytest.mark.parametrize("reg,mode", [("3DCNN", "ultralite"), ("GRU", "lite")])
def test_golden_forward(reg, mode):
    data = np.load(GOLDEN)
    cfg = ModelConfig(view_num=3, max_d=8, width=64, height=64,
                      network_mode=mode, regularization=reg,
                      compute_dtype="float32")
    model = MVSNet(cfg)
    images, cams, ds, di = tiny_inputs()
    if reg == "3DCNN":
        v = model.init(jax.random.PRNGKey(7), images, cams, ds, di,
                       method=MVSNet.forward_3dcnn)
        depth, prob = model.apply(v, images, cams, ds, di,
                                  method=MVSNet.forward_3dcnn)
    else:
        v = model.init(jax.random.PRNGKey(7), images, cams, ds, di,
                       method=MVSNet.forward_prob_recurrent)
        depth, prob = model.apply(v, images, cams, ds, di,
                                  method=MVSNet.forward_gru_wta)
    np.testing.assert_allclose(np.asarray(depth), data[f"{reg}_depth"],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(prob), data[f"{reg}_prob"],
                               rtol=5e-3, atol=5e-3)
