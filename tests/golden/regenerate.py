"""Regenerate tests/golden/tiny_forward.npz (run from repo root on CPU).

Only do this when the model numerics change DELIBERATELY; explain why in
the commit that updates the fixture.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from test_golden import tiny_inputs  # noqa: E402
from mvsnet_tpu.config import ModelConfig  # noqa: E402
from mvsnet_tpu.models import MVSNet  # noqa: E402


def main():
    out = {}
    for reg, mode in (("3DCNN", "ultralite"), ("GRU", "lite")):
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
        out[f"{reg}_depth"] = np.asarray(depth)
        out[f"{reg}_prob"] = np.asarray(prob)
    path = os.path.join(os.path.dirname(__file__), "tiny_forward.npz")
    np.savez(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
