"""scripts/test_and_fuse pipeline glue + loader robustness."""

import json
import os
import sys

import numpy as np
import pytest

from mvsnet_tpu.data import PrefetchingLoader
from tests.synthetic_session import make_session
from tests.test_drivers import _write_gt_predictions


def test_prefetching_loader_survives_bad_samples():
    """A generator that raises mid-stream ends the epoch cleanly (no hang,
    no exception escaping the iterator thread)."""

    class Gen:
        def iterate_once(self):
            yield (np.zeros((2, 2)),)
            yield (np.ones((2, 2)),)
            raise RuntimeError("bad cluster data")

    loader = PrefetchingLoader(Gen, batch_size=1, epochs=1)
    batches = list(loader)
    assert len(batches) == 2


def test_test_and_fuse_no_test_mode(tmp_path, monkeypatch):
    """--no_test: skips inference, runs native fusion via subprocess,
    collects the PLY, writes the results CSV (reference:
    scripts/test_and_fuse.py:25-35)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.test_and_fuse import main

    session = make_session(str(tmp_path / "sess"), n_images=4)
    _write_gt_predictions(session, os.path.join(session, "depths_mvsnet"))

    # subprocesses must not touch the TPU tunnel: JAX_PLATFORM_NAME survives
    # the sitecustomize platform pinning.
    monkeypatch.setenv("JAX_PLATFORM_NAME", "cpu")

    ply_root = str(tmp_path / "plys")
    results = str(tmp_path / "fusion_results.csv")
    rc = main(["--test_folder_root", session, "--no_test",
               "--ply_folder", ply_root, "--results_path", results,
               "--prob_threshold", "0.5", "--disp_threshold", "1.0",
               "--num_consistent", "2"])
    assert rc == 0
    # PLY collected into the run folder
    run_dirs = os.listdir(ply_root)
    assert len(run_dirs) == 1
    plys = os.listdir(os.path.join(ply_root, run_dirs[0]))
    assert any(p.endswith(".ply") for p in plys)
    assert os.path.exists(results)
