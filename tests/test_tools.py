"""Dataset tooling: converters, splits, DTU legacy lists, hp search sampling."""

import json
import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)

import convert_utils  # noqa: E402

from mvsnet_tpu.data.dtu import gen_pipeline_mvs_list, parse_pair_txt  # noqa: E402
from mvsnet_tpu.io.cams import load_cam_txt, write_cam_txt  # noqa: E402
from mvsnet_tpu.io.pfm import write_pfm  # noqa: E402


PAIR_TXT = """2
0
2 1 120.5 2 80.2
1
1 0 95.0
"""


def test_parse_pair_txt(tmp_path):
    p = tmp_path / "pair.txt"
    p.write_text(PAIR_TXT)
    pairs = parse_pair_txt(str(p))
    assert pairs == [[1, 2], [0]]


def test_pair_to_covisibility(tmp_path):
    p = tmp_path / "pair.txt"
    p.write_text(PAIR_TXT)
    out = tmp_path / "covisibility.json"
    covis = convert_utils.pair_to_covisibility(str(p), str(out), 400.0, 900.0)
    with open(out) as f:
        data = json.load(f)
    assert data["0"]["views"] == [1, 2]
    assert data["1"]["views"] == [0]
    assert data["0"]["min_depth"] == 400.0
    assert data["0"]["max_depth"] == 900.0


def test_cam_to_json_roundtrip(tmp_path):
    cam = np.zeros((2, 4, 4))
    cam[0] = np.eye(4)
    cam[0, :3, 3] = [1500.0, -250.0, 30.0]   # mm
    cam[1, :3, :3] = [[800.0, 0, 320], [0, 810.0, 240], [0, 0, 1]]
    cam[1, 3] = [400.0, 2.0, 128, 656.0]
    txt = tmp_path / "cam.txt"
    write_cam_txt(str(txt), cam)
    jpath = tmp_path / "cam.json"
    convert_utils.cam_to_json(str(txt), str(jpath), scale_factor=0.5)
    with open(jpath) as f:
        data = json.load(f)
    assert data["intrinsics"]["fx"] == pytest.approx(400.0)
    assert data["pose"]["matrix"]["0,3"] == pytest.approx(1.5)   # mm -> m
    assert data["pose"]["matrix"]["1,3"] == pytest.approx(-0.25)


def test_depth_pfm_to_png(tmp_path):
    depth = np.random.default_rng(0).uniform(100, 5000, (8, 9)).astype(np.float32)
    pfm = tmp_path / "d.pfm"
    write_pfm(str(pfm), depth)
    png = tmp_path / "d.png"
    convert_utils.depth_pfm_to_png(str(pfm), str(png))
    from mvsnet_tpu.io.images import load_depth_png
    out = load_depth_png(str(png))
    np.testing.assert_allclose(out, depth.astype(np.uint16))


def test_gen_pipeline_mvs_list(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "cams").mkdir()
    (tmp_path / "pair.txt").write_text(PAIR_TXT)
    samples = gen_pipeline_mvs_list(str(tmp_path), view_num=2)
    assert len(samples) == 2
    assert samples[0][0].endswith("00000000.jpg")
    assert samples[0][1].endswith("00000000_cam.txt")
    assert samples[0][2].endswith("00000001.jpg")


def test_split_data(tmp_path):
    import split_data as sd
    for i in range(10):
        (tmp_path / f"sess_{i}").mkdir()
    sd.split_data(str(tmp_path), 0.8, 0.1, 0.1, seed=0)
    n_train = len(os.listdir(tmp_path / "train"))
    n_val = len(os.listdir(tmp_path / "val"))
    n_test = len(os.listdir(tmp_path / "test"))
    assert n_train == 8
    assert n_train + n_val + n_test == 10


def test_hp_search_sampling():
    import hp_search
    import random
    space = {"params": [
        {"name": "base_lr", "type": "double", "min": 1e-4, "max": 1e-2, "scale": "log"},
        {"name": "stepvalue", "type": "integer", "min": 50, "max": 200, "scale": "linear"},
    ]}
    rng = random.Random(0)
    for _ in range(20):
        s = hp_search.sample_params(space, rng)
        assert 1e-4 <= s["base_lr"] <= 1e-2
        assert 50 <= s["stepvalue"] <= 200
        assert isinstance(s["stepvalue"], int)


def test_covisibility_from_demon(tmp_path):
    (tmp_path / "depths").mkdir()
    for i in range(4):
        (tmp_path / "depths" / f"{i}.png").write_bytes(b"")
    convert_utils.covisibility_from_demon(str(tmp_path), 300, 5000)
    with open(tmp_path / "covisibility.json") as f:
        covis = json.load(f)
    assert covis["0"]["views"] == [1, 2, 3]
    assert covis["3"]["views"] == [0, 1, 2]


def test_demon_fixer(tmp_path):
    """--fix parity (reference datasets/convert/demon_fixer.py:21-70):
    uint8-depth sessions deleted, depth ranges rewritten with the 400/
    10000 floors, unreadable sessions removed."""
    import imageio
    import numpy as np

    import convert_demon

    def make_session(name, arrays, covis=True):
        d = tmp_path / name / "depths"
        d.mkdir(parents=True)
        for i, a in enumerate(arrays):
            imageio.imwrite(str(d / f"{i}.png"), a)
        if covis:
            cov = {str(i): {"views": [j for j in range(len(arrays)) if j != i],
                            "min_depth": 1, "max_depth": 2}
                   for i in range(len(arrays))}
            with open(tmp_path / name / "covisibility.json", "w") as f:
                json.dump(cov, f)

    # good session: depths 350..12000 with invalid 0/65535 codes sprinkled
    good = np.full((8, 8), 5000, np.uint16)
    good[0, 0] = 0           # invalid-low: ignored for min
    good[0, 1] = 65535       # invalid-high: ignored for max
    good[1, 0] = 350         # below the 400 floor -> becomes the min
    good[1, 1] = 12000       # above the 10000 ceiling -> becomes the max
    make_session("good", [good, np.full((8, 8), 6000, np.uint16)])
    # mid-range session: floors stand (min 400 / max 10000)
    make_session("mid", [np.full((8, 8), 5000, np.uint16)])
    # uint8 session: deleted
    make_session("bad8", [np.full((8, 8), 100, np.uint8)])
    # broken session (no covisibility.json): removed
    make_session("broken", [np.full((8, 8), 5000, np.uint16)], covis=False)

    convert_demon.fix_demon(str(tmp_path))

    assert not (tmp_path / "bad8").exists()
    assert not (tmp_path / "broken").exists()
    with open(tmp_path / "good" / "covisibility.json") as f:
        cov = json.load(f)
    assert cov["0"]["min_depth"] == 350
    assert cov["0"]["max_depth"] == 12000
    with open(tmp_path / "mid" / "covisibility.json") as f:
        cov = json.load(f)
    assert cov["0"]["min_depth"] == 400
    assert cov["0"]["max_depth"] == 10000


def test_hp_search_bayes_beats_random_on_quadratic():
    """GP-EI converges near the optimum of a smooth objective within the
    same budget (reference parity: ML-Engine Bayesian tuning,
    machines/1p100_hptuning.yaml)."""
    import hp_search
    import random
    space = {"params": [
        {"name": "x", "type": "double", "min": 0.0, "max": 1.0, "scale": "linear"},
        {"name": "y", "type": "double", "min": 0.0, "max": 1.0, "scale": "linear"},
    ], "objective": {"metric": "score", "goal": "maximize"}}

    def objective(_t, params):
        return -((params["x"] - 0.3) ** 2 + (params["y"] - 0.7) ** 2)

    res = hp_search.run_search(space, 16, objective, random.Random(0),
                               strategy="bayes", init_trials=4)
    best = res[0]
    assert best["score"] > -0.01, best
    assert abs(best["params"]["x"] - 0.3) < 0.12
    assert abs(best["params"]["y"] - 0.7) < 0.12


def test_hp_search_handles_failed_trials():
    import hp_search
    import random
    space = {"params": [
        {"name": "x", "type": "double", "min": 0.0, "max": 1.0, "scale": "linear"},
    ], "objective": {"metric": "score", "goal": "maximize"}}

    def objective(t, params):
        return None if t % 2 == 0 else -(params["x"] - 0.5) ** 2

    res = hp_search.run_search(space, 8, objective, random.Random(1),
                               strategy="bayes", init_trials=2)
    assert res[0]["score"] is not None


def test_eval_pointcloud_metrics(tmp_path):
    """acc/comp/F-score on clouds with a KNOWN offset: pred = GT plane
    shifted 1mm in z plus 20% outliers at 50mm — the metrics must read
    exactly off that construction."""
    import eval_pointcloud
    from mvsnet_tpu.io.ply import write_ply

    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 100, (4000, 2))
    gt = np.concatenate([xy, np.zeros((4000, 1))], axis=1)
    pred_good = gt[:3200] + [0.0, 0.0, 1.0]
    pred_bad = gt[3200:4000] + [0.0, 0.0, 50.0]
    pred = np.concatenate([pred_good, pred_bad], axis=0)

    m = eval_pointcloud.evaluate_clouds(pred, gt, threshold=2.0)
    assert abs(m["accuracy_median"] - 1.0) < 0.05, m
    assert abs(m["precision"] - 0.8) < 0.02, m
    assert m["recall"] > 0.95, m          # dense plane: everything covered
    assert 0.85 < m["fscore"] < 0.93, m
    # bbox mask kills the 50mm outliers -> near-perfect accuracy
    m2 = eval_pointcloud.evaluate_clouds(pred, gt, threshold=2.0,
                                         bbox_margin=5.0)
    assert m2["accuracy_mean"] < 1.5, m2

    # CLI round trip through PLY files
    pp, gp = str(tmp_path / "p.ply"), str(tmp_path / "g.ply")
    write_ply(pp, pred.astype(np.float32))
    write_ply(gp, gt.astype(np.float32))
    rc = eval_pointcloud.main(["--pred", pp, "--gt", gp, "--threshold", "2"])
    assert rc == 0


def test_eval_pointcloud_voxel_downsample():
    import eval_pointcloud

    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 10, (5000, 3))
    ds = eval_pointcloud.voxel_downsample(pts, 1.0)
    assert len(ds) <= 1000 + 1  # at most the 10^3 occupied voxels
    assert len(ds) > 500
    # means stay inside their voxel
    assert (np.floor(ds / 1.0) >= 0).all()
    # no-op cases
    assert eval_pointcloud.voxel_downsample(pts, 0.0) is pts
