"""Hyperparameter search driver.

Replaces the reference's ML-Engine Bayesian tuning
(machines/1p100_hptuning.yaml): random search over the space in
configs/hp_tuning.json, launching mvsnet_tpu.train per trial and scoring
each by the best `val_less_one` in its metrics.jsonl.

`python tools/hp_search.py --train_data_root ... --model_root ... [--trials 6]`
Any extra arguments are forwarded to the train driver.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import subprocess
import sys


def sample_params(space, rng: random.Random):
    out = {}
    for p in space["params"]:
        lo, hi = p["min"], p["max"]
        if p.get("scale") == "log":
            v = math.exp(rng.uniform(math.log(lo), math.log(hi)))
        else:
            v = rng.uniform(lo, hi)
        if p["type"] == "integer":
            v = int(round(v))
        out[p["name"]] = v
    return out


def best_metric(metrics_path: str, metric: str):
    best = None
    try:
        with open(metrics_path) as f:
            for line in f:
                rec = json.loads(line)
                if metric in rec:
                    best = rec[metric] if best is None else max(best, rec[metric])
    except OSError:
        pass
    return best


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_data_root", required=True)
    p.add_argument("--model_root", required=True)
    p.add_argument("--space", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "hp_tuning.json"))
    p.add_argument("--trials", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    args, extra = p.parse_known_args(argv)

    with open(args.space) as f:
        space = json.load(f)
    metric = space["objective"]["metric"]
    trials = args.trials or space.get("max_trials", 6)
    rng = random.Random(args.seed)

    results = []
    for t in range(trials):
        params = sample_params(space, rng)
        model_dir = os.path.join(args.model_root, f"trial_{t}")
        cmd = [sys.executable, "-m", "mvsnet_tpu.train",
               "--train_data_root", args.train_data_root,
               "--model_dir", model_dir]
        for k, v in params.items():
            cmd += [f"--{k}", str(v)]
        cmd += extra
        print(f"[trial {t}] {params}")
        rc = subprocess.call(cmd)
        score = best_metric(os.path.join(model_dir, "metrics.jsonl"), metric)
        print(f"[trial {t}] rc={rc} {metric}={score}")
        results.append({"trial": t, "params": params, "score": score, "rc": rc})

    results.sort(key=lambda r: (r["score"] is not None, r["score"]), reverse=True)
    summary_path = os.path.join(args.model_root, "hp_search_results.json")
    with open(summary_path, "w") as f:
        json.dump(results, f, indent=2)
    print("best:", results[0] if results else None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
