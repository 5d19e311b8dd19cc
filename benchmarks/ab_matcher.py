"""A/B: on-device auction LSAP vs exact scipy Hungarian (VERDICT r4 weak#5).

The matcher's auction solver is eps-optimal per cost matrix
(tests/test_auction.py) but its end-to-end effect on a TRAINED model's AP
was unquantified; the reference solves exactly
(/root/reference/models/matcher.py:161-163). This trains the same tiny
oracle config twice -- identical data, seeds, schedule -- differing ONLY in
matcher.solver, and reports final val AP50/AP25 + loss for both.

Runs on CPU (scipy's pure_callback is host-only; the axon TPU runtime has
no host callbacks): JAX_PLATFORMS=cpu python benchmarks/ab_matcher.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from benchmarks.self_train_trajectory import BASE_OVERRIDES, write_dataset


def train_once(root: str, out_root: str, solver: str, epochs: int):
    from main_instance_segmentation import build_experiment, get_parameters

    cfg = get_parameters(BASE_OVERRIDES + [
        f"general.data_dir={root}",
        f"general.save_dir={out_root}/{solver}",
        f"general.experiment_name=ab_{solver}",
        f"trainer.max_epochs={epochs}",
        f"matcher.solver={solver}",
    ])
    exp = build_experiment(cfg)
    assert exp.criterion.matcher.solver == solver
    t0 = time.time()
    state = exp.fit(max_epochs=epochs)
    results = exp.evaluate(state, exp.validation_dataset, with_boxes=False)
    return {
        "solver": solver,
        "ap50": float(results["all_ap_50%"]),
        "ap": float(results["all_ap"]),
        "ap25": float(results["all_ap_25%"]),
        "train_seconds": round(time.time() - t0, 1),
    }


if __name__ == "__main__":
    from unscene3d_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    root = os.environ.get("AB_DATA", "/tmp/unscene3d_ab_matcher/data")
    out = os.environ.get("AB_OUT", "/tmp/unscene3d_ab_matcher/runs")
    epochs = int(os.environ.get("AB_EPOCHS", "30"))
    if not os.path.exists(os.path.join(root, "train_database.yaml")):
        # oracle masks on BOTH splits: the A/B isolates the matcher, not
        # label noise
        write_dataset(root, drop=0.0, erode=0.0)
    rows = [train_once(root, out, s, epochs) for s in ("auction", "scipy")]
    delta = rows[0]["ap50"] - rows[1]["ap50"]
    print(json.dumps({"runs": rows, "ap50_auction_minus_scipy": round(delta, 4)}))
