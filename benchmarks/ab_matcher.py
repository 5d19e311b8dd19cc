"""A/B: on-device auction LSAP vs scipy exact Hungarian (VERDICT r1 weak #7).

Samples cost matrices with the criterion's real structure (100 queries x K
targets, cost = 2*class + 5*BCE + 2*dice) at three training stages —
random-init (near-uniform costs), mid-training (partial structure), and
near-converged (each target dominated by one query) — and reports:

- exact assignment agreement rate,
- total-cost regret of the auction solution vs the optimal,
- the resulting matched-pair overlap (what the loss actually consumes).

  python benchmarks/ab_matcher.py [--trials 50]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _stage_cost(rng, q=100, k=20, stage="init"):
    """Cost matrices shaped like SetCriterion's (class + mask BCE + dice)."""
    if stage == "init":
        # untrained model: all queries look alike
        return rng.rand(q, k) * 2.0 + rng.randn(q, k) * 0.05
    if stage == "mid":
        c = rng.rand(q, k) * 2.0
        for j in range(k):
            winners = rng.choice(q, 3, replace=False)
            c[winners, j] -= rng.rand(3) * 1.5  # a few plausible queries
        return c
    # converged: one dominant query per target
    c = rng.rand(q, k) * 2.0 + 2.0
    for j in range(k):
        c[rng.randint(q), j] = rng.rand() * 0.2
    return c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=50)
    args = ap.parse_args()

    import jax.numpy as jnp
    from scipy.optimize import linear_sum_assignment

    from unscene3d_tpu.losses.matcher import solve_lsap_auction

    rng = np.random.RandomState(0)
    report = {}
    for stage in ("init", "mid", "converged"):
        agree, regret, pair_overlap = [], [], []
        for t in range(args.trials):
            k = int(rng.randint(3, 30))
            c = _stage_cost(rng, 100, k, stage)
            rows = np.asarray(solve_lsap_auction(jnp.asarray(c[None]))[0][:k])
            r_opt, c_opt = linear_sum_assignment(c)
            opt_cost = c[r_opt, c_opt].sum()
            got_cost = c[rows, np.arange(k)].sum()
            opt_rows = np.full(k, -1)
            opt_rows[c_opt] = r_opt
            agree.append(float((rows == opt_rows).mean()))
            regret.append(float((got_cost - opt_cost) / max(abs(opt_cost), 1e-9)))
            pair_overlap.append(float(np.isin(rows, opt_rows).mean()))
        report[stage] = {
            "assignment_agreement": round(float(np.mean(agree)), 4),
            "cost_regret_mean": round(float(np.mean(regret)), 5),
            "cost_regret_max": round(float(np.max(regret)), 5),
        }
        print(f"[{stage}] agree={np.mean(agree):.3f} "
              f"regret mean={np.mean(regret):.4f} max={np.max(regret):.4f}",
              file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
