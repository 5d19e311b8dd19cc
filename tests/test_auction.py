"""On-device auction LSAP vs scipy's exact solver."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from unscene3d_tpu.losses.matcher import solve_lsap_auction


def total_cost(cost, assign):
    return sum(cost[q, t] for t, q in enumerate(assign))


def test_auction_matches_scipy_on_random():
    r = np.random.RandomState(0)
    worst_gap = 0.0
    for trial in range(20):
        q, t = 20, r.randint(2, 12)
        cost = r.rand(q, t).astype(np.float32) * 10
        ours = np.asarray(solve_lsap_auction(jnp.asarray(cost[None]))[0])
        assert (ours >= 0).all()
        assert len(set(ours.tolist())) == t  # distinct queries
        rows, cols = linear_sum_assignment(cost)
        opt = cost[rows, cols].sum()
        got = total_cost(cost, ours)
        worst_gap = max(worst_gap, (got - opt) / max(opt, 1e-9))
    assert worst_gap < 0.05, f"auction too far from optimal: {worst_gap:.3f}"


def test_auction_exact_on_separated():
    # well-separated costs: auction must be exactly optimal
    cost = np.full((8, 3), 100.0, np.float32)
    cost[5, 0] = 1.0
    cost[2, 1] = 1.0
    cost[7, 2] = 1.0
    ours = np.asarray(solve_lsap_auction(jnp.asarray(cost[None]))[0])
    assert ours.tolist() == [5, 2, 7]


def test_auction_batched_shapes():
    r = np.random.RandomState(1)
    cost = r.rand(3, 2, 16, 5).astype(np.float32)
    out = np.asarray(solve_lsap_auction(jnp.asarray(cost)))
    assert out.shape == (3, 2, 5)
    for i in range(3):
        for j in range(2):
            assert len(set(out[i, j].tolist())) == 5


def test_auction_padded_targets_exceed_queries():
    # T padded past Q (the flagship train shape: Q=100 queries, T=256 padded
    # targets): with the valid mask, padded targets never bid, the loop
    # converges (far before the cap), valid targets match scipy's optimum on
    # the valid sub-problem, and invalid targets come back -1
    r = np.random.RandomState(3)
    q, t, t_valid = 50, 128, 9
    cost = np.full((q, t), 1e8, np.float32)
    cost[:, :t_valid] = r.rand(q, t_valid) * 10
    valid = np.zeros((t,), bool)
    valid[:t_valid] = True
    ours = np.asarray(
        solve_lsap_auction(jnp.asarray(cost[None]), jnp.asarray(valid[None]))[0]
    )
    assert (ours[t_valid:] == -1).all()
    head = ours[:t_valid]
    assert (head >= 0).all() and len(set(head.tolist())) == t_valid
    rows, cols = linear_sum_assignment(cost[:, :t_valid])
    opt = cost[rows, cols].sum()
    got = total_cost(cost[:, :t_valid], head)
    assert got <= opt * 1.05 + 1e-6


def test_auction_with_padding_costs():
    # padded targets carry a huge constant cost; all still get distinct queries
    r = np.random.RandomState(2)
    cost = r.rand(10, 6).astype(np.float32)
    cost[:, 4:] = 1e8
    ours = np.asarray(solve_lsap_auction(jnp.asarray(cost[None]))[0])
    assert len(set(ours.tolist())) == 6
    rows, cols = linear_sum_assignment(cost[:, :4])
    opt = cost[rows, cols].sum()
    got = total_cost(cost[:, :4], ours[:4])
    assert got <= opt * 1.05 + 1e-6
