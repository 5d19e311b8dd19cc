"""Hungarian matcher: batched on-device cost matrices + on-device LSAP.

Reference (models/matcher.py:67-201) loops scenes on GPU and calls scipy per
scene per aux output (13 x B CPU round-trips per step). Here all L x B cost
matrices are computed batched on device in one einsum pass and solved by a
vmapped auction algorithm entirely on device -- zero host round-trips, and it
works on TPU runtimes without host-callback support (the axon PJRT rejects
pure_callback). A scipy pure_callback solver is kept for exactness tests
(solver='scipy'). Costs match the reference exactly:
  C = cost_mask * BCE + cost_class * (-prob[target]) + cost_dice * dice
with padded target columns pushed to a huge constant so LSAP never prefers
them; pairs matched to padding are dropped afterwards.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from unscene3d_tpu.data.batch import Targets

_BIG = 1e8


@struct.dataclass
class HungarianMatcher:
    cost_class: float = 2.0
    cost_mask: float = 5.0
    cost_dice: float = 2.0
    num_points: int = -1  # -1 = use all points (reference default)
    ignore_label: int = 253
    # 'auction' solves on device (the TPU runtime here lacks host callbacks);
    # 'scipy' uses a pure_callback to linear_sum_assignment (exact, CPU-only)
    solver: str = struct.field(pytree_node=False, default="auction")

    def cost_matrix(
        self,
        pred_logits: jnp.ndarray,   # (..., Q, C)
        pred_masks: jnp.ndarray,    # (..., M, Q)  mask logits over M columns
        tgt_labels: jnp.ndarray,    # (..., T)
        tgt_masks: jnp.ndarray,     # (..., T, M) float {0,1}
        tgt_valid: jnp.ndarray,     # (..., T)
        col_valid: jnp.ndarray,     # (..., M) valid mask columns (segments/voxels)
    ) -> jnp.ndarray:
        out_prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
        ignore = tgt_labels == self.ignore_label
        ids = jnp.where(ignore, 0, tgt_labels)
        cost_class = -jnp.take_along_axis(
            out_prob, ids[..., None, :], axis=-1
        )  # (..., Q, T)
        cost_class = jnp.where(ignore[..., None, :], -1.0, cost_class)

        x = pred_masks.astype(jnp.float32)          # (..., M, Q)
        t = tgt_masks.astype(jnp.float32)           # (..., T, M)
        w = col_valid.astype(jnp.float32)           # (..., M)
        pos = jax.nn.softplus(-x) * w[..., None]    # BCE(x, 1)
        neg = jax.nn.softplus(x) * w[..., None]     # BCE(x, 0)
        n_cols = jnp.maximum(w.sum(-1), 1.0)
        cost_bce = (
            jnp.einsum("...mq,...tm->...qt", pos, t)
            + jnp.einsum("...mq,...tm->...qt", neg, (1.0 - t) * w[..., None, :])
        ) / n_cols[..., None, None]

        sig = jax.nn.sigmoid(x) * w[..., None]
        numerator = 2.0 * jnp.einsum("...mq,...tm->...qt", sig, t)
        denominator = sig.sum(-2)[..., :, None] + (t * w[..., None, :]).sum(-1)[..., None, :]
        cost_dice = 1.0 - (numerator + 1.0) / (denominator + 1.0)

        cost = (
            self.cost_mask * cost_bce
            + self.cost_class * cost_class
            + self.cost_dice * cost_dice
        )
        return jnp.where(tgt_valid[..., None, :], cost, _BIG)

    def __call__(self, pred_logits, pred_masks, targets: Targets, mask_type: str,
                 col_valid) -> jnp.ndarray:
        """pred_logits (L,B,Q,C), pred_masks (L,B,M,Q). Returns matched query
        index per target: (L, B, T) int32, -1 where the target is padding."""
        tgt_masks = targets.seg_masks if mask_type == "segment_mask" else None
        assert tgt_masks is not None, "voxel-level matching uses cost_matrix directly"
        L, B = pred_logits.shape[:2]
        T = targets.labels.shape[-1]
        cost = self.cost_matrix(
            pred_logits,
            pred_masks,
            targets.labels[None].repeat(L, 0),
            tgt_masks[None].astype(jnp.float32).repeat(L, 0),
            targets.valid[None].repeat(L, 0),
            col_valid[None].repeat(L, 0),
        )
        cost = jax.lax.stop_gradient(cost)
        if self.solver == "scipy":
            matched = solve_lsap(cost)
        else:
            matched = solve_lsap_auction(cost, targets.valid[None].repeat(L, 0))
        return jnp.where(targets.valid[None], matched, -1)


def solve_lsap_auction(cost: jnp.ndarray, valid: jnp.ndarray | None = None,
                       eps_scale: float = 1e-3,
                       max_iters: int | None = None) -> jnp.ndarray:
    """Fully on-device rectangular LSAP via the (Jacobi) auction algorithm.

    cost: (..., Q, T) with Q >= #valid targets; returns (..., T) int32 query
    per target (-1 for invalid targets). valid (..., T) marks real targets:
    padded targets are born "assigned" so they never bid -- without this, a
    batch padded to T > Q can never satisfy the all-assigned convergence test
    and every solve burns the full iteration cap (measured: ~9.4k iterations
    = 1.2s/step at the flagship train workload, vs <100 when only the ~dozen
    real targets bid).
    The axon TPU runtime does not support host callbacks, so scipy is not an
    option inside a jitted train step; auction with a small bid increment
    solves the tiny (100 x <=32) matrices to near-optimality on device.
    eps-optimality: total cost within T*eps of optimal, eps = eps_scale *
    (per-matrix cost range).
    """
    q, t = cost.shape[-2:]
    lead = cost.shape[:-2]
    flat = cost.reshape((-1, q, t)).astype(jnp.float32)
    vflat = (jnp.ones_like(flat[:, 0, :], bool) if valid is None
             else valid.reshape((-1, t)).astype(bool))

    # worst-case bid count scales with T/eps_scale (ADVICE r1: a fixed 3000
    # cap can leave valid targets unassigned, silently dropping them from the
    # loss); a greedy completion pass below guarantees every target is
    # assigned even if the cap is hit
    cap = max_iters or max(3000, int(4 * t / eps_scale**0.5))

    def solve_one(c, v):
        benefit = -c.T  # (T, Q), maximize
        rng = jnp.maximum(jnp.max(c) - jnp.min(c), 1e-6)
        eps = eps_scale * rng + 1e-9

        def body(state):
            price, owner_q, assign_t, _, it = state  # (Q,), (Q,), (T,)
            unassigned = assign_t < 0  # (T,)
            value = benefit - price[None, :]        # (T, Q)
            best_q = jnp.argmax(value, axis=1)      # (T,)
            best_v = jnp.max(value, axis=1)
            second_v = jnp.max(
                jnp.where(jax.nn.one_hot(best_q, q, dtype=bool), -jnp.inf, value),
                axis=1,
            )
            bid = best_v - jnp.where(jnp.isfinite(second_v), second_v, best_v) + eps
            # only unassigned targets bid; per query keep the highest bid
            bid = jnp.where(unassigned, bid, -jnp.inf)
            bid_matrix = jnp.full((t, q), -jnp.inf).at[
                jnp.arange(t), best_q
            ].set(bid)
            win_bid = jnp.max(bid_matrix, axis=0)       # (Q,)
            win_t = jnp.argmax(bid_matrix, axis=0)      # (Q,)
            has_bid = jnp.isfinite(win_bid) & (win_bid > -jnp.inf)

            # displace previous owners of re-auctioned queries
            new_owner_q = jnp.where(has_bid, win_t, owner_q)
            displaced = has_bid & (owner_q >= 0)
            assign_t = jnp.where(
                jnp.isin(jnp.arange(t), jnp.where(displaced, owner_q, -1)),
                -1, assign_t,
            )
            # record new assignments
            assign_t = assign_t.at[jnp.where(has_bid, win_t, t)].set(
                jnp.where(has_bid, jnp.arange(q), -1), mode="drop"
            )
            price = jnp.where(has_bid, price + win_bid, price)
            done = jnp.all(assign_t >= 0)
            return price, new_owner_q, assign_t, done, it + 1

        def cond(state):
            return (~state[3]) & (state[4] < cap)

        # invalid targets start "assigned" to the out-of-range sentinel q:
        # they never bid, never get displaced (no query ever owns them), and
        # don't block the all-assigned convergence test
        init = (jnp.zeros(q), jnp.full((q,), -1, jnp.int32),
                jnp.where(v, -1, q).astype(jnp.int32), jnp.asarray(False),
                jnp.asarray(0, jnp.int32))
        state = jax.lax.while_loop(cond, body, init)
        assign = state[2].astype(jnp.int32)

        # greedy completion: if the iteration cap was hit, give every still-
        # unassigned target its cheapest free query so no valid target drops
        # out of the loss with zero weight
        used = jnp.zeros((q,), bool).at[
            jnp.where(assign >= 0, assign, q)
        ].set(True, mode="drop")

        def fill(i, carry):
            assign, used = carry
            c_i = jnp.where(used, jnp.inf, c[:, i])
            pick = jnp.argmin(c_i).astype(jnp.int32)
            take = assign[i] < 0
            assign = assign.at[i].set(jnp.where(take, pick, assign[i]))
            used = used.at[pick].set(used[pick] | take)
            return assign, used

        assign, _ = jax.lax.fori_loop(0, t, fill, (assign, used))
        return jnp.where(v, assign, -1)

    out = jax.vmap(solve_one)(flat, vflat)
    return out.reshape(*lead, t)


def _host_lsap(cost: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost, np.float64)
    lead = cost.shape[:-2]
    q, t = cost.shape[-2:]
    flat = cost.reshape(-1, q, t)
    out = np.zeros((flat.shape[0], t), np.int32)
    for i in range(flat.shape[0]):
        c = np.nan_to_num(flat[i], nan=_BIG, posinf=_BIG, neginf=-_BIG)
        rows, cols = linear_sum_assignment(c)
        out[i][cols] = rows
    return out.reshape(*lead, t)


def solve_lsap(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve batched LSAPs on host. cost (..., Q, T) -> (..., T) query index."""
    shape = jax.ShapeDtypeStruct(cost.shape[:-2] + (cost.shape[-1],), jnp.int32)
    return jax.pure_callback(_host_lsap, shape, cost)
