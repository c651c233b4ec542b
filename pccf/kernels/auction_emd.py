"""Auction-algorithm EMD with exact point assignment.

TPU-native counterpart of the reference's vendored auction EMD
(external/emd/: ``emd_cuda.cu`` Bid/GetMax/Assign phases, ``emd_module.py``).
The CUDA code runs Gauss-Seidel auction rounds with scatter/atomic updates;
here it is a **compacted Jacobi auction** in dense XLA ops inside
``lax.while_loop``:

- the pairwise distance matrix is computed once and stays in HBM; each round
  gathers the rows of up to ``k_active`` still-unassigned points (cumsum
  compaction — no data-dependent shapes) and only those bid, so per-round cost
  is ``O(B * k_active * M)`` instead of ``O(B * N * M)``;
- items take the best bid simultaneously (Jacobi), previous owners are
  evicted; the top-2 benefit per bidder is two masked max passes, not a sort;
- the loop terminates as soon as every point is assigned — the ``iters``
  argument is the *cap*, matching the reference contract where eval calls
  pass ~10000 iterations but the auction stops at convergence
  (external/emd/emd/emd_module.py:25-31).

Contract mirrors ``emdModule`` (emd_module.py:17-31):
- inputs ``(B, N, 3)`` / ``(B, M, 3)``; intended for clouds normalised to
  roughly the unit box;
- ``eps`` is the bid increment (accuracy/speed knob: 0.005/50 iterations for
  training, 0.002/~10000 for evaluation);
- returns per-point squared distances ``(B, N)`` and the assignment indices
  ``(B, N)`` into the second cloud.

Unlike the CUDA kernel there is no ``n % 1024 == 0`` constraint; any shapes
with ``N <= M`` work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pccf.kernels.ops import square_distance

Array = jax.Array

_NEG = -1e30


@functools.partial(jax.jit, static_argnames=('iters', 'k_active'))
def auction_emd(
    x1: Array, x2: Array, eps: float = 0.005, iters: int = 50, k_active: int | None = None
) -> tuple[Array, Array]:
    """Approximate optimal assignment EMD via compacted Jacobi auction.

    Args:
        x1: ``(B, N, 3)`` source cloud.
        x2: ``(B, M, 3)`` target cloud, ``M >= N``.
        eps: minimal bid increment (smaller -> more accurate, more rounds).
        iters: maximum auction rounds (loop exits early once all assigned).
        k_active: max simultaneous bidders per round; bounds the per-round
            working set gathered from the distance matrix.  Default
            ``min(max(256, N // 4), N)``: at the iteration-capped train
            contract this leaves no more rows unassigned than the uncapped
            Jacobi auction (measured), while the eval contract converges to
            a full assignment under any cap (early exit) — the cap is what
            keeps the long tail of nearly-converged rounds cheap.

    Returns:
        dis: ``(B, N)`` squared distance to the assigned target point.
        assignment: ``(B, N)`` int32 indices into ``x2`` (-1 if unassigned).
    """
    b, n, _ = x1.shape
    m = x2.shape[1]
    if n > m:
        # with more bidders than items the auction can never fully assign:
        # the loop would silently spin the whole iteration cap and return -1s
        raise ValueError(f'auction_emd requires N <= M, got N={n} > M={m}')
    k = min(k_active, n) if k_active else min(max(256, n // 4), n)
    d2 = square_distance(x1, x2)  # (B, N, M)
    neg_d2 = -d2
    batch_idx = jnp.arange(b)[:, None]
    row_ids = jnp.arange(n, dtype=jnp.int32)[None, :]
    item_ids = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None, :], (b, m))

    def cond(state):
        it, assignment, _owner, _price = state
        return (it < iters) & jnp.any(assignment < 0)

    def body(state):
        it, assignment, owner, price = state
        unassigned = assignment < 0  # (B, N)
        # --- compact: row ids of the first k unassigned points per batch ---
        pos = jnp.cumsum(unassigned, axis=1) - 1  # rank among unassigned
        valid = unassigned & (pos < k)
        scatter_pos = jnp.where(valid, pos, k)  # k = dump slot
        rows_ext = jnp.full((b, k + 1), n, jnp.int32)
        rows_ext = rows_ext.at[batch_idx, scatter_pos].set(
            jnp.where(valid, row_ids, n)
        )
        rows = rows_ext[:, :k]  # (B, k); n marks an empty slot
        active = rows < n
        rows_safe = jnp.minimum(rows, n - 1)

        # --- bid: best and second-best benefit per active bidder ---
        nb = jnp.take_along_axis(neg_d2, rows_safe[:, :, None], axis=1)  # (B, k, M)
        benefits = nb - price[:, None, :]
        best = jnp.max(benefits, axis=-1)  # (B, k)
        j_star = jnp.argmax(benefits, axis=-1).astype(jnp.int32)  # (B, k)
        onehot = jax.nn.one_hot(j_star, m, dtype=d2.dtype)  # (B, k, M)
        second = jnp.max(jnp.where(onehot > 0, _NEG, benefits), axis=-1)
        increment = best - second + eps
        bid_value = jnp.take_along_axis(price, j_star, axis=1) + increment
        bid_value = jnp.where(active, bid_value, _NEG)

        # --- items take the best bid (Jacobi): max over the k bidders ---
        bids = jnp.where(onehot > 0, bid_value[:, :, None], _NEG)  # (B, k, M)
        win_bid = jnp.max(bids, axis=1)  # (B, M)
        win_slot = jnp.argmax(bids, axis=1).astype(jnp.int32)  # (B, M) in [0, k)
        has_bid = win_bid > _NEG / 2
        win_row = jnp.take_along_axis(rows_safe, win_slot, axis=1)  # (B, M)

        # --- evict previous owners of re-auctioned items, assign winners ---
        evicted_rows = jnp.where(has_bid & (owner >= 0), owner, n)  # n = dump
        assignment_ext = jnp.concatenate(
            [assignment, jnp.full((b, 1), -1, jnp.int32)], axis=1
        )
        assignment_ext = assignment_ext.at[batch_idx, evicted_rows].set(-1)
        win_rows_safe = jnp.where(has_bid, win_row, n)
        assignment_ext = assignment_ext.at[batch_idx, win_rows_safe].set(
            jnp.where(has_bid, item_ids, -1)
        )
        assignment = assignment_ext[:, :n]
        owner = jnp.where(has_bid, win_row, owner)
        price = jnp.where(has_bid, win_bid, price)
        return it + 1, assignment, owner, price

    init = (
        jnp.asarray(0, jnp.int32),
        jnp.full((b, n), -1, jnp.int32),
        jnp.full((b, m), -1, jnp.int32),
        # prices must carry d2's dtype (f32 accumulation even for bf16
        # clouds), or the while_loop carry type changes across iterations
        jnp.zeros((b, m), d2.dtype),
    )
    _it, assignment, _owner, _price = jax.lax.while_loop(cond, body, init)
    dis = jnp.take_along_axis(d2, jnp.maximum(assignment, 0)[..., None], axis=2)[..., 0]
    dis = jnp.where(assignment >= 0, dis, jnp.min(d2, axis=2))
    return dis, assignment


class EmdModule:
    """Stateful wrapper matching the reference ``emdModule`` call surface."""

    def __call__(self, x1: Array, x2: Array, eps: float = 0.005, iters: int = 50):
        return auction_emd(x1, x2, eps=eps, iters=int(iters))


emdModule = EmdModule  # reference-compatible alias (external/emd/emd/__init__.py)
