"""Auction-algorithm EMD with exact point assignment.

TPU-native counterpart of the reference's vendored auction EMD
(external/emd/: ``emd_cuda.cu`` Bid/GetMax/Assign phases, ``emd_module.py``).
The CUDA code runs Gauss-Seidel auction rounds with scatter/atomic updates;
here it is a **Jacobi auction** in dense XLA ops inside ``lax.fori_loop`` —
every unassigned point bids simultaneously, items take the best bid, previous
owners are evicted — which maps onto the TPU as batched matmuls, top-k and
one-hot reductions with no data-dependent shapes.

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


@functools.partial(jax.jit, static_argnames=('iters',))
def auction_emd(x1: Array, x2: Array, eps: float = 0.005, iters: int = 50) -> tuple[Array, Array]:
    """Approximate optimal assignment EMD via Jacobi auction.

    Args:
        x1: ``(B, N, 3)`` source cloud.
        x2: ``(B, M, 3)`` target cloud, ``M >= N``.
        eps: minimal bid increment (smaller -> more accurate, more iters).
        iters: auction rounds.

    Returns:
        dis: ``(B, N)`` squared distance to the assigned target point.
        assignment: ``(B, N)`` int32 indices into ``x2`` (-1 if unassigned).
    """
    b, n, _ = x1.shape
    m = x2.shape[1]
    d2 = square_distance(x1, x2)  # (B, N, M)
    neg_d2 = -d2

    def body(_, state):
        assignment, owner, price = state
        unassigned = assignment < 0  # (B, N)
        benefits = neg_d2 - price[:, None, :]  # (B, N, M)
        top2, top2i = jax.lax.top_k(benefits, 2)
        j_star = top2i[..., 0]  # (B, N)
        increment = top2[..., 0] - top2[..., 1] + eps
        bid_value = jnp.take_along_axis(price, j_star, axis=1) + increment  # (B, N)
        bid_value = jnp.where(unassigned, bid_value, _NEG)
        # winning bid per item: max over bidders (dense one-hot contraction)
        onehot = jax.nn.one_hot(j_star, m, dtype=d2.dtype)  # (B, N, M)
        bids = jnp.where(onehot > 0, bid_value[:, :, None], _NEG)
        win_bid = jnp.max(bids, axis=1)  # (B, M)
        win_row = jnp.argmax(bids, axis=1).astype(jnp.int32)  # (B, M)
        has_bid = win_bid > _NEG / 2
        # evict previous owners of re-auctioned items
        evicted_rows = jnp.where(has_bid & (owner >= 0), owner, n)  # (B, M), n = dump slot
        batch_idx = jnp.arange(b)[:, None]
        assignment_ext = jnp.concatenate([assignment, jnp.full((b, 1), -1, jnp.int32)], axis=1)
        assignment_ext = assignment_ext.at[batch_idx, evicted_rows].set(-1)
        # assign winners
        win_rows_safe = jnp.where(has_bid, win_row, n)
        item_ids = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None, :], (b, m))
        assignment_ext = assignment_ext.at[batch_idx, win_rows_safe].set(
            jnp.where(has_bid, item_ids, -1)
        )
        assignment = assignment_ext[:, :n]
        owner = jnp.where(has_bid, win_row, owner)
        price = jnp.where(has_bid, win_bid, price)
        return assignment, owner, price

    init = (
        jnp.full((b, n), -1, jnp.int32),
        jnp.full((b, m), -1, jnp.int32),
        jnp.zeros((b, m), x1.dtype),
    )
    assignment, _owner, _price = jax.lax.fori_loop(0, iters, body, init)
    dis = jnp.take_along_axis(d2, jnp.maximum(assignment, 0)[..., None], axis=2)[..., 0]
    dis = jnp.where(assignment >= 0, dis, jnp.min(d2, axis=2))
    return dis, assignment


class EmdModule:
    """Stateful wrapper matching the reference ``emdModule`` call surface."""

    def __call__(self, x1: Array, x2: Array, eps: float = 0.005, iters: int = 50):
        return auction_emd(x1, x2, eps=eps, iters=int(iters))


emdModule = EmdModule  # reference-compatible alias (external/emd/emd/__init__.py)
