"""Pure-`jax.numpy` geometry / matching ops — the golden reference semantics.

These functions define the numerical contract of the framework's kernel layer.
Every Pallas TPU kernel in :mod:`pccf.kernels.pallas` must match these within
float tolerance.  Semantics mirror the upstream reference implementation:

- pairwise squared distance: reference ``src/utils/neighbour_ops.py:43-50``
- kNN (self, top-k smallest):  reference ``src/utils/neighbour_ops.py:63-82``
- neighbour gather / EdgeConv features: ``src/utils/neighbour_ops.py:85-119``
- graph filtering:              reference ``src/utils/neighbour_ops.py:122-133``
- Chamfer (mean-per-point, pykeops variant): ``src/train/metrics_and_losses.py:21-47``
- NNDistance fwd/bwd:           reference ``external/pytorch_structural_losses/src/nndistance.cu``
- ApproxMatch EMD fwd/bwd:      reference ``external/pytorch_structural_losses/src/approxmatch.cu``

All point clouds are channels-last ``(B, N, C)`` (TPU-idiomatic: the feature
axis maps to the 128-wide lane dimension).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

# number of relaxation levels in ApproxMatch: level = -4**j for j = 7 .. -1
# (reference approxmatch.cu:24-27; the j == -2 / level == 0 pass is excluded).
APPROX_MATCH_LEVELS = tuple(-float(4.0**j) for j in range(7, -2, -1))


def square_distance(t1: Array, t2: Array) -> Array:
    """Batched pairwise squared Euclidean distance.

    Args:
        t1: ``(..., N, C)`` points.
        t2: ``(..., M, C)`` points.

    Returns:
        ``(..., N, M)`` squared distances.
    """
    # -2 x.y^T + |x|^2 + |y|^2 : one big MXU matmul plus rank-1 updates.
    # HIGHEST precision: distances feed argmin / matching, bf16 MXU passes
    # would perturb neighbour selection vs the reference fp32 kernels.
    cross = jnp.matmul(
        t1, jnp.swapaxes(t2, -1, -2), precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32
    )
    d = -2.0 * cross
    d = d + jnp.sum(t1 * t1, axis=-1, keepdims=True)
    d = d + jnp.swapaxes(jnp.sum(t2 * t2, axis=-1, keepdims=True), -1, -2)
    return d


def self_square_distance(t: Array) -> Array:
    """Pairwise squared distance of a cloud with itself: ``(..., N, N)``."""
    sq = jnp.sum(t * t, axis=-1, keepdims=True)
    cross = jnp.matmul(
        t, jnp.swapaxes(t, -1, -2), precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32
    )
    return sq - 2.0 * cross + jnp.swapaxes(sq, -1, -2)


def knn(x: Array, k: int, *, approx: bool = False) -> Array:
    """Indices of the k nearest neighbours of each point (self included).

    Args:
        x: ``(B, N, C)`` features.
        k: neighbour count (the closest entry is the point itself).
        approx: use TPU-optimised ``lax.approx_min_k`` (recall < 1, faster).

    Returns:
        ``(B, N, k)`` int32 indices into axis 1.
    """
    d = self_square_distance(x)
    if approx:
        _, idx = jax.lax.approx_min_k(d, k)
    else:
        _, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32)


def gather_neighbors(x: Array, idx: Array) -> Array:
    """Gather neighbour features.

    Args:
        x: ``(B, N, C)`` features.
        idx: ``(B, N, k)`` neighbour indices.

    Returns:
        ``(B, N, k, C)`` neighbour features.
    """
    b, n, c = x.shape
    k = idx.shape[-1]
    flat = jnp.take_along_axis(x, idx.reshape(b, n * k, 1), axis=1)
    return flat.reshape(b, n, k, c)


def edge_features(x: Array, idx: Array) -> Array:
    """EdgeConv features ``concat(neighbor - x, x)``: ``(B, N, k, 2C)``.

    Reference: ``get_graph_features`` (neighbour_ops.py:113-119).
    """
    neigh = gather_neighbors(x, idx)
    centers = jnp.broadcast_to(x[:, :, None, :], neigh.shape)
    return jnp.concatenate([neigh - centers, centers], axis=-1)


@jax.custom_vjp
def graph_max_pool(x: Array, idx: Array) -> Array:
    """Max over the k neighbours of each point: ``(B, N, C)``.

    Reference: ``graph_max_pooling`` (neighbour_ops.py:106-110).

    Backward routes each cotangent to the FIRST maximal neighbour (torch
    ``max`` semantics, which the reference trains with — and what the Pallas
    kernel's argmax-scatter backward implements), not jax ``reduce_max``'s
    even split among ties; gradients therefore match across backends even on
    exactly duplicated points.
    """
    return jnp.max(gather_neighbors(x, idx), axis=2)


def _gmp_fwd(x: Array, idx: Array):
    gathered = gather_neighbors(x, idx)  # (B, N, k, C)
    arg = jnp.argmax(gathered, axis=2)  # (B, N, C): first max along k
    return jnp.max(gathered, axis=2), (idx, arg)


def _gmp_bwd(res, g):
    idx, arg = res
    # source row per (b, n, c): the winning slot's neighbour index
    src = jnp.take_along_axis(idx[..., None], arg[:, :, None, :], axis=2)[:, :, 0, :]
    # x is (B, N, C) with idx into its own axis 1 (self-graph), so the
    # primal shape/dtype are recoverable from the residual arrays + cotangent
    shape = (idx.shape[0], idx.shape[1], arg.shape[-1])
    b_i = jnp.arange(shape[0])[:, None, None]
    c_i = jnp.arange(shape[2])[None, None, :]
    gx = jnp.zeros(shape, g.dtype).at[b_i, src, c_i].add(g)
    return gx, None


graph_max_pool.defvjp(_gmp_fwd, _gmp_bwd)


def interleave_residual(x: Array, out_features: int) -> Array:
    """Reference residual ``repeat_interleave(out//in + 1, -1)[..., :out]``
    (layers.py:165-167), built from the surviving prefix only.

    Only the first ``ceil(out/reps)`` source channels survive the truncation,
    so the broadcast starts from that prefix — at ``out == in`` this
    materialises an (…, out)-sized intermediate instead of (…, 2·in).
    Single source of truth for :class:`pccf.nn.layers.DenseBlock` and the
    fused PCGen kernel (their layouts must match exactly)."""
    in_features = x.shape[-1]
    reps = out_features // in_features + 1
    src = -(-out_features // reps)
    pre = x[..., :src]
    return jnp.broadcast_to(pre[..., None], (*pre.shape, reps)).reshape(
        *x.shape[:-1], src * reps
    )[..., :out_features]


def graph_sum_pool(x: Array, idx: Array) -> Array:
    """Sum over the k neighbours of each point: ``(B, N, C)``.

    Streaming-BN helper for the EdgeConv training path: batch statistics of
    the gathered edge tensor reduce to neighbour sums of ``u`` and ``u²``
    (pccf extension; no reference counterpart — the reference materialises
    the (B, N, k, F) tensor instead).
    """
    return jnp.sum(gather_neighbors(x, idx), axis=2)


def get_local_covariance(x: Array, idx: Array) -> Array:
    """Per-point local covariance features concatenated to the input
    (reference neighbour_ops.py:97-103; unused by the shipped models but part
    of the geometry-op surface).

    Args:
        x: ``(B, N, C)`` features.
        idx: ``(B, N, k)`` neighbour indices.

    Returns:
        ``(B, N, C + C*C)``: input features plus flattened covariances.
    """
    neigh = gather_neighbors(x, idx)  # (B, N, k, C)
    centered = neigh - jnp.mean(neigh, axis=2, keepdims=True)
    cov = jnp.einsum('bnkc,bnkd->bncd', centered, centered)
    return jnp.concatenate([x, cov.reshape(*x.shape[:2], -1)], axis=-1)


def graph_filtering(x: Array, k: int = 4) -> Array:
    """Gaussian-weighted sharpening filter applied to a decoded cloud.

    ``(1 + sum_w) * x - sum(w * neighbours)`` with per-cloud bandwidth sigma
    clamped at 0.005.  Reference: ``neighbour_ops.py:122-133`` (channels-last
    here; the reference is channels-first).

    Args:
        x: ``(B, N, 3)`` decoded cloud.
        k: neighbours including self.
    """
    return graph_filtering_with_idx(x, knn(x, k))


def graph_filtering_with_idx(x: Array, idx: Array, gather_fn=None) -> Array:
    """Graph filtering with precomputed neighbour indices (self first)."""
    neigh = (gather_fn or gather_neighbors)(x, idx)[:, :, 1:, :]  # drop self
    diff = x[:, :, None, :] - neigh  # (B, N, k-1, 3)
    # epsilon guards sqrt'(0): duplicate decoded points would otherwise put
    # NaNs into the backward pass (the reference's sqrt(abs(.)) has the same
    # singularity; its GPU path just never hits exact zeros)
    dist = jnp.sqrt(jnp.abs(jnp.sum(diff * diff, axis=-1)) + 1e-12)  # (B, N, k-1)
    sigma = jnp.maximum(jnp.mean(dist[:, :, 0:1], axis=1, keepdims=True), 0.005)
    weights = jnp.exp(-dist / sigma)  # (B, N, k-1)
    w_sum = jnp.sum(weights, axis=-1, keepdims=True)  # (B, N, 1)
    weighted = jnp.sum(weights[..., None] * neigh, axis=2)  # (B, N, 3)
    return (1.0 + w_sum) * x - weighted


# ---------------------------------------------------------------------------
# Chamfer / NNDistance
# ---------------------------------------------------------------------------


def nn_distance(x: Array, y: Array) -> tuple[Array, Array, Array, Array]:
    """Bidirectional nearest-neighbour squared distances.

    Same outputs as the reference CUDA ``nndistance`` (nndistance.cu:125):
    ``dist1 (B,N), idx1 (B,N), dist2 (B,M), idx2 (B,M)`` where ``dist1[i]`` is
    the squared distance from ``x_i`` to its nearest point of ``y``.
    """
    d = square_distance(x, y)
    idx1 = jnp.argmin(d, axis=-1).astype(jnp.int32)
    dist1 = jnp.take_along_axis(d, idx1[..., None].astype(jnp.int32), axis=-1)[..., 0]
    idx2 = jnp.argmin(d, axis=-2).astype(jnp.int32)
    dist2 = jnp.take_along_axis(jnp.swapaxes(d, -1, -2), idx2[..., None], axis=-1)[..., 0]
    return dist1, idx1, dist2, idx2


def chamfer(x: Array, y: Array, *, reduction: str = 'mean') -> Array:
    """Chamfer distance per batch element ``(B,)``.

    ``reduction='mean'`` matches the reference GPU path (``pykeops_chamfer``,
    metrics_and_losses.py:21-41): mean over points in each direction.
    ``reduction='sum'`` matches ``torch_chamfer`` (:44-47).

    Differentiable; gradients flow through the gathered nearest neighbours
    (same semantics as the reference's gather trick).
    """
    d = square_distance(jax.lax.stop_gradient(x), jax.lax.stop_gradient(y))
    idx1 = jnp.argmin(d, axis=-1)  # for each x point: nearest y (B, N)
    idx2 = jnp.argmin(d, axis=-2)  # for each y point: nearest x (B, M)
    nearest_y = jnp.take_along_axis(y, idx1[..., None], axis=1)  # (B, N, C)
    nearest_x = jnp.take_along_axis(x, idx2[..., None], axis=1)  # (B, M, C)
    red = jnp.mean if reduction == 'mean' else jnp.sum
    fwd = red(jnp.sum((x - nearest_y) ** 2, axis=-1), axis=1)
    bwd = red(jnp.sum((y - nearest_x) ** 2, axis=-1), axis=1)
    return fwd + bwd


# ---------------------------------------------------------------------------
# ApproxMatch EMD (Fan et al. multi-scale soft matching)
# ---------------------------------------------------------------------------


def emd_marginal_multipliers(n: int, m: int) -> tuple[float, float]:
    """ApproxMatch marginal multipliers via C-int division
    (approxmatch.cu:6-12) — shared by the golden matchers and the fused
    Pallas kernel so the edge-case semantics can never desynchronise."""
    if n >= m:
        return 1.0, float(n // m)
    return float(m // n), 1.0


def approx_match(x1: Array, x2: Array) -> Array:
    """Approximate optimal-transport plan between two clouds.

    Multi-scale soft matching over 9 temperature levels; faithful port of the
    reference CUDA algorithm (approxmatch.cu:3-183) in dense-batched form.

    Args:
        x1: ``(B, N, 3)``.
        x2: ``(B, M, 3)``.

    Returns:
        match: ``(B, N, M)`` transport weights (rows ~ x1, cols ~ x2).
    """
    n = x1.shape[1]
    m = x2.shape[1]
    mult_l, mult_r = emd_marginal_multipliers(n, m)

    d = square_distance(x1, x2)  # (B, N, M)

    def level_step(carry, level):
        remain_l, remain_r, match = carry
        kernel = jnp.exp(level * d)  # (B, N, M)
        # phase 1: per-left normalisation
        suml = jnp.einsum('bnm,bm->bn', kernel, remain_r) + 1e-9
        ratio_l = remain_l / suml
        # phase 2: right capacity consumption
        demand = jnp.einsum('bnm,bn->bm', kernel, ratio_l) * remain_r
        consumption = jnp.minimum(remain_r / (demand + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        # phase 3: assign mass
        w = kernel * ratio_l[:, :, None] * ratio_r[:, None, :]
        match = match + w
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(w, axis=2))
        remain_r = jnp.maximum(0.0, remain_r - demand)
        return (remain_l, remain_r, match), None

    b = x1.shape[0]
    init = (
        jnp.full((b, n), mult_l, dtype=x1.dtype),
        jnp.full((b, m), mult_r, dtype=x1.dtype),
        jnp.zeros((b, n, m), dtype=x1.dtype),
    )
    levels = jnp.asarray(APPROX_MATCH_LEVELS, dtype=x1.dtype)
    (_, _, match), _ = jax.lax.scan(level_step, init, levels)
    return match


def _match_cost_from_match(x1: Array, x2: Array, match: Array) -> Array:
    """Sum of match-weighted Euclidean distances (matchcostkernel)."""
    d = jnp.sqrt(jnp.maximum(square_distance(x1, x2), 0.0))
    return jnp.sum(match * d, axis=(1, 2))


def _match_cost_grads(x1: Array, x2: Array, match: Array) -> tuple[Array, Array]:
    """Analytic grads with the transport plan held constant.

    Mirrors matchcostgrad{1,2}kernel (approxmatch.cu:229-312):
    ``grad1_j = sum_k match_jk (x1_j - x2_k) * rsqrt(max(d2, 1e-20))``.
    """
    diff = x1[:, :, None, :] - x2[:, None, :, :]  # (B, N, M, 3)
    d2 = jnp.sum(diff * diff, axis=-1)
    inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-20))
    w = match * inv  # (B, N, M)
    grad1 = jnp.einsum('bnm,bnmc->bnc', w, diff)
    grad2 = -jnp.einsum('bnm,bnmc->bmc', w, diff)
    return grad1, grad2


@jax.custom_vjp
def match_cost(x1: Array, x2: Array) -> Array:
    """Approximate EMD between batched clouds: ``(B,)``.

    Same fwd/bwd contract as the reference ``match_cost`` autograd Function
    (structural_losses/match_cost.py:11-50): the matching itself is treated
    as a constant in the backward pass.
    """
    match = approx_match(x1, x2)
    return _match_cost_from_match(x1, x2, match)


def _match_cost_fwd(x1: Array, x2: Array):
    match = approx_match(x1, x2)
    cost = _match_cost_from_match(x1, x2, match)
    grad1, grad2 = _match_cost_grads(x1, x2, match)
    return cost, (grad1, grad2)


def _match_cost_bwd(res, g):
    grad1, grad2 = res
    g = g[:, None, None]
    return grad1 * g, grad2 * g


match_cost.defvjp(_match_cost_fwd, _match_cost_bwd)


# ----------------------------------------------------------------- sinkhorn
# Opt-in alternative to ApproxMatch (no reference counterpart): entropic-OT
# transport plan via Sinkhorn iterations.  Same cost/grad contract as
# ``match_cost`` (match-constant backward), so it is a drop-in EMD surrogate
# where a cheaper/tunable matcher is wanted.

SINKHORN_EPS = 0.02
SINKHORN_ITERS = 12


def sinkhorn_match(
    x1: Array, x2: Array, eps: float = SINKHORN_EPS, iters: int = SINKHORN_ITERS
) -> Array:
    """Entropic transport plan ``(B, N, M)`` with ApproxMatch marginals.

    Row-stabilised plain-domain iterations: the kernel is
    ``exp(-(d2 - rowmin)/eps)`` (every row keeps a 1.0 entry, so rows never
    underflow); the row-min shift is absorbed by the scaling vector ``u``.
    """
    b, n, _ = x1.shape
    m = x2.shape[1]
    mult_l, mult_r = emd_marginal_multipliers(n, m)
    d2 = square_distance(x1, x2)
    k = jnp.exp(-(d2 - jnp.min(d2, axis=2, keepdims=True)) / eps)

    def step(carry, _):
        _u, v = carry
        u = mult_l / jnp.maximum(jnp.einsum('bnm,bm->bn', k, v), 1e-30)
        v = mult_r / jnp.maximum(jnp.einsum('bnm,bn->bm', k, u), 1e-30)
        return (u, v), None

    init = (jnp.ones((b, n), x1.dtype), jnp.ones((b, m), x1.dtype))
    (u, v), _ = jax.lax.scan(step, init, None, length=iters)
    return u[:, :, None] * k * v[:, None, :]


@jax.custom_vjp
def sinkhorn_cost(x1: Array, x2: Array) -> Array:
    """Sinkhorn EMD surrogate ``(B,)``: transport-weighted Euclidean cost,
    plan treated as constant in the backward (match_cost contract)."""
    match = sinkhorn_match(x1, x2)
    return _match_cost_from_match(x1, x2, match)


def _sinkhorn_cost_fwd(x1: Array, x2: Array):
    match = sinkhorn_match(x1, x2)
    cost = _match_cost_from_match(x1, x2, match)
    grad1, grad2 = _match_cost_grads(x1, x2, match)
    return cost, (grad1, grad2)


sinkhorn_cost.defvjp(_sinkhorn_cost_fwd, _match_cost_bwd)


# ---------------------------------------------------------------------------
# Vector quantisation
# ---------------------------------------------------------------------------


def vq_assign(x: Array, codebook: Array) -> tuple[Array, Array, Array]:
    """Nearest-codebook-entry assignment per code slot.

    Mirrors ``VectorQuantizer.quantize`` (reference src/module/quantize.py:20-32).

    Args:
        x: ``(B, n_codes * d)`` or ``(B, n_codes, d)`` continuous embeddings.
        codebook: ``(n_codes, book_size, d)`` per-slot codebooks.

    Returns:
        embeddings ``(B, n_codes * d)`` quantised vectors, idx ``(B, n_codes)``
        int32 selections, dist2 ``(B, n_codes, book_size)`` squared distances.
    """
    n_codes, book_size, dim = codebook.shape
    b = x.shape[0]
    xc = x.reshape(b, n_codes, dim)
    # (B, n_codes, book_size): per-slot pairwise squared distance.
    diff = xc[:, :, None, :] - codebook[None, :, :, :]
    dist2 = jnp.sum(diff * diff, axis=-1)
    idx = jnp.argmin(dist2, axis=-1).astype(jnp.int32)
    embeddings = jnp.take_along_axis(
        jnp.broadcast_to(codebook[None], (b, n_codes, book_size, dim)),
        idx[..., None, None],
        axis=2,
    )[:, :, 0, :]
    return embeddings.reshape(b, n_codes * dim), idx, dist2


def vq_lookup(idx: Array, codebook: Array) -> Array:
    """Decode embeddings from indices (quantize.py:46-53).

    Args:
        idx: ``(B, n_codes)`` int selections.
        codebook: ``(n_codes, book_size, d)``.

    Returns:
        ``(B, n_codes * d)`` embeddings.
    """
    n_codes, _, dim = codebook.shape
    b = idx.shape[0]
    emb = jnp.take_along_axis(
        jnp.broadcast_to(codebook[None], (b, *codebook.shape)),
        idx[..., None, None],
        axis=2,
    )[:, :, 0, :]
    return emb.reshape(b, n_codes * dim)


def one_hot_idx(idx: Array, book_size: int) -> Array:
    """One-hot encoding of VQ selections: ``(B, n_codes, book_size)``."""
    return jax.nn.one_hot(idx, book_size, dtype=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def straight_through(w_e: Array, w_q: Array) -> Array:
    """Forward ``w_e``; route gradients to ``w_q`` (TransferGrad, layers.py:220-237)."""
    del w_q
    return w_e


def _st_fwd(w_e, w_q):
    del w_q
    return w_e, None


def _st_bwd(_, g):
    return jnp.zeros_like(g), g


straight_through.defvjp(_st_fwd, _st_bwd)
