"""Point-cloud encoders: DGCNN and LDGCNN (reference src/module/encoders.py).

Channels-last redesign: each EdgeConv block is
``knn -> gather -> concat(neigh - x, x) -> dense -> max over k``
with the kNN distance matrix produced by one MXU matmul
(:func:`pccf.kernels.ops.knn`); the dense is a feature-axis matmul.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from pccf.kernels import api as kapi, ops
from pccf.nn.layers import DenseBlock, bn_groups, default_act, get_kernel_init

Array = jax.Array

IN_CHAN = 3
OUT_CHAN = 3


class EdgeConvBlock(nn.Module):
    """EdgeConv: graph features -> dense(+BN+act) -> max over neighbours.

    TPU restructure: with ``W = [W_diff; W_self]`` the edge dense
    ``concat(nbr - x, x) @ W`` equals ``(x @ W_diff)[nbr] + x @ (W_self - W_diff)``
    — two point-wise matmuls plus a feature gather.  This removes the
    ``(B, N, k, 2C)`` edge-feature tensor and cuts the matmul FLOPs by the
    neighbour count k (identical math to reference encoders.py EdgeConv).

    Eval fast path: the running-stat BN is a per-channel affine, which folds
    into the per-point features *before* the gather; the per-centre shift is
    constant over the k neighbours, so ``max`` commutes with it; and a
    monotone activation commutes with ``max`` — the (B, N, k, F) tensor is
    produced once by the gather and reduced immediately, with no BN/act
    passes over it.  Exactly equal to the reference formula."""

    features: int
    k: int
    act: Callable | None
    act_name: str = ''

    @nn.compact
    def __call__(self, x: Array, idx: Array | None, train: bool = False) -> Array:
        if idx is not None and idx.shape[-1] != self.k:
            if idx.shape[-1] > self.k:
                # kNN indices are distance-sorted (ops.knn top_k / the Pallas
                # tournament), so the prefix IS the exact k-NN set — lets the
                # classifier (k=20) reuse the dataset's data.n_neighbors=25
                # precompute instead of silently pooling over 25 neighbours
                idx = idx[..., : self.k]
            else:  # too few precomputed neighbours: recompute
                idx = None
        if idx is None:
            idx = kapi.knn(x, self.k)
        c = x.shape[-1]
        init = get_kernel_init(self.act_name if self.act is not None else 'linear')
        kernel = self.param('kernel', init, (2 * c, self.features))  # [W_diff; W_self]
        scale = self.param('bn_scale', nn.initializers.ones, (self.features,))
        bias = self.param('bn_bias', nn.initializers.zeros, (self.features,))
        ra_mean = self.variable('batch_stats', 'bn_mean', jnp.zeros, (self.features,))
        ra_var = self.variable('batch_stats', 'bn_var', jnp.ones, (self.features,))
        eps, momentum = 1e-5, 0.9

        w_diff = kernel[:c]
        u = jnp.dot(x, w_diff)  # (B, N, F): gathered per neighbour
        s = jnp.dot(x, kernel[c:] - w_diff)  # (B, N, F): per-centre term

        # The streaming path is only valid for monotone-increasing activations
        # (max commutes with act).  Identify the CALLABLE, not act_name — the
        # config resolves activations to these shared callables (specs.py
        # act_cls), and a hand-constructed block whose name claims 'ReLU' over
        # a non-monotone act must not take the fast path on the name's word.
        monotone = self.act is None or self.act in (default_act, jax.nn.relu, jax.nn.leaky_relu)
        if monotone:
            # Streaming path, train AND eval: BN is a per-channel affine, the
            # per-centre shift is constant over the k neighbours, and max
            # commutes with a monotone activation — so the (B, N, k, F) edge
            # tensor is never materialised.  In training the batch statistics
            # of the gathered tensor reduce to neighbour sums:
            #   E[u_g] = Σ_k u[idx] / (BNk),  E[pre²] = E[u_g²] + 2 E[u_g·s] + E[s²]
            # (one fused sum-pool of [u, u²] gives both u-moments; the cross
            # term uses the same per-centre neighbour sum).  Mathematically
            # identical to normalising the materialised tensor.
            if train:
                f = u.shape[-1]
                sums = kapi.graph_sum_pool(jnp.concatenate([u, u * u], axis=-1), idx)
                usum, u2sum = sums[..., :f], sums[..., f:]
                # statistic groups (bn_groups): axis-0 reshape (G, B/G, N, F)
                # turns every global-batch reduction into a per-group one —
                # G=1 is the GSPMD global-stats path, G=dp the reference's
                # per-replica DDP semantics (see layers.bn_groups)
                g = bn_groups()
                bsz = u.shape[0]
                if bsz % g:
                    raise ValueError(f'batch {bsz} not divisible by bn groups {g}')

                def gmean(t):  # (B, N, F) -> (G, F) per-group mean over B/G, N
                    return jnp.mean(t.reshape(g, bsz // g, *t.shape[1:]), axis=(1, 2))

                k_n = idx.shape[-1]
                e_u = gmean(usum) / k_n
                e_u2 = gmean(u2sum) / k_n
                e_cross = gmean(s * usum) / k_n
                batch_mean = e_u + gmean(s)
                batch_var = (
                    e_u2 + 2.0 * e_cross + gmean(jnp.square(s))
                    - jnp.square(batch_mean)
                )
                if not self.is_initializing():
                    ra_mean.value = momentum * ra_mean.value + (1 - momentum) * batch_mean.mean(0)
                    ra_var.value = momentum * ra_var.value + (1 - momentum) * batch_var.mean(0)
                # per-sample affine: repeat the group stats over B/G samples
                mean = jnp.repeat(batch_mean, bsz // g, axis=0)[:, None, :]
                var = jnp.repeat(batch_var, bsz // g, axis=0)[:, None, :]
            else:
                mean, var = ra_mean.value, ra_var.value
            a = scale * jax.lax.rsqrt(var + eps)
            b = bias - mean * a
            pooled = kapi.graph_max_pool(u * a, idx)
            out = pooled + s * a + b
            return self.act(out) if self.act is not None else out

        pre = kapi.gather_neighbors(u, idx) + s[:, :, None, :]  # (B, N, k, F)
        if train:
            g = bn_groups()
            bsz = pre.shape[0]
            if bsz % g:
                raise ValueError(f'batch {bsz} not divisible by bn groups {g}')
            preg = pre.reshape(g, bsz // g, *pre.shape[1:])
            batch_mean = jnp.mean(preg, axis=(1, 2, 3))  # (G, F)
            batch_var = jnp.mean(jnp.square(preg), axis=(1, 2, 3)) - jnp.square(batch_mean)
            if not self.is_initializing():
                ra_mean.value = momentum * ra_mean.value + (1 - momentum) * batch_mean.mean(0)
                ra_var.value = momentum * ra_var.value + (1 - momentum) * batch_var.mean(0)
            mean = jnp.repeat(batch_mean, bsz // g, axis=0)[:, None, None, :]
            var = jnp.repeat(batch_var, bsz // g, axis=0)[:, None, None, :]
        else:
            mean, var = ra_mean.value, ra_var.value
        pre = (pre - mean) * jax.lax.rsqrt(var + eps) * scale + bias
        if self.act is not None:
            pre = self.act(pre)
        # first-winner tie gradient (argmax is first-on-ties), matching
        # ops.graph_max_pool's custom VJP on the streaming path — jnp.max
        # would split tied cotangents evenly and diverge between paths
        win = jnp.argmax(pre, axis=2, keepdims=True)
        return jnp.take_along_axis(pre, win, axis=2)[:, :, 0, :]  # (B, N, F)


class DGCNNEncoder(nn.Module):
    """Dynamic-graph CNN encoder (reference encoders.py:31-59).

    Hard-coded block dims (64, 64, 128, 256) as in the reference; the graph is
    recomputed in feature space before every block.
    """

    w_dim: int
    n_neighbors: int
    act: Callable
    act_name: str = ''
    h_dim: tuple[int, ...] = (64, 64, 128, 256)

    @nn.compact
    def __call__(self, cloud: Array, indices: Array | None = None, train: bool = False) -> Array:
        x = cloud  # (B, N, 3)
        xs = []
        idx = indices
        for i, f in enumerate(self.h_dim):
            act = None if i == 0 else self.act  # first block has no activation
            x = EdgeConvBlock(f, self.n_neighbors, act, self.act_name, name=f'edge_conv_{i}')(x, idx, train)
            idx = None  # dynamic graph: re-compute kNN on new features
            xs.append(x)
        x = jnp.concatenate(xs, axis=-1)
        x = DenseBlock(self.w_dim, act=None, batch_norm=False, name='final_conv')(x, train)
        return jnp.max(x, axis=1)  # (B, w_dim)


class LDGCNNEncoder(nn.Module):
    """Lighter DGCNN: the graph is computed once on the input cloud
    (reference encoders.py:62-91); subsequent blocks do graph-max-pooling
    with the same indices.
    """

    w_dim: int
    n_neighbors: int
    conv_dims: tuple[int, ...]
    act: Callable
    act_name: str = ''

    @nn.compact
    def __call__(self, cloud: Array, indices: Array | None = None, train: bool = False) -> Array:
        idx = indices if indices is not None else kapi.knn(cloud, self.n_neighbors)
        x = EdgeConvBlock(self.conv_dims[0], self.n_neighbors, None, '', name='edge_conv')(cloud, idx, train)
        xs = [x]
        for i, f in enumerate(self.conv_dims[1:]):
            x = kapi.graph_max_pool(x, idx)
            x = DenseBlock(f, act=self.act, act_name=self.act_name, name=f'points_conv_{i}')(x, train)
            xs.append(x)
        x = jnp.concatenate(xs, axis=-1)
        x = DenseBlock(self.w_dim, act=None, batch_norm=False, name='final_conv')(x, train)
        return jnp.max(x, axis=1)


def get_encoder(cfg_ae_model, act=None) -> nn.Module:
    """Factory matching the reference registry (encoders.py:94-100)."""
    from pccf.config.options import Encoders

    enc_cfg = cfg_ae_model.encoder
    act = act or enc_cfg.act_cls
    if enc_cfg.class_name == Encoders.DGCNN:
        return DGCNNEncoder(
            w_dim=cfg_ae_model.w_dim,
            n_neighbors=enc_cfg.n_neighbors,
            act=act,
            act_name=enc_cfg.act_name,
        )
    if enc_cfg.class_name == Encoders.LDGCNN:
        return LDGCNNEncoder(
            w_dim=cfg_ae_model.w_dim,
            n_neighbors=enc_cfg.n_neighbors,
            conv_dims=tuple(enc_cfg.conv_dims),
            act=act,
            act_name=enc_cfg.act_name,
        )
    raise ValueError(f'Unknown encoder {enc_cfg.class_name}')
