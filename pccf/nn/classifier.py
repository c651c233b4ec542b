"""DGCNN point-cloud classifier (reference src/module/classifier.py)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from pccf.data.structures import Inputs
from pccf.nn.encoders import EdgeConvBlock
from pccf.nn.layers import DenseBlock, MLPHead

Array = jax.Array


class DGCNNClassifier(nn.Module):
    """EdgeConv stack -> global max+avg pooling -> dropout MLP -> logits.

    Mirrors reference classifier.py:18-66 in channels-last form.
    """

    n_classes: int
    n_neighbors: int
    conv_dims: tuple[int, ...]
    feature_dim: int
    mlp_dims: tuple[int, ...]
    dropout_rates: tuple[float, ...]
    act: Callable
    act_name: str = ''

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Array:
        x = inputs.cloud  # (B, N, 3)
        idx = inputs.indices
        xs = []
        for i, f in enumerate(self.conv_dims):
            x = EdgeConvBlock(f, self.n_neighbors, self.act, self.act_name, name=f'edge_conv_{i}')(
                x, idx, train
            )
            idx = None  # dynamic graph after the first block
            xs.append(x)
        x = jnp.concatenate(xs, axis=-1)
        x = DenseBlock(self.feature_dim, act=None, name='final_conv')(x, train)  # BN, no act
        pooled = jnp.concatenate([jnp.max(x, axis=1), jnp.mean(x, axis=1)], axis=-1)
        return MLPHead(
            dims=self.mlp_dims,
            out_features=self.n_classes,
            act=self.act,
            act_name=self.act_name,
            dropout_rates=self.dropout_rates,
            name='mlp',
        )(pooled, train)


def get_classifier(cfg) -> DGCNNClassifier:
    """Factory (classifier.py:69-72). ``cfg`` is the full AllConfig."""
    m = cfg.classifier.model
    return DGCNNClassifier(
        n_classes=cfg.data.dataset.n_classes,
        n_neighbors=m.n_neighbors,
        conv_dims=tuple(m.conv_dims),
        feature_dim=m.feature_dim,
        mlp_dims=tuple(m.mlp_dims),
        dropout_rates=tuple(m.dropout_rates),
        act=m.act_cls,
        act_name=m.act_name,
    )
