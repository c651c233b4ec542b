"""Typed batch structures (reference src/data/structures.py), as JAX pytrees."""

from __future__ import annotations

from typing import NamedTuple

import jax
from flax import struct

Array = jax.Array


class Inputs(NamedTuple):
    """Input for the outer autoencoder / classifier.

    Attributes:
        cloud: ``(B, N, 3)`` input cloud.
        indices: optional precomputed kNN indices ``(B, N, k)`` (or None).
        initial_sampling: optional fixed decoder sampling ``(B, n_out, sample_dim)``.
    """

    cloud: Array
    indices: Array | None = None
    initial_sampling: Array | None = None


class Targets(NamedTuple):
    """Targets for the outer autoencoder.

    Attributes:
        ref_cloud: ``(B, M, 3)`` reference cloud.
        scale: original per-cloud scale factor.
        label: ``(B,)`` int labels.
    """

    ref_cloud: Array
    scale: Array | None = None
    label: Array | None = None


class WInputs(NamedTuple):
    """Inputs for the inner (W) autoencoder."""

    w_q: Array
    logits: Array | None = None


class WTargets(NamedTuple):
    """Targets for the inner (W) autoencoder."""

    w_e: Array
    one_hot_idx: Array
    logits: Array | None = None


@struct.dataclass
class Outputs:
    """Outputs of the inner and outer autoencoder (reference structures.py:38-114).

    All fields optional; populated progressively along the encode/decode path.
    """

    model_epoch: Array | int | None = None
    recon: Array | None = None
    w: Array | None = None
    w_q: Array | None = None
    w_e: Array | None = None
    w_recon: Array | None = None
    w_dist_2: Array | None = None
    idx: Array | None = None
    one_hot_idx: Array | None = None
    attention_weights: Array | None = None
    components: Array | None = None
    z1: Array | None = None
    z2: Array | None = None
    mu1: Array | None = None
    log_var1: Array | None = None
    pseudo_mu1: Array | None = None
    pseudo_log_var1: Array | None = None
    p_mu2: Array | None = None
    p_log_var2: Array | None = None
    d_mu2: Array | None = None
    d_log_var2: Array | None = None
    probs: Array | None = None
