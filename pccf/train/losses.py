"""Losses and metrics (reference src/train/metrics_and_losses.py), in JAX.

Reconstruction losses dispatch to the Pallas TPU kernels through
:mod:`pccf.kernels.api`.  Composition uses the
:mod:`pccf.train.objectives` algebra: ``+`` weighted sum, ``*`` scaling
(including Loss*Loss for annealing), ``|`` attach-metric.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pccf.config.options import AutoEncoders, ReconLosses
from pccf.data.structures import Outputs, Targets, WTargets
from pccf.kernels import api as kapi
from pccf.train.objectives import Loss, Metric, Objective

Array = jax.Array


# ------------------------------------------------------------ reconstruction


def get_chamfer_loss() -> Objective:
    """Chamfer (mean-per-point reduction, the reference GPU path
    metrics_and_losses.py:21-41)."""

    def _chamfer(data: Outputs, targets: Targets) -> Array:
        return kapi.chamfer(data.recon, targets.ref_cloud, reduction='mean')

    return Loss(_chamfer, 'Chamfer')


def get_emd_loss() -> Objective:
    """ApproxMatch EMD (metrics_and_losses.py:50-56)."""

    def _emd(data: Outputs, targets: Targets) -> Array:
        return kapi.match_cost(data.recon, targets.ref_cloud)

    return Loss(_emd, 'EMD')


def get_chamfer_emd_losses() -> tuple[Objective, Objective]:
    """Chamfer and EMD loss terms sharing ONE fused kernel launch.

    Both calculations dispatch :func:`pccf.kernels.api.chamfer_match_cost`,
    which computes the (N, M) distance structure once (the fused Pallas
    kernel emits chamfer's min/argmin from the same d2 sweep the EMD
    relaxation caches).  ``compute_all`` evaluates each named calculation
    independently, so a trace-level identity cache hands the second
    calculation the pair the first already produced instead of launching
    the kernel twice.  The cache keys on the exact tracer/array identities
    of ``(recon, ref_cloud)``; a new trace (or new arrays) always misses
    and recomputes, so stale entries are never *used* — they are only kept
    alive until the next evaluation overwrites them."""
    cache: list = []

    def _pair(data: Outputs, targets: Targets) -> tuple[Array, Array]:
        a, b = data.recon, targets.ref_cloud
        if len(cache) == 3 and cache[0] is a and cache[1] is b:
            return cache[2]
        out = kapi.chamfer_match_cost(a, b, reduction='mean')
        cache[:] = [a, b, out]
        return out

    def _chamfer(data: Outputs, targets: Targets) -> Array:
        return _pair(data, targets)[0]

    def _emd(data: Outputs, targets: Targets) -> Array:
        return _pair(data, targets)[1]

    return Loss(_chamfer, 'Chamfer'), Loss(_emd, 'EMD')


def get_sinkhorn_loss() -> Objective:
    """Sinkhorn EMD surrogate (opt-in; no reference counterpart)."""

    def _sinkhorn(data: Outputs, targets: Targets) -> Array:
        return kapi.sinkhorn_cost(data.recon, targets.ref_cloud)

    return Loss(_sinkhorn, 'EMD')


def get_chamfer_sinkhorn_losses() -> tuple[Objective, Objective]:
    """Chamfer and Sinkhorn-surrogate terms sharing ONE fused launch (same
    trace-level pair cache as :func:`get_chamfer_emd_losses`; kept a separate
    factory so the objective algebra's qualname guard still distinguishes the
    ApproxMatch 'EMD' from the surrogate 'EMD')."""
    cache: list = []

    def _pair(data: Outputs, targets: Targets) -> tuple[Array, Array]:
        a, b = data.recon, targets.ref_cloud
        if len(cache) == 3 and cache[0] is a and cache[1] is b:
            return cache[2]
        out = kapi.chamfer_sinkhorn_cost(a, b, reduction='mean')
        cache[:] = [a, b, out]
        return out

    def _chamfer(data: Outputs, targets: Targets) -> Array:
        return _pair(data, targets)[0]

    def _sinkhorn(data: Outputs, targets: Targets) -> Array:
        return _pair(data, targets)[1]

    return Loss(_chamfer, 'Chamfer'), Loss(_sinkhorn, 'EMD')


def get_recon_loss(cfg) -> Objective:
    """Chamfer or Chamfer+EMD per config (metrics_and_losses.py:70-79).

    The reference adds EMD only on the accelerated path; here the cpu flag
    plays that role (the Pallas EMD kernel is the accelerated path).
    ``ChamferSinkhorn`` swaps the ApproxMatch term for the entropic-OT
    surrogate (same name so monitors/metrics stay comparable)."""
    recon = cfg.autoencoder.objective.recon_loss
    if recon == ReconLosses.ChamferEMD and not cfg.user.cpu:
        chamfer_term, emd_term = get_chamfer_emd_losses()
        return chamfer_term + emd_term
    if recon == ReconLosses.ChamferSinkhorn:
        # no cpu gate: Sinkhorn is a pccf extension the user explicitly
        # opted into (no reference-parity reason to drop it), and the jnp
        # golden path the api dispatches to off-TPU is cheap enough
        chamfer_term, sinkhorn_term = get_chamfer_sinkhorn_losses()
        return chamfer_term + sinkhorn_term
    return get_chamfer_loss()


def get_embed_loss() -> Objective:
    """MSE(w_q, w_e) per sample (metrics_and_losses.py:82-90)."""

    def _embed(data: Outputs, _t: Targets) -> Array:
        return jnp.mean((data.w_q - data.w_e) ** 2, axis=1)

    return Loss(_embed, 'Embed. Loss')


# ------------------------------------------------------------------- gaussian


def gaussian_ll(x: Array, mu: Array, log_var: Array) -> Array:
    """(metrics_and_losses.py:93-95 — including its +log(2 pi) sign quirk)."""
    return -0.5 * (log_var + (x - mu) ** 2 / jnp.exp(log_var)) + math.log(2 * math.pi)


def gaussian_kld(mu: Array, log_var: Array) -> Array:
    return 0.5 * (-1.0 - log_var + jnp.exp(log_var) + mu**2)


def diff_gaussian_kld(d_mu: Array, d_log_var: Array, p_log_var: Array) -> Array:
    return 0.5 * (-1.0 - d_log_var + jnp.exp(d_log_var) + d_mu**2 / jnp.exp(p_log_var))


def get_kld1_loss() -> Objective:
    def _kld1(data: Outputs, _t: WTargets) -> Array:
        return jnp.sum(gaussian_kld(data.mu1, data.log_var1), axis=(1, 2))

    return Loss(_kld1, 'KLD1')


def get_kld2_loss() -> Objective:
    def _kld2(data: Outputs, _t: WTargets) -> Array:
        return jnp.sum(
            diff_gaussian_kld(data.d_mu2, data.d_log_var2, data.p_log_var2), axis=(1, 2)
        )

    return Loss(_kld2, 'KLD2')


def get_kld_vamp_loss(cfg) -> Objective:
    """VampPrior KLD (metrics_and_losses.py:126-147)."""
    n_pseudo = cfg.w_autoencoder.model.n_pseudo_inputs

    def _vamp(data: Outputs, _t: WTargets) -> Array:
        z = data.z1[:, None]  # (B, 1, n_codes, z1)
        posterior_ll = jnp.sum(gaussian_ll(data.z1, data.mu1, data.log_var1), axis=(1, 2))
        pseudo_mu = data.pseudo_mu1[None]  # (1, P, n_codes, z1)
        pseudo_lv = data.pseudo_log_var1[None]
        prior_ll = jax.nn.logsumexp(
            jnp.sum(gaussian_ll(z, pseudo_mu, pseudo_lv), axis=(2, 3)), axis=1
        )
        return posterior_ll - prior_ll + math.log(n_pseudo)

    return Loss(_vamp, 'KLD2_VAMP')


def get_annealing(cfg) -> Objective:
    """Cosine ramp of the KLD weight over training (metrics_and_losses.py:150-162)."""
    total_epochs = cfg.w_autoencoder.train.n_epochs

    def _anneal(data: Outputs, _t: WTargets) -> Array:
        frac = jnp.clip(jnp.asarray(data.model_epoch, jnp.float32) / total_epochs, 0.0, 1.0)
        return 0.5 * (1.0 - jnp.cos(frac * jnp.pi))

    return Loss(_anneal, 'Annealing')


def get_kld_loss(cfg) -> Objective:
    """annealing * (c1 * KLD1|vamp + c2 * KLD2) (metrics_and_losses.py:165-171)."""
    wae = cfg.w_autoencoder
    vamp = wae.model.n_pseudo_inputs > 0
    inner = wae.objective.c_kld1 * (get_kld_vamp_loss(cfg) if vamp else get_kld1_loss())
    inner = inner + wae.objective.c_kld2 * get_kld2_loss()
    return get_annealing(cfg) * inner


# --------------------------------------------------------------------- inner


def get_nll_loss() -> Objective:
    """Codebook-distance NLL (metrics_and_losses.py:174-184).

    Quirk preserved from the reference: the normalizer sums the squared
    distances themselves (``sum(w_dist_2)``, reference line 179), NOT the
    inverse-distance ``w_weights`` its name suggests — so the term is
    ``log(sum d^2) + log(d^2_selected)`` exactly as published."""

    def _nll(data: Outputs, targets: WTargets) -> Array:
        w_weights = 1.0 / jnp.clip(data.w_dist_2, 1e-6, None)
        sum_weights = jnp.sum(data.w_dist_2, axis=2, keepdims=True)
        nll = (jnp.log(sum_weights) - jnp.log(w_weights)) * targets.one_hot_idx
        return jnp.sum(nll, axis=(1, 2))

    return Loss(_nll, 'NLL')


def get_mse_loss() -> Objective:
    """sum-over-w_dim MSE(w_recon, w_e) (metrics_and_losses.py:187-193)."""

    def _mse(data: Outputs, targets: WTargets) -> Array:
        return jnp.sum((data.w_recon - targets.w_e) ** 2, axis=1)

    return Loss(_mse, 'MSE')


def get_w_accuracy() -> Objective:
    """Quantisation accuracy (metrics_and_losses.py:196-203)."""

    def _acc(data: Outputs, targets: WTargets) -> Array:
        pred = jax.nn.one_hot(jnp.argmin(data.w_dist_2, axis=2), targets.one_hot_idx.shape[2])
        return jnp.mean(jnp.sum(targets.one_hot_idx * pred, axis=2), axis=1)

    return Metric(_acc, 'Quantisation Accuracy', higher_is_better=True)


# ------------------------------------------------------------ classification


def get_cross_entropy_loss() -> Objective:
    def _ce(logits: Array, targets: Targets) -> Array:
        return -jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=-1), targets.label[:, None], axis=-1
        )[:, 0]

    return Loss(_ce, 'CrossEntropy')


def get_accuracy() -> Objective:
    def _acc(logits: Array, targets: Targets) -> Array:
        return (jnp.argmax(logits, axis=-1) == targets.label).astype(jnp.float32)

    return Metric(_acc, 'Accuracy', higher_is_better=True)


def get_macro_accuracy() -> Objective:
    """Per-class recall averaged over classes present in the batch
    (torcheval ``multiclass_accuracy(average='macro')`` semantics)."""

    def _macro(logits: Array, targets: Targets) -> Array:
        n_classes = logits.shape[1]
        pred = jnp.argmax(logits, axis=-1)
        correct = (pred == targets.label).astype(jnp.float32)
        onehot = jax.nn.one_hot(targets.label, n_classes)
        per_class_correct = jnp.sum(onehot * correct[:, None], axis=0)
        per_class_count = jnp.sum(onehot, axis=0)
        present = per_class_count > 0
        recalls = jnp.where(present, per_class_correct / jnp.maximum(per_class_count, 1), 0.0)
        return jnp.sum(recalls) / jnp.maximum(jnp.sum(present), 1)

    return Metric(_macro, 'Macro Accuracy', higher_is_better=True)


def get_f1() -> Objective:
    """Micro F1 == accuracy for single-label multiclass (torcheval default)."""

    def _f1(logits: Array, targets: Targets) -> Array:
        return (jnp.argmax(logits, axis=-1) == targets.label).astype(jnp.float32)

    return Metric(_f1, 'F1_Score', higher_is_better=True)


# ----------------------------------------------------------------- composites


def get_classification_loss() -> Objective:
    """(metrics_and_losses.py:248-250)"""
    return get_cross_entropy_loss() | get_accuracy() | get_macro_accuracy()


def get_w_autoencoder_loss(cfg) -> Objective:
    """mse + annealed KLD | quantisation accuracy (metrics_and_losses.py:253-255)."""
    return get_mse_loss() + get_kld_loss(cfg) | get_w_accuracy()


def get_autoencoder_loss(cfg) -> Objective:
    """recon + c_embedding * embed (metrics_and_losses.py:258-266)."""
    loss = get_recon_loss(cfg)
    if cfg.autoencoder.model.class_name is not AutoEncoders.AE:
        return loss + cfg.autoencoder.objective.c_embedding * get_embed_loss()
    return loss
