"""Micro-scale counterfactual *flip* diagnostic for the conditional W-AE.

The round-4 quality run recorded counterfeit accuracy at exactly chance
(QUALITY_r4.json: 0.25 over 4 classes) despite a structurally faithful
implementation of the reference counterfactual path
(reference src/module/w_autoencoders.py:247-262).  This probe isolates the
*mechanism*: it trains the conditional WAutoEncoder alone, at tiny dims, on
synthetic w-space data whose class identity shifts the embedding
distribution, using the exact stage-2 objective (MSE + annealed
0.1*KLD1 + 4*KLD2, reference metrics_and_losses.py:165-171), then measures
whether ``generate_counterfactual`` toward class j moves the decoded
embeddings nearer class j's prototype than the source class's.

A flip rate >> 1/n_classes proves the conditioning channel (probs ->
ConditionalPrior -> z2 -> decoder) learns and steers in this framework;
chance-rate at micro scale would indicate a code defect instead.

Usage: python tools/flip_probe.py [--epochs N] [--beta-z1 F] [--beta-z2 F]
Run on CPU (JAX_PLATFORMS=cpu) in ~1-2 min; also wired as a slow test in
tests/test_flip_probe.py.
"""

from __future__ import annotations

import argparse
import json
import sys
from functools import partial

import numpy as np

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import optax

from pccf.data.structures import WInputs
from pccf.models.w_autoencoders import WAutoEncoder
from pccf.nn.layers import gelu_exact
from pccf.nn.w_networks import (
    ConditionalPrior,
    TransformerWConditionalEncoder,
    TransformerWDecoder,
    TransformerWEncoder,
)
from pccf.train.losses import diff_gaussian_kld, gaussian_kld

T, E, Z1, Z2, D = 16, 4, 4, 4, 32  # codes, embed, z1, z2, proj
N_CLASSES = 4


def make_data(n_per_class: int, seed: int = 0):
    """Class prototype + instance variation in w-space, peaked logits."""
    rng = np.random.default_rng(seed)
    protos = rng.standard_normal((N_CLASSES, T, E)).astype(np.float32) * 1.2
    labels = np.repeat(np.arange(N_CLASSES), n_per_class)
    inst = rng.standard_normal((labels.size, T, E)).astype(np.float32) * 0.4
    w = protos[labels] + inst
    logits = (np.eye(N_CLASSES, dtype=np.float32)[labels] * 10.0
              + rng.standard_normal((labels.size, N_CLASSES)).astype(np.float32) * 0.1)
    return w, logits, labels, protos


def make_wae() -> WAutoEncoder:
    return WAutoEncoder(
        encoder=TransformerWEncoder(
            z1_dim=Z1, n_codes=T, proj_dim=D, n_heads=2,
            mlp_dims=(64,), dropout_rates=(0.0,), act=gelu_exact,
        ),
        decoder=TransformerWDecoder(
            embedding_dim=E, n_codes=T, proj_dim=D, n_heads=2,
            mlp_dims=(64,), dropout_rates=(0.0,), act=gelu_exact,
        ),
        z2_prior=ConditionalPrior(n_codes=T, z2_dim=Z2),
        z2_posterior=TransformerWConditionalEncoder(
            z2_dim=Z2, n_codes=T, proj_dim=D, n_heads=2,
            mlp_dims=(64,), dropout_rates=(0.0,), act=gelu_exact,
        ),
        n_codes=T, embedding_dim=E, book_size=8,
        z1_dim=Z1, z2_dim=Z2, n_classes=N_CLASSES,
        n_pseudo_inputs=0, conditional=True,
    )


def run(epochs: int = 400, beta_z1: float = 0.1, beta_z2: float = 4.0,
        lr: float = 3e-3, seed: int = 0, quiet: bool = False) -> dict:
    w, logits, labels, protos = make_data(64, seed=seed)
    wae = make_wae()
    codebook = jnp.asarray(
        np.random.default_rng(1).standard_normal((T, 8, E)).astype(np.float32))
    w_flat = jnp.asarray(w.reshape(w.shape[0], -1))
    logits_j = jnp.asarray(logits)

    variables = wae.init(
        {'params': jax.random.key(seed), 'sampling': jax.random.key(seed + 1)},
        WInputs(w_flat[:2], logits_j[:2]), codebook, train=False)
    params = variables['params']
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    @partial(jax.jit, static_argnums=())
    def step(params, opt_state, w_b, lg_b, anneal, key):
        def loss_fn(p):
            out = wae.apply(
                {'params': p}, WInputs(w_b, lg_b), codebook, train=True,
                rngs={'sampling': key})
            mse = jnp.sum((out.w_recon - w_b.reshape(out.w_recon.shape)) ** 2,
                          axis=1).mean()
            kld1 = jnp.sum(gaussian_kld(out.mu1, out.log_var1),
                           axis=(1, 2)).mean()
            kld2 = jnp.sum(
                diff_gaussian_kld(out.d_mu2, out.d_log_var2, out.p_log_var2),
                axis=(1, 2)).mean()
            return mse + anneal * (beta_z1 * kld1 + beta_z2 * kld2), (mse, kld1, kld2)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    n = w_flat.shape[0]
    key = jax.random.key(seed + 7)
    for ep in range(epochs):
        anneal = 0.5 * (1.0 - np.cos(min(ep / epochs, 1.0) * np.pi))
        key, k1, k2 = jax.random.split(key, 3)
        perm = jax.random.permutation(k1, n)
        for i in range(0, n, 64):
            idx = perm[i:i + 64]
            key, ks = jax.random.split(key)
            params, opt_state, loss, aux = step(
                params, opt_state, w_flat[idx], logits_j[idx],
                jnp.float32(anneal), ks)
        if not quiet and (ep % max(1, epochs // 8) == 0 or ep == epochs - 1):
            mse, kld1, kld2 = (float(a) for a in aux)
            print(f'ep {ep:4d} loss {float(loss):8.3f} mse {mse:8.3f} '
                  f'kld1 {kld1:7.3f} kld2 {kld2:7.3f} anneal {anneal:.3f}')

    # --- counterfactual flips: every sample toward every other class -------
    @jax.jit
    def cf(w_b, lg_b, tgt):
        out = wae.apply({'params': params}, WInputs(w_b, lg_b), codebook,
                        tgt, 1.0, method='generate_counterfactual')
        return out.w_recon

    protos_flat = protos.reshape(N_CLASSES, -1)
    flips = total = 0
    per_target = {}
    for j in range(N_CLASSES):
        rec = np.asarray(cf(w_flat, logits_j, j)).reshape(n, -1)
        d = ((rec[:, None, :] - protos_flat[None]) ** 2).sum(-1)
        pred = d.argmin(1)
        mask = labels != j  # only count genuine flips
        flips_j = int((pred[mask] == j).sum())
        per_target[f'to_{j}'] = flips_j / int(mask.sum())
        flips += flips_j
        total += int(mask.sum())

    # recon sanity: plain forward (deterministic CF toward own class, tv=0)
    rec0 = np.asarray(cf(w_flat, logits_j, 0)).reshape(n, -1)  # tv=1 to 0
    result = {
        'flip_rate': flips / total,
        'chance': 1.0 / N_CLASSES,
        'per_target': per_target,
        'final_mse': float(aux[0]),
        'epochs': epochs, 'beta_z1': beta_z1, 'beta_z2': beta_z2,
    }
    if not quiet:
        print(json.dumps(result, indent=1))
    return result


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=400)
    ap.add_argument('--beta-z1', type=float, default=0.1)
    ap.add_argument('--beta-z2', type=float, default=4.0)
    ap.add_argument('--lr', type=float, default=3e-3)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()
    run(args.epochs, args.beta_z1, args.beta_z2, args.lr, args.seed)
