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
           [--anneal-frac F] [--n-per-class N]
Run on CPU (JAX_PLATFORMS=cpu) in ~1-2 min; the flip-capable micro regime
also runs ungated in the default suite (tests/test_flip_probe.py, ~30 s).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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


def make_data(n_per_class: int, seed: int = 0,
              proto_scale: float = 1.2, inst_scale: float = 0.4):
    """Class prototype + instance variation in w-space, peaked logits.

    ``inst_scale`` > ``proto_scale`` models the flagship/ShapeNet regime
    where per-instance geometry dominates w and the z2 posterior delta is
    the preferred information channel (QUALITY_r5 anatomy: delta at 6.7
    nats nullifies the conditioning)."""
    rng = np.random.default_rng(seed)
    protos = rng.standard_normal((N_CLASSES, T, E)).astype(np.float32) * proto_scale
    labels = np.repeat(np.arange(N_CLASSES), n_per_class)
    inst = rng.standard_normal((labels.size, T, E)).astype(np.float32) * inst_scale
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
        lr: float = 3e-3, seed: int = 0, quiet: bool = False,
        n_per_class: int = 64, anneal_frac: float = 1.0,
        proto_scale: float = 1.2, inst_scale: float = 0.4) -> dict:
    """``anneal_frac``: fraction of the run over which the KLD anneal ramps
    to 1 (cosine).  1.0 matches the reference schedule shape (full-run ramp);
    smaller values give the z1 squeeze time at full pressure, which is what
    the flip mechanism needs — used by the fast regression test."""
    if epochs < 1:
        raise ValueError('epochs must be >= 1 (the anneal schedule needs a run)')
    w, logits, labels, protos = make_data(
        n_per_class, seed=seed, proto_scale=proto_scale, inst_scale=inst_scale)
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

    # The whole training runs as ONE lax.scan under jit: at these micro dims
    # a per-minibatch host loop is dispatch-bound (~0.3 s/step on CPU), and
    # the scan form is the TPU-idiomatic shape regardless.  Batch order comes
    # from host-side permutations precomputed per epoch (tiny: the full
    # batched dataset copy is a few MB).
    n = w_flat.shape[0]
    batch = min(64, n)
    steps_per_epoch = n // batch
    perm_rng = np.random.default_rng(seed + 7)
    idx = np.concatenate([perm_rng.permutation(n)[: steps_per_epoch * batch]
                          for _ in range(epochs)])
    w_steps = w_flat[idx].reshape(epochs * steps_per_epoch, batch, -1)
    lg_steps = logits_j[idx].reshape(epochs * steps_per_epoch, batch, -1)
    ep_of_step = np.repeat(np.arange(epochs), steps_per_epoch)
    anneal_steps = jnp.asarray(
        0.5 * (1.0 - np.cos(
            np.minimum(ep_of_step / (anneal_frac * epochs), 1.0) * np.pi)),
        dtype=jnp.float32)
    keys = jax.random.split(jax.random.key(seed + 13), epochs * steps_per_epoch)

    def step(carry, xs):
        params, opt_state = carry
        w_b, lg_b, anneal, key = xs

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
        return (optax.apply_updates(params, updates), opt_state), (loss, *aux)

    @jax.jit
    def train(params, opt_state):
        return jax.lax.scan(
            step, (params, opt_state), (w_steps, lg_steps, anneal_steps, keys))

    (params, opt_state), trace = train(params, opt_state)
    if not quiet:
        losses, mses, kld1s, kld2s = (np.asarray(t) for t in trace)
        for ep in range(0, epochs, max(1, epochs // 8)):
            s = (ep + 1) * steps_per_epoch - 1
            print(f'ep {ep:4d} loss {losses[s]:8.3f} mse {mses[s]:8.3f} '
                  f'kld1 {kld1s[s]:7.3f} kld2 {kld2s[s]:7.3f} '
                  f'anneal {float(anneal_steps[s]):.3f}')

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

    # full-data reconstruction MSE (eval forward, not the last mini-batch)
    out_eval = wae.apply(
        {'params': params}, WInputs(w_flat, logits_j), codebook, train=False,
        rngs={'sampling': jax.random.key(seed + 11)})
    final_mse = float(jnp.sum(
        (out_eval.w_recon - w_flat.reshape(out_eval.w_recon.shape)) ** 2,
        axis=1).mean())
    result = {
        'flip_rate': flips / total,
        'chance': 1.0 / N_CLASSES,
        'per_target': per_target,
        'final_mse': final_mse,
        'final_kld1': float(np.asarray(trace[2])[-1]),
        'final_kld2': float(np.asarray(trace[3])[-1]),
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
    ap.add_argument('--anneal-frac', type=float, default=1.0)
    ap.add_argument('--n-per-class', type=int, default=64)
    args = ap.parse_args()
    run(args.epochs, args.beta_z1, args.beta_z2, args.lr, args.seed,
        n_per_class=args.n_per_class, anneal_frac=args.anneal_frac)
