"""Counterfactual-failure diagnostic on the quality_r4 checkpoints.

QUALITY_r4 recorded counterfeit success exactly at chance (0.25 over 4
balanced classes): the generated counterfactuals never flip the classifier.
The math matches the reference (z1 = mu1, z2 = p_mu2 + d_mu2, interpolated
probs — reference src/module/w_autoencoders.py:248-262), so this probes the
*trained state* to localise the failure:

1. counterfeit confusion — what class counterfeits actually land on;
2. conditional-prior separation ||p_mu2(ci) - p_mu2(cj)|| vs the posterior
   deviation ||d_mu2|| (if deviation >> separation, the condition is inert:
   d_mu2 re-encodes the source class and drags the decode back);
3. decode sensitivity — how much w_recon moves when only probs change.

CPU-forced (the chip stays free for training); run AFTER a quality run has
left checkpoints under experiments/<tag>/.

Usage: python tools/_cf_diag.py [--tag quality_r4] [--n 64]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ['JAX_PLATFORMS'] = 'cpu'
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--tag', default='quality_r4')
    ap.add_argument('--n', type=int, default=64, help='test samples to probe')
    ap.add_argument('--variability', type=float, default=0.85)
    ap.add_argument('--n-train', type=int, default=512)
    ap.add_argument('--n-test', type=int, default=128)
    args = ap.parse_args()

    os.environ.setdefault('ROOT_EXP_DIR', str(REPO / 'experiments' / args.tag))
    os.environ.setdefault('DATASET_DIR', str(REPO / 'datasets'))

    from pccf.config import Experiment, get_config_all

    # must mirror tools/quality_run.py's non-smoke overrides so the loaded
    # checkpoints match the module shapes
    cfg = get_config_all([
        'data/dataset=synthetic',
        'data.dataset.n_classes=4',
        f'data.dataset.settings.n_train={args.n_train}',
        f'data.dataset.settings.n_test={args.n_test}',
        'data.dataset.settings.base_points=4096',
        f'data.dataset.settings.variability={args.variability}',
        'user.checkpoint_every=0',
        'user.trackers.tensorboard=false',
        'user.seed=0',
        'final=True',
    ])
    exp = Experiment(cfg, name=args.tag)
    with exp.create_run(resume=True):
        _diagnose(cfg, args.n)


def _diagnose(cfg, n_probe: int) -> None:
    from evaluate_counterfactuals import get_dataset
    from pccf.data import Inputs, Partitions
    from pccf.data.processed import _collate_base
    from train_w_autoencoder import load_models

    classifier, vqvae = load_models(cfg)
    dataset = get_dataset(cfg, Partitions.test)
    dataset.set_inference(True)
    n = min(n_probe, len(dataset))
    cloud, idx, labels = _collate_base(dataset, list(range(n)))
    inputs = Inputs(cloud=cloud, indices=idx)
    n_classes = cfg.data.dataset.n_classes

    cls_fn = jax.jit(
        lambda v, c: classifier.module.apply(v, Inputs(cloud=c), train=False)
    )
    logits = np.asarray(cls_fn(classifier.variables, cloud))
    preds = logits.argmax(1)
    print(f'original acc over {n} probes: {(preds == labels).mean():.3f}')

    # ---- 1. counterfeit confusion -------------------------------------
    cf_fn = jax.jit(
        lambda v, inp, lg, td: vqvae.module.apply(
            v, inp, lg, td, 1.0, method='generate_counterfactual',
            rngs={'sampling': jax.random.key(0)},
        )
    )
    rec_fn = jax.jit(
        lambda v, inp, lg: vqvae.module.apply(
            v, inp, lg, method='double_reconstruct_with_logits',
            rngs={'sampling': jax.random.key(0)},
        )
    )
    recon = rec_fn(vqvae.variables, inputs, logits)
    confusion = np.zeros((n_classes, n_classes), np.int64)  # [target, predicted]
    flip_ok = flip_tot = 0
    cf_minus_rec = []
    for tgt in range(n_classes):
        out = cf_fn(vqvae.variables, inputs, logits, tgt)
        cf_logits = np.asarray(cls_fn(classifier.variables, out.recon))
        cf_pred = cf_logits.argmax(1)
        for p in cf_pred:
            confusion[tgt, p] += 1
        mask = labels != tgt
        flip_ok += int((cf_pred[mask] == tgt).sum())
        flip_tot += int(mask.sum())
        cf_minus_rec.append(
            float(jnp.abs(out.w_recon - recon.w_recon).mean())
        )
    print(f'\ncounterfeit confusion [target, predicted] over {n} probes x {n_classes} targets:')
    print(confusion)
    print(f'strict flip rate (source != target): {flip_ok}/{flip_tot} = {flip_ok / max(flip_tot, 1):.3f}')
    print(f'mean |w_recon(cf) - w_recon(recon)| per target: {np.round(cf_minus_rec, 4)}')

    # ---- 2. latent geometry -------------------------------------------
    def latents(m, inp, lg):
        w_q = m.encoder(inp.cloud, inp.indices, False)
        wae = m.w_autoencoder
        x = w_q.reshape(-1, wae.n_codes, wae.embedding_dim)
        data = wae.encode_z1(x, False)
        probs = wae.get_probabilities_from_logits(lg)
        data = data.replace(probs=probs)
        data = wae.encode_z2(x, data, False)
        eye = jnp.eye(wae.n_classes, dtype=probs.dtype)
        class_prior = wae.z2_prior(eye)  # (n_classes, n_codes, 2*z2)
        return data, class_prior, probs

    data, class_prior, probs = vqvae.module.apply(
        vqvae.variables, inputs, logits, method=latents,
        rngs={'sampling': jax.random.key(0)},
    )
    z2 = class_prior.shape[-1] // 2
    p_mu_c = np.asarray(class_prior[..., :z2])      # (C, n_codes, z2)
    p_lv_c = np.asarray(class_prior[..., z2:])
    sep = np.zeros((n_classes, n_classes))
    for i in range(n_classes):
        for j in range(n_classes):
            sep[i, j] = np.sqrt(((p_mu_c[i] - p_mu_c[j]) ** 2).sum())
    d_mu2 = np.asarray(data.d_mu2)                  # (B, n_codes, z2)
    d_norm = np.sqrt((d_mu2.reshape(n, -1) ** 2).sum(1))
    print(f'\n||p_mu2(ci) - p_mu2(cj)|| class separation matrix:')
    print(np.round(sep, 2))
    print(f'||d_mu2|| per sample: mean {d_norm.mean():.3f}  max {d_norm.max():.3f}')
    print(f'prior sigma (exp(p_lv/2)) mean: {np.exp(p_lv_c / 2).mean():.4f}')
    print(f'posterior sigma offset exp(d_lv/2) mean: {np.exp(np.asarray(data.d_log_var2) / 2).mean():.4f}')
    print(f'probs from logits (cf_temperature={vqvae.module.w_autoencoder.cf_temperature}): '
          f'max prob mean {np.asarray(probs).max(1).mean():.3f}')

    # z1 class leakage: how far apart are per-class mean mu1 centroids vs
    # the within-class spread — large ratio means z1 re-encodes the class
    mu1 = np.asarray(data.mu1).reshape(n, -1)
    cents = np.stack([mu1[labels == c].mean(0) for c in range(n_classes)])
    within = np.mean([
        np.sqrt(((mu1[labels == c] - cents[c]) ** 2).sum(1)).mean()
        for c in range(n_classes)
    ])
    between = np.mean([
        np.sqrt(((cents[i] - cents[j]) ** 2).sum())
        for i in range(n_classes) for j in range(n_classes) if i != j
    ])
    print(f'\nz1 (mu1) class geometry: between-centroid {between:.3f} vs within-class {within:.3f} '
          f'(ratio {between / max(within, 1e-9):.2f} — >>1 means z1 carries the class)')


if __name__ == '__main__':
    main()
