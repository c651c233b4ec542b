"""Counterfactual-channel anatomy on a trained checkpoint (round-5 probe).

QUALITY_r5 recorded counterfeit accuracy at chance with z1 fully squeezed
(KLD1 = 0.022 nats) and the z2 posterior delta rich (KLD2 = 6.7 nats) — the
source-sample information that defeats the flip must therefore ride in
``d_mu2``.  The posterior net sees (probs, x) (reference
w_autoencoders.py:166 Conditional encoder; pccf encode_z2), so it *can*
learn ``d_mu2(probs, x) = g(x) − p_mu2(probs)``, which makes
``z2 = p_mu2 + d_mu2`` independent of the condition and nullifies the
counterfactual channel even though the prior is class-separated.

This probe decomposes the CF decode on the saved checkpoints:

- ``full``:        z2 = p_mu2(tgt) + d_mu2(tgt, x)   (the reference CF rule)
- ``delta_src``:   z2 = p_mu2(tgt) + d_mu2(src, x)   (delta can't see the target)
- ``prior_only``:  z2 = p_mu2(tgt)                    (delta removed)
- ``prior_z1z``:   z2 = p_mu2(tgt), z1 = 0            (prior channel alone)

and reports the classifier's target-accuracy for each, over all 4 targets.
If prior_only flips but full doesn't, the cancellation story is confirmed
and the fix is a training-regime change (squeeze the delta), not a wiring
change.

Usage: python tools/cf_anatomy.py [--tag quality_r5] [--cpu] [--smoke]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def cf_variant(module, inputs, sample_logits, target_dim, target_value, mode):
    """Replicates WAutoEncoder.generate_counterfactual with channel switches.

    mode: 0=full, 1=delta_src, 2=prior_only, 3=prior_z1zero (static int).
    """
    import jax
    import jax.numpy as jnp

    from pccf.data.structures import WInputs  # noqa: F401  (doc parity)

    wae = module.w_autoencoder
    w_q = module.encoder(inputs.cloud, inputs.indices, False)
    x = w_q.reshape(-1, wae.n_codes, wae.embedding_dim)
    old_probs = wae.get_probabilities_from_logits(sample_logits)
    target = jax.nn.one_hot(jnp.asarray(target_dim), wae.n_classes, dtype=old_probs.dtype)
    target = jnp.broadcast_to(target, old_probs.shape)
    probs = (1.0 - target_value) * old_probs + target_value * target

    data = wae.encode_z1(x, False).replace(probs=probs)
    # prior always conditioned on the interpolated target probs
    p = wae.z2_prior(probs, False)
    p_mu2, p_log_var2 = jnp.split(p, 2, axis=2)
    # delta conditioned on target (reference rule) or source probs
    d_probs = old_probs if mode == 1 else probs
    d = wae.z2_posterior(d_probs, x, False)
    d_mu2, _ = jnp.split(d, 2, axis=2)
    z2 = p_mu2 if mode >= 2 else p_mu2 + d_mu2
    z1 = jnp.zeros_like(data.mu1) if mode == 3 else data.mu1
    data = data.replace(
        z1=z1, z2=z2, p_mu2=p_mu2, p_log_var2=p_log_var2, d_mu2=d_mu2
    )
    data = wae.decode(data, module.codebook, False)
    return module._decode_from_idx(data, inputs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--tag', default='quality_r5')
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--smoke', action='store_true', help='tiny dims (validates plumbing)')
    ap.add_argument('--target-value', type=float, default=1.0)
    args = ap.parse_args()

    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax

        jax.config.update('jax_platforms', 'cpu')
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    os.environ.setdefault('ROOT_EXP_DIR', str(REPO / 'experiments' / args.tag))
    os.environ.setdefault('DATASET_DIR', str(REPO / 'datasets'))

    from pccf.config import Experiment, get_config_all
    from pccf.data import Inputs, get_datasets
    from pccf.train import DataLoader, get_trackers

    overrides = [
        'data/dataset=synthetic',
        'data.dataset.n_classes=4',
        'data.dataset.settings.n_train=512',
        'data.dataset.settings.n_test=128',
        'data.dataset.settings.base_points=4096',
        'data.dataset.settings.variability=0.85',
        'user.checkpoint_every=0',
        'user.trackers.tensorboard=false',
        'user.trackers.csv=false',
        'user.seed=0',
    ]
    if args.smoke:
        overrides += [
            'data.dataset.settings.n_train=16',
            'data.dataset.settings.n_test=8',
            'data.dataset.settings.base_points=96',
            'data.n_input_points=64',
            'data.n_target_points=64',
            'data.n_neighbors=6',
            'classifier.model.n_neighbors=6',
            'classifier.model.conv_dims=[8,8]',
            'classifier.model.mlp_dims=[16,16]',
            'classifier.model.feature_dim=16',
            'autoencoder.model.w_dim=32',
            'autoencoder.model.embedding_dim=4',
            'autoencoder.model.book_size=4',
            'autoencoder.model.encoder.n_neighbors=6',
            'autoencoder.model.decoder.map_dims=[8]',
            'autoencoder.model.decoder.conv_dims=[16,8]',
            'autoencoder.model.decoder.n_components=2',
            'autoencoder.model.decoder.sample_dim=4',
            'w_autoencoder.model.w_encoder.proj_dim=16',
            'w_autoencoder.model.w_encoder.n_heads=2',
            'w_autoencoder.model.w_encoder.mlp_dims=[16]',
            'w_autoencoder.model.w_decoder.proj_dim=16',
            'w_autoencoder.model.w_decoder.n_heads=2',
            'w_autoencoder.model.w_decoder.mlp_dims=[16]',
            'w_autoencoder.model.conditional_w_encoder.proj_dim=16',
            'w_autoencoder.model.conditional_w_encoder.n_heads=2',
            'w_autoencoder.model.conditional_w_encoder.mlp_dims=[16]',
            'w_autoencoder.model.z1_dim=4',
            'w_autoencoder.model.z2_dim=4',
        ]
    cfg = get_config_all(overrides)
    exp = Experiment(cfg, name=args.tag)
    for tracker in get_trackers(cfg):
        exp.subscribe(tracker)

    record: dict = {'tag': args.tag, 'target_value': args.target_value, 'modes': {}}
    with exp.create_run(resume=True):
        from train_w_autoencoder import load_models

        classifier, vqvae = load_models(cfg)
        _, test_dataset = get_datasets(cfg)
        test_dataset.set_inference(True)
        loader = DataLoader(test_dataset, 16)

        cls_fn = jax.jit(
            lambda v, inp: classifier.module.apply(v, inp, train=False)
        )
        cf_fn = jax.jit(
            lambda v, inp, lg, td, tv, mode: vqvae.module.apply(
                v, inp, lg, td, tv, mode, method=cf_variant,
                rngs={'sampling': jax.random.key(5)},
            ),
            static_argnums=(5,),
        )

        batches = list(loader.epoch_iterator(1))
        labels = np.concatenate([np.asarray(t.label).ravel() for _, t in batches])
        n_classes = cfg.data.dataset.n_classes

        # conditional-prior geometry: pairwise L2 between p_mu2(one_hot(c))
        # — a collapsed prior (near-zero off-diagonals) cannot steer decodes
        # no matter how squeezed the delta is
        prior_fn = jax.jit(
            lambda v, p: vqvae.module.apply(
                v, p, False,
                method=lambda m, p_, t_: m.w_autoencoder.z2_prior(p_, t_),
            )
        )
        eye = np.eye(n_classes, dtype=np.float32)
        p_out = np.asarray(prior_fn(vqvae.variables, eye))
        p_mu2 = p_out[..., : p_out.shape[-1] // 2]
        dmat = np.sqrt(
            ((p_mu2[:, None] - p_mu2[None]) ** 2).sum(axis=(2, 3))
        )
        record['prior_mu2_pairwise_l2'] = [[round(float(v), 3) for v in row] for row in dmat]
        print('prior pairwise L2:', record['prior_mu2_pairwise_l2'], flush=True)

        for mode, name in ((0, 'full'), (1, 'delta_src'), (2, 'prior_only'), (3, 'prior_z1zero')):
            t0 = time.time()
            hits = {j: [0, 0] for j in range(n_classes)}
            # predicted-class histogram per target: shows WHERE failed
            # targets land (e.g. prior decodes for class 2 classified as 0)
            hist = np.zeros((n_classes, n_classes), np.int64)
            for inputs, _t in batches:
                lg = cls_fn(classifier.variables, inputs)
                for j in range(n_classes):
                    out = cf_fn(
                        vqvae.variables, inputs, lg,
                        np.int32(j), np.float32(args.target_value), mode,
                    )
                    pred = np.asarray(cls_fn(classifier.variables, Inputs(cloud=out.recon))).argmax(1)
                    hits[j][0] += int((pred == j).sum())
                    hits[j][1] += int(pred.shape[0])
                    np.add.at(hist[j], pred, 1)
            per_target = {f'to_{j}': round(h / t, 4) for j, (h, t) in hits.items()}
            overall = sum(h for h, _ in hits.values()) / sum(t for _, t in hits.values())
            record['modes'][name] = {
                'overall': round(overall, 4), **per_target,
                'pred_hist': hist.tolist(),
                'wall_s': round(time.time() - t0, 1),
            }
            print(name, json.dumps(record['modes'][name]), flush=True)

    out = REPO / 'tools' / f'cf_anatomy_{args.tag}.json'
    out.write_text(json.dumps(record, indent=1))
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
