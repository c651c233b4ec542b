"""Visualize counterfactual edits of selected test samples.

pccf counterpart of the reference entry point (visualize_counterfactuals.py):
renders original / reconstruction / double reconstruction / per-class
counterfactuals with the classifier's probability vectors printed.
"""

from __future__ import annotations

import jax
import numpy as np

from pccf.config import AllConfig, Experiment, hydra_main
from pccf.data import Inputs, Partitions, get_dataset
from pccf.utils.visualization import render_cloud


def _probs(classifier, cloud: np.ndarray, prefix: str) -> tuple[np.ndarray, str]:
    logits = classifier(Inputs(cloud=cloud))
    probs = np.asarray(jax.nn.softmax(logits, axis=1))[0]
    text = f'{prefix}: ({" ".join(f"{p:.2f}" for p in probs)})'
    print(text)
    return np.asarray(logits), text


def create_and_render_counterfactuals(cfg) -> None:
    from train_w_autoencoder import load_models

    classifier, vqvae = load_models(cfg)
    value = cfg.user.counterfactual_value
    interactive = cfg.user.plot.interactive
    base_dir = cfg.user.path.version_dir / 'images' / cfg.name
    dataset = get_dataset(cfg, Partitions.test if cfg.final else Partitions.val)
    dataset.set_inference(True)
    n_classes = cfg.data.dataset.n_classes
    rngs = {'sampling': jax.random.key(0)}

    for i in cfg.user.plot.sample_indices:
        if i >= len(dataset):
            raise ValueError(f'Index {i} too large for dataset of length {len(dataset)}')
        save_dir = base_dir / f'sample_{i}'
        save_dir.mkdir(parents=True, exist_ok=True)
        for old in save_dir.iterdir():
            old.unlink()

        inputs_i, targets_i = dataset[i]
        cloud = np.stack([np.asarray(inputs_i.cloud)])
        indices = None if inputs_i.indices is None else np.stack([np.asarray(inputs_i.indices)])
        sample = Inputs(cloud=cloud, indices=indices)
        print(f'Sample {i} with label {int(targets_i.label)}:')

        logits, str_orig = _probs(classifier, cloud, 'Original')
        data = vqvae.apply(sample, rngs=rngs)
        recon = np.asarray(data.recon)
        _, str_recon = _probs(classifier, recon, 'Reconstruction')

        data = vqvae.apply(sample, logits, method='double_reconstruct_with_logits', rngs=rngs)
        double = np.asarray(data.recon)
        _, str_double = _probs(classifier, double, 'Double Reconstruction')

        cfs, cf_strs = [], []
        for j in range(n_classes):
            data = vqvae.apply(
                sample, logits, np.int32(j), np.float32(value),
                method='generate_counterfactual', rngs=rngs,
            )
            cf = np.asarray(data.recon)
            _, text = _probs(classifier, cf, f'Counterfactual to {j}')
            cfs.append(cf[0])
            cf_strs.append(text)
        print()

        render_cloud((cloud[0],), title=str_orig, interactive=interactive, save_dir=save_dir)
        render_cloud((recon[0],), title=str_recon, interactive=interactive, save_dir=save_dir)
        render_cloud((double[0],), title=str_double, interactive=interactive, save_dir=save_dir)
        for j in range(n_classes):
            render_cloud((cfs[j],), title=cf_strs[j], interactive=interactive, save_dir=save_dir)
        render_cloud(cfs, title='Counterfactuals', interactive=interactive, save_dir=save_dir)


@hydra_main
def main(cfg: AllConfig) -> None:
    exp = Experiment(cfg, name=cfg.name, par_dir=cfg.user.path.version_dir, tags=cfg.tags)
    with exp.create_run(resume=True):
        create_and_render_counterfactuals(cfg)


if __name__ == '__main__':
    main()
