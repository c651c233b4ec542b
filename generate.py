"""Generate random samples from the trained generative prior.

pccf counterpart of the reference entry point (generate.py): sample z1/z2
from the priors (Dirichlet class condition), decode through the codebook and
PCGen, and render.
"""

from __future__ import annotations

import jax
import numpy as np

from pccf.config import AllConfig, Experiment, hydra_main
from pccf.utils.visualization import render_cloud


def generate_random_samples(cfg) -> np.ndarray:
    from train_w_autoencoder import load_models

    _classifier, vqvae = load_models(cfg)
    cfg_gen = cfg.user.generate
    save_dir = cfg.user.path.version_dir / 'images' / cfg.name / 'generated'

    z1_bias = np.zeros(
        (cfg_gen.batch_size, cfg.autoencoder.model.n_codes, cfg.w_autoencoder.model.z1_dim),
        np.float32,
    )
    if cfg_gen.bias_value:
        z1_dim = cfg.w_autoencoder.model.z1_dim
        if not 0 <= cfg_gen.bias_dim < z1_dim:
            raise ValueError(
                f'user.generate.bias_dim={cfg_gen.bias_dim} is out of range '
                f'for z1_dim={z1_dim}'
            )
        z1_bias[:, :, cfg_gen.bias_dim] = cfg_gen.bias_value
    outputs = vqvae.apply(
        cfg_gen.batch_size,
        None,
        z1_bias,
        method='generate',
        rngs={'sampling': jax.random.key(cfg.user.seed or 0)},
    )
    clouds = np.asarray(jax.device_get(outputs.recon))
    for i, cloud in enumerate(clouds):
        render_cloud((cloud,), title=str(i), interactive=cfg.user.plot.interactive, save_dir=save_dir)
    return clouds


@hydra_main
def main(cfg: AllConfig) -> None:
    exp = Experiment(cfg, name=cfg.name, par_dir=cfg.user.path.version_dir, tags=cfg.tags)
    with exp.create_run(resume=True):
        generate_random_samples(cfg)


if __name__ == '__main__':
    main()
