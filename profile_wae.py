"""Sub-stage attribution of the inner CVAE counterfactual path (not in bench)."""

from __future__ import annotations

import numpy as np

from bench import _marginal_scan_time


def main(batch=16):
    import jax
    import jax.numpy as jnp

    from pccf.config import get_config_all
    from pccf.data.structures import Inputs, WInputs
    from pccf.models import get_autoencoder

    cfg = get_config_all(
        ['data/dataset=synthetic', 'data.dataset.n_classes=2',
         'data.n_input_points=2048', 'data.n_target_points=2048']
    )
    model = get_autoencoder(cfg)
    rng = np.random.default_rng(0)
    cloud = jnp.asarray(rng.standard_normal((batch, 2048, 3)).astype(np.float32) / 2)
    logits = jnp.asarray(rng.standard_normal((batch, 2)).astype(np.float32))
    rngs = {'params': jax.random.key(0), 'sampling': jax.random.key(1), 'dropout': jax.random.key(2)}
    variables = model.init(rngs, Inputs(cloud=cloud), logits, method='full_init')
    w_q0 = model.apply(variables, Inputs(cloud=cloud), method='encode').w_q
    codebook = variables['params']['codebook']

    def apply_m(fn, *args):
        return model.apply(variables, *args, method=fn, rngs={'sampling': jax.random.key(3)})

    def stage_full(carry):
        wq, lg = carry
        data = apply_m(lambda m, a, b, c, d: m.w_autoencoder.generate_counterfactual(a, b, c, d),
                       WInputs(wq, lg), codebook, 1, 1.0)
        return (wq + 1e-6 * jnp.mean(data.w_recon) * wq, lg)

    def stage_z1(carry):
        wq, lg = carry
        data = apply_m(lambda m, x: m.w_autoencoder.encode_z1(x, False),
                       wq.reshape(-1, 256, 4))
        return (wq + 1e-6 * jnp.mean(data.mu1) * wq, lg)

    def stage_z2(carry):
        wq, lg = carry

        def run(m, x, lg_):
            wa = m.w_autoencoder
            data = wa.encode_z1(x, False)
            probs = wa.get_probabilities_from_logits(lg_)
            data = data.replace(probs=probs)
            data = wa.encode_z2(x, data, False)
            return data

        data = apply_m(run, wq.reshape(-1, 256, 4), lg)
        return (wq + 1e-6 * jnp.mean(data.p_mu2 + data.d_mu2) * wq, lg)

    def stage_decode(carry):
        wq, lg = carry

        def run(m, x, lg_):
            wa = m.w_autoencoder
            data = wa.encode_z1(x, False)
            probs = wa.get_probabilities_from_logits(lg_)
            data = data.replace(probs=probs)
            data = wa.encode_z2(x, data, False)
            data = data.replace(z1=data.mu1, z2=data.p_mu2 + data.d_mu2)
            return wa.decode(data, codebook, False)

        data = apply_m(run, wq.reshape(-1, 256, 4), lg)
        return (wq + 1e-6 * jnp.mean(data.w_recon) * wq, lg)

    for name, fn in [('full_cf', stage_full), ('z1_enc', stage_z1),
                     ('z1+z2', stage_z2), ('z1+z2+decode', stage_decode)]:
        dts = [_marginal_scan_time(fn, (w_q0, logits), k_short=2, k_long=18) for _ in range(2)]
        print(f'{name:>14}: {min(dts) * 1e3:6.2f} ms/batch')


if __name__ == '__main__':
    main()
