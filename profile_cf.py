"""Stage attribution for the counterfactual decode path (not part of bench).

Times each stage of CounterfactualVQVAE.generate_counterfactual with the
same marginal-scan methodology as bench.py.
"""

from __future__ import annotations

import numpy as np

from bench import _marginal_scan_time


def main(batch=16, n=2048):
    import jax
    import jax.numpy as jnp

    from pccf.config import get_config_all
    from pccf.data.structures import Inputs, WInputs
    from pccf.models import get_autoencoder

    cfg = get_config_all(
        [
            'data/dataset=synthetic',
            'data.dataset.n_classes=2',
            f'data.n_input_points={n}',
            f'data.n_target_points={n}',
        ]
    )
    model = get_autoencoder(cfg)
    rng = np.random.default_rng(0)
    cloud = jnp.asarray(rng.standard_normal((batch, n, 3)).astype(np.float32) / 2)
    logits = jnp.asarray(rng.standard_normal((batch, 2)).astype(np.float32))
    rngs = {'params': jax.random.key(0), 'sampling': jax.random.key(1), 'dropout': jax.random.key(2)}
    variables = model.init(rngs, Inputs(cloud=cloud), logits, method='full_init')

    w_q0 = model.apply(variables, Inputs(cloud=cloud), method='encode').w_q

    def stage_full(carry):
        c, lg = carry
        r = model.apply(
            variables, Inputs(cloud=c), lg, 1, 1.0,
            method='generate_counterfactual', rngs={'sampling': jax.random.key(3)},
        ).recon
        return c + 1e-3 * r, lg

    def stage_encoder(carry):
        c, lg = carry
        out = model.apply(variables, Inputs(cloud=c), method='encode')
        return c + 1e-6 * jnp.mean(out.w_q) * c, lg

    def stage_wae(carry):
        wq, lg = carry
        data = model.apply(
            variables, WInputs(wq, lg), variables['params']['codebook'], 1, 1.0,
            method=lambda m, *a: m.w_autoencoder.generate_counterfactual(*a),
            rngs={'sampling': jax.random.key(3)},
        )
        return wq + 1e-6 * jnp.mean(data.w_recon) * wq, lg

    def stage_decode(carry):
        wq, c = carry
        from pccf.kernels import ops

        # decode from quantised indices only: vq_assign + PCGen + filtering
        def run2(m, wq_, inputs_):
            w_e, idx, _ = ops.vq_assign(wq_, m.codebook)
            from pccf.data.structures import Outputs

            data = Outputs(w_q=wq_, idx=idx)
            return m._decode_from_idx(data, inputs_)

        r = model.apply(
            variables, wq, Inputs(cloud=c), method=run2, rngs={'sampling': jax.random.key(3)}
        ).recon
        return wq + 1e-6 * jnp.mean(r) * wq, c

    for name, fn, args in [
        ('full', stage_full, (cloud, logits)),
        ('encoder', stage_encoder, (cloud, logits)),
        ('wae_inner', stage_wae, (w_q0, logits)),
        ('decode_pcgen', stage_decode, (w_q0, cloud)),
    ]:
        dt = _marginal_scan_time(fn, args, k_short=1, k_long=9)
        print(f'{name:>14}: {dt * 1e3:7.2f} ms/batch  ({batch / dt:8.1f} samples/s)')


if __name__ == '__main__':
    main()
