"""Silicon A/B of the fused single-launch CVAE counterfactual kernel.

BENCH_r4a (19:24) recorded counterfactual_batch_ms unchanged (18.8) after
the fused kernel landed, even though the gate provably passes at bench
shapes.  This isolates it: the same flagship counterfactual step timed with
``PCCF_CVAE_FUSED`` 1 vs 0 (trace-time kill-switch in
``WAutoEncoder._fused_cf_ok``), plus a null-executable marginal to expose
the per-dispatch tunnel overhead every standalone number carries.

Usage: python tools/_cvae_ab.py        (one JSON line)
"""

from __future__ import annotations

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main(batch=16, n=2048):
    import jax
    import jax.numpy as jnp

    from bench import _median_scan_time
    from pccf.config import get_config_all
    from pccf.data.structures import Inputs
    from pccf.models import get_autoencoder

    out: dict = {}

    # --- per-dispatch overhead: a 1-op executable's marginal step ---------
    def null_step(carry):
        (c,) = carry
        return (c + 1.0,)

    dt0, _ = _median_scan_time(null_step, (jnp.zeros((8, 128)),), k_short=2, k_long=42)
    out['null_dispatch_ms'] = round(dt0 * 1e3, 3)

    # --- the bench counterfactual model, packed serving state -------------
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
    cloud = rng.standard_normal((batch, n, 3)).astype(np.float32) / 2
    logits = rng.standard_normal((batch, 2)).astype(np.float32)
    rngs = {'params': jax.random.key(0), 'sampling': jax.random.key(1), 'dropout': jax.random.key(2)}
    variables = model.init(rngs, Inputs(cloud=cloud), logits, method='full_init')

    for flag in ('1', '0'):
        _os.environ['PCCF_CVAE_FUSED'] = flag

        _, mutated = jax.jit(
            lambda v, c, lg: model.apply(
                v, Inputs(cloud=c), lg, 1, 1.0, method='generate_counterfactual',
                rngs={'sampling': jax.random.key(3)}, mutable=['packed'],
            )
        )(variables, jnp.asarray(cloud), jnp.asarray(logits))
        packed = dict(mutated).get('packed', {})
        v_run = {**dict(variables), 'packed': packed} if packed else variables

        def step(carry, _v=v_run):
            cloud_c, logits_c = carry
            recon = model.apply(
                _v, Inputs(cloud=cloud_c), logits_c, 1, 1.0,
                method='generate_counterfactual', rngs={'sampling': jax.random.key(3)},
            ).recon
            return cloud_c + 1e-3 * recon, logits_c

        dt, spread = _median_scan_time(
            step, (jnp.asarray(cloud), jnp.asarray(logits)), k_short=1, k_long=9
        )
        key = 'fused' if flag == '1' else 'xla_chain'
        out[f'{key}_batch_ms'] = round(dt * 1e3, 2)
        out[f'{key}_samples_per_s'] = round(batch / dt, 1)
        out[f'{key}_spread'] = round(spread, 3)

    _os.environ.pop('PCCF_CVAE_FUSED', None)
    out['fused_gain_ms'] = round(out['xla_chain_batch_ms'] - out['fused_batch_ms'], 2)
    print(json.dumps(out))


if __name__ == '__main__':
    main(*(int(a) for a in _sys.argv[1:]))
