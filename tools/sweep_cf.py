"""Silicon A/B sweep of the staged counterfactual-path knobs (VERDICT r3 #1).

Runs the full generate_counterfactual step (bench.bench_counterfactual's
B=16 point, minus the serve/B64 extras) in a fresh subprocess per knob combo
so every trace sees its env values cleanly, and prints one JSON line per
combo plus a winner summary.

Knobs (read at trace time by the kernels):
  PCCF_KNN_MXU   : '' (bf16x3 high precision) | 'bf16' (single-pass, ~1e-2 rel)
  PCCF_KNN_GROUP : extraction-chain interleave 1 | 2 | 4
  PCCF_POOL_UNROLL: dynamic-row ILP 4 | 8

Usage: python tools/sweep_cf.py [--quick]
"""

from __future__ import annotations

import itertools
import json
import os
import subprocess
import sys

_CHILD_SRC = r'''
import json, sys
import numpy as np

def main():
    import jax
    import jax.numpy as jnp
    from pccf.config import get_config_all
    from pccf.data.structures import Inputs
    from pccf.models import get_autoencoder

    batch, n = 16, 2048
    cfg = get_config_all([
        'data/dataset=synthetic', 'data.dataset.n_classes=2',
        f'data.n_input_points={n}', f'data.n_target_points={n}',
    ])
    model = get_autoencoder(cfg)
    rng = np.random.default_rng(0)
    cloud = jnp.asarray(rng.standard_normal((batch, n, 3)).astype(np.float32) / 2)
    logits = jnp.asarray(rng.standard_normal((batch, 2)).astype(np.float32))
    rngs = {'params': jax.random.key(0), 'sampling': jax.random.key(1),
            'dropout': jax.random.key(2)}
    variables = model.init(rngs, Inputs(cloud=cloud), logits, method='full_init')
    _, mutated = jax.jit(
        lambda v, c, lg: model.apply(
            v, Inputs(cloud=c), lg, 1, 1.0, method='generate_counterfactual',
            rngs={'sampling': jax.random.key(3)}, mutable=['packed'],
        )
    )(variables, cloud, logits)
    packed = dict(mutated).get('packed', {})
    if packed:
        variables = {**dict(variables), 'packed': packed}

    def step(carry):
        c, lg = carry
        r = model.apply(
            variables, Inputs(cloud=c), lg, 1, 1.0,
            method='generate_counterfactual', rngs={'sampling': jax.random.key(3)},
        ).recon
        return c + 1e-3 * r, lg

    # Compile the two scan lengths ONCE, then draw all 5 marginal samples
    # from the same compiled loops (a fresh _marginal_scan_time per sample
    # recompiles the full model twice per rep — 10+ min/combo, which blew
    # the sweep's 900 s combo timeout).
    import time as _time

    def make(k):
        @jax.jit
        def loop(c, lg):
            out, _ = jax.lax.scan(lambda cc, _: (step(cc), None), (c, lg), None, length=k)
            return out[0].ravel()[0]

        return loop

    k_short, k_long = 1, 9
    loops = {k: make(k) for k in (k_short, k_long)}
    for lp in loops.values():
        float(lp(cloud, logits))  # compile + warm

    samples = []
    for _ in range(5):
        times = {}
        for k, lp in loops.items():
            best = float('inf')
            for _ in range(2):
                t0 = _time.time()
                float(lp(cloud, logits))
                best = min(best, _time.time() - t0)
            times[k] = best
        dt = (times[k_long] - times[k_short]) / (k_long - k_short)
        if dt > 0:
            samples.append(batch / dt)
    if not samples:
        print(json.dumps({'error': 'non-positive marginals'}))
        return
    samples.sort()
    med = samples[len(samples) // 2]
    print(json.dumps({
        'samples_per_s_median': round(med, 1),
        'samples_per_s_all': [round(s, 1) for s in samples],
        'batch_ms_median': round(batch / med * 1e3, 2),
    }))

main()
'''


def run_combo(env_add: dict[str, str], timeout: int = 900) -> dict:
    env = {**os.environ, **env_add}
    try:
        p = subprocess.run(
            [sys.executable, '-c', _CHILD_SRC], env=env, capture_output=True,
            text=True, timeout=timeout, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    except subprocess.TimeoutExpired:
        return {'error': 'timeout'}
    for line in reversed(p.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {'error': (p.stderr or p.stdout)[-400:]}


def main() -> None:
    quick = '--quick' in sys.argv
    mxu_opts = ['', 'bf16']
    group_opts = ['1', '2', '4'] if not quick else ['2', '4']
    unroll_opts = ['4', '8']
    results = []
    for mxu, group, unroll in itertools.product(mxu_opts, group_opts, unroll_opts):
        env_add = {'PCCF_KNN_GROUP': group, 'PCCF_POOL_UNROLL': unroll}
        if mxu:
            env_add['PCCF_KNN_MXU'] = mxu
        else:
            env_add['PCCF_KNN_MXU'] = ''
        r = run_combo(env_add)
        row = {'mxu': mxu or 'bf16x3', 'group': group, 'unroll': unroll, **r}
        results.append(row)
        print(json.dumps(row), flush=True)
    ok = [r for r in results if 'samples_per_s_median' in r]
    if ok:
        best = max(ok, key=lambda r: r['samples_per_s_median'])
        print(json.dumps({'winner': best}), flush=True)


if __name__ == '__main__':
    main()
