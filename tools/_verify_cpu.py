"""CPU-forced verification entry points for when the TPU tunnel is down.

The axon sitecustomize ignores a bare ``JAX_PLATFORMS=cpu`` env var, so every
mode here applies BOTH the env var and the config override before first
device use (see .claude/skills/verify/SKILL.md).

Usage: python _verify_cpu.py {dryrun|bench-small|bench-full}

  dryrun       __graft_entry__.dryrun_multichip(8) on an 8-virtual-device
               CPU mesh (all eight sharding configurations).
  bench-small  every bench.py measurement function at small shapes — real
               code paths, minutes not hours (tests/test_bench_fallback.py
               covers main()'s orchestration separately).
  bench-full   the full driver bench (flagship shapes) on CPU; slow, prints
               the same single JSON line the driver records.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
if 'dryrun' in sys.argv[1:2]:
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'
    )
import jax

jax.config.update('jax_platforms', 'cpu')


def _dryrun() -> None:
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    print('DRYRUN_OK')


def _bench_small() -> None:
    import bench

    r = bench.bench_loss_headline(batch=2, n=512)
    assert r['chamfer_emd_pairs_per_s'] > 0, r
    r.update(bench.bench_loss_extras(batch=2, n=512))
    print('loss ok:', {k: round(v, 2) for k, v in r.items() if isinstance(v, float)})
    r2 = bench.bench_counterfactual(batch=2, n=256)
    assert r2['counterfactual_samples_per_s'] > 0, r2
    print('cf ok:', round(r2['counterfactual_samples_per_s'], 2), 'samples/s')
    r2s = bench.bench_serving(batch=2, n=256, big=8, engine=False)
    assert r2s['counterfactual_b64_samples_per_s'] > 0, r2s
    print('serving ok:', {k: round(v, 2) for k, v in r2s.items() if isinstance(v, float)})
    r3 = bench.bench_train_step(batch=2, n=256, iters=2)
    assert r3['vqvae_train_step_ms'] > 0, r3
    print('train ok:', round(r3['vqvae_train_step_ms'], 1), 'ms/step')
    r4 = bench.bench_auction(n=1024)
    assert r4['auction_train_ms'] > 0, r4
    print('auction ok:', {k: round(v, 1) if isinstance(v, float) else v for k, v in r4.items()})
    print('BENCH_SMALL_OK')


def _bench_full() -> None:
    import runpy

    sys.argv = ['bench.py']
    runpy.run_path(os.path.join(os.path.dirname(__file__), 'bench.py'), run_name='__main__')


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'bench-small'
    {'dryrun': _dryrun, 'bench-small': _bench_small, 'bench-full': _bench_full}[mode]()
