"""Benchmark: Chamfer/EMD pairs/sec/chip @ 2048 pts + counterfactual throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The DRIVER-captured run of this script (BENCH_r{N}.json) is the official
record for the round; numbers measured by ad-hoc runs are "best observed"
only and must be labelled as such in BASELINE.md.

Headline metric (BASELINE.json): combined Chamfer+ApproxMatch-EMD loss
forward+backward at 2048 points — the reference autoencoder's hot loss path.
``vs_baseline`` is measured throughput relative to the documented A100
estimate for the reference CUDA kernels (BASELINE.md: ~2000 pairs/s fwd+bwd;
the reference repo publishes no numbers).

Timing methodology: the step is iterated inside a jitted ``lax.scan`` with a
real data dependency between iterations; per-step time is the *marginal* time
between a long and a short scan, which cancels the fixed dispatch/transfer
overhead of the remote-TPU tunnel exactly.  Every reported metric is the
MEDIAN of ``PCCF_BENCH_REPS`` (default 5) independent marginal measurements;
the relative spread (max-min)/median across those measurements is reported
alongside the headline metrics so run-to-run variance is on the record.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_EST_PAIRS_PER_S = 2000.0  # documented estimate, see BASELINE.md
A100_EST_CF_SAMPLES_PER_S = 900.0  # counterfactual decode estimate, see BASELINE.md


def _progress(msg: str) -> None:
    """Timestamped progress line on stderr (stdout stays the one JSON line).

    The full bench is ~10 compile-heavy sections over the tunnel; without
    per-section stamps a driver-side timeout kill is undiagnosable."""
    import sys

    print(f'[bench +{time.time() - _T0:7.1f}s] {msg}', file=sys.stderr, flush=True)


_T0 = time.time()


def _marginal_scan_time(step_fn, args, k_short=2, k_long=12, repeats=2) -> float:
    """Marginal seconds/iteration of ``step_fn`` chained inside lax.scan.

    Takes the min over ``repeats`` timed runs per scan length (compiles are
    cached after the first), which suppresses tunnel/host jitter.  A
    non-positive marginal (one noisy short run beating the long run) retries
    with more repeats, then RAISES — clamping it would fabricate an absurd
    throughput (batch / 1e-9) as the official record."""
    import jax

    def make(k):
        @jax.jit
        def loop(*args):
            def body(c, _):
                return step_fn(c), None

            out, _ = jax.lax.scan(body, args, None, length=k)
            return jax.tree.leaves(out)[0].ravel()[0]

        return loop

    loops = {k: make(k) for k in (k_short, k_long)}
    for k, loop in loops.items():
        float(loop(*args))  # compile + warm (forces full execution)

    for attempt_repeats in (repeats, repeats * 3):
        times = {}
        for k, loop in loops.items():
            best = float('inf')
            for _ in range(attempt_repeats):
                t0 = time.time()
                float(loop(*args))
                best = min(best, time.time() - t0)
            times[k] = best
        marginal = (times[k_long] - times[k_short]) / (k_long - k_short)
        if marginal > 0:
            return marginal
    raise RuntimeError(
        f'non-positive marginal scan time ({times}): host/tunnel jitter '
        f'dominates; re-run the bench'
    )


def _bench_reps() -> int:
    import os

    return max(1, int(os.environ.get('PCCF_BENCH_REPS', '5')))


def _median_scan_time(step_fn, args, **kw) -> tuple[float, float]:
    """Median of ``PCCF_BENCH_REPS`` independent marginal measurements plus
    the relative spread (max-min)/median across them.  Compiles are cached
    after the first measurement, so extra reps cost only execution time —
    this is the variance control the round-3 verdict asked for (the same
    code measured 4,104 then 3,131 pairs/s an hour apart on single-shot
    marginals)."""
    samples = sorted(_marginal_scan_time(step_fn, args, **kw) for _ in range(_bench_reps()))
    med = samples[len(samples) // 2]
    spread = (samples[-1] - samples[0]) / med if med > 0 else 0.0
    return med, spread


def bench_loss_kernels(batch=8, n=2048):
    import jax
    import jax.numpy as jnp

    from pccf.kernels import api as kapi

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, n, 3)).astype(np.float32) / 2)
    y = jnp.asarray(rng.standard_normal((batch, n, 3)).astype(np.float32) / 2)

    def make_step(loss_fn):
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

        def step(carry):
            cx, cy = carry
            _, (gx, gy) = grad_fn(cx, cy)
            return cx + 1e-3 * gx, cy + 1e-3 * gy

        return step

    def _fused(a, b):
        cham, emd = kapi.chamfer_match_cost(a, b)
        return jnp.sum(cham) + jnp.sum(emd)

    results = {}
    for name, loss in [
        # the headline: the ChamferEMD composite as the training loss actually
        # runs it (get_chamfer_emd_losses) — ONE fused kernel launch emitting
        # the EMD relaxation AND chamfer's min/argmin from the shared d2 sweep
        ('chamfer_emd', _fused),
        # the two-launch construction, kept for comparison with round-2 numbers
        ('chamfer_emd_2launch', lambda a, b: jnp.sum(kapi.chamfer(a, b)) + jnp.sum(kapi.match_cost(a, b))),
        ('chamfer', lambda a, b: jnp.sum(kapi.chamfer(a, b))),
        ('emd', lambda a, b: jnp.sum(kapi.match_cost(a, b))),
        # opt-in entropic-OT surrogate (ChamferSinkhorn objective) — extra,
        # not the parity metric; fused single-launch form like the headline
        ('chamfer_sinkhorn', lambda a, b: sum(map(jnp.sum, kapi.chamfer_sinkhorn_cost(a, b)))),
    ]:
        _progress(f'loss kernel: {name}')
        try:
            dt, spread = _median_scan_time(make_step(loss), (x, y))
        except Exception as e:
            # an extra (non-headline) kernel failing — e.g. the opt-in
            # Sinkhorn entry hitting a Mosaic lowering issue — must not take
            # down the chamfer_emd headline metric
            results[f'{name}_error'] = str(e)[:200]
            continue
        results[f'{name}_pairs_per_s'] = batch / dt
        results[f'{name}_ms_per_batch'] = dt * 1e3
        if name == 'chamfer_emd':
            results['chamfer_emd_spread'] = spread
    if 'chamfer_emd_pairs_per_s' not in results:
        # fused variant failed (e.g. a Mosaic regression in the new
        # chamfer-in-EMD outputs): fall back to the two-launch number as the
        # headline rather than losing the bench, keeping the error on record
        if 'chamfer_emd_2launch_pairs_per_s' not in results:
            raise RuntimeError(
                f'both combined-loss variants failed: '
                f'{results.get("chamfer_emd_error")} / '
                f'{results.get("chamfer_emd_2launch_error")}'
            )
        results['chamfer_emd_pairs_per_s'] = results['chamfer_emd_2launch_pairs_per_s']
        results['chamfer_emd_ms_per_batch'] = results['chamfer_emd_2launch_ms_per_batch']
    return results


def bench_auction(n=2048):
    """Auction EMD at the reference contract operating points
    (external/emd/emd/emd_module.py:25-31): train eps=0.005/50 iters,
    eval eps=0.002/10000-iter cap (compacted auction exits at convergence)."""
    _progress('auction EMD')
    import time as _time

    import jax.numpy as jnp

    from pccf.kernels.auction_emd import auction_emd

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, n, 3)).astype(np.float32))
    y = jnp.asarray(rng.random((1, n, 3)).astype(np.float32))
    out = {}
    for tag, eps, iters in [('train', 0.005, 50), ('eval', 0.002, 10000)]:
        dis, a = auction_emd(x, y, eps=eps, iters=iters)  # compile + warm
        dis.block_until_ready()
        best = float('inf')
        for _ in range(3):
            t0 = _time.time()
            dis, a = auction_emd(x, y, eps=eps, iters=iters)
            dis.block_until_ready()
            best = min(best, _time.time() - t0)
        out[f'auction_{tag}_ms'] = best * 1e3
        if tag == 'eval':
            out['auction_eval_converged'] = bool((np.asarray(a) >= 0).all())
    return out


def bench_counterfactual(batch=16, n=2048):
    """Full counterfactual decode (encode -> interpolate -> decode) at the
    reference flagship shapes: w_dim 1024 = 256 codes x 4, transformer 512."""
    _progress('counterfactual: build + init')
    import jax

    from pccf.config import get_config_all
    from pccf.data.structures import Inputs
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
    cloud = rng.standard_normal((batch, n, 3)).astype(np.float32) / 2
    inputs = Inputs(cloud=cloud)
    logits = rng.standard_normal((batch, 2)).astype(np.float32)
    rngs = {'params': jax.random.key(0), 'sampling': jax.random.key(1), 'dropout': jax.random.key(2)}
    variables = model.init(rngs, inputs, logits, method='full_init')
    # steady-state eval: capture the fused transformer-stack operands once
    # (the 'packed' collection) so the timed loop measures the served path,
    # not the per-call weight repacking (pccf/nn/w_networks._packed_stack)
    _, mutated = jax.jit(
        lambda v, c, lg: model.apply(
            v, Inputs(cloud=c), lg, 1, 1.0, method='generate_counterfactual',
            rngs={'sampling': jax.random.key(3)}, mutable=['packed'],
        )
    )(variables, jax.numpy.asarray(cloud), jax.numpy.asarray(logits))
    packed = dict(mutated).get('packed', {})
    if packed:
        variables = {**dict(variables), 'packed': packed}

    def step(carry):
        cloud_c, logits_c = carry
        recon = model.apply(
            variables, Inputs(cloud=cloud_c), logits_c, 1, 1.0,
            method='generate_counterfactual', rngs={'sampling': jax.random.key(3)},
        ).recon
        return cloud_c + 1e-3 * recon, logits_c

    dt, spread = _median_scan_time(
        step, (jax.numpy.asarray(cloud), jax.numpy.asarray(logits)), k_short=1, k_long=9
    )
    out = {
        'counterfactual_samples_per_s': batch / dt,
        'counterfactual_batch_ms': dt * 1e3,
        'counterfactual_vs_baseline': batch / dt / A100_EST_CF_SAMPLES_PER_S,
        'counterfactual_spread': spread,
    }
    # throughput-oriented serving point: larger batch amortises the per-call
    # issue-bound kernel portions (the reference serves at batch 16; this is
    # an extra, not the parity number)
    _progress('counterfactual: b64 point')
    big = 64
    cloud_b = rng.standard_normal((big, n, 3)).astype(np.float32) / 2
    logits_b = rng.standard_normal((big, 2)).astype(np.float32)
    dt_b, _ = _median_scan_time(
        step, (jax.numpy.asarray(cloud_b), jax.numpy.asarray(logits_b)), k_short=1, k_long=5
    )
    out['counterfactual_b64_samples_per_s'] = big / dt_b

    # serving-layer point: the same decode through pccf.serve (bucketed jit
    # cache + host pad/unpad + device_get) — quantifies serving overhead
    # over the raw model path above (an extra: its failure must not lose the
    # already-measured counterfactual parity numbers)
    try:
        _progress('serving engine')
        import time as _time

        from pccf.serve import CounterfactualServer
        from pccf.train import Model as _Model

        m = _Model(model, name='bench_serve', seed=0)
        m.variables = variables
        server = CounterfactualServer(m, buckets=(big,))
        server.counterfactual(cloud_b, 1, logits_b)  # compile (prepack variant)
        server.counterfactual(cloud_b, 1, logits_b)  # compile (steady-state)
        best = float('inf')
        for _ in range(3):
            t0 = _time.time()
            for _ in range(4):
                server.counterfactual(cloud_b, 1, logits_b)
            best = min(best, (_time.time() - t0) / 4)
        out['serve_b64_samples_per_s'] = big / best

        # pipelined serving: keep DEPTH requests in flight via the async API
        # so host pad/transfer (the tunnel round trip) overlaps device
        # compute — the engine's intended steady-state operating mode
        depth, rounds = 3, 12
        best_p = float('inf')
        for _ in range(3):
            futs = [
                server.counterfactual_async(cloud_b, 1, logits_b) for _ in range(depth)
            ]
            t0 = _time.time()
            for _ in range(rounds):
                futs.pop(0).result()
                futs.append(server.counterfactual_async(cloud_b, 1, logits_b))
            best_p = min(best_p, (_time.time() - t0) / rounds)
            for f in futs:
                f.result()
        out['serve_b64_pipelined_samples_per_s'] = big / best_p
    except Exception as e:
        out['serve_error'] = str(e)[:200]
    return out


def bench_train_step(batch=8, n=2048, iters=8):
    """Full VQ-VAE training-step throughput (fwd + Chamfer+EMD loss + bwd +
    AdamW update + host metric fetch), the reference's stage-1 hot loop."""
    _progress('train step: build + init')
    import time as _time

    import jax

    from pccf.config import get_config_all
    from pccf.data import get_datasets
    from pccf.data.protocols import Singleton
    from pccf.data.structures import Inputs
    from pccf.models import get_autoencoder
    from pccf.train import DataLoader, Model, Trainer, get_autoencoder_loss, get_learning_schema

    Singleton.reset_all()
    cfg = get_config_all(
        [
            'data/dataset=synthetic',
            'data.dataset.n_classes=2',
            f'data.n_input_points={n}',
            f'data.n_target_points={n}',
            f'autoencoder.train.batch_size={batch}',
            'autoencoder.objective.recon_loss=ChamferEMD',
        ]
    )
    ae = get_autoencoder(cfg)
    model = Model(ae, name='bench', seed=0)
    train_dataset, _ = get_datasets(cfg)
    loader = DataLoader(train_dataset, batch, n_workers=0)
    inputs, targets = next(iter(loader.epoch_iterator(1)))
    model.initialize(
        Inputs(cloud=inputs.cloud[:1]),
        np.zeros((1, cfg.data.dataset.n_classes), np.float32),
        method='full_init',
    )
    trainer = Trainer(model, loader, get_autoencoder_loss(cfg), get_learning_schema(cfg.autoencoder))
    rng = jax.random.key(7)
    for _ in range(2):  # compile + warm
        trainer.run_step(inputs, targets, rng=rng, epoch=1.0)
    samples = []
    for _ in range(_bench_reps()):
        t0 = _time.time()
        for _ in range(iters):
            trainer.run_step(inputs, targets, rng=rng, epoch=1.0)
        samples.append((_time.time() - t0) / iters)
    samples.sort()
    dt = samples[len(samples) // 2]
    return {
        'vqvae_train_step_ms': dt * 1e3,
        'vqvae_train_samples_per_s': batch / dt,
    }


def main() -> None:
    # Fail (with a parseable line) if the TPU tunnel is wedged: a direct
    # jax.devices() in that state hangs forever (the axon plugin retries
    # indefinitely), so probe device init in a disposable subprocess first.
    # The tunnel occasionally flaps, so retry the probe a few times with
    # spacing before giving up (healthy init is well under a minute).
    import os
    import subprocess
    import sys

    tries = int(os.environ.get('PCCF_BENCH_INIT_TRIES', '3'))
    probe_timeout = int(os.environ.get('PCCF_BENCH_INIT_TIMEOUT', '240'))
    gap = int(os.environ.get('PCCF_BENCH_INIT_GAP', '90'))
    # The probe must init the SAME platform the bench will use. The axon
    # sitecustomize ignores a JAX_PLATFORMS=cpu env var alone, so a CPU-forced
    # run (e.g. verification while the tunnel is down) must also apply the
    # config override inside the subprocess, or the probe would hang on the
    # tunnel the parent explicitly opted out of.
    # The probe must EXECUTE an op, not just enumerate devices: the 19 Aug
    # wedge mode had jax.devices() returning instantly while every
    # execution hung, so an init-only probe would wave the bench through
    # into an unbounded hang.
    probe_src = (
        'import os, jax\n'
        "if os.environ.get('JAX_PLATFORMS', '').startswith('cpu'):\n"
        "    jax.config.update('jax_platforms', 'cpu')\n"
        'jax.devices()\n'
        'import jax.numpy as jnp\n'
        'x = jnp.ones((128, 128))\n'
        'assert float((x @ x).sum()) > 0\n'
    )
    err: Exception | None = None
    for attempt in range(tries):
        if attempt:
            time.sleep(gap)
        try:
            subprocess.run(
                [sys.executable, '-c', probe_src],
                capture_output=True,
                timeout=probe_timeout,
                check=True,
            )
            err = None
            break
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            err = e
    if err is not None:
        print(json.dumps({
            'metric': 'chamfer_emd_pairs_per_sec_per_chip_2048pts_fwd_bwd',
            'value': 0.0,
            'unit': 'pairs/s',
            'vs_baseline': 0.0,
            'error': f'device init failed/hung {tries}x: {type(err).__name__}',
        }))
        raise SystemExit(1)

    _progress('device probe ok')
    try:
        results = bench_loss_kernels()
    except Exception as e:
        # Last resort: a Mosaic lowering regression in the shared EMD kernel
        # core would take down BOTH combined-loss variants. A slow-but-real
        # number from the jnp golden path (XLA-compiled on the chip) beats a
        # 0.0 record; the Pallas error stays on the line for diagnosis.
        pallas_err = str(e)[:200]
        from pccf.kernels import api as _kapi

        try:
            # thread-scoped pin: leaves any user PCCF_KERNEL_BACKEND env
            # setting untouched for the remaining bench sections
            with _kapi.force_backend('jnp'):
                results = bench_loss_kernels()
            results['loss_backend'] = 'jnp-fallback'
            results['pallas_error'] = pallas_err
        except Exception as e2:
            print(json.dumps({
                'metric': 'chamfer_emd_pairs_per_sec_per_chip_2048pts_fwd_bwd',
                'value': 0.0,
                'unit': 'pairs/s',
                'vs_baseline': 0.0,
                'error': f'loss-kernel bench failed: pallas: {pallas_err}; jnp: {str(e2)[:200]}',
            }))
            raise SystemExit(1) from e2
    try:
        results.update(bench_counterfactual())
    except Exception as e:  # keep the headline metric even if the model bench fails
        results['counterfactual_error'] = str(e)[:200]
        # same last-resort retry: the counterfactual path crosses the fused
        # PCGen / transformer-stack / kNN / pool kernels, any of which could
        # regress in Mosaic independently of the loss kernels
        from pccf.kernels import api as _kapi

        try:
            with _kapi.force_backend('jnp'):
                cf = bench_counterfactual()
            results.update({f'{k}_jnp' if not k.startswith('counterfactual') else k: v
                            for k, v in cf.items()})
            results['counterfactual_backend'] = 'jnp-fallback'
        except Exception as e2:
            results['counterfactual_jnp_error'] = str(e2)[:200]
    try:
        results.update(bench_train_step())
    except Exception as e:
        results['train_step_error'] = str(e)[:200]
    try:
        results.update(bench_auction())
    except Exception as e:
        results['auction_error'] = str(e)[:200]
    value = results['chamfer_emd_pairs_per_s']
    line = {
        'metric': 'chamfer_emd_pairs_per_sec_per_chip_2048pts_fwd_bwd',
        'value': round(value, 1),
        'unit': 'pairs/s',
        'vs_baseline': round(value / A100_EST_PAIRS_PER_S, 3),
        **{k: round(v, 2) if isinstance(v, float) else v for k, v in results.items()},
    }
    print(json.dumps(line))


if __name__ == '__main__':
    main()
