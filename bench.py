"""Benchmark: Chamfer/EMD pairs/sec/chip @ 2048 pts + counterfactual throughput.

Prints one JSON summary line per completed SECTION (each a full, parseable
record of everything measured so far — same schema every time); the LAST
line printed is the final summary.  A driver-side timeout kill therefore
never loses completed measurements (round 4's all-or-nothing output turned
an rc=124 into a null record; this is the fix).

The DRIVER-captured run of this script (BENCH_r{N}.json) is the official
record for the round; numbers measured by ad-hoc runs are "best observed"
only and must be labelled as such in BASELINE.md.

Headline metric (BASELINE.json): combined Chamfer+ApproxMatch-EMD loss
forward+backward at 2048 points — the reference autoencoder's hot loss path.
``vs_baseline`` is measured throughput relative to the documented A100
estimate for the reference CUDA kernels (BASELINE.md: ~2000 pairs/s fwd+bwd;
the reference repo publishes no numbers).

Timeout resilience (VERDICT r4 #2):
- sections are ordered most-important-first: headline loss -> counterfactual
  parity point -> train step -> serving -> loss extras -> auction;
- a persistent XLA compilation cache (``.jax_cache/``) amortises the
  ~650 s flagship-model compile across runs;
- a wall-clock budget (env ``PCCF_BENCH_BUDGET_S``, default 1650 s) degrades
  the per-metric rep count 5 -> 3 -> 1 and skips non-headline sections
  rather than overrunning; skipped sections are recorded on the line.

Timing methodology: the step is iterated inside a jitted ``lax.scan`` with a
real data dependency between iterations; per-step time is the *marginal* time
between a long and a short scan, which cancels the fixed dispatch/transfer
overhead of the remote-TPU tunnel exactly.  Every reported metric is the
MEDIAN of ``PCCF_BENCH_REPS`` (default 5, budget-degradable) independent
marginal measurements; the relative spread (max-min)/median across those
measurements is reported alongside the headline metrics so run-to-run
variance is on the record.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np

A100_EST_PAIRS_PER_S = 2000.0  # documented estimate, see BASELINE.md
A100_EST_CF_SAMPLES_PER_S = 900.0  # counterfactual decode estimate, see BASELINE.md

_T0 = time.time()
_REPO = Path(__file__).resolve().parent


def _progress(msg: str) -> None:
    """Timestamped progress line on stderr (stdout carries only JSON lines).

    The full bench is ~10 compile-heavy sections over the tunnel; without
    per-section stamps a driver-side timeout kill is undiagnosable."""
    import sys

    print(f'[bench +{time.time() - _T0:7.1f}s] {msg}', file=sys.stderr, flush=True)


class _Budget:
    """Wall-clock budget: degrade reps and skip extras instead of overrunning.

    ``PCCF_BENCH_BUDGET_S`` defaults to 1650 s (the round-4 driver kill
    landed between +1557 and +1800 s; staying under ~1650 leaves margin for
    the final JSON emission even on a cold compile cache)."""

    def __init__(self) -> None:
        self.total = float(os.environ.get('PCCF_BENCH_BUDGET_S', '1650'))
        self._reps_env = os.environ.get('PCCF_BENCH_REPS')

    def left(self) -> float:
        return self.total - (time.time() - _T0)

    def reps(self) -> int:
        """Median-of-N rep count, degraded as the budget drains."""
        if self._reps_env is not None:
            return max(1, int(self._reps_env))
        left = self.left()
        if left > 500:
            return 5
        if left > 250:
            return 3
        return 1

    def allow(self, section: str, est_s: float) -> bool:
        """Gate a section on its cost estimate; log the skip if over budget."""
        if self.left() >= est_s:
            return True
        _progress(f'SKIP {section}: {self.left():.0f}s left < ~{est_s:.0f}s estimate')
        return False


_BUDGET = _Budget()


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


def _median_scan_time(step_fn, args, **kw) -> tuple[float, float]:
    """Median of budget-degradable rep-count independent marginal measurements
    plus the relative spread (max-min)/median across them.  Compiles are
    cached after the first measurement, so extra reps cost only execution
    time — this is the variance control the round-3 verdict asked for (the
    same code measured 4,104 then 3,131 pairs/s an hour apart on single-shot
    marginals)."""
    reps = _BUDGET.reps()
    samples = sorted(_marginal_scan_time(step_fn, args, **kw) for _ in range(reps))
    med = samples[len(samples) // 2]
    spread = (samples[-1] - samples[0]) / med if med > 0 else 0.0
    return med, spread


def _loss_pairs(batch=8, n=2048):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, n, 3)).astype(np.float32) / 2)
    y = jnp.asarray(rng.standard_normal((batch, n, 3)).astype(np.float32) / 2)
    return x, y


def _make_loss_step(loss_fn):
    import jax

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

    def step(carry):
        cx, cy = carry
        _, (gx, gy) = grad_fn(cx, cy)
        return cx + 1e-3 * gx, cy + 1e-3 * gy

    return step


def bench_loss_headline(batch=8, n=2048):
    """The headline: the ChamferEMD composite as the training loss actually
    runs it (get_chamfer_emd_losses) — ONE fused kernel launch emitting the
    EMD relaxation AND chamfer's min/argmin from the shared d2 sweep.  Falls
    back to the two-launch construction, then to the jnp golden path, rather
    than losing the record."""
    import jax.numpy as jnp

    from pccf.kernels import api as kapi

    x, y = _loss_pairs(batch, n)

    def _fused(a, b):
        cham, emd = kapi.chamfer_match_cost(a, b)
        return jnp.sum(cham) + jnp.sum(emd)

    def _2launch(a, b):
        return jnp.sum(kapi.chamfer(a, b)) + jnp.sum(kapi.match_cost(a, b))

    results = {}
    _progress('loss kernel: chamfer_emd (headline)')
    try:
        dt, spread = _median_scan_time(_make_loss_step(_fused), (x, y))
        results['chamfer_emd_pairs_per_s'] = batch / dt
        results['chamfer_emd_ms_per_batch'] = dt * 1e3
        results['chamfer_emd_spread'] = spread
        return results
    except Exception as e:
        results['chamfer_emd_error'] = str(e)[:200]
    # fused variant failed (e.g. a Mosaic regression in the chamfer-in-EMD
    # outputs): fall back to the two-launch number as the headline rather
    # than losing the bench, keeping the error on record
    _progress('loss kernel: chamfer_emd_2launch (fallback headline)')
    try:
        dt, spread = _median_scan_time(_make_loss_step(_2launch), (x, y))
        results['chamfer_emd_2launch_pairs_per_s'] = batch / dt
        results['chamfer_emd_2launch_ms_per_batch'] = dt * 1e3
        results['chamfer_emd_pairs_per_s'] = batch / dt
        results['chamfer_emd_ms_per_batch'] = dt * 1e3
        results['chamfer_emd_spread'] = spread
        return results
    except Exception as e:
        results['chamfer_emd_2launch_error'] = str(e)[:200]
    # Last resort: a Mosaic lowering regression in the shared EMD kernel core
    # takes down BOTH Pallas variants.  A slow-but-real number from the jnp
    # golden path (XLA-compiled on the chip) beats a 0.0 record; the Pallas
    # errors stay on the line for diagnosis.
    _progress('loss kernel: jnp golden fallback')
    with kapi.force_backend('jnp'):
        dt, spread = _median_scan_time(_make_loss_step(_2launch), (x, y))
    results['chamfer_emd_pairs_per_s'] = batch / dt
    results['chamfer_emd_ms_per_batch'] = dt * 1e3
    results['chamfer_emd_spread'] = spread
    results['loss_backend'] = 'jnp-fallback'
    return results


def bench_loss_extras(batch=8, n=2048):
    """Non-headline loss kernels: the two-launch construction (round-2
    comparison point), standalone Chamfer, standalone ApproxMatch EMD, and
    the opt-in entropic-OT surrogate (ChamferSinkhorn objective)."""
    import jax.numpy as jnp

    from pccf.kernels import api as kapi

    x, y = _loss_pairs(batch, n)
    results = {}
    for name, loss, est in [
        ('chamfer_emd_2launch', lambda a, b: jnp.sum(kapi.chamfer(a, b)) + jnp.sum(kapi.match_cost(a, b)), 90),
        ('chamfer', lambda a, b: jnp.sum(kapi.chamfer(a, b)), 60),
        ('emd', lambda a, b: jnp.sum(kapi.match_cost(a, b)), 80),
        ('chamfer_sinkhorn', lambda a, b: sum(map(jnp.sum, kapi.chamfer_sinkhorn_cost(a, b))), 80),
    ]:
        if not _BUDGET.allow(f'loss:{name}', est):
            results[f'{name}_skipped'] = 'budget'
            continue
        _progress(f'loss kernel: {name}')
        try:
            dt, _ = _median_scan_time(_make_loss_step(loss), (x, y))
        except Exception as e:
            # an extra kernel failing — e.g. the opt-in Sinkhorn entry hitting
            # a Mosaic lowering issue — must not take down the record
            results[f'{name}_error'] = str(e)[:200]
            continue
        results[f'{name}_pairs_per_s'] = batch / dt
        results[f'{name}_ms_per_batch'] = dt * 1e3
    return results


_CF_MODEL_CACHE: dict = {}


def _build_cf_model(batch=16, n=2048):
    """Flagship counterfactual model + packed serving variables + step fn.

    Memoized per (batch, n): the counterfactual and serving sections share
    one build (the flagship model costs minutes of XLA compile cold)."""
    if (batch, n) in _CF_MODEL_CACHE:
        return _CF_MODEL_CACHE[(batch, n)]
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

    out = (model, variables, step, cloud, logits)
    _CF_MODEL_CACHE[(batch, n)] = out
    return out


def bench_counterfactual(batch=16, n=2048):
    """Full counterfactual decode (encode -> interpolate -> decode) at the
    reference flagship shapes: w_dim 1024 = 256 codes x 4, transformer 512.
    This is the B=16 parity point only; the throughput-oriented B=64 and
    serving-layer points are a separate (skippable) section."""
    _progress('counterfactual: build + init')
    import jax

    _, _, step, cloud, logits = _build_cf_model(batch, n)
    _progress('counterfactual: b16 parity point')
    dt, spread = _median_scan_time(
        step, (jax.numpy.asarray(cloud), jax.numpy.asarray(logits)), k_short=1, k_long=9
    )
    return {
        'counterfactual_samples_per_s': batch / dt,
        'counterfactual_batch_ms': dt * 1e3,
        'counterfactual_vs_baseline': batch / dt / A100_EST_CF_SAMPLES_PER_S,
        'counterfactual_spread': spread,
    }


def bench_serving(batch=16, n=2048, big=64, engine=True):
    """Throughput-oriented serving points: raw B=64 decode (amortises the
    per-call issue-bound kernel portions), the serving engine end-to-end
    (bucketed jit cache + host pad/unpad + device_get), and the async
    pipelined mode (depth-3 in flight so host transfer overlaps device
    compute — the engine's intended steady state).  ``engine=False`` stops
    after the raw point (the CPU verify path: the engine itself is covered
    by tests/test_serve.py and its CPU compile is minutes-slow)."""
    import time as _time

    import jax

    model, variables, step, _, _ = _build_cf_model(batch, n)
    rng = np.random.default_rng(1)
    out = {}
    _progress(f'serving: b{big} raw point')
    cloud_b = rng.standard_normal((big, n, 3)).astype(np.float32) / 2
    logits_b = rng.standard_normal((big, 2)).astype(np.float32)
    dt_b, _ = _median_scan_time(
        step, (jax.numpy.asarray(cloud_b), jax.numpy.asarray(logits_b)), k_short=1, k_long=5
    )
    out['counterfactual_b64_samples_per_s'] = big / dt_b
    if not engine:
        return out

    try:
        _progress('serving: engine + pipelined')
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
        if tag == 'eval' and not _BUDGET.allow('auction:eval', 60):
            out['auction_eval_skipped'] = 'budget'
            continue
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
    _progress('train step: measuring')
    samples = []
    for _ in range(_BUDGET.reps()):
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


def _emit(results: dict, sections_done: list[str], final: bool = False) -> None:
    """Print the full summary-so-far as one JSON line on stdout.

    Every line is a complete record with the same schema, so whichever line
    a driver parses (first, last, or the last one before a kill) is valid."""
    value = results.get('chamfer_emd_pairs_per_s', 0.0)
    line = {
        'metric': 'chamfer_emd_pairs_per_sec_per_chip_2048pts_fwd_bwd',
        'value': round(value, 1),
        'unit': 'pairs/s',
        'vs_baseline': round(value / A100_EST_PAIRS_PER_S, 3),
        'sections_done': ','.join(sections_done),
        'elapsed_s': round(time.time() - _T0, 1),
        **{k: round(v, 2) if isinstance(v, float) else v for k, v in results.items()},
    }
    if not final:
        line['partial'] = True
    print(json.dumps(line), flush=True)


def main() -> None:
    # Fail (with a parseable line) if the TPU tunnel is wedged: a direct
    # jax.devices() in that state hangs forever (the axon plugin retries
    # indefinitely), so probe device init in a disposable subprocess first.
    # The tunnel occasionally flaps, so retry the probe a few times with
    # spacing before giving up (healthy init is well under a minute).
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

    # persistent compilation cache: the flagship counterfactual model alone
    # cost ~650 s of XLA compile in BENCH_r04; cache across runs so the
    # driver's official run rides a warm cache
    import jax

    jax.config.update('jax_compilation_cache_dir', str(_REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    results: dict = {}
    done: list[str] = []

    # 1. headline loss kernel (never skipped; its own internal fallbacks)
    try:
        results.update(bench_loss_headline())
    except Exception as e:
        results['headline_error'] = str(e)[:300]
    done.append('headline')
    _emit(results, done)

    # 2. counterfactual B=16 parity point (with jnp last-resort retry: the
    # path crosses the fused PCGen / transformer-stack / kNN / pool kernels,
    # any of which could regress in Mosaic independently of the loss kernels)
    if _BUDGET.allow('counterfactual', 150):
        try:
            results.update(bench_counterfactual())
        except Exception as e:
            results['counterfactual_error'] = str(e)[:200]
            from pccf.kernels import api as _kapi

            try:
                with _kapi.force_backend('jnp'):
                    results.update(bench_counterfactual())
                results['counterfactual_backend'] = 'jnp-fallback'
            except Exception as e2:
                results['counterfactual_jnp_error'] = str(e2)[:200]
        done.append('counterfactual')
        _emit(results, done)
    else:
        results['counterfactual_skipped'] = 'budget'

    # 3. train step
    if _BUDGET.allow('train_step', 180):
        try:
            results.update(bench_train_step())
        except Exception as e:
            results['train_step_error'] = str(e)[:200]
        done.append('train_step')
        _emit(results, done)
    else:
        results['train_step_skipped'] = 'budget'

    # 4. serving points (B=64 + engine + pipelined)
    if _BUDGET.allow('serving', 150):
        try:
            results.update(bench_serving())
        except Exception as e:
            results['serving_error'] = str(e)[:200]
        done.append('serving')
        _emit(results, done)
    else:
        results['serving_skipped'] = 'budget'

    # 5. loss extras (per-kernel budget gates inside)
    try:
        results.update(bench_loss_extras())
    except Exception as e:
        results['loss_extras_error'] = str(e)[:200]
    done.append('loss_extras')
    _emit(results, done)

    # 6. auction EMD
    if _BUDGET.allow('auction', 60):
        try:
            results.update(bench_auction())
        except Exception as e:
            results['auction_error'] = str(e)[:200]
        done.append('auction')
    else:
        results['auction_skipped'] = 'budget'

    _emit(results, done, final=True)
    if 'chamfer_emd_pairs_per_s' not in results:
        # the headline (with all three internal fallbacks) failed: the final
        # line above still carries every completed section plus the error,
        # but the exit code must flag the run as degraded
        raise SystemExit(1)


if __name__ == '__main__':
    main()
