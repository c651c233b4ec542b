"""bench.main() orchestration: incremental per-section JSON emission, the
headline's fused -> two-launch -> jnp fallback ladder, the counterfactual
jnp retry, the wall-clock budget gates, and the degraded exit code.

Stubs replace the heavy bench functions; only the orchestration logic is
under test (the real kernel paths are covered by tests/test_kernels_*.py
and the on-chip suite).  Round 4 context: BENCH_r04 died rc=124 with zero
parsed output because the old main() printed one line at the very end —
these tests pin the every-line-is-a-complete-record contract that fixes it.
"""

import json
import os
import subprocess
import types

from pccf.kernels import api as kapi

import pytest

bench = pytest.importorskip('bench')


@pytest.fixture()
def probe_ok(monkeypatch):
    """Make the device-init subprocess probe succeed without touching jax."""
    monkeypatch.setattr(
        subprocess, 'run', lambda *a, **k: types.SimpleNamespace(returncode=0)
    )


@pytest.fixture()
def fresh_budget(monkeypatch):
    """Reset the module-level budget clock (set at import time) so a long
    pytest session can't drain it before main() runs."""
    import time as _time

    monkeypatch.setattr(bench, '_T0', _time.time())
    monkeypatch.setattr(bench, '_BUDGET', bench._Budget())


def _stub_extras(monkeypatch):
    monkeypatch.setattr(bench, 'bench_train_step', lambda: {})
    monkeypatch.setattr(bench, 'bench_auction', lambda: {})
    monkeypatch.setattr(bench, 'bench_serving', lambda: {})
    monkeypatch.setattr(bench, 'bench_loss_extras', lambda: {})


def _run_main(capsys):
    bench.main()
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines() if ln]
    # every emitted line is a complete record: same schema, always parseable
    for ln in lines:
        assert ln['metric'] == 'chamfer_emd_pairs_per_sec_per_chip_2048pts_fwd_bwd'
        assert 'value' in ln and 'vs_baseline' in ln
    # exactly the last line is the non-partial summary
    assert all(ln.get('partial') for ln in lines[:-1])
    assert 'partial' not in lines[-1]
    return lines


def test_cf_falls_back_to_jnp(monkeypatch, capsys, probe_ok, fresh_budget):
    calls = []

    def fake_cf():
        calls.append(('cf', kapi._FORCED_BACKEND.get() or 'auto'))
        if kapi._FORCED_BACKEND.get() != 'jnp':
            raise RuntimeError('cf boom')
        return {
            'counterfactual_samples_per_s': 10.0,
            'counterfactual_vs_baseline': 0.01,
        }

    monkeypatch.setattr(
        bench, 'bench_loss_headline', lambda: {'chamfer_emd_pairs_per_s': 100.0}
    )
    monkeypatch.setattr(bench, 'bench_counterfactual', fake_cf)
    _stub_extras(monkeypatch)

    line = _run_main(capsys)[-1]
    assert line['value'] == 100.0
    assert line['counterfactual_backend'] == 'jnp-fallback'
    assert 'cf boom' in line['counterfactual_error']
    assert line['counterfactual_samples_per_s'] == 10.0
    # the pin is scoped: neither the env var nor the thread override leaks
    assert os.environ.get('PCCF_KERNEL_BACKEND') is None
    assert kapi._FORCED_BACKEND.get() is None
    assert calls == [('cf', 'auto'), ('cf', 'jnp')]


def test_headline_fallback_ladder(monkeypatch, probe_ok, fresh_budget):
    """fused -> 2launch -> jnp inside bench_loss_headline itself."""
    attempts = []

    def fake_median(step_fn, args, **kw):
        attempts.append(kapi._FORCED_BACKEND.get() or 'auto')
        if kapi._FORCED_BACKEND.get() != 'jnp':
            raise RuntimeError('mosaic boom')
        return 0.08, 0.01

    monkeypatch.setattr(bench, '_median_scan_time', fake_median)
    r = bench.bench_loss_headline()
    assert attempts == ['auto', 'auto', 'jnp']  # fused, 2launch, golden
    assert r['loss_backend'] == 'jnp-fallback'
    assert 'mosaic boom' in r['chamfer_emd_error']
    assert 'mosaic boom' in r['chamfer_emd_2launch_error']
    assert r['chamfer_emd_pairs_per_s'] == pytest.approx(8 / 0.08)
    assert kapi._FORCED_BACKEND.get() is None


def test_no_fallback_when_pallas_succeeds(monkeypatch, capsys, probe_ok, fresh_budget):
    monkeypatch.setattr(
        bench, 'bench_loss_headline', lambda: {'chamfer_emd_pairs_per_s': 200.0}
    )
    monkeypatch.setattr(
        bench, 'bench_counterfactual', lambda: {'counterfactual_samples_per_s': 20.0}
    )
    _stub_extras(monkeypatch)

    line = _run_main(capsys)[-1]
    assert line['value'] == 200.0
    assert 'loss_backend' not in line
    assert 'counterfactual_backend' not in line


def test_incremental_emission_survives_late_kill(monkeypatch, capsys, probe_ok, fresh_budget):
    """A driver kill after the counterfactual section must leave a parseable
    record with the headline AND counterfactual numbers: the line emitted
    after each section already carries everything measured so far."""
    monkeypatch.setattr(
        bench, 'bench_loss_headline', lambda: {'chamfer_emd_pairs_per_s': 300.0}
    )
    monkeypatch.setattr(
        bench, 'bench_counterfactual', lambda: {'counterfactual_samples_per_s': 30.0}
    )
    _stub_extras(monkeypatch)

    lines = _run_main(capsys)
    # line 1 (post-headline): full record with the headline value
    assert lines[0]['value'] == 300.0
    assert lines[0]['sections_done'] == 'headline'
    # line 2 (post-counterfactual): headline retained, cf number added
    assert lines[1]['value'] == 300.0
    assert lines[1]['counterfactual_samples_per_s'] == 30.0
    assert len(lines) >= 3


def test_budget_skips_extras_keeps_headline(monkeypatch, capsys, probe_ok, fresh_budget):
    """With the budget already drained, every gated section is skipped (and
    marked) but the headline still runs and the final line is emitted."""
    monkeypatch.setattr(
        bench, 'bench_loss_headline', lambda: {'chamfer_emd_pairs_per_s': 400.0}
    )
    called = []
    monkeypatch.setattr(
        bench, 'bench_counterfactual', lambda: called.append('cf') or {}
    )
    _stub_extras(monkeypatch)
    monkeypatch.setattr(bench._BUDGET, 'total', 0.0)

    line = _run_main(capsys)[-1]
    assert line['value'] == 400.0
    assert called == []
    assert line['counterfactual_skipped'] == 'budget'
    assert line['train_step_skipped'] == 'budget'
    assert line['serving_skipped'] == 'budget'
    assert line['auction_skipped'] == 'budget'


def test_headline_failure_exits_nonzero_with_record(monkeypatch, capsys, probe_ok, fresh_budget):
    def boom():
        raise RuntimeError('broken everywhere')

    monkeypatch.setattr(bench, 'bench_loss_headline', boom)
    monkeypatch.setattr(bench, 'bench_counterfactual', lambda: {})
    _stub_extras(monkeypatch)

    with pytest.raises(SystemExit):
        bench.main()
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines() if ln]
    assert lines[-1]['value'] == 0.0
    assert 'broken everywhere' in lines[-1]['headline_error']
    assert os.environ.get('PCCF_KERNEL_BACKEND') is None
    assert kapi._FORCED_BACKEND.get() is None


def test_budget_reps_degrade(monkeypatch, fresh_budget):
    monkeypatch.delenv('PCCF_BENCH_REPS', raising=False)
    b = bench._Budget()
    b.total = 1e9
    assert b.reps() == 5
    import time as _time

    monkeypatch.setattr(bench, '_T0', _time.time())
    b.total = 400.0
    assert b.reps() == 3
    b.total = 100.0
    assert b.reps() == 1
    monkeypatch.setenv('PCCF_BENCH_REPS', '2')
    assert bench._Budget().reps() == 2


def test_marginal_scan_time_raises_on_nonpositive(monkeypatch):
    """Tunnel jitter making the short scan slower than the long one must
    raise, not clamp to 1e-9 (which fabricated ~1e9 pairs/s as the official
    record)."""
    import itertools
    import time as _time

    # constant clock -> zero marginal on every attempt
    monkeypatch.setattr(_time, 'time', itertools.count(0).__next__)
    monkeypatch.setattr(bench.time, 'time', lambda: 0.0)
    with pytest.raises(RuntimeError, match='non-positive marginal'):
        bench._marginal_scan_time(lambda c: c, (__import__('jax').numpy.ones(4),))
