"""bench.main() last-resort jnp fallback: a Mosaic regression in the Pallas
kernels must degrade the driver bench to the golden-backend numbers (marked
as such) instead of recording 0.0.

Stubs replace the heavy bench functions; only the orchestration logic in
``bench.main`` is under test (the real kernel paths are covered by
tests/test_kernels_*.py and the on-chip suite).
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


def _stub_extras(monkeypatch):
    monkeypatch.setattr(bench, 'bench_train_step', lambda: {})
    monkeypatch.setattr(bench, 'bench_auction', lambda: {})


def _run_main(capsys):
    bench.main()
    return json.loads(capsys.readouterr().out)


def test_loss_and_cf_fall_back_to_jnp(monkeypatch, capsys, probe_ok):
    calls = []

    def fake_loss():
        calls.append(('loss', kapi._FORCED_BACKEND.get() or 'auto'))
        if kapi._FORCED_BACKEND.get() != 'jnp':
            raise RuntimeError('mosaic boom')
        return {'chamfer_emd_pairs_per_s': 100.0, 'chamfer_emd_ms_per_batch': 80.0}

    def fake_cf():
        calls.append(('cf', kapi._FORCED_BACKEND.get() or 'auto'))
        if kapi._FORCED_BACKEND.get() != 'jnp':
            raise RuntimeError('cf boom')
        return {
            'counterfactual_samples_per_s': 10.0,
            'counterfactual_vs_baseline': 0.01,
            'serve_b64_samples_per_s': 5.0,
        }

    monkeypatch.setattr(bench, 'bench_loss_kernels', fake_loss)
    monkeypatch.setattr(bench, 'bench_counterfactual', fake_cf)
    _stub_extras(monkeypatch)

    line = _run_main(capsys)
    assert line['value'] == 100.0
    assert line['loss_backend'] == 'jnp-fallback'
    assert 'mosaic boom' in line['pallas_error']
    assert line['counterfactual_backend'] == 'jnp-fallback'
    assert 'cf boom' in line['counterfactual_error']
    # counterfactual_* keys keep their names; non-cf extras are marked _jnp
    assert line['counterfactual_samples_per_s'] == 10.0
    assert 'serve_b64_samples_per_s_jnp' in line
    # the pin is scoped: neither the env var nor the thread override leaks
    assert os.environ.get('PCCF_KERNEL_BACKEND') is None
    assert kapi._FORCED_BACKEND.get() is None
    assert calls == [('loss', 'auto'), ('loss', 'jnp'), ('cf', 'auto'), ('cf', 'jnp')]


def test_no_fallback_when_pallas_succeeds(monkeypatch, capsys, probe_ok):
    monkeypatch.setattr(
        bench, 'bench_loss_kernels', lambda: {'chamfer_emd_pairs_per_s': 200.0}
    )
    monkeypatch.setattr(
        bench, 'bench_counterfactual', lambda: {'counterfactual_samples_per_s': 20.0}
    )
    _stub_extras(monkeypatch)

    line = _run_main(capsys)
    assert line['value'] == 200.0
    assert 'loss_backend' not in line
    assert 'pallas_error' not in line
    assert 'counterfactual_backend' not in line


def test_both_backends_failing_exits_with_record(monkeypatch, capsys, probe_ok):
    def boom():
        raise RuntimeError('broken everywhere')

    monkeypatch.setattr(bench, 'bench_loss_kernels', boom)
    _stub_extras(monkeypatch)

    with pytest.raises(SystemExit):
        bench.main()
    line = json.loads(capsys.readouterr().out)
    assert line['value'] == 0.0
    assert 'broken everywhere' in line['error']
    assert os.environ.get('PCCF_KERNEL_BACKEND') is None
    assert kapi._FORCED_BACKEND.get() is None


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
