"""Counterfactual flip-rate regression test (opt-in: PCCF_TEST_SLOW=1).

Trains the conditional W-AE at micro scale with the exact stage-2 objective
and asserts ``generate_counterfactual`` steers decodes to the target class
well above chance (reference capability: src/module/w_autoencoders.py:247-262
+ evaluate_counterfactuals.py Counterfeit_to_j suites).  ~5 min on CPU, so
gated like the TPU suite; tools/flip_probe.py is the interactive version.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get('PCCF_TEST_SLOW', '0') != '1',
    reason='set PCCF_TEST_SLOW=1 (trains ~400 micro-epochs, ~3 min CPU)',
)


def test_counterfactuals_flip_above_chance():
    from tools.flip_probe import run

    result = run(epochs=400, beta_z1=1.0, beta_z2=4.0, quiet=True)
    assert result['flip_rate'] >= 0.9, result
