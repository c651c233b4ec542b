"""Single-launch fused CVAE counterfactual kernel vs the XLA module chain.

Interpret-mode Pallas (CPU): covers the head folds (z1 -> memory, z2_proj +
conditional prior as a probs tensor, prob_proj row), the three chained
stacks, and the packed-operand cache contract.  The Mosaic lowering is
covered on-chip by test_kernels_tpu.py.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pccf.data.structures import WInputs
from pccf.nn.layers import gelu_exact


def _assert_norm_close(got, want, rel_l2=1e-2, rel_max=5e-2):
    """Norm-relative acceptance (see tests/test_kernels_tpu.py): the fused
    chain is ~20 bf16-in/f32-accumulate matmul stages deep, so absolute
    error scales with output energy — a flat atol fails on legitimate
    rounding at this depth."""
    scale = float(np.sqrt(np.mean(np.square(want)))) + 1e-12
    l2 = float(np.linalg.norm(got - want)) / (float(np.linalg.norm(want)) + 1e-12)
    assert l2 <= rel_l2, f'rel L2 {l2:.3e} > {rel_l2}'
    mx = float(np.abs(got - want).max())
    assert mx <= rel_max * scale, f'max {mx:.3e} > {rel_max} * rms {scale:.3e}'


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call', functools.partial(orig, interpret=True))
    yield
    jax.clear_caches()


def _make_wae(n_pseudo_inputs=0, t=128, d=128, z1=8, z2=6, n_classes=3):
    from pccf.models.w_autoencoders import WAutoEncoder
    from pccf.nn.w_networks import (
        ConditionalPrior,
        TransformerWConditionalEncoder,
        TransformerWDecoder,
        TransformerWEncoder,
    )

    return WAutoEncoder(
        encoder=TransformerWEncoder(
            z1_dim=z1, n_codes=t, proj_dim=d, n_heads=2,
            mlp_dims=(256, 128), dropout_rates=(0.0, 0.0), act=gelu_exact,
        ),
        decoder=TransformerWDecoder(
            embedding_dim=4, n_codes=t, proj_dim=d, n_heads=4,
            mlp_dims=(128,), dropout_rates=(0.0,), act=gelu_exact,
        ),
        z2_prior=ConditionalPrior(n_codes=t, z2_dim=z2),
        z2_posterior=TransformerWConditionalEncoder(
            z2_dim=z2, n_codes=t, proj_dim=d, n_heads=2,
            mlp_dims=(256,), dropout_rates=(0.0,), act=gelu_exact,
        ),
        n_codes=t, embedding_dim=4, book_size=8,
        z1_dim=z1, z2_dim=z2, n_classes=n_classes,
        n_pseudo_inputs=n_pseudo_inputs, conditional=True,
    )


def _init(wae, t, n_classes, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    w_q = jnp.asarray(rng.standard_normal((batch, t * 4)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((batch, n_classes)).astype(np.float32))
    codebook = jnp.asarray(rng.standard_normal((t, 8, 4)).astype(np.float32))
    variables = wae.init(
        {'params': jax.random.key(0), 'sampling': jax.random.key(1)},
        WInputs(w_q, logits), codebook, train=False,
    )
    return variables, WInputs(w_q, logits), codebook


def _cf(wae, variables, inputs, codebook, mutable=False):
    kwargs = {'mutable': ['packed']} if mutable else {}
    return wae.apply(
        variables, inputs, codebook, 1, 0.7,
        method='generate_counterfactual', **kwargs,
    )


class TestFusedCVAE:
    def test_matches_xla_chain(self, interpret_pallas, monkeypatch):
        t, n_classes = 128, 3
        wae = _make_wae(t=t, n_classes=n_classes)
        variables, inputs, codebook = _init(wae, t, n_classes)

        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'pallas')
        fused = _cf(wae, variables, inputs, codebook)
        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'jnp')
        slow = _cf(wae, variables, inputs, codebook)

        f, s = np.asarray(fused.w_recon), np.asarray(slow.w_recon)
        _assert_norm_close(f, s)
        np.testing.assert_allclose(
            np.asarray(fused.probs), np.asarray(slow.probs), rtol=1e-6
        )

    def test_pseudo_inputs_do_not_gate(self, interpret_pallas, monkeypatch):
        """VampPrior pseudo-input rows are split off unused by the CF path;
        the fused kernel must stay active and agree with the XLA chain."""
        t, n_classes = 128, 3
        wae = _make_wae(n_pseudo_inputs=2, t=t, n_classes=n_classes)
        variables, inputs, codebook = _init(wae, t, n_classes, seed=1)

        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'pallas')
        fused = _cf(wae, variables, inputs, codebook)
        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'jnp')
        slow = _cf(wae, variables, inputs, codebook)
        _assert_norm_close(np.asarray(fused.w_recon), np.asarray(slow.w_recon))

    def test_packed_cache_roundtrip(self, interpret_pallas, monkeypatch):
        """mutable=['packed'] captures the operands; replaying with the cache
        gives identical outputs (the serving prepack contract)."""
        t, n_classes = 128, 3
        wae = _make_wae(t=t, n_classes=n_classes)
        variables, inputs, codebook = _init(wae, t, n_classes, seed=2)

        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'pallas')
        out1, mutated = _cf(wae, variables, inputs, codebook, mutable=True)
        packed = dict(mutated)['packed']
        assert 'cvae_cf' in packed
        out2 = _cf(wae, {**variables, 'packed': packed}, inputs, codebook)
        np.testing.assert_array_equal(
            np.asarray(out1.w_recon), np.asarray(out2.w_recon)
        )

    def test_gate_rejects_mismatched_proj_dim(self):
        from pccf.models.w_autoencoders import WAutoEncoder
        from pccf.nn.w_networks import (
            ConditionalPrior,
            TransformerWConditionalEncoder,
            TransformerWDecoder,
            TransformerWEncoder,
        )

        wae = WAutoEncoder(
            encoder=TransformerWEncoder(
                z1_dim=8, n_codes=128, proj_dim=256, n_heads=2,
                mlp_dims=(256,), dropout_rates=(0.0,), act=gelu_exact,
            ),
            decoder=TransformerWDecoder(
                embedding_dim=4, n_codes=128, proj_dim=128, n_heads=4,
                mlp_dims=(128,), dropout_rates=(0.0,), act=gelu_exact,
            ),
            z2_prior=ConditionalPrior(n_codes=128, z2_dim=6),
            z2_posterior=TransformerWConditionalEncoder(
                z2_dim=6, n_codes=128, proj_dim=128, n_heads=2,
                mlp_dims=(256,), dropout_rates=(0.0,), act=gelu_exact,
            ),
            n_codes=128, embedding_dim=4, book_size=8,
            z1_dim=8, z2_dim=6, n_classes=3, conditional=True,
        )
        variables, inputs, codebook = _init(wae, 128, 3, seed=3)
        # jnp backend on CPU: gate must reject (proj_dim mismatch) without
        # error and the XLA chain must still run
        out = _cf(wae, variables, inputs, codebook)
        assert out.w_recon.shape == (2, 128 * 4)
