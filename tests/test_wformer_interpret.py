"""Fused inner-CVAE transformer-stack kernels vs the XLA layer path.

Interpret-mode Pallas (CPU): covers weight packing, the layer/head
fori_loops, FF-width zero padding, and cross-attention wiring; the Mosaic
lowering is covered on-chip by test_kernels_tpu.py.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pccf.nn.layers import gelu_exact


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call', functools.partial(orig, interpret=True))
    yield
    jax.clear_caches()


def _backend(monkeypatch, name):
    monkeypatch.setenv('PCCF_KERNEL_BACKEND', name)


class TestWEncoderFused:
    def test_encoder_stack_matches_xla(self, interpret_pallas, monkeypatch):
        from pccf.kernels.pallas_wformer import wformer_supported
        from pccf.nn.w_networks import TransformerWEncoder

        t, d, heads = 256, 128, 2
        mlp_dims = (256, 128)  # mixed widths: exercises FF zero-padding
        assert wformer_supported(t, d, max(mlp_dims), len(mlp_dims), heads)
        enc = TransformerWEncoder(
            z1_dim=8, n_codes=t, proj_dim=d, n_heads=heads,
            mlp_dims=mlp_dims, dropout_rates=(0.0, 0.0), act=gelu_exact,
        )
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, t, 4)).astype(np.float32))
        variables = enc.init(jax.random.key(0), x, train=False)

        _backend(monkeypatch, 'pallas')
        fused = np.asarray(enc.apply(variables, x, train=False))
        _backend(monkeypatch, 'jnp')
        slow = np.asarray(enc.apply(variables, x, train=False))
        np.testing.assert_allclose(fused, slow, atol=2e-2)
        # soft-init head keeps outputs tiny; check relative agreement upstream
        assert np.abs(fused - slow).max() < 0.05 * max(np.abs(slow).max(), 1e-3) + 2e-2

    def test_conditional_encoder_matches_xla(self, interpret_pallas, monkeypatch):
        from pccf.nn.w_networks import TransformerWConditionalEncoder

        t, d, heads = 128, 128, 4
        enc = TransformerWConditionalEncoder(
            z2_dim=8, n_codes=t, proj_dim=d, n_heads=heads,
            mlp_dims=(192,), dropout_rates=(0.0,), act=gelu_exact,
        )
        rng = np.random.default_rng(1)
        probs = jax.nn.softmax(jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32)))
        x = jnp.asarray(rng.standard_normal((2, t, 4)).astype(np.float32))
        variables = enc.init(jax.random.key(0), probs, x, train=False)

        _backend(monkeypatch, 'pallas')
        fused = np.asarray(enc.apply(variables, probs, x, train=False))
        _backend(monkeypatch, 'jnp')
        slow = np.asarray(enc.apply(variables, probs, x, train=False))
        np.testing.assert_allclose(fused, slow, atol=2e-2)


class TestWDecoderFused:
    def test_decoder_stack_matches_xla(self, interpret_pallas, monkeypatch):
        from pccf.kernels.pallas_wformer import wformer_supported
        from pccf.nn.w_networks import TransformerWDecoder

        t, d, heads = 128, 128, 2
        mlp_dims = (256, 128)
        assert wformer_supported(t, d, max(mlp_dims), len(mlp_dims), heads)
        dec = TransformerWDecoder(
            embedding_dim=4, n_codes=t, proj_dim=d,
            n_heads=heads, mlp_dims=mlp_dims, dropout_rates=(0.1, 0.1), act=gelu_exact,
        )
        rng = np.random.default_rng(2)
        z1 = jnp.asarray(rng.standard_normal((2, t, 8)).astype(np.float32))
        z2 = jnp.asarray(rng.standard_normal((2, t, 8)).astype(np.float32))
        variables = dec.init(jax.random.key(0), z1, z2, train=False)

        _backend(monkeypatch, 'pallas')
        fused = np.asarray(dec.apply(variables, z1, z2, train=False))
        _backend(monkeypatch, 'jnp')
        slow = np.asarray(dec.apply(variables, z1, z2, train=False))
        np.testing.assert_allclose(fused, slow, atol=2e-2)

    def test_broadcast_z1_memory(self, interpret_pallas, monkeypatch):
        """Unconditional-prior path: z1 is (B, 1, z1) broadcast over codes."""
        from pccf.nn.w_networks import TransformerWDecoder

        t, d = 128, 128
        dec = TransformerWDecoder(
            embedding_dim=4, n_codes=t, proj_dim=d,
            n_heads=2, mlp_dims=(128,), dropout_rates=(0.0,), act=gelu_exact,
        )
        rng = np.random.default_rng(3)
        z1 = jnp.asarray(rng.standard_normal((2, 1, 8)).astype(np.float32))
        z2 = jnp.asarray(rng.standard_normal((2, t, 8)).astype(np.float32))
        variables = dec.init(jax.random.key(0), z1, z2, train=False)
        _backend(monkeypatch, 'pallas')
        fused = np.asarray(dec.apply(variables, z1, z2, train=False))
        _backend(monkeypatch, 'jnp')
        slow = np.asarray(dec.apply(variables, z1, z2, train=False))
        np.testing.assert_allclose(fused, slow, atol=2e-2)


class TestDispatchGates:
    def test_flagship_dims_supported(self):
        from pccf.kernels.pallas_wformer import wformer_supported

        # flagship: 256 codes x 512 dims, 8 heads; encoder 2 layers ff 1024,
        # decoder 4 layers ff [1024,1024,1024,512]
        assert wformer_supported(256, 512, 1024, 2, 8)
        assert wformer_supported(256, 512, 1024, 4, 8)

    def test_flagship_config_stays_fused_eligible(self):
        """Regression guard: the shipped flagship config must dispatch the
        fused transformer stacks on all three inner-CVAE networks."""
        from pccf.config import get_config_all
        from pccf.data.protocols import Singleton
        from pccf.kernels.pallas_wformer import wformer_supported

        Singleton.reset_all()
        cfg = get_config_all([])
        n_codes = cfg.autoencoder.model.n_codes
        wae = cfg.w_autoencoder.model
        for net in (wae.w_encoder, wae.w_decoder, wae.conditional_w_encoder):
            assert net.act_cls is gelu_exact, net
            assert wformer_supported(
                n_codes, net.proj_dim, max(net.mlp_dims), len(net.mlp_dims), net.n_heads
            ), net

    def test_unsupported_dims_keep_xla_path(self, monkeypatch):
        from pccf.kernels.pallas_wformer import wformer_supported
        from pccf.nn.w_networks import TransformerWEncoder

        assert not wformer_supported(100, 512, 1024, 2, 8)  # tokens not 128-aligned
        assert not wformer_supported(256, 96, 1024, 2, 8)  # dims not 128-aligned
        # tiny-config module (proj 16) must run the XLA path even with the
        # pallas backend forced: no pallas_call may be issued
        enc = TransformerWEncoder(
            z1_dim=4, n_codes=16, proj_dim=16, n_heads=2,
            mlp_dims=(16,), dropout_rates=(0.0,), act=gelu_exact,
        )
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((2, 16, 4)).astype(np.float32))
        variables = enc.init(jax.random.key(0), x, train=False)
        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'pallas')
        out = enc.apply(variables, x, train=False)  # would fail to lower on CPU if fused
        assert np.isfinite(np.asarray(out)).all()


class TestPackedCache:
    """Serving prepack: the 'packed' variable collection caches the fused
    stack operands so later calls skip the per-call weight repacking."""

    def _encoder(self):
        from pccf.nn.w_networks import TransformerWEncoder

        return TransformerWEncoder(
            z1_dim=8, n_codes=256, proj_dim=128, n_heads=2,
            mlp_dims=(256, 128), dropout_rates=(0.0, 0.0), act=gelu_exact,
        )

    def test_prepack_roundtrip_skips_repacking(self, interpret_pallas, monkeypatch):
        import pccf.kernels.pallas_wformer as wf

        enc = self._encoder()
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 256, 4)).astype(np.float32))
        variables = enc.init(jax.random.key(0), x, train=False)

        _backend(monkeypatch, 'pallas')
        out1, mutated = enc.apply(variables, x, train=False, mutable=['packed'])
        assert 'stack' in dict(mutated)['packed']

        calls = []
        orig = wf.pack_encoder_params
        monkeypatch.setattr(
            wf, 'pack_encoder_params', lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
        )
        vars_packed = {**dict(variables), 'packed': dict(mutated)['packed']}
        out2 = enc.apply(vars_packed, x, train=False)
        assert not calls, 'packed collection present but params were repacked'
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    def test_without_mutable_nothing_is_written(self, interpret_pallas, monkeypatch):
        enc = self._encoder()
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((2, 256, 4)).astype(np.float32))
        variables = enc.init(jax.random.key(0), x, train=False)
        _backend(monkeypatch, 'pallas')
        out = enc.apply(variables, x, train=False)  # plain apply: inline pack
        assert np.isfinite(np.asarray(out)).all()


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])
