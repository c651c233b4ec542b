"""On-chip Pallas-vs-golden parity tests.

Run with ``PCCF_TEST_TPU=1 python -m pytest tests/test_kernels_tpu.py`` on a
machine with a TPU attached; skipped on the CPU test mesh.
"""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get('PCCF_TEST_TPU', '0') != '1', reason='set PCCF_TEST_TPU=1 with TPU attached'
)


@requires_tpu
class TestPallasParity:
    def setup_method(self):
        import jax
        import jax.numpy as jnp

        assert jax.default_backend() != 'cpu'
        rng = np.random.default_rng(0)
        self.x = jnp.asarray(rng.standard_normal((2, 512, 3)).astype(np.float32))
        self.y = jnp.asarray(rng.standard_normal((2, 512, 3)).astype(np.float32))

    def test_nn_distance(self):
        from pccf.kernels import ops
        from pccf.kernels.pallas_chamfer import nn_distance_tpu

        d1, i1, d2, i2 = nn_distance_tpu(self.x, self.y)
        d1r, i1r, d2r, i2r = ops.nn_distance(self.x, self.y)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d1r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d2r), atol=1e-4)
        assert (np.asarray(i1) != np.asarray(i1r)).sum() == 0
        assert (np.asarray(i2) != np.asarray(i2r)).sum() == 0

    def test_chamfer_grads(self):
        import jax
        import jax.numpy as jnp

        from pccf.kernels import ops
        from pccf.kernels.pallas_chamfer import chamfer_tpu

        g1r, g2r = jax.grad(lambda a, b: jnp.sum(ops.chamfer(a, b)), argnums=(0, 1))(self.x, self.y)
        g1t, g2t = jax.grad(lambda a, b: jnp.sum(chamfer_tpu(a, b)), argnums=(0, 1))(self.x, self.y)
        np.testing.assert_allclose(np.asarray(g1t), np.asarray(g1r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g2t), np.asarray(g2r), atol=1e-5)

    def test_emd_cost_and_grads(self):
        import jax
        import jax.numpy as jnp

        from pccf.kernels import ops
        from pccf.kernels.pallas_emd import match_cost_tpu

        xs, ys = self.x / 2, self.y / 2  # 512 pts: one full kernel tile
        # the Pallas kernel computes d2 by coordinate expansion (like the CUDA
        # reference); the golden jnp uses the matmul identity — coarse
        # relaxation levels amplify the f32 difference, hence the tolerance
        np.testing.assert_allclose(
            np.asarray(match_cost_tpu(xs, ys)), np.asarray(ops.match_cost(xs, ys)), rtol=5e-4
        )
        g1r, g2r = jax.grad(lambda a, b: jnp.sum(ops.match_cost(a, b)), argnums=(0, 1))(xs, ys)
        g1t, g2t = jax.grad(lambda a, b: jnp.sum(match_cost_tpu(a, b)), argnums=(0, 1))(xs, ys)
        np.testing.assert_allclose(np.asarray(g1t), np.asarray(g1r), atol=5e-3)
        np.testing.assert_allclose(np.asarray(g2t), np.asarray(g2r), atol=5e-3)

    def test_chamfer_emd_fused(self):
        """The fused ChamferEMD launch: chamfer outputs bit-match nn_distance,
        EMD matches the standalone kernel, combined grads match the goldens."""
        import jax
        import jax.numpy as jnp

        from pccf.kernels import ops
        from pccf.kernels.pallas_emd import _emd_chamfer_forward, chamfer_match_cost_tpu

        xs, ys = self.x / 2, self.y / 2
        cham, emd = chamfer_match_cost_tpu(xs, ys)
        np.testing.assert_allclose(
            np.asarray(cham), np.asarray(ops.chamfer(xs, ys)), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(emd), np.asarray(ops.match_cost(xs, ys)), rtol=5e-4)
        _, _, _, d1, i1, d2, i2 = _emd_chamfer_forward(xs, ys)
        d1r, i1r, d2r, i2r = ops.nn_distance(xs, ys)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d1r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d2r), atol=1e-4)
        assert (np.asarray(i1) != np.asarray(i1r)).sum() == 0
        assert (np.asarray(i2) != np.asarray(i2r)).sum() == 0

        def fused(a, b):
            c, e = chamfer_match_cost_tpu(a, b)
            return jnp.sum(c) + jnp.sum(e)

        def golden(a, b):
            return jnp.sum(ops.chamfer(a, b)) + jnp.sum(ops.match_cost(a, b))

        gt = jax.grad(fused, argnums=(0, 1))(xs, ys)
        gr = jax.grad(golden, argnums=(0, 1))(xs, ys)
        for t, r in zip(gt, gr):
            np.testing.assert_allclose(np.asarray(t), np.asarray(r), atol=5e-3)

    def test_chamfer_emd_fused_rectangular_sum(self):
        """n != m (asymmetric marginals + 1/n-vs-1/m grad split) with the
        'sum' reduction, on silicon."""
        import jax
        import jax.numpy as jnp

        from pccf.kernels import ops
        from pccf.kernels.pallas_emd import chamfer_match_cost_tpu

        rng = np.random.default_rng(12)
        xs = jnp.asarray(rng.standard_normal((2, 512, 3)).astype(np.float32) / 2)
        ys = jnp.asarray(rng.standard_normal((2, 1024, 3)).astype(np.float32) / 2)
        cham, emd = chamfer_match_cost_tpu(xs, ys, 'sum')
        np.testing.assert_allclose(
            np.asarray(cham), np.asarray(ops.chamfer(xs, ys, reduction='sum')),
            rtol=1e-5, atol=1e-4,
        )
        np.testing.assert_allclose(np.asarray(emd), np.asarray(ops.match_cost(xs, ys)), rtol=5e-4)

        def fused(a, b):
            c, e = chamfer_match_cost_tpu(a, b, 'sum')
            return jnp.sum(c) + 0.5 * jnp.sum(e)

        def golden(a, b):
            return jnp.sum(ops.chamfer(a, b, reduction='sum')) + 0.5 * jnp.sum(
                ops.match_cost(a, b)
            )

        gt = jax.grad(fused, argnums=(0, 1))(xs, ys)
        gr = jax.grad(golden, argnums=(0, 1))(xs, ys)
        for t, r in zip(gt, gr):
            np.testing.assert_allclose(np.asarray(t), np.asarray(r), atol=1e-2)

    def test_graph_max_pool(self):
        import jax
        import jax.numpy as jnp

        from pccf.kernels import ops
        from pccf.kernels.pallas_gather import graph_max_pool_tpu

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 512, 64)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 512, (2, 512, 25)).astype(np.int32))
        out = graph_max_pool_tpu(x, idx)
        ref = ops.graph_max_pool(x, idx)
        assert (np.asarray(out) != np.asarray(ref)).sum() == 0  # bit-exact

        # backward: cotangent routed to the argmax rows (matches XLA max+gather)
        gt = jax.grad(lambda a: jnp.sum(graph_max_pool_tpu(a, idx) ** 2))(x)
        gr = jax.grad(lambda a: jnp.sum(ops.graph_max_pool(a, idx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gr), atol=1e-5)

    def test_graph_sum_pool(self):
        import jax
        import jax.numpy as jnp

        from pccf.kernels import ops
        from pccf.kernels.pallas_gather import graph_sum_pool_tpu

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((2, 512, 64)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 512, (2, 512, 25)).astype(np.int32))
        out = graph_sum_pool_tpu(x, idx)
        ref = ops.graph_sum_pool(x, idx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
        gt = jax.grad(lambda a: jnp.sum(graph_sum_pool_tpu(a, idx) ** 2))(x)
        gr = jax.grad(lambda a: jnp.sum(ops.graph_sum_pool(a, idx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gr), atol=1e-3)

    def test_knn_packed_extraction(self):
        import jax.numpy as jnp

        from pccf.kernels import ops
        from pccf.kernels.pallas_knn import knn_tpu

        idx = np.asarray(knn_tpu(self.x, 25))
        ref = np.asarray(ops.knn(self.x, 25))
        # neighbour SETS must agree (packed keys may reorder exact ties)
        for b in range(idx.shape[0]):
            for i in range(0, idx.shape[1], 17):
                assert set(idx[b, i]) == set(ref[b, i]), (b, i)

    def test_gather_neighbors(self):
        import jax
        import jax.numpy as jnp

        from pccf.kernels import ops
        from pccf.kernels.pallas_gather import gather_neighbors_tpu

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 512, 32)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 512, (2, 512, 4)).astype(np.int32))
        out = gather_neighbors_tpu(x, idx)
        ref = ops.gather_neighbors(x, idx)
        assert (np.asarray(out) != np.asarray(ref)).sum() == 0
        gt = jax.grad(lambda a: jnp.sum(gather_neighbors_tpu(a, idx) ** 2))(x)
        gr = jax.grad(lambda a: jnp.sum(ops.gather_neighbors(a, idx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gr), atol=1e-5)


@requires_tpu
class TestFusedPCGen:
    """Fused component-stack kernel vs the unfused XLA eval path.

    Both run bf16 MXU matmuls (XLA's default f32 precision on TPU), but the
    fused kernel folds BN into the weights before the bf16 round — tolerance
    covers that one extra rounding of the weight product."""

    def test_fused_matches_unfused(self, monkeypatch):
        import flax
        import jax
        import jax.numpy as jnp

        from pccf.nn.decoders import PCGenDecoder

        w_dim, n, b, g = 512, 512, 2, 4
        dec = PCGenDecoder(
            w_dim=w_dim, sample_dim=8, n_components=g, map_dims=(64,),
            conv_dims=(512, 256, 16), tau=5.0, act=jax.nn.relu, act_name='ReLU',
            filtering=False,
        )
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((b, w_dim)).astype(np.float32))
        samp = jnp.asarray(rng.standard_normal((b, n, 8)).astype(np.float32))
        variables = dec.init(
            {'params': jax.random.key(0), 'sampling': jax.random.key(1)}, w, n, samp, train=False
        )
        flat = flax.traverse_util.flatten_dict(variables['batch_stats'])
        for k, v in list(flat.items()):
            if k[-1] == 'mean':
                flat[k] = jnp.asarray(rng.normal(0, 0.05, v.shape).astype(np.float32))
            if k[-1] == 'var':
                flat[k] = jnp.asarray(rng.uniform(0.5, 1.5, v.shape).astype(np.float32))
        variables = dict(variables)
        variables['batch_stats'] = flax.traverse_util.unflatten_dict(flat)

        from pccf.kernels.pallas_pcgen import pcgen_fused_supported

        assert pcgen_fused_supported(n, w_dim, (512, 256, 16), g)
        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'pallas')
        out_fused = np.asarray(dec.apply(variables, w, n, samp, train=False))
        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'jnp')
        out_slow = np.asarray(dec.apply(variables, w, n, samp, train=False))
        np.testing.assert_allclose(out_fused, out_slow, atol=3e-3)


@requires_tpu
class TestModelForwardParity:
    """Full flagship-model forward on the real chip: Pallas backend vs the
    jnp golden backend (PCCF_KERNEL_BACKEND override) must agree — catches
    Mosaic regressions at the model level, not just per-kernel."""

    def test_counterfactual_vqvae_forward(self, monkeypatch):
        import jax

        import __graft_entry__ as graft
        from pccf.config import get_config_all
        from pccf.data.protocols import Singleton
        from pccf.data.structures import Inputs
        from pccf.models import get_autoencoder

        Singleton.reset_all()
        cfg = get_config_all(graft._tiny_overrides())
        model = get_autoencoder(cfg)
        cloud = np.random.default_rng(0).standard_normal((2, 256, 3)).astype(np.float32)
        inputs = Inputs(cloud=cloud)
        logits = np.zeros((2, 2), np.float32)
        rngs = {
            'params': jax.random.key(0),
            'sampling': jax.random.key(1),
            'dropout': jax.random.key(2),
        }
        variables = model.init(rngs, inputs, logits, method='full_init')

        def forward():
            out = model.apply(
                variables, inputs, train=False, rngs={'sampling': jax.random.key(3)}
            )
            return np.asarray(out.recon)

        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'pallas')
        recon_pallas = forward()
        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'jnp')
        recon_jnp = forward()
        assert recon_pallas.shape == (2, 256, 3)
        np.testing.assert_allclose(recon_pallas, recon_jnp, atol=2e-4)


@requires_tpu
class TestSinkhornOnChip:
    def test_cost_and_grads_match_golden(self):
        import jax
        import jax.numpy as jnp

        from pccf.kernels import ops
        from pccf.kernels.pallas_sinkhorn import sinkhorn_cost_tpu

        rng = np.random.default_rng(10)
        x = jnp.asarray(rng.random((2, 512, 3)).astype(np.float32))
        y = jnp.asarray(rng.random((2, 512, 3)).astype(np.float32))
        got = np.asarray(sinkhorn_cost_tpu(x, y))
        want = np.asarray(ops.sinkhorn_cost(x, y))
        np.testing.assert_allclose(got, want, rtol=2e-3)
        gt = jax.grad(lambda a, b: jnp.sum(sinkhorn_cost_tpu(a, b)), argnums=(0, 1))(x, y)
        gr = jax.grad(lambda a, b: jnp.sum(ops.sinkhorn_cost(a, b)), argnums=(0, 1))(x, y)
        for t, r in zip(gt, gr):
            np.testing.assert_allclose(np.asarray(t), np.asarray(r), atol=5e-3)

    def test_chamfer_sinkhorn_fused(self):
        import jax
        import jax.numpy as jnp

        from pccf.kernels import ops
        from pccf.kernels.pallas_sinkhorn import chamfer_sinkhorn_cost_tpu

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.random((2, 512, 3)).astype(np.float32))
        y = jnp.asarray(rng.random((2, 512, 3)).astype(np.float32))
        cham, sink = chamfer_sinkhorn_cost_tpu(x, y)
        np.testing.assert_allclose(
            np.asarray(cham), np.asarray(ops.chamfer(x, y)), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(sink), np.asarray(ops.sinkhorn_cost(x, y)), rtol=2e-3)
        gt = jax.grad(
            lambda a, b: sum(map(jnp.sum, chamfer_sinkhorn_cost_tpu(a, b))), argnums=(0, 1)
        )(x, y)
        gr = jax.grad(
            lambda a, b: jnp.sum(ops.chamfer(a, b)) + jnp.sum(ops.sinkhorn_cost(a, b)),
            argnums=(0, 1),
        )(x, y)
        for t, r in zip(gt, gr):
            np.testing.assert_allclose(np.asarray(t), np.asarray(r), atol=5e-3)


def _assert_norm_close(got: np.ndarray, want: np.ndarray, rel_l2=1e-2, rel_max=5e-2):
    """Norm-relative acceptance for the fused bf16 transformer stacks.

    The fused kernels run every matmul bf16-in / f32-accumulate (the Mosaic
    MXU path); across a 4-layer stack that is ~12 matmul stages of bf16
    input rounding, so the absolute error grows with the activations' scale
    and depth — a flat ``atol`` either hides real bugs at small scales or
    fails on legitimate rounding at large ones.  Accept when the error is
    small relative to the output's own energy: relative L2 over the whole
    tensor plus a max-abs bound scaled by the output RMS.
    """
    scale = float(np.sqrt(np.mean(np.square(want)))) + 1e-12
    l2 = float(np.linalg.norm(got - want)) / (float(np.linalg.norm(want)) + 1e-12)
    mx = float(np.max(np.abs(got - want))) / scale
    assert l2 <= rel_l2 and mx <= rel_max, (
        f'rel L2 {l2:.3e} (limit {rel_l2}), rms-scaled max {mx:.3e} (limit {rel_max})'
    )


@requires_tpu
class TestWFormerOnChip:
    """Fused transformer stacks vs the XLA layer path at flagship dims."""

    def test_encoder_stack(self, monkeypatch):
        import jax
        import jax.numpy as jnp

        from pccf.nn.layers import gelu_exact
        from pccf.nn.w_networks import TransformerWEncoder

        enc = TransformerWEncoder(
            z1_dim=16, n_codes=256, proj_dim=512, n_heads=8,
            mlp_dims=(1024, 1024), dropout_rates=(0.0, 0.0), act=gelu_exact,
        )
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((4, 256, 4)).astype(np.float32))
        variables = enc.init(jax.random.key(0), x, train=False)
        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'pallas')
        fused = np.asarray(enc.apply(variables, x, train=False))
        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'jnp')
        slow = np.asarray(enc.apply(variables, x, train=False))
        _assert_norm_close(fused, slow)

    def test_decoder_stack(self, monkeypatch):
        import jax
        import jax.numpy as jnp

        from pccf.nn.layers import gelu_exact
        from pccf.nn.w_networks import TransformerWDecoder

        dec = TransformerWDecoder(
            embedding_dim=4, n_codes=256, proj_dim=512,
            n_heads=8, mlp_dims=(1024, 1024, 1024, 512),
            dropout_rates=(0.1,) * 5, act=gelu_exact,
        )
        rng = np.random.default_rng(12)
        z1 = jnp.asarray(rng.standard_normal((4, 256, 16)).astype(np.float32))
        z2 = jnp.asarray(rng.standard_normal((4, 256, 16)).astype(np.float32))
        variables = dec.init(jax.random.key(0), z1, z2, train=False)
        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'pallas')
        fused = np.asarray(dec.apply(variables, z1, z2, train=False))
        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'jnp')
        slow = np.asarray(dec.apply(variables, z1, z2, train=False))
        _assert_norm_close(fused, slow)


@requires_tpu
class TestFusedCVAEOnChip:
    """Single-launch fused counterfactual CVAE chain vs the XLA module path
    at flagship dims (2+2+4 layers, d=512, T=256; pccf/kernels/pallas_cvae.py)."""

    def test_counterfactual_chain(self, monkeypatch):
        import jax
        import jax.numpy as jnp

        from pccf.data.structures import WInputs
        from pccf.models.w_autoencoders import WAutoEncoder
        from pccf.nn.layers import gelu_exact
        from pccf.nn.w_networks import (
            ConditionalPrior,
            TransformerWConditionalEncoder,
            TransformerWDecoder,
            TransformerWEncoder,
        )

        t, n_classes = 256, 4
        wae = WAutoEncoder(
            encoder=TransformerWEncoder(
                z1_dim=16, n_codes=t, proj_dim=512, n_heads=8,
                mlp_dims=(1024, 1024), dropout_rates=(0.0,) * 5, act=gelu_exact,
            ),
            decoder=TransformerWDecoder(
                embedding_dim=4, n_codes=t, proj_dim=512, n_heads=8,
                mlp_dims=(1024, 1024, 1024, 512), dropout_rates=(0.1,) * 5,
                act=gelu_exact,
            ),
            z2_prior=ConditionalPrior(n_codes=t, z2_dim=16),
            z2_posterior=TransformerWConditionalEncoder(
                z2_dim=16, n_codes=t, proj_dim=512, n_heads=8,
                mlp_dims=(1024, 1024), dropout_rates=(0.0,) * 5, act=gelu_exact,
            ),
            n_codes=t, embedding_dim=4, book_size=16,
            z1_dim=16, z2_dim=16, n_classes=n_classes, conditional=True,
        )
        rng = np.random.default_rng(13)
        w_q = jnp.asarray(rng.standard_normal((4, t * 4)).astype(np.float32))
        logits = jnp.asarray(rng.standard_normal((4, n_classes)).astype(np.float32))
        codebook = jnp.asarray(rng.standard_normal((t, 16, 4)).astype(np.float32))
        inputs = WInputs(w_q, logits)
        variables = wae.init(
            {'params': jax.random.key(0), 'sampling': jax.random.key(1)},
            inputs, codebook, train=False,
        )

        def run():
            return wae.apply(
                variables, inputs, codebook, 1, 0.7, method='generate_counterfactual'
            )

        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'pallas')
        fused = run()
        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'jnp')
        slow = run()
        _assert_norm_close(np.asarray(fused.w_recon), np.asarray(slow.w_recon))
