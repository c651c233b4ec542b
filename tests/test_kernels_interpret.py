"""Pallas kernels in interpret mode on CPU.

``pl.pallas_call(..., interpret=True)`` executes the kernel body with the
reference semantics of the Pallas primitives, no Mosaic/TPU required — this
covers the kernel *logic* (tournament extraction, BN folding, residual
wiring, unrolled gathers) in the regular CPU suite; the on-chip tests in
``test_kernels_tpu.py`` cover the Mosaic lowering.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call', functools.partial(orig, interpret=True))
    yield
    jax.clear_caches()  # drop jit entries traced with the interpreted calls


class TestKnnInterpret:
    def test_neighbour_sets_match_golden(self, interpret_pallas):
        from pccf.kernels import ops
        from pccf.kernels.pallas_knn import knn_tpu

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 256, 3)).astype(np.float32))
        idx = np.asarray(knn_tpu(x, 9))
        ref = np.asarray(ops.knn(x, 9))
        assert idx.shape == ref.shape
        for b in range(2):
            for i in range(0, 256, 7):
                assert set(idx[b, i]) == set(ref[b, i]), (b, i)

    def test_self_is_slot_zero_and_padding_masked(self, interpret_pallas):
        from pccf.kernels import ops
        from pccf.kernels.pallas_knn import knn_tpu

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 200, 3)).astype(np.float32))  # padded to 256
        idx = np.asarray(knn_tpu(x, 5))
        assert (idx[0, :, 0] == np.arange(200)).all()
        assert idx.max() < 200  # padded candidates never selected
        ref = np.asarray(ops.knn(x, 5))
        for i in range(0, 200, 11):
            assert set(idx[0, i]) == set(ref[0, i])

    def test_duplicate_points_same_set(self, interpret_pallas):
        from pccf.kernels import ops
        from pccf.kernels.pallas_knn import knn_tpu

        rng = np.random.default_rng(2)
        xs = rng.standard_normal((1, 128, 3)).astype(np.float32)
        xs[0, 77] = xs[0, 3]  # exact duplicate
        x = jnp.asarray(xs)
        idx = np.asarray(knn_tpu(x, 4))
        ref = np.asarray(ops.knn(x, 4))
        for i in (3, 77):
            assert set(idx[0, i]) == set(ref[0, i])
        # k == 1 skips the self shortcut: exact-index parity incl. duplicates
        # (golden top_k returns the LOWEST-index zero-distance point, so the
        # nearest neighbour of 77 is 3, not itself)
        idx1 = np.asarray(knn_tpu(x, 1))
        ref1 = np.asarray(ops.knn(x, 1))
        assert (idx1 == ref1).all()
        assert idx1[0, 77, 0] == 3


class TestKnnPropertyInterpret:
    def test_random_shapes_match_golden(self, interpret_pallas):
        """Property sweep: arbitrary (n, k, c) incl. padding remainders."""
        from pccf.kernels import ops
        from pccf.kernels.pallas_knn import knn_tpu

        rng = np.random.default_rng(7)
        for n, k, c in [(128, 1, 3), (130, 3, 2), (256, 8, 5), (300, 17, 3), (384, 25, 4)]:
            x = jnp.asarray(rng.standard_normal((1, n, c)).astype(np.float32))
            idx = np.asarray(knn_tpu(x, k))
            ref = np.asarray(ops.knn(x, k))
            assert idx.shape == (1, n, k)
            for i in range(0, n, max(1, n // 13)):
                assert set(idx[0, i]) == set(ref[0, i]), (n, k, c, i)


class TestGatherPoolInterpret:
    def test_pool_and_gather_bit_exact(self, interpret_pallas):
        from pccf.kernels import ops
        from pccf.kernels.pallas_gather import gather_neighbors_tpu, graph_max_pool_tpu

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 256, 16)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 256, (2, 256, 5)).astype(np.int32))
        assert (np.asarray(graph_max_pool_tpu(x, idx)) == np.asarray(ops.graph_max_pool(x, idx))).all()
        assert (np.asarray(gather_neighbors_tpu(x, idx)) == np.asarray(ops.gather_neighbors(x, idx))).all()
        # argmax-source scatter backward == XLA max gradient (first-max ties)
        gt = jax.grad(lambda a: jnp.sum(graph_max_pool_tpu(a, idx) ** 2))(x)
        gr = jax.grad(lambda a: jnp.sum(ops.graph_max_pool(a, idx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gr), atol=1e-5)

    def test_sum_pool_matches_golden_with_grads(self, interpret_pallas):
        from pccf.kernels import ops
        from pccf.kernels.pallas_gather import graph_sum_pool_tpu

        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((2, 256, 16)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 256, (2, 256, 5)).astype(np.int32))
        np.testing.assert_allclose(
            np.asarray(graph_sum_pool_tpu(x, idx)), np.asarray(ops.graph_sum_pool(x, idx)), atol=1e-5
        )
        gt = jax.grad(lambda a: jnp.sum(graph_sum_pool_tpu(a, idx) ** 2))(x)
        gr = jax.grad(lambda a: jnp.sum(ops.graph_sum_pool(a, idx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gr), atol=1e-4)


class TestLossKernelsInterpret:
    def test_nn_distance_matches_golden(self, interpret_pallas):
        from pccf.kernels import ops
        from pccf.kernels.pallas_chamfer import nn_distance_tpu

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((1, 256, 3)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((1, 256, 3)).astype(np.float32))
        d1, i1, d2, i2 = nn_distance_tpu(x, y)
        d1r, i1r, d2r, i2r = ops.nn_distance(x, y)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d1r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d2r), atol=1e-4)
        assert (np.asarray(i1) == np.asarray(i1r)).all()
        assert (np.asarray(i2) == np.asarray(i2r)).all()

    def test_match_cost_matches_golden(self, interpret_pallas):
        from pccf.kernels import ops
        from pccf.kernels.pallas_emd import emd_fits_vmem, match_cost_tpu

        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((1, 512, 3)).astype(np.float32) / 2)
        y = jnp.asarray(rng.standard_normal((1, 512, 3)).astype(np.float32) / 2)
        assert emd_fits_vmem(512, 512)
        got = np.asarray(match_cost_tpu(x, y))
        want = np.asarray(ops.match_cost(x, y))
        np.testing.assert_allclose(got, want, rtol=5e-4)

        # analytic custom-vjp grads (match treated as constant) vs golden
        gt = jax.grad(lambda a, b: jnp.sum(match_cost_tpu(a, b)), argnums=(0, 1))(x, y)
        gr = jax.grad(lambda a, b: jnp.sum(ops.match_cost(a, b)), argnums=(0, 1))(x, y)
        for t, r in zip(gt, gr):
            np.testing.assert_allclose(np.asarray(t), np.asarray(r), atol=5e-3)

    def test_chamfer_match_cost_fused_matches_goldens(self, interpret_pallas):
        """One launch emits EMD cost/grads AND nn_distance-parity chamfer."""
        from pccf.kernels import ops
        from pccf.kernels.pallas_emd import _emd_chamfer_forward, chamfer_match_cost_tpu

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 512, 3)).astype(np.float32) / 2)
        y = jnp.asarray(rng.standard_normal((2, 512, 3)).astype(np.float32) / 2)
        cham, emd = chamfer_match_cost_tpu(x, y)
        np.testing.assert_allclose(
            np.asarray(cham), np.asarray(ops.chamfer(x, y)), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(emd), np.asarray(ops.match_cost(x, y)), rtol=5e-4)
        _, _, _, d1, i1, d2, i2 = _emd_chamfer_forward(x, y)
        d1r, i1r, d2r, i2r = ops.nn_distance(x, y)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d1r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d2r), atol=1e-4)
        assert (np.asarray(i1) == np.asarray(i1r)).all()
        assert (np.asarray(i2) == np.asarray(i2r)).all()

    def test_chamfer_match_cost_fused_grads(self, interpret_pallas):
        """Combined backward = chamfer analytic + EMD match-constant."""
        from pccf.kernels import ops
        from pccf.kernels.pallas_emd import chamfer_match_cost_tpu

        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((1, 512, 3)).astype(np.float32) / 2)
        y = jnp.asarray(rng.standard_normal((1, 512, 3)).astype(np.float32) / 2)

        def fused(a, b):
            cham, emd = chamfer_match_cost_tpu(a, b)
            return jnp.sum(cham) + 0.5 * jnp.sum(emd)

        def golden(a, b):
            return jnp.sum(ops.chamfer(a, b)) + 0.5 * jnp.sum(ops.match_cost(a, b))

        gt = jax.grad(fused, argnums=(0, 1))(x, y)
        gr = jax.grad(golden, argnums=(0, 1))(x, y)
        for t, r in zip(gt, gr):
            np.testing.assert_allclose(np.asarray(t), np.asarray(r), atol=5e-3)

    @pytest.mark.parametrize('m,reduction', [(256, 'mean'), (1024, 'sum')])
    def test_chamfer_match_cost_fused_rectangular(self, interpret_pallas, m, reduction):
        """n != m exercises the asymmetric marginals (mult_r = max(m//n, 1))
        and the 1/n-vs-1/m chamfer gradient split; 'sum' locks the
        reduction-scaling path."""
        from pccf.kernels import ops
        from pccf.kernels.pallas_emd import chamfer_match_cost_tpu

        rng = np.random.default_rng(10 + m)
        x = jnp.asarray(rng.standard_normal((1, 512, 3)).astype(np.float32) / 2)
        y = jnp.asarray(rng.standard_normal((1, m, 3)).astype(np.float32) / 2)
        cham, emd = chamfer_match_cost_tpu(x, y, reduction)
        np.testing.assert_allclose(
            np.asarray(cham), np.asarray(ops.chamfer(x, y, reduction=reduction)),
            rtol=1e-5, atol=1e-4,
        )
        np.testing.assert_allclose(np.asarray(emd), np.asarray(ops.match_cost(x, y)), rtol=5e-4)

        def fused(a, b):
            c, e = chamfer_match_cost_tpu(a, b, reduction)
            return jnp.sum(c) + 0.5 * jnp.sum(e)

        def golden(a, b):
            return jnp.sum(ops.chamfer(a, b, reduction=reduction)) + 0.5 * jnp.sum(
                ops.match_cost(a, b)
            )

        gt = jax.grad(fused, argnums=(0, 1))(x, y)
        gr = jax.grad(golden, argnums=(0, 1))(x, y)
        for t, r in zip(gt, gr):
            np.testing.assert_allclose(np.asarray(t), np.asarray(r), atol=1e-2)

    def test_composite_fallback_uses_per_term_dispatchers(self, interpret_pallas, monkeypatch):
        """When only the fused gate fails (n not a 512-multiple), the chamfer
        term must still get its own Pallas kernel, not the jnp golden."""
        from pccf.kernels import api
        from pccf.kernels import ops
        from pccf.kernels import pallas_chamfer

        calls = []
        orig = pallas_chamfer.chamfer_tpu

        def spy(x, y, reduction='mean'):
            calls.append(1)
            return orig(x, y, reduction)

        monkeypatch.setattr(pallas_chamfer, 'chamfer_tpu', spy)
        monkeypatch.setattr(api, '_use_pallas', lambda: True)
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((1, 256, 3)).astype(np.float32) / 2)
        y = jnp.asarray(rng.standard_normal((1, 256, 3)).astype(np.float32) / 2)
        cham, emd = api.chamfer_match_cost(x, y)  # 256 % 512 != 0 -> fused gate fails
        assert calls, 'chamfer term fell back to the jnp golden, not its Pallas kernel'
        np.testing.assert_allclose(np.asarray(cham), np.asarray(ops.chamfer(x, y)), atol=1e-4)
        np.testing.assert_allclose(np.asarray(emd), np.asarray(ops.match_cost(x, y)), rtol=5e-4)

    def test_chamfer_sinkhorn_fused_matches_goldens(self, interpret_pallas):
        """Sinkhorn variant of the fused launch: chamfer = the row stabiliser
        the Gibbs-kernel build computes anyway."""
        from pccf.kernels import ops
        from pccf.kernels.pallas_sinkhorn import chamfer_sinkhorn_cost_tpu

        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((1, 512, 3)).astype(np.float32) / 2)
        y = jnp.asarray(rng.standard_normal((1, 512, 3)).astype(np.float32) / 2)
        cham, sink = chamfer_sinkhorn_cost_tpu(x, y)
        np.testing.assert_allclose(
            np.asarray(cham), np.asarray(ops.chamfer(x, y)), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(sink), np.asarray(ops.sinkhorn_cost(x, y)), rtol=5e-4
        )

        def fused(a, b):
            c, s = chamfer_sinkhorn_cost_tpu(a, b)
            return jnp.sum(c) + jnp.sum(s)

        def golden(a, b):
            return jnp.sum(ops.chamfer(a, b)) + jnp.sum(ops.sinkhorn_cost(a, b))

        gt = jax.grad(fused, argnums=(0, 1))(x, y)
        gr = jax.grad(golden, argnums=(0, 1))(x, y)
        for t, r in zip(gt, gr):
            np.testing.assert_allclose(np.asarray(t), np.asarray(r), atol=5e-3)


class TestPCGenFusedInterpret:
    def test_fused_decoder_matches_slow_path(self, interpret_pallas, monkeypatch):
        import flax

        from pccf.kernels.pallas_pcgen import pcgen_fused_supported
        from pccf.nn.decoders import PCGenDecoder

        w_dim, n, b, g = 128, 256, 1, 2
        conv_dims = (128, 32, 16)
        assert pcgen_fused_supported(n, w_dim, conv_dims, g)
        dec = PCGenDecoder(
            w_dim=w_dim, sample_dim=4, n_components=g, map_dims=(8,),
            conv_dims=conv_dims, tau=5.0, act=jax.nn.relu, act_name='ReLU',
            filtering=False,
        )
        rng = np.random.default_rng(4)
        w = jnp.asarray(rng.standard_normal((b, w_dim)).astype(np.float32))
        samp = jnp.asarray(rng.standard_normal((b, n, 4)).astype(np.float32))
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

        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'pallas')
        out_fused = np.asarray(dec.apply(variables, w, n, samp, train=False))
        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'jnp')
        out_slow = np.asarray(dec.apply(variables, w, n, samp, train=False))
        # bf16 weight/activation rounding inside the kernel
        np.testing.assert_allclose(out_fused, out_slow, atol=3e-3)


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])


class TestGradSemantics:
    def test_max_pool_tie_gradients_match_golden(self, interpret_pallas):
        """On exactly duplicated points the golden and the kernel both route
        the cotangent to the FIRST maximal neighbour (torch max semantics) —
        backend-identical training gradients even on ties."""
        from pccf.kernels import ops
        from pccf.kernels.pallas_gather import graph_max_pool_tpu

        rng = np.random.default_rng(3)
        x = rng.standard_normal((1, 256, 8)).astype(np.float32)
        x[0, 7] = x[0, 3]  # exact duplicate rows -> tied maxima
        x = jnp.asarray(x)
        idx = jnp.asarray(
            np.stack([rng.integers(0, 256, (256, 4)) for _ in range(1)]).astype(np.int32)
        )
        idx = idx.at[0, 0].set(jnp.asarray([3, 7, 3, 7]))  # guaranteed tie

        def loss_g(fn):
            return jax.grad(lambda v: jnp.sum(fn(v, idx) * 1.7))(x)

        g_golden = np.asarray(loss_g(ops.graph_max_pool))
        g_kernel = np.asarray(loss_g(graph_max_pool_tpu))
        np.testing.assert_allclose(g_golden, g_kernel, atol=1e-6)

    def test_nn_distance_tpu_is_differentiable(self, interpret_pallas):
        """The dispatched nn_distance must be differentiable on every
        backend; kernel grads match the golden's analytic gradients."""
        from pccf.kernels import ops
        from pccf.kernels.pallas_chamfer import nn_distance_tpu

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((2, 256, 3)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((2, 256, 3)).astype(np.float32))

        def loss(fn, a, b):
            d1, _, d2, _ = fn(a, b)
            return jnp.sum(d1) + 0.5 * jnp.sum(d2)

        gx_k, gy_k = jax.grad(functools.partial(loss, nn_distance_tpu), argnums=(0, 1))(x, y)
        gx_g, gy_g = jax.grad(functools.partial(loss, ops.nn_distance), argnums=(0, 1))(x, y)
        np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_g), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gy_k), np.asarray(gy_g), atol=1e-4)


class TestDispatchGates:
    def test_vmem_fit_gates(self):
        from pccf.kernels.pallas_chamfer import chamfer_fits_vmem
        from pccf.kernels.pallas_knn import knn_fits_vmem

        assert knn_fits_vmem(2048)  # flagship
        assert not knn_fits_vmem(1 << 17)  # would blow scoped VMEM
        assert chamfer_fits_vmem(2048, 2048)
        assert not chamfer_fits_vmem(2048, 1 << 16)

    def test_knn_env_knobs_apply_per_call(self, interpret_pallas, monkeypatch):
        """PCCF_KNN_GROUP changes must retrace (static arg), not silently
        reuse the kernel baked at first call."""
        from pccf.kernels.pallas_knn import knn_tpu

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((1, 256, 3)).astype(np.float32))
        monkeypatch.setenv('PCCF_KNN_GROUP', '1')
        a = np.asarray(knn_tpu(x, 5))
        monkeypatch.setenv('PCCF_KNN_GROUP', '2')
        b = np.asarray(knn_tpu(x, 5))
        np.testing.assert_array_equal(a, b)  # same result, different schedule


class TestForceBackend:
    def test_force_backend_overrides_env(self, monkeypatch):
        from pccf.kernels import api

        monkeypatch.setenv('PCCF_KERNEL_BACKEND', 'jnp')
        assert not api._use_pallas()
        with api.force_backend('pallas'):
            assert api._use_pallas()
        assert not api._use_pallas()

    def test_force_backend_rejects_unknown(self):
        from pccf.kernels import api

        with pytest.raises(ValueError):
            with api.force_backend('cuda'):
                pass

    def test_force_backend_is_thread_scoped(self):
        """A force_backend pin in one thread (e.g. pccf.export targeting
        another platform) must not leak into concurrent dispatch decisions in
        other threads (regression: export_server mutated the process-global
        env var)."""
        import threading

        from pccf.kernels import api

        pinned = threading.Event()
        release = threading.Event()
        observed = []

        def exporter():
            with api.force_backend('pallas'):
                pinned.set()
                release.wait(timeout=10)

        def server():
            pinned.wait(timeout=10)
            observed.append(api._use_pallas())  # CPU test env: auto -> False
            release.set()

        t1 = threading.Thread(target=exporter)
        t2 = threading.Thread(target=server)
        t1.start(), t2.start()
        t1.join(timeout=15), t2.join(timeout=15)
        assert observed == [False], (
            f'force_backend leaked across threads: other thread saw pallas={observed}'
        )


class TestGatherGateK:
    def test_gather_gate_scales_with_k(self):
        """gather_neighbors_tpu's output block is (k, 256, C) on top of the
        resident (N, C) tile, so the VMEM gate must reject large k where the
        pool kernels (k-independent block) still fit (regression: the gate
        ignored k, so large-k gathers failed Mosaic compilation at runtime
        instead of falling back to jnp)."""
        from pccf.kernels.pallas_gather import _VMEM_BUDGET, gather_pool_supported

        n, c = 2048, 2048
        assert gather_pool_supported(n, c)  # pool kernels: fits
        # find a k that pushes the gather block past the budget
        k = (_VMEM_BUDGET - n * c * 12) // (256 * c * 4) + 1
        assert not gather_pool_supported(n, c, k)
        assert gather_pool_supported(n, c, 1)

    def test_gather_large_k_falls_back_to_jnp(self, monkeypatch):
        from pccf.kernels import api
        from pccf.kernels import pallas_gather

        monkeypatch.setattr(api, '_use_pallas', lambda: True)
        monkeypatch.setattr(
            pallas_gather,
            'gather_neighbors_tpu',
            lambda *a: (_ for _ in ()).throw(AssertionError('kernel dispatched')),
        )
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 256, 8)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 256, (1, 256, 200000)).astype(np.int32))
        out = api.gather_neighbors(x, idx)  # k huge -> gate fails -> jnp golden
        assert out.shape == (1, 256, 200000, 8)
