"""Golden numerical tests for the jnp kernel layer against torch-CPU oracles.

The oracles re-state the reference's documented math (torch fallbacks in
neighbour_ops.py / metrics_and_losses.py and the CUDA kernel algorithms)
directly in the test, so the framework's semantics are pinned independently
of its own implementation.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pccf.kernels import ops


def _rand_clouds(b=2, n=64, m=48, c=3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, n, c)).astype(np.float32)
    y = rng.standard_normal((b, m, c)).astype(np.float32)
    return x, y


def torch_square_distance(t1, t2):
    t2 = t2.transpose(-1, -2)
    dist = -2 * torch.matmul(t1, t2)
    dist += torch.sum(t1**2, -1, keepdim=True)
    dist += torch.sum(t2**2, -2, keepdim=True)
    return dist


class TestDistances:
    def test_square_distance(self):
        x, y = _rand_clouds()
        got = np.asarray(ops.square_distance(jnp.asarray(x), jnp.asarray(y)))
        want = torch_square_distance(torch.from_numpy(x), torch.from_numpy(y)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_self_square_distance(self):
        x, _ = _rand_clouds()
        got = np.asarray(ops.self_square_distance(jnp.asarray(x)))
        want = torch_square_distance(torch.from_numpy(x), torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_knn_matches_topk(self):
        x, _ = _rand_clouds(n=128)
        k = 8
        idx = np.asarray(ops.knn(jnp.asarray(x), k))
        d = torch_square_distance(torch.from_numpy(x), torch.from_numpy(x))
        want = d.topk(k=k, largest=False)[1].numpy()
        # indices can differ under ties; compare gathered distances instead
        got_d = np.take_along_axis(d.numpy(), idx, axis=-1)
        want_d = np.take_along_axis(d.numpy(), want, axis=-1)
        np.testing.assert_allclose(np.sort(got_d, -1), np.sort(want_d, -1), atol=1e-4)
        assert (idx[:, :, 0] == np.arange(x.shape[1])[None, :]).mean() > 0.99

    def test_gather_and_edge_features(self):
        x, _ = _rand_clouds(n=32, c=5)
        idx = np.asarray(ops.knn(jnp.asarray(x[..., :3]), 4))
        neigh = np.asarray(ops.gather_neighbors(jnp.asarray(x), jnp.asarray(idx)))
        for b in range(x.shape[0]):
            for i in range(0, 32, 7):
                np.testing.assert_array_equal(neigh[b, i], x[b, idx[b, i]])
        ef = np.asarray(ops.edge_features(jnp.asarray(x), jnp.asarray(idx)))
        assert ef.shape == (x.shape[0], 32, 4, 10)
        np.testing.assert_allclose(ef[..., 5:], np.broadcast_to(x[:, :, None, :], neigh.shape), atol=0)
        np.testing.assert_allclose(ef[..., :5], neigh - x[:, :, None, :], atol=1e-6)


class TestChamfer:
    def test_chamfer_mean_matches_pykeops_formula(self):
        x, y = _rand_clouds()
        t1, t2 = torch.from_numpy(x), torch.from_numpy(y)
        dist = torch_square_distance(t1, t2)
        # pykeops_chamfer (metrics_and_losses.py:21-41): mean-per-point both ways
        idx1 = dist.argmin(dim=1, keepdim=True).transpose(1, 2).expand(-1, -1, 3)
        m1 = t1.gather(1, idx1)
        squared1 = ((t2 - m1) ** 2).sum(2).mean(1)
        idx2 = dist.argmin(dim=2, keepdim=True).expand(-1, -1, 3)
        m2 = t2.gather(1, idx2)
        squared2 = ((t1 - m2) ** 2).sum(2).mean(1)
        want = (squared1 + squared2).numpy()
        got = np.asarray(ops.chamfer(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_chamfer_sum_matches_torch_chamfer(self):
        x, y = _rand_clouds()
        t1, t2 = torch.from_numpy(x), torch.from_numpy(y)
        dist = torch_square_distance(t1, t2)
        want = (torch.min(dist, dim=-1)[0].sum(1) + torch.min(dist, dim=-2)[0].sum(1)).numpy()
        got = np.asarray(ops.chamfer(jnp.asarray(x), jnp.asarray(y), reduction='sum'))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_chamfer_grad_matches_torch_autograd(self):
        x, y = _rand_clouds(b=1, n=20, m=24)
        t1 = torch.from_numpy(x.copy()).requires_grad_(True)
        t2 = torch.from_numpy(y.copy()).requires_grad_(True)
        dist = torch_square_distance(t1.detach(), t2.detach())
        idx1 = dist.argmin(dim=1, keepdim=True).transpose(1, 2).expand(-1, -1, 3)
        m1 = t1.gather(1, idx1)
        squared1 = ((t2 - m1) ** 2).sum(2).mean(1)
        idx2 = dist.argmin(dim=2, keepdim=True).expand(-1, -1, 3)
        m2 = t2.gather(1, idx2)
        squared2 = ((t1 - m2) ** 2).sum(2).mean(1)
        (squared1 + squared2).sum().backward()

        g1, g2 = jax.grad(
            lambda a, b: jnp.sum(ops.chamfer(a, b)), argnums=(0, 1)
        )(jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(g1), t1.grad.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(g2), t2.grad.numpy(), atol=1e-4)

    def test_nn_distance(self):
        x, y = _rand_clouds()
        d1, i1, d2, i2 = ops.nn_distance(jnp.asarray(x), jnp.asarray(y))
        dist = torch_square_distance(torch.from_numpy(x), torch.from_numpy(y))
        np.testing.assert_allclose(np.asarray(d1), dist.min(-1)[0].numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2), dist.min(-2)[0].numpy(), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i1), dist.argmin(-1).numpy())
        np.testing.assert_array_equal(np.asarray(i2), dist.argmin(-2).numpy())


def torch_approx_match(x1, x2):
    """Dense torch oracle of approxmatch.cu (direct restatement of the CUDA loop)."""
    b, n, _ = x1.shape
    m = x2.shape[1]
    if n >= m:
        mult_l, mult_r = 1.0, float(n // m)
    else:
        mult_l, mult_r = float(m // n), 1.0
    d = torch_square_distance(x1, x2)
    remain_l = torch.full((b, n), mult_l)
    remain_r = torch.full((b, m), mult_r)
    match = torch.zeros(b, n, m)
    for j in range(7, -2, -1):
        level = -float(4.0**j)
        kern = torch.exp(level * d)
        suml = torch.einsum('bnm,bm->bn', kern, remain_r) + 1e-9
        ratio_l = remain_l / suml
        demand = torch.einsum('bnm,bn->bm', kern, ratio_l) * remain_r
        consumption = torch.clamp(remain_r / (demand + 1e-9), max=1.0)
        ratio_r = consumption * remain_r
        w = kern * ratio_l[:, :, None] * ratio_r[:, None, :]
        match = match + w
        remain_l = torch.clamp(remain_l - w.sum(2), min=0.0)
        remain_r = torch.clamp(remain_r - demand, min=0.0)
    return match


class TestApproxMatchEMD:
    def test_match_mass_bounds(self):
        # The reference algorithm is approximate: row/col mass never exceeds 1
        # but may be under-assigned for spread-out clouds. On unit-sphere
        # normalised clouds (the real usage) assignment is near-complete.
        x, y = _rand_clouds(b=2, n=64, m=64)
        x = x / np.linalg.norm(x, axis=-1, keepdims=True).max(1, keepdims=True)
        y = y / np.linalg.norm(y, axis=-1, keepdims=True).max(1, keepdims=True)
        match = np.asarray(ops.approx_match(jnp.asarray(x), jnp.asarray(y)))
        assert match.min() >= 0.0
        assert match.sum(axis=2).max() <= 1.0 + 1e-4
        assert match.sum(axis=1).max() <= 1.0 + 1e-4
        assert match.sum(axis=2).mean() > 0.9

    def test_match_against_torch_oracle(self):
        x, y = _rand_clouds(b=2, n=32, m=32, seed=3)
        got = np.asarray(ops.approx_match(jnp.asarray(x), jnp.asarray(y)))
        want = torch_approx_match(torch.from_numpy(x), torch.from_numpy(y)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_cost_identical_clouds_near_zero(self):
        x, _ = _rand_clouds(b=2, n=64, m=64)
        cost = np.asarray(ops.match_cost(jnp.asarray(x), jnp.asarray(x)))
        assert np.all(cost < 1e-2 * 64)

    def test_cost_grad_semantics(self):
        # grads treat the match as constant: d cost / d x1 = sum_k match * unit vec
        x, y = _rand_clouds(b=1, n=16, m=16, seed=5)
        match = np.asarray(ops.approx_match(jnp.asarray(x), jnp.asarray(y)))
        diff = x[:, :, None, :] - y[:, None, :, :]
        d2 = (diff**2).sum(-1)
        inv = 1.0 / np.sqrt(np.maximum(d2, 1e-20))
        want1 = np.einsum('bnm,bnmc->bnc', match * inv, diff)
        want2 = -np.einsum('bnm,bnmc->bmc', match * inv, diff)
        g1, g2 = jax.grad(lambda a, b: jnp.sum(ops.match_cost(a, b)), argnums=(0, 1))(
            jnp.asarray(x), jnp.asarray(y)
        )
        np.testing.assert_allclose(np.asarray(g1), want1, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g2), want2, atol=1e-4)

    def test_emd_detects_offset(self):
        x, _ = _rand_clouds(b=1, n=128, m=128)
        shift = x + np.array([0.5, 0.0, 0.0], dtype=np.float32)
        cost = float(ops.match_cost(jnp.asarray(x), jnp.asarray(shift))[0])
        # EMD of a rigid shift ~ n * |shift| (the multi-scale relaxation
        # overestimates on spread-out clouds; the reference kernel does too)
        assert 128 * 0.5 * 0.9 < cost < 128 * 0.5 * 1.5


class TestVQ:
    def test_vq_assign_and_lookup(self):
        rng = np.random.default_rng(0)
        n_codes, book, dim, b = 8, 16, 4, 5
        codebook = rng.standard_normal((n_codes, book, dim)).astype(np.float32)
        x = rng.standard_normal((b, n_codes * dim)).astype(np.float32)
        emb, idx, dist2 = ops.vq_assign(jnp.asarray(x), jnp.asarray(codebook))
        emb, idx, dist2 = np.asarray(emb), np.asarray(idx), np.asarray(dist2)
        xr = x.reshape(b, n_codes, dim)
        want_d = ((xr[:, :, None, :] - codebook[None]) ** 2).sum(-1)
        np.testing.assert_allclose(dist2, want_d, atol=1e-5)
        want_idx = want_d.argmin(-1)
        np.testing.assert_array_equal(idx, want_idx)
        want_emb = np.take_along_axis(
            np.broadcast_to(codebook[None], (b, n_codes, book, dim)), want_idx[..., None, None], axis=2
        )[:, :, 0, :].reshape(b, -1)
        np.testing.assert_allclose(emb, want_emb, atol=0)
        back = np.asarray(ops.vq_lookup(jnp.asarray(idx), jnp.asarray(codebook)))
        np.testing.assert_allclose(back, want_emb, atol=0)

    def test_straight_through(self):
        w_e = jnp.asarray(np.random.default_rng(0).standard_normal((3, 8)).astype(np.float32))
        w_q = jnp.asarray(np.random.default_rng(1).standard_normal((3, 8)).astype(np.float32))
        out = ops.straight_through(w_e, w_q)
        np.testing.assert_allclose(np.asarray(out), np.asarray(w_e))
        g_e, g_q = jax.grad(lambda a, b: jnp.sum(ops.straight_through(a, b) ** 2), argnums=(0, 1))(w_e, w_q)
        np.testing.assert_allclose(np.asarray(g_e), 0.0)
        np.testing.assert_allclose(np.asarray(g_q), np.asarray(2 * w_e), atol=1e-5)


class TestGraphFilteringGrad:
    def test_no_nan_grad_with_duplicate_points(self):
        # sqrt'(0) guard: duplicate decoded points must not poison the backward
        x = np.random.default_rng(0).standard_normal((1, 32, 3)).astype(np.float32)
        x[0, 1] = x[0, 0]
        g = jax.grad(lambda c: jnp.sum(ops.graph_filtering(c)))(jnp.asarray(x))
        assert not bool(jnp.isnan(g).any())


class TestGraphFiltering:
    def test_matches_torch_reference_formula(self):
        x, _ = _rand_clouds(b=2, n=64)
        k = 4
        t = torch.from_numpy(x)  # (B, N, 3) channels-last torch oracle
        d = torch_square_distance(t, t)
        idx = d.topk(k=k, largest=False)[1]
        neigh = torch.stack([t[b][idx[b]] for b in range(t.shape[0])])  # (B,N,k,3)
        neigh = neigh[:, :, 1:, :]
        diff = t[:, :, None, :] - neigh
        dist = torch.sqrt(torch.abs((diff**2).sum(-1)))
        sigma = torch.clamp(dist[:, :, 0:1].mean(1, keepdim=True), min=0.005)
        weights = torch.exp(-dist / sigma)
        w_sum = weights.sum(-1, keepdim=True)
        want = ((1 + w_sum) * t - (weights[..., None] * neigh).sum(2)).numpy()
        got = np.asarray(ops.graph_filtering(jnp.asarray(x), k=k))
        np.testing.assert_allclose(got, want, atol=1e-3)


class TestPCGenFusionHelpers:
    def test_fold_bn_affine_matches_bn(self):
        from pccf.kernels.pallas_pcgen import fold_bn_affine

        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
        scale = jnp.asarray(rng.uniform(0.5, 1.5, 8).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(8).astype(np.float32))
        mean = jnp.asarray(rng.standard_normal(8).astype(np.float32) * 0.1)
        var = jnp.asarray(rng.uniform(0.5, 1.5, 8).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
        wf, bf = fold_bn_affine(w, scale, bias, mean, var)
        got = x @ wf.astype(jnp.float32) + bf
        a = scale / jnp.sqrt(var + 1e-5)
        want = (x @ w - mean) * a + bias
        # bf16 weight rounding: ~2^-9 relative on each product term
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=6e-3, atol=2e-2)

    def test_interleave_residual_matches_repeat(self):
        from pccf.kernels.pallas_pcgen import interleave_residual

        rng = np.random.default_rng(4)
        for in_f, out_f in [(8, 8), (8, 20), (16, 8), (6, 6)]:
            x = jnp.asarray(rng.standard_normal((2, 5, in_f)).astype(np.float32))
            reps = out_f // in_f + 1
            want = jnp.repeat(x, reps, axis=-1)[..., :out_f]
            got = interleave_residual(x, out_f)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def test_supported_predicate(self):
        from pccf.kernels.pallas_pcgen import pcgen_fused_supported

        assert pcgen_fused_supported(2048, 1024, (1024, 256, 16), 8)  # flagship
        assert not pcgen_fused_supported(2048, 64, (32, 16), 2)  # lane misaligned
        assert not pcgen_fused_supported(100, 1024, (1024, 256, 16), 8)  # tile
        assert not pcgen_fused_supported(2048, 1024, (1024, 256, 256), 8)  # re-expand

    def test_flagship_config_stays_fused_eligible(self):
        """Regression guard: the shipped flagship config must dispatch the
        fused serving kernel (a config/predicate drift would silently fall
        back to the 5x-slower XLA route)."""
        from pccf.config import get_config_all
        from pccf.data.protocols import Singleton
        from pccf.kernels.pallas_pcgen import pcgen_fused_supported

        Singleton.reset_all()
        cfg = get_config_all([])
        dec = cfg.autoencoder.model.decoder
        assert dec.act_name in ('', 'LeakyReLU', 'ReLU')
        assert pcgen_fused_supported(
            cfg.data.n_target_points,
            cfg.autoencoder.model.w_dim,
            tuple(dec.conv_dims),
            dec.n_components,
        )


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])
