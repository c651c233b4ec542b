"""Sinkhorn EMD surrogate: golden properties + Pallas interpret parity.

The Sinkhorn matcher is the framework's opt-in alternative to ApproxMatch
(reference external/pytorch_structural_losses/src/approxmatch.cu) — an
entropic-OT transport plan with the same cost/gradient contract as
``match_cost`` (plan treated as constant in the backward,
structural_losses/match_cost.py:31-42).
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from pccf.kernels import ops


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, 'pallas_call', functools.partial(orig, interpret=True))
    yield
    jax.clear_caches()


def _clouds(b=2, n=256, m=256, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((b, n, 3)).astype(np.float32)
    y = rng.random((b, m, 3)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


class TestSinkhornGolden:
    def test_marginals(self):
        x, y = _clouds()
        plan = ops.sinkhorn_match(x, y)
        # final update is v (columns exact), rows approximately satisfied
        np.testing.assert_allclose(np.asarray(plan.sum(axis=1)), 1.0, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(plan.sum(axis=2)), 1.0, rtol=0.35)

    def test_uneven_sizes_marginals(self):
        x, y = _clouds(b=1, n=512, m=256, seed=3)
        plan = ops.sinkhorn_match(x, y)
        # n > m: left mass 1 per row, right capacity n//m per column
        np.testing.assert_allclose(np.asarray(plan.sum(axis=1)), 2.0, rtol=1e-4)

    def test_cost_near_hungarian(self):
        """Entropic cost lands near the optimal-assignment Euclidean cost."""
        x, y = _clouds(b=1, n=128, m=128, seed=1)
        cost = float(ops.sinkhorn_cost(x, y)[0])
        d = np.sqrt(((np.asarray(x)[0][:, None] - np.asarray(y)[0][None]) ** 2).sum(-1))
        rows, cols = linear_sum_assignment(d)
        optimal = d[rows, cols].sum()
        assert 0.8 * optimal <= cost <= 1.8 * optimal, (cost, optimal)

    def test_identity_clouds_low_cost(self):
        x, y = _clouds(b=1, n=128, seed=2)
        cost_id = float(ops.sinkhorn_cost(x, x)[0])
        cost_xy = float(ops.sinkhorn_cost(x, y)[0])
        # the eps-blurred plan leaks mass off the diagonal (~sqrt(eps) length
        # scale), but identical clouds must still cost far less than
        # independent ones
        assert cost_id < 0.5 * cost_xy, (cost_id, cost_xy)

    def test_grad_contract_plan_constant(self):
        """jax.grad(sinkhorn_cost) == analytic grads with the plan frozen."""
        x, y = _clouds(b=1, n=64, m=64, seed=4)
        g1, g2 = jax.grad(lambda a, b: jnp.sum(ops.sinkhorn_cost(a, b)), argnums=(0, 1))(x, y)
        plan = ops.sinkhorn_match(x, y)
        r1, r2 = ops._match_cost_grads(x, y, plan)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(r2), atol=1e-5)

    def test_tracks_approx_match_ranking(self):
        """Sinkhorn and ApproxMatch order cloud pairs the same way."""
        rng = np.random.default_rng(5)
        base = rng.random((1, 128, 3)).astype(np.float32)
        costs_s, costs_a = [], []
        for noise in (0.01, 0.05, 0.2):
            pert = base + rng.normal(0, noise, base.shape).astype(np.float32)
            costs_s.append(float(ops.sinkhorn_cost(jnp.asarray(base), jnp.asarray(pert))[0]))
            costs_a.append(float(ops.match_cost(jnp.asarray(base), jnp.asarray(pert))[0]))
        assert costs_s == sorted(costs_s)
        assert costs_a == sorted(costs_a)


class TestSinkhornPallasInterpret:
    def test_cost_and_grads_match_golden(self, interpret_pallas):
        from pccf.kernels.pallas_sinkhorn import sinkhorn_cost_tpu, sinkhorn_fits_vmem

        x, y = _clouds(b=1, n=512, m=512, seed=6)
        assert sinkhorn_fits_vmem(512, 512)
        got = np.asarray(sinkhorn_cost_tpu(x, y))
        want = np.asarray(ops.sinkhorn_cost(x, y))
        np.testing.assert_allclose(got, want, rtol=5e-4)

        gt = jax.grad(lambda a, b: jnp.sum(sinkhorn_cost_tpu(a, b)), argnums=(0, 1))(x, y)
        gr = jax.grad(lambda a, b: jnp.sum(ops.sinkhorn_cost(a, b)), argnums=(0, 1))(x, y)
        for t, r in zip(gt, gr):
            np.testing.assert_allclose(np.asarray(t), np.asarray(r), atol=5e-4)

    def test_uneven_sizes(self, interpret_pallas):
        from pccf.kernels.pallas_sinkhorn import sinkhorn_cost_tpu

        x, y = _clouds(b=1, n=512, m=256, seed=7)
        got = np.asarray(sinkhorn_cost_tpu(x, y))
        want = np.asarray(ops.sinkhorn_cost(x, y))
        np.testing.assert_allclose(got, want, rtol=5e-4)


class TestSinkhornWiring:
    def test_api_dispatch_cpu_falls_back(self):
        from pccf.kernels import api

        x, y = _clouds(b=1, n=512, m=512, seed=8)
        np.testing.assert_allclose(
            np.asarray(api.sinkhorn_cost(x, y)), np.asarray(ops.sinkhorn_cost(x, y))
        )

    def test_recon_loss_option(self):
        from pccf.config import get_config_all
        from pccf.data.structures import Outputs, Targets
        from pccf.train.losses import get_recon_loss

        cfg = get_config_all(
            [
                'autoencoder/objective=chamfer_sinkhorn',
                'user.cpu=false',
            ]
        )
        loss = get_recon_loss(cfg)
        assert set(loss.calculations) == {'Chamfer', 'EMD'}
        x, y = _clouds(b=1, n=128, m=128, seed=9)
        outputs = Outputs(recon=x)
        targets = Targets(ref_cloud=y, scale=jnp.ones((1,)), label=jnp.zeros((1,), jnp.int32))
        got = float(loss.loss_value(outputs, targets))
        want = float(
            jnp.mean(ops.chamfer(x, y, reduction='mean') + ops.sinkhorn_cost(x, y))
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)


if __name__ == '__main__':
    pytest.main([__file__, '-x', '-q'])


class TestSinkhornCpuOptIn:
    def test_recon_loss_keeps_surrogate_on_cpu(self):
        """ChamferSinkhorn is an explicit opt-in with no reference-parity
        reason to drop the surrogate term off-TPU (unlike ChamferEMD, whose
        cpu gate mirrors the reference's accelerated-path-only EMD): under
        user.cpu=true the objective must still carry both terms, dispatched
        to the jnp golden path (regression: the cpu gate silently degraded
        the objective to plain Chamfer)."""
        from pccf.config import get_config_all
        from pccf.train.losses import get_recon_loss

        cfg = get_config_all(['autoencoder/objective=chamfer_sinkhorn', 'user.cpu=true'])
        loss = get_recon_loss(cfg)
        assert set(loss.calculations) == {'Chamfer', 'EMD'}
