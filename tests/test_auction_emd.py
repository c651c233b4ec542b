"""Auction EMD vs scipy optimal assignment oracle."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from pccf.kernels.auction_emd import auction_emd


def _clouds(b=2, n=48, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((b, n, 3)).astype(np.float32)
    y = rng.random((b, n, 3)).astype(np.float32)
    return x, y


class TestAuctionEMD:
    def test_near_optimal_cost(self):
        x, y = _clouds()
        dis, assignment = auction_emd(jnp.asarray(x), jnp.asarray(y), eps=0.002, iters=500)
        dis, assignment = np.asarray(dis), np.asarray(assignment)
        assert (assignment >= 0).all(), 'auction did not converge'
        for b in range(x.shape[0]):
            # valid permutation
            assert len(set(assignment[b].tolist())) == x.shape[1]
            d2 = ((x[b][:, None] - y[b][None]) ** 2).sum(-1)
            rows, cols = linear_sum_assignment(d2)
            optimal = d2[rows, cols].sum()
            got = dis[b].sum()
            assert got <= optimal * 1.15 + 1e-4, (got, optimal)

    def test_identity_assignment(self):
        x, _ = _clouds(b=1)
        dis, assignment = auction_emd(jnp.asarray(x), jnp.asarray(x), eps=0.0005, iters=800)
        np.testing.assert_allclose(np.asarray(dis).sum(), 0.0, atol=1e-3)

    def test_eval_operating_point(self):
        """Reference eval contract: eps=0.002, iters cap ~10000 (emd_module.py:25-31).

        The compacted auction must fully converge under the cap and land near
        the Hungarian optimum. n kept moderate so the CPU test stays fast; the
        n=2048 point is exercised on-chip via bench.py's auction entry.
        """
        x, y = _clouds(b=1, n=512, seed=7)
        dis, assignment = auction_emd(
            jnp.asarray(x), jnp.asarray(y), eps=0.002, iters=10000
        )
        dis, assignment = np.asarray(dis), np.asarray(assignment)
        assert (assignment >= 0).all(), 'auction did not converge under cap'
        assert len(set(assignment[0].tolist())) == x.shape[1]
        d2 = ((x[0][:, None] - y[0][None]) ** 2).sum(-1)
        rows, cols = linear_sum_assignment(d2)
        optimal = d2[rows, cols].sum()
        assert dis.sum() <= optimal * 1.10 + 1e-4, (dis.sum(), optimal)

    def test_train_operating_point_partial(self):
        """Train contract (eps=0.005, 50 iters): assignment may be partial;
        unassigned rows fall back to their nearest-neighbour distance."""
        x, y = _clouds(b=1, n=256, seed=11)
        dis, assignment = auction_emd(
            jnp.asarray(x), jnp.asarray(y), eps=0.005, iters=50
        )
        dis, assignment = np.asarray(dis)[0], np.asarray(assignment)[0]
        d2 = ((x[0][:, None] - y[0][None]) ** 2).sum(-1)
        for i, j in enumerate(assignment):
            if j < 0:
                assert abs(dis[i] - d2[i].min()) < 1e-5

    def test_default_bidder_cap_not_worse_than_uncapped(self):
        """The adaptive k_active default must not leave more rows unassigned
        at the iteration-capped train contract than the uncapped auction
        (regression: a fixed 256-bidder cap degraded large-n assignments)."""
        x, y = _clouds(b=2, n=512, seed=13)
        _, a_default = auction_emd(jnp.asarray(x), jnp.asarray(y), eps=0.005, iters=50)
        _, a_full = auction_emd(
            jnp.asarray(x), jnp.asarray(y), eps=0.005, iters=50, k_active=512
        )
        un_default = int((np.asarray(a_default) < 0).sum())
        un_full = int((np.asarray(a_full) < 0).sum())
        assert un_default <= un_full + int(0.005 * 2 * 512)

    def test_dis_matches_assignment(self):
        x, y = _clouds(b=1, n=32, seed=3)
        dis, assignment = auction_emd(jnp.asarray(x), jnp.asarray(y), eps=0.005, iters=200)
        dis, assignment = np.asarray(dis)[0], np.asarray(assignment)[0]
        d2 = ((x[0][:, None] - y[0][None]) ** 2).sum(-1)
        for i, j in enumerate(assignment):
            if j >= 0:
                assert abs(dis[i] - d2[i, j]) < 1e-5

    def test_bf16_clouds_supported(self):
        """Prices carry d2's f32 dtype, so bf16 inputs must not change the
        while_loop carry structure across iterations."""
        x, y = _clouds(n=24)
        dis, assignment = auction_emd(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(y, jnp.bfloat16), iters=200
        )
        assert np.asarray(assignment).min() >= 0  # fully assigned
        assert np.isfinite(np.asarray(dis, np.float32)).all()

    def test_n_greater_than_m_rejected(self):
        """N > M can never fully assign; fail loudly instead of silently
        spinning the whole iteration cap and returning -1s."""
        import pytest

        x, y = _clouds(n=32)
        with pytest.raises(ValueError, match='N <= M'):
            auction_emd(jnp.asarray(x), jnp.asarray(y[:, :16]))
