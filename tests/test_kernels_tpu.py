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
