"""Micro-attribution of the DGCNN encoder eval path (not part of bench)."""

from __future__ import annotations

import numpy as np

from bench import _marginal_scan_time


def main(batch=16, n=2048, k=25):
    import jax.numpy as jnp

    from pccf.kernels import api as kapi

    rng = np.random.default_rng(0)

    for c in (3, 64, 64, 128):
        x = jnp.asarray(rng.standard_normal((batch, n, c)).astype(np.float32))

        def step_knn(carry, c=c):
            (xc,) = carry
            idx = kapi.knn(xc, k)
            return (xc + 1e-6 * idx[..., :1].astype(jnp.float32),)

        dt = _marginal_scan_time(step_knn, (x,), k_short=1, k_long=9)
        print(f'knn   c={c:4d}: {dt * 1e3:6.2f} ms')

    for c in (64, 64, 128, 256):
        x = jnp.asarray(rng.standard_normal((batch, n, c)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n, (batch, n, k)).astype(np.int32))

        def step_pool(carry, idx=idx):
            (xc,) = carry
            return (kapi.graph_max_pool(xc, idx) * 0.999,)

        dt = _marginal_scan_time(step_pool, (x,), k_short=1, k_long=9)
        print(f'pool  c={c:4d}: {dt * 1e3:6.2f} ms')

    # final conv 960 -> 1024 + global max
    x = jnp.asarray(rng.standard_normal((batch, n, 512)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((512, 1024)).astype(np.float32) * 0.01)

    def step_final(carry):
        (xc,) = carry
        y = jnp.max(jnp.dot(xc, w), axis=1)
        return (xc + 1e-6 * y[:, None, :512],)

    dt = _marginal_scan_time(step_final, (x,), k_short=1, k_long=9)
    print(f'final conv 512->1024 + max: {dt * 1e3:6.2f} ms')


if __name__ == '__main__':
    main()
