"""On-chip A/B probe for the kNN extraction pairing and pool unroll.

Env toggles are read at trace time, so each configuration runs in its own
process:

  python _knn_pool_probe.py                       # paired kNN, unroll 4
  PCCF_KNN_NO_PAIR=1 python _knn_pool_probe.py    # single-tile kNN
  PCCF_POOL_UNROLL=8 python _knn_pool_probe.py    # 8-row pool unroll

Also times the chamfer fwd vs fwd+bwd split to locate the XLA glue cost.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    import bench as benchmod
    from pccf.kernels.pallas_chamfer import chamfer_tpu
    from pccf.kernels.pallas_gather import graph_max_pool_tpu
    from pccf.kernels.pallas_knn import knn_tpu

    print(
        f"config: PCCF_KNN_NO_PAIR={os.environ.get('PCCF_KNN_NO_PAIR', '')!r} "
        f"PCCF_KNN_GROUP={os.environ.get('PCCF_KNN_GROUP', '2')!r} "
        f"PCCF_KNN_MXU={os.environ.get('PCCF_KNN_MXU', '')!r} "
        f"PCCF_POOL_UNROLL={os.environ.get('PCCF_POOL_UNROLL', '4')!r}",
        flush=True,
    )
    rng = np.random.default_rng(0)
    b, n, k, c = 16, 2048, 20, 64
    x = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))

    # kNN: chain the calls through a data dependency (marginal-scan method)
    def knn_step(carry):
        feats = carry
        idx = knn_tpu(feats, k)
        return feats + 1e-6 * idx[..., :1].astype(jnp.float32)

    dt = benchmod._marginal_scan_time(knn_step, (x,), k_short=2, k_long=10)
    print(f'knn (B={b}, N={n}, C={c}, k={k}): {dt * 1e3:.3f} ms/call', flush=True)

    # pool: fixed indices, chained values
    idx0 = knn_tpu(x, k)

    def pool_step(carry):
        feats = carry
        out = graph_max_pool_tpu(feats, idx0)
        return feats + 1e-6 * out

    dt = benchmod._marginal_scan_time(pool_step, (v,), k_short=2, k_long=10)
    print(f'max-pool (B={b}, N={n}, C={c}, k={k}): {dt * 1e3:.3f} ms/call', flush=True)

    # chamfer fwd vs fwd+bwd at the loss bench shapes
    xb = jnp.asarray(rng.standard_normal((8, 2048, 3)).astype(np.float32) / 2)
    yb = jnp.asarray(rng.standard_normal((8, 2048, 3)).astype(np.float32) / 2)

    def fwd_step(carry):
        cx, cy = carry
        d = chamfer_tpu(cx, cy)
        return cx + 1e-6 * d[:, None, None], cy

    dt_f = benchmod._marginal_scan_time(fwd_step, (xb, yb), k_short=2, k_long=10)

    grad_fn = jax.value_and_grad(lambda a, b_: jnp.sum(chamfer_tpu(a, b_)), argnums=(0, 1))

    def fb_step(carry):
        cx, cy = carry
        _, (gx, gy) = grad_fn(cx, cy)
        return cx + 1e-3 * gx, cy + 1e-3 * gy

    dt_fb = benchmod._marginal_scan_time(fb_step, (xb, yb), k_short=2, k_long=10)
    print(
        f'chamfer (B=8, N=2048): fwd {dt_f * 1e3:.3f} ms  fwd+bwd {dt_fb * 1e3:.3f} ms '
        f'(bwd glue {max(dt_fb - dt_f, 0) * 1e3:.3f} ms)',
        flush=True,
    )


if __name__ == '__main__':
    main()
