import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
import time
import numpy as np
import jax.numpy as jnp
from pccf.kernels.auction_emd import auction_emd
from scipy.optimize import linear_sum_assignment

rng = np.random.default_rng(0)
for n, eps, iters, k in [(2048, 0.002, 10000, 256), (2048, 0.005, 50, 256), (2048, 0.002, 10000, 512)]:
    x = rng.random((1, n, 3)).astype(np.float32)
    y = rng.random((1, n, 3)).astype(np.float32)
    t0 = time.time()
    dis, a = auction_emd(jnp.asarray(x), jnp.asarray(y), eps=eps, iters=iters, k_active=k)
    dis, a = np.asarray(dis), np.asarray(a)
    dt = time.time() - t0
    conv = (a >= 0).all()
    got = dis[0].sum()
    d2 = ((x[0][:, None] - y[0][None]) ** 2).sum(-1)
    r, c = linear_sum_assignment(d2)
    opt = d2[r, c].sum()
    print(f'n={n} eps={eps} iters={iters} k={k}: t={dt:.1f}s conv={conv} cost={got:.4f} opt={opt:.4f} ratio={got/opt:.4f}')
