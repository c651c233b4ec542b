"""Post-tunnel-recovery validation: kernels parity + timing, then bench."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import numpy as np
import jax, jax.numpy as jnp

t0 = time.time()
d = jax.devices()
print('devices:', d, f'({time.time()-t0:.1f}s)'); sys.stdout.flush()

from pccf.kernels import ops
from pccf.kernels.pallas_knn import knn_tpu
from bench import _marginal_scan_time

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((2, 512, 3)).astype(np.float32))
idx = np.asarray(knn_tpu(x, 25)); ref = np.asarray(ops.knn(x, 25))
bad = sum(set(idx[b, i]) != set(ref[b, i]) for b in range(2) for i in range(512))
print('knn8 set mismatches:', bad, '/ 1024'); sys.stdout.flush()

for c in (3, 128):
    xb = jnp.asarray(rng.standard_normal((16, 2048, c)).astype(np.float32))
    def step(carry):
        (xc,) = carry
        i = knn_tpu(xc, 25)
        return (xc + 1e-6 * i[..., :1].astype(jnp.float32),)
    dt = min(_marginal_scan_time(step, (xb,), k_short=2, k_long=10) for _ in range(2))
    print(f'knn8 c={c}: {dt*1e3:5.2f} ms'); sys.stdout.flush()

# fused decoder parity + timing at flagship shapes
import os, flax
from pccf.nn.decoders import PCGenDecoder
W_DIM, N, B, G = 1024, 2048, 16, 8
dec = PCGenDecoder(w_dim=W_DIM, sample_dim=8, n_components=G, map_dims=(64,),
    conv_dims=(1024, 256, 16), tau=5.0, act=jax.nn.relu, act_name='ReLU', filtering=False)
w = jnp.asarray(rng.standard_normal((B, W_DIM)).astype(np.float32))
samp = jnp.asarray(rng.standard_normal((B, N, 8)).astype(np.float32))
variables = dec.init({'params': jax.random.key(0), 'sampling': jax.random.key(1)}, w, N, samp, train=False)
flat = flax.traverse_util.flatten_dict(variables['batch_stats'])
for k, v in list(flat.items()):
    if k[-1] == 'mean': flat[k] = jnp.asarray(rng.normal(0, 0.05, v.shape).astype(np.float32))
    if k[-1] == 'var': flat[k] = jnp.asarray(rng.uniform(0.5, 1.5, v.shape).astype(np.float32))
variables = dict(variables); variables['batch_stats'] = flax.traverse_util.unflatten_dict(flat)
os.environ['PCCF_KERNEL_BACKEND'] = 'pallas'
out_f = np.asarray(dec.apply(variables, w, N, samp, train=False))
os.environ['PCCF_KERNEL_BACKEND'] = 'jnp'
out_s = np.asarray(dec.apply(variables, w, N, samp, train=False))
print(f'fused decoder max abs diff: {np.abs(out_f-out_s).max():.2e} (scale {np.abs(out_s).max():.3f})'); sys.stdout.flush()
os.environ['PCCF_KERNEL_BACKEND'] = 'pallas'
def stepd(carry):
    (wc,) = carry
    o = dec.apply(variables, wc, N, samp, train=False)
    return (wc + 1e-6 * jnp.mean(o) * wc,)
dt = min(_marginal_scan_time(stepd, (w,), k_short=2, k_long=10) for _ in range(2))
print(f'fused decode (no filter): {dt*1e3:5.2f} ms'); sys.stdout.flush()
