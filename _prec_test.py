import numpy as np, jax, jax.numpy as jnp, sys
from bench import _marginal_scan_time

rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal((8192, 1024)).astype(np.float32))
w = jnp.asarray(rng.standard_normal((1024, 1024)).astype(np.float32))
flops = 2 * 8192 * 1024 * 1024

for prec in ('default', 'bfloat16', 'tensorfloat32', 'float32', 'highest'):
    def step(carry, prec=prec):
        (ac,) = carry
        p = None if prec == 'default' else prec
        y = jax.lax.dot_general(ac, w, (((1,), (0,)), ((), ())), precision=p)
        return (y * 1e-3,)
    try:
        dt = min(_marginal_scan_time(step, (a,), k_short=2, k_long=18) for _ in range(2))
        print(f'{prec:>14}: {dt*1e6:8.1f} us  {flops/dt/1e12:7.1f} TFLOP/s')
    except Exception as e:
        print(f'{prec:>14}: error {str(e)[:80]}')
    sys.stdout.flush()

ab = a.astype(jnp.bfloat16); wb = w.astype(jnp.bfloat16)
def stepb(carry):
    (ac,) = carry
    y = jax.lax.dot_general(ac, wb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return (y.astype(jnp.bfloat16) * 1e-3,)
dt = min(_marginal_scan_time(stepb, (ab,), k_short=2, k_long=18) for _ in range(2))
print(f'{"bf16 in/out":>14}: {dt*1e6:8.1f} us  {flops/dt/1e12:7.1f} TFLOP/s')
