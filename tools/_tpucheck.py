import time
t0 = time.time()
import jax
print("import ok", time.time()-t0, flush=True)
d = jax.devices()
print("devices:", d, time.time()-t0, flush=True)
import jax.numpy as jnp
x = jnp.ones((256,256))
print("matmul:", float((x@x).sum()), time.time()-t0, flush=True)
