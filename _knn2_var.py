"""A/B: tile-pair interleaved kNN extraction (ILP experiment, not shipped)."""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _marginal_scan_time
from pccf.kernels.pallas_knn import _cross_bf16x3, knn_tpu

_TILE = 128
_BIG = 1e30
NET8 = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7), (1, 2), (5, 6),
        (0, 4), (1, 5), (2, 6), (3, 7), (1, 4), (3, 6), (2, 4), (3, 5), (3, 4)]


def _prep(x_ref, x, x_sq, cand_ids, lane_ids, t, n, valid_n, mask):
    xt = x_ref[pl.ds(t * _TILE, _TILE), :]
    xt_sq = jnp.sum(xt * xt, axis=-1)[None, :]
    cross = _cross_bf16x3(x, xt)
    d = x_sq - 2.0 * cross + xt_sq
    centres = lane_ids + t * _TILE
    d = jnp.where((cand_ids < valid_n) & (cand_ids != centres), d, _BIG)
    key = (jax.lax.bitcast_convert_type(jnp.maximum(d, 0.0), jnp.int32) & ~mask) | cand_ids
    eighth = n // 8
    q = [key[i * eighth : (i + 1) * eighth] for i in range(8)]
    for a, b in NET8:
        q[a], q[b] = jnp.minimum(q[a], q[b]), jnp.maximum(q[a], q[b])
    return q, centres


def _kernel2(x_ref, idx_ref, *, n, k, valid_n, idx_bits):
    n_tiles = n // _TILE
    cand_ids = jax.lax.broadcasted_iota(jnp.int32, (n, _TILE), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (n, _TILE), 1)
    mask = (1 << idx_bits) - 1
    int_max = jnp.iinfo(jnp.int32).max

    x = x_ref[...]
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)

    def tile_body(tp, _):
        ta, tb = 2 * tp, 2 * tp + 1
        qa, ca = _prep(x_ref, x, x_sq, cand_ids, lane_ids, ta, n, valid_n, mask)
        qb, cb = _prep(x_ref, x, x_sq, cand_ids, lane_ids, tb, n, valid_n, mask)
        outsa, outsb = [ca[:1, :]], [cb[:1, :]]
        for _j in range(k - 1):
            ma = jnp.min(qa[0], axis=0, keepdims=True)
            mb = jnp.min(qb[0], axis=0, keepdims=True)
            outsa.append(ma & mask)
            outsb.append(mb & mask)
            hita = qa[0] == ma
            hitb = qb[0] == mb
            for i in range(7):
                qa[i] = jnp.where(hita, qa[i + 1], qa[i])
                qb[i] = jnp.where(hitb, qb[i + 1], qb[i])
            qa[7] = jnp.where(hita, int_max, qa[7])
            qb[7] = jnp.where(hitb, int_max, qb[7])
        idx_ref[:, pl.ds(ta * _TILE, _TILE)] = jnp.concatenate(outsa, axis=0)
        idx_ref[:, pl.ds(tb * _TILE, _TILE)] = jnp.concatenate(outsb, axis=0)
        return _

    jax.lax.fori_loop(0, n_tiles // 2, tile_body, None)


@functools.partial(jax.jit, static_argnames=('k',))
def knn2(x, k):
    x = jax.lax.stop_gradient(x)
    b, n, c = x.shape
    pad_n = (-n) % (2 * _TILE)
    xp = jnp.pad(x, ((0, 0), (0, pad_n), (0, 0))) if pad_n else x
    np_ = xp.shape[1]
    idx_bits = max(1, (np_ - 1).bit_length())
    kernel = functools.partial(_kernel2, n=np_, k=k, valid_n=n, idx_bits=idx_bits)
    idx = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((None, np_, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, k, np_), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, np_), jnp.int32),
    )(xp)
    return jnp.transpose(idx, (0, 2, 1))[:, :n, :]


if __name__ == '__main__':
    from pccf.kernels import ops

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 512, 3)).astype(np.float32))
    idx = np.asarray(knn2(x, 25))
    ref = np.asarray(ops.knn(x, 25))
    bad = sum(set(idx[b, i]) != set(ref[b, i]) for b in range(2) for i in range(512))
    print('knn2 set mismatches:', bad, '/ 1024')
    sys.stdout.flush()
    for c in (3, 128):
        xb = jnp.asarray(rng.standard_normal((16, 2048, c)).astype(np.float32))
        for name, fn in [('knn8', knn_tpu), ('knn2x', knn2)]:
            def step(carry, fn=fn):
                (xc,) = carry
                i = fn(xc, 25)
                return (xc + 1e-6 * i[..., :1].astype(jnp.float32),)
            dt = min(_marginal_scan_time(step, (xb,), k_short=2, k_long=10) for _ in range(2))
            print(f'{name} c={c}: {dt * 1e3:5.2f} ms')
            sys.stdout.flush()
