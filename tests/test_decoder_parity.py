"""PCGen decoder fidelity vs a torch oracle of the reference semantics.

Oracle re-states decoders.py:108-134 (channels-first): map MLP (ReLU stack +
Hardtanh head), elementwise join with the latent, per-component residual
stacks with BN, soft-init heads, tempered-softmax attention mixing (eval
path).  Graph filtering is covered by its own golden test and disabled here.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from pccf.nn.decoders import PCGenDecoder

W_DIM, SAMPLE_DIM, N_COMP, B, N_OUT = 8, 4, 2, 2, 16
MAP_DIMS, CONV_DIMS = (4,), (8, 4)
TAU = 5.0


def _bn_eval_t(z, p, s, eps=1e-5):
    scale = torch.from_numpy(np.asarray(p['scale']))
    bias = torch.from_numpy(np.asarray(p['bias']))
    mean = torch.from_numpy(np.asarray(s['mean']))
    var = torch.from_numpy(np.asarray(s['var']))
    return (z - mean) / torch.sqrt(var + eps) * scale + bias


def _dense_t(z, p):
    w = torch.from_numpy(np.asarray(p['kernel']))
    z = z @ w
    if 'bias' in p:
        z = z + torch.from_numpy(np.asarray(p['bias']))
    return z


def test_pcgen_eval_matches_torch_oracle():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((B, W_DIM)).astype(np.float32)
    sampling = rng.standard_normal((B, N_OUT, SAMPLE_DIM)).astype(np.float32)

    dec = PCGenDecoder(
        w_dim=W_DIM,
        sample_dim=SAMPLE_DIM,
        n_components=N_COMP,
        map_dims=MAP_DIMS,
        conv_dims=CONV_DIMS,
        tau=TAU,
        act=jax.nn.relu,
        act_name='ReLU',
        filtering=False,
    )
    variables = dec.init(
        {'params': jax.random.key(0), 'sampling': jax.random.key(1)},
        jnp.asarray(w), N_OUT, jnp.asarray(sampling), train=False,
    )
    # randomise BN stats so normalisation is exercised
    import flax

    flat = flax.traverse_util.flatten_dict(variables.get('batch_stats', {}))
    for k, v in list(flat.items()):
        if k[-1] == 'mean':
            flat[k] = jnp.asarray(rng.normal(0, 0.05, v.shape).astype(np.float32))
        if k[-1] == 'var':
            flat[k] = jnp.asarray(rng.uniform(0.5, 1.5, v.shape).astype(np.float32))
    variables = dict(variables)
    variables['batch_stats'] = flax.traverse_util.unflatten_dict(flat)

    out_jax = np.asarray(
        dec.apply(variables, jnp.asarray(w), N_OUT, jnp.asarray(sampling), train=False)
    )

    # ---- torch oracle ------------------------------------------------------
    p = variables['params']
    s = variables['batch_stats']
    x = torch.from_numpy(sampling)  # (B, N, sample_dim) channels-last oracle
    # map stack: ReLU dense layers then Hardtanh head (no BN)
    x = torch.relu(_dense_t(x, p['map_0']['dense']))
    x = torch.nn.functional.hardtanh(_dense_t(x, p['map_out']['dense']))
    # join: w (B, w_dim) broadcast over points
    x = torch.from_numpy(w)[:, None, :] * x  # (B, N, w_dim)

    comps, atts = [], []
    for g in range(N_COMP):
        z = x
        for i, f in enumerate(CONV_DIMS):
            blk = p['components'][f'conv_{i}']
            bs = s['components'][f'conv_{i}']
            # vmapped params: leading component axis must be indexed
            pre = _dense_t(z, {kk: np.asarray(vv)[g] for kk, vv in blk['dense'].items()})
            pre = _bn_eval_t(
                pre,
                {kk: np.asarray(vv)[g] for kk, vv in blk['bn'].items()},
                {kk: np.asarray(vv)[g] for kk, vv in bs['bn'].items()},
            )
            pre = torch.relu(pre)
            reps = f // z.shape[-1] + 1
            res = z.repeat_interleave(reps, dim=-1)[..., :f]
            z = pre + res
        atts.append(z)
        head = {kk: torch.from_numpy(np.asarray(vv)[g]) for kk, vv in p['component_heads']['dense'].items()}
        comps.append(z @ head['kernel'] + head['bias'])
    att_in = torch.cat(atts, dim=-1)
    att = _dense_t(att_in, p['att']['dense'])
    att = torch.softmax(att / TAU, dim=-1)  # (B, N, G)
    out_torch = sum(att[..., g : g + 1] * comps[g] for g in range(N_COMP)).numpy()

    np.testing.assert_allclose(out_jax, out_torch, atol=5e-5)
