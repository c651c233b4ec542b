"""PCGen point-cloud decoder (reference src/module/decoders.py).

TPU redesign notes:
- The reference runs its 8 component groups as sequential Conv1d stacks
  (decoders.py:78-90); here they are a single vmapped parameter stack so each
  layer is one batched MXU matmul over all components at once.
- The train/eval Gumbel/temperature attention switch is an explicit ``train``
  flag (the reference switches on ``torch.is_inference_mode_enabled``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from pccf.kernels import api as kapi
from pccf.nn.layers import DenseBlock, default_act, gumbel_softmax, temperature_softmax

Array = jax.Array

OUT_CHAN = 3


class ComponentStack(nn.Module):
    """The residual conv stack of one PCGen component, vmapped over components."""

    conv_dims: tuple[int, ...]
    act: Callable
    act_name: str

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for i, f in enumerate(self.conv_dims):
            x = DenseBlock(
                f, act=self.act, act_name=self.act_name, residual=True, name=f'conv_{i}'
            )(x, train)
        return x


class PCGenDecoder(nn.Module):
    """Map per-point Gaussian samples through an MLP, join with the latent by
    elementwise product, mix ``n_components`` parallel residual stacks with
    (Gumbel-)softmax attention, optionally sharpen with graph filtering.
    """

    w_dim: int
    sample_dim: int
    n_components: int
    map_dims: tuple[int, ...]
    conv_dims: tuple[int, ...]
    tau: float
    act: Callable
    act_name: str = 'ReLU'
    filtering: bool = True

    @nn.compact
    def __call__(
        self,
        w: Array,
        n_output_points: int,
        initial_sampling: Array | None = None,
        train: bool = False,
    ) -> Array:
        batch = w.shape[0]
        if initial_sampling is None:
            rng = self.make_rng('sampling')
            x = jax.random.normal(rng, (batch, n_output_points, self.sample_dim))
        else:
            x = initial_sampling  # (B, n_out, sample_dim)

        # map the sampling to w_dim (ReLU stack + Hardtanh head, no BN)
        for i, f in enumerate(self.map_dims):
            x = DenseBlock(f, act=jax.nn.relu, act_name='ReLU', batch_norm=False, name=f'map_{i}')(x, train)

        # dispatch on the ACTUAL row count: a caller-supplied initial_sampling
        # may have a different length than n_output_points
        if self._fused_eval_ok(x.shape[1], train):
            # the Hardtanh map head + join + components run inside the kernel
            x = self._fused_components(x, w)
            if self.filtering:
                x = kapi.graph_filtering(x)
            return x

        x = DenseBlock(
            self.w_dim, act=jax.nn.hard_tanh, act_name='Hardtanh', batch_norm=False, name='map_out'
        )(x, train)

        # join with the latent: elementwise product (decoders.py:132-134)
        x = w[:, None, :] * x  # (B, N, w_dim)

        # parallel component stacks as one vmapped module
        stack = nn.vmap(
            ComponentStack,
            in_axes=None,
            out_axes=0,
            axis_size=self.n_components,
            variable_axes={'params': 0, 'batch_stats': 0},
            split_rngs={'params': True},
        )(self.conv_dims, self.act, self.act_name, name='components')
        feats = stack(x, train)  # (G, B, N, conv_dims[-1])

        head = nn.vmap(
            DenseBlock,
            in_axes=0,
            out_axes=0,
            axis_size=self.n_components,
            variable_axes={'params': 0},
            split_rngs={'params': True},
        )(OUT_CHAN, act=None, batch_norm=False, soft_init=True, name='component_heads')
        comps = head(feats, False)  # (G, B, N, 3)

        if self.n_components > 1:
            # attention over components from the concatenated stack features
            att_in = jnp.concatenate(
                [feats[g] for g in range(self.n_components)], axis=-1
            )  # (B, N, G * conv_dims[-1])
            att = DenseBlock(self.n_components, act=None, batch_norm=False, name='att')(att_in, train)
            if train:
                att = gumbel_softmax(self.make_rng('sampling'), att, self.tau, axis=-1)
            else:
                att = temperature_softmax(att, self.tau, axis=-1)
            # (B, N, G) x (G, B, N, 3) -> (B, N, 3)
            x = jnp.einsum('bng,gbnc->bnc', att, comps)
        else:
            x = comps[0]

        if self.filtering:
            x = kapi.graph_filtering(x)
        return x

    # ------------------------------------------------- fused eval fast path
    def _fused_eval_ok(self, n_points: int, train: bool) -> bool:
        """Dispatch the fused Pallas component-stack kernel (eval only).

        Training keeps the XLA path (batch-stat BN + gradients); init keeps
        it too so the full param tree is materialised."""
        from pccf.kernels.pallas_pcgen import pcgen_fused_supported

        # The kernel hard-codes the activation from its slope argument, so the
        # configured callable must positively match what act_name implies:
        # ReLU -> jax.nn.relu (slope 0), ''/LeakyReLU -> default_act (0.2).
        # Any other (act, act_name) pair keeps the XLA path.
        act_ok = (self.act is jax.nn.relu and self.act_name == 'ReLU') or (
            self.act is default_act and self.act_name in ('', 'LeakyReLU')
        )
        return (
            not train
            and not self.is_initializing()
            and act_ok
            and kapi.use_pallas()
            and pcgen_fused_supported(n_points, self.w_dim, self.conv_dims, self.n_components)
        )

    def _fused_components(self, m: Array, w: Array) -> Array:
        """Run map head + join + components + attention mix in one Pallas
        kernel.

        Reads the child-module params (created by the XLA path during init)
        from the bound variable tree and folds each BN running-stat affine
        into its dense kernel."""
        from pccf.kernels.pallas_pcgen import fold_bn_affine, pcgen_mix_tpu

        v = self.variables
        params = v['params']
        stats = v['batch_stats']
        layer_ws, layer_bs = [], []
        for i in range(len(self.conv_dims)):
            blk = params['components'][f'conv_{i}']
            st = stats['components'][f'conv_{i}']['bn']
            w_f, b_f = fold_bn_affine(
                blk['dense']['kernel'], blk['bn']['scale'], blk['bn']['bias'],
                st['mean'], st['var'],
            )
            layer_ws.append(w_f)
            layer_bs.append(b_f)
        head = params['component_heads']['dense']
        att = params['att']['dense']
        map_out = params['map_out']['dense']
        slope = 0.0 if self.act_name == 'ReLU' else 0.2
        return pcgen_mix_tpu(
            m,
            w,
            map_out['kernel'],
            map_out['bias'],
            tuple(layer_ws),
            tuple(layer_bs),
            head['kernel'].astype(jnp.bfloat16),
            head['bias'],
            att['kernel'].astype(jnp.bfloat16),
            att['bias'].reshape(1, -1),
            dims=(self.w_dim, *self.conv_dims),
            tau=self.tau,
            act_slope=slope,
        )


def get_decoder(cfg_ae_model) -> nn.Module:
    """Factory matching the reference registry (decoders.py:137-142)."""
    from pccf.config.options import Decoders

    dec = cfg_ae_model.decoder
    if dec.class_name != Decoders.PCGen:
        raise ValueError(f'Unknown decoder {dec.class_name}')
    return PCGenDecoder(
        w_dim=cfg_ae_model.w_dim,
        sample_dim=dec.sample_dim,
        n_components=dec.n_components,
        map_dims=tuple(dec.map_dims),
        conv_dims=tuple(dec.conv_dims),
        tau=dec.tau,
        act=dec.act_cls,
        act_name=dec.act_name,
        filtering=dec.filter,
    )
