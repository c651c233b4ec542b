"""Hierarchical conditional W-autoencoder (reference src/module/w_autoencoders.py).

The inner CVAE over the VQ-VAE's discrete latent codes.  Functional design:
the codebook is an explicit argument (the reference registers a non-persistent
buffer copy, w_autoencoders.py:124-129); randomness comes from the linen
``sampling`` RNG stream.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from pccf.data.structures import Outputs, WInputs
from pccf.kernels import ops
from pccf.nn.layers import temperature_softmax

Array = jax.Array


class WAutoEncoder(nn.Module):
    """Two-level conditional VAE over code embeddings.

    ``conditional=False`` reproduces the reference ``WAutoEncoder`` (uniform
    class probabilities); ``conditional=True`` the ``CounterfactualWAutoEncoder``
    (tempered softmax of classifier logits, w_autoencoders.py:238-287).
    """

    encoder: nn.Module
    decoder: nn.Module
    z2_prior: nn.Module
    z2_posterior: nn.Module
    n_codes: int
    embedding_dim: int
    book_size: int
    z1_dim: int
    z2_dim: int
    n_classes: int
    n_pseudo_inputs: int = 0
    conditional: bool = True
    cf_temperature: float = 5.0

    def setup(self) -> None:
        if self.n_pseudo_inputs > 0:
            init = nn.initializers.normal(1.0)
            self.pseudo_inputs = self.param(
                'pseudo_inputs', init, (self.n_pseudo_inputs, self.n_codes, self.embedding_dim)
            )

    # ------------------------------------------------------------------ core
    def __call__(self, inputs: WInputs, codebook: Array, train: bool = False) -> Outputs:
        x = inputs.w_q.reshape(-1, self.n_codes, self.embedding_dim)
        data = self.encode_z1(x, train)
        data = data.replace(probs=self.get_probabilities(inputs, x.shape[0]))
        data = self.encode_z2(x, data, train)
        data = self.sample_posterior(data)
        return self.decode(data, codebook, train)

    def encode_z1(self, x: Array | None, train: bool = False) -> Outputs:
        """Discrete -> continuous z1 stats; splits off pseudo-input stats."""
        data = Outputs()
        inp = self._get_input(x)
        latent = self.encoder(inp, train)
        if self.n_pseudo_inputs > 0:
            latent, pseudo = latent[: -self.n_pseudo_inputs], latent[-self.n_pseudo_inputs :]
            p_mu, p_log_var = jnp.split(pseudo, 2, axis=2)
            data = data.replace(pseudo_mu1=p_mu, pseudo_log_var1=p_log_var)
        mu1, log_var1 = jnp.split(latent, 2, axis=2)
        return data.replace(mu1=mu1, log_var1=log_var1)

    def encode_z2(self, x: Array, data: Outputs, train: bool = False) -> Outputs:
        p = self.z2_prior(data.probs, train)
        p_mu2, p_log_var2 = jnp.split(p, 2, axis=2)
        d = self.z2_posterior(data.probs, x, train)
        d_mu2, d_log_var2 = jnp.split(d, 2, axis=2)
        return data.replace(p_mu2=p_mu2, p_log_var2=p_log_var2, d_mu2=d_mu2, d_log_var2=d_log_var2)

    def sample_posterior(self, data: Outputs) -> Outputs:
        z1 = self._gaussian_sample(data.mu1, data.log_var1)
        z2 = self._gaussian_sample(data.d_mu2 + data.p_mu2, data.d_log_var2 + data.p_log_var2)
        return data.replace(z1=z1, z2=z2)

    def decode(self, data: Outputs, codebook: Array, train: bool = False) -> Outputs:
        w_recon = self.decoder(data.z1, data.z2, train)
        _, idx, w_dist_2 = ops.vq_assign(w_recon, codebook)
        return data.replace(w_recon=w_recon, idx=idx, w_dist_2=w_dist_2)

    # ------------------------------------------------------- counterfactual
    def generate_counterfactual(
        self,
        inputs: WInputs,
        codebook: Array,
        target_dim: int | Array,
        target_value: float | Array = 1.0,
    ) -> Outputs:
        """Deterministic conditional decode with interpolated probabilities
        (w_autoencoders.py:247-262): z1 = mu1, z2 = p_mu2 + d_mu2."""
        x = inputs.w_q.reshape(-1, self.n_codes, self.embedding_dim)
        old_probs = self.get_probabilities_from_logits(inputs.logits)
        target = jax.nn.one_hot(jnp.asarray(target_dim), self.n_classes, dtype=old_probs.dtype)
        target = jnp.broadcast_to(target, old_probs.shape)
        probs = (1.0 - target_value) * old_probs + target_value * target
        if self._fused_cf_ok():
            w_recon = self._fused_cf(x, probs)
            _, idx, w_dist_2 = ops.vq_assign(w_recon, codebook)
            return Outputs(probs=probs, w_recon=w_recon, idx=idx, w_dist_2=w_dist_2)
        data = self.encode_z1(x, False).replace(probs=probs)
        data = self.encode_z2(x, data, False)
        data = data.replace(z1=data.mu1, z2=data.p_mu2 + data.d_mu2)
        return self.decode(data, codebook, False)

    def _fused_cf_ok(self) -> bool:
        """Dispatch the single-launch fused CVAE kernel for the deterministic
        counterfactual chain (eval only; transformer nets with a shared
        proj_dim and the exact-GELU activation the kernel hard-codes).
        Pseudo-inputs don't gate it: their encode_z1 rows are split off and
        unused by the counterfactual path, and token rows are independent."""
        from pccf.kernels import api as kapi
        from pccf.kernels.pallas_cvae import cvae_cf_supported
        from pccf.nn.layers import gelu_exact
        from pccf.nn.w_networks import (
            TransformerWConditionalEncoder,
            TransformerWDecoder,
            TransformerWEncoder,
        )

        enc, post, dec = self.encoder, self.z2_posterior, self.decoder
        if not (
            isinstance(enc, TransformerWEncoder)
            and isinstance(post, TransformerWConditionalEncoder)
            and isinstance(dec, TransformerWDecoder)
        ):
            return False
        if self.is_initializing() or not kapi.use_pallas():
            return False
        if os.environ.get('PCCF_CVAE_FUSED', '1') == '0':  # A/B kill-switch
            return False
        if not (enc.act is gelu_exact and post.act is gelu_exact and dec.act is gelu_exact):
            return False
        if not enc.proj_dim == post.proj_dim == dec.proj_dim:
            return False
        return cvae_cf_supported(
            self.n_codes,
            enc.proj_dim,
            max(*enc.mlp_dims, *post.mlp_dims, *dec.mlp_dims),
            len(enc.mlp_dims) + len(post.mlp_dims) + len(dec.mlp_dims),
            (enc.n_heads, post.n_heads, dec.n_heads),
            self.embedding_dim,
        )

    def _fused_cf(self, x: Array, probs: Array) -> Array:
        """Run the fused chain; caches packed operands in the ``packed``
        collection when mutable (see w_networks._packed_stack for the
        serving prepack contract)."""
        from pccf.kernels.pallas_cvae import cvae_cf_tpu, pack_cvae_cf_params

        enc, post, dec = self.encoder, self.z2_posterior, self.decoder
        if self.has_variable('packed', 'cvae_cf'):
            operands, prob_ops = self.get_variable('packed', 'cvae_cf')
        else:
            wae_params = {
                'encoder': enc.variables['params'],
                'z2_posterior': post.variables['params'],
                'decoder': dec.variables['params'],
                'z2_prior': self.z2_prior.variables['params'],
            }
            operands, prob_ops = pack_cvae_cf_params(
                wae_params,
                z1_dim=self.z1_dim,
                z2_dim=self.z2_dim,
                l1=len(enc.mlp_dims),
                l2=len(post.mlp_dims),
                ld=len(dec.mlp_dims),
                f1=max(enc.mlp_dims),
                f2=max(post.mlp_dims),
                fd=max(dec.mlp_dims),
            )
            if self.is_mutable_collection('packed'):
                self.put_variable('packed', 'cvae_cf', (operands, prob_ops))
        tokens = cvae_cf_tpu(
            x,
            probs,
            operands,
            prob_ops,
            heads=(enc.n_heads, post.n_heads, dec.n_heads),
            n_layers=(len(enc.mlp_dims), len(post.mlp_dims), len(dec.mlp_dims)),
            embedding_dim=self.embedding_dim,
        )
        return tokens.reshape(x.shape[0], self.n_codes * self.embedding_dim)

    # ------------------------------------------------------------ generation
    def generate_discrete_latent_space(
        self,
        codebook: Array,
        z1_bias: Array | float = 0.0,
        batch_size: int = 1,
        probs: Array | None = None,
    ) -> Outputs:
        """Sample z1/z2 from the priors and decode to code indices
        (w_autoencoders.py:195-205)."""
        data = Outputs()
        z1 = self.sample_z1_prior(batch_size) + z1_bias
        if probs is None:
            probs = self.sample_prob(batch_size)
        p = self.z2_prior(probs, False)
        p_mu2, p_log_var2 = jnp.split(p, 2, axis=2)
        z2 = self._gaussian_sample(p_mu2, p_log_var2)
        data = data.replace(z1=z1, z2=z2, probs=probs)
        return self.decode(data, codebook, False)

    def sample_z1_prior(self, batch_size: int = 1) -> Array:
        if self.n_pseudo_inputs > 0:
            pseudo = self.encode_z1(None, False)
            rng = self.make_rng('sampling')
            which = jax.random.randint(rng, (batch_size,), 0, self.n_pseudo_inputs)
            mu = pseudo.pseudo_mu1[which]
            log_var = pseudo.pseudo_log_var1[which]
            return self._gaussian_sample(mu, log_var)
        rng = self.make_rng('sampling')
        return jax.random.normal(rng, (batch_size, 1, self.z1_dim))

    def sample_prob(self, batch_size: int = 1) -> Array:
        if self.conditional:
            # Dirichlet(1) sample (w_autoencoders.py:272-275)
            rng = self.make_rng('sampling')
            return jax.random.dirichlet(rng, jnp.ones(self.n_classes), (batch_size,))
        return jnp.full((batch_size, self.n_classes), 1.0 / self.n_classes)

    # -------------------------------------------------------------- helpers
    def get_probabilities(self, inputs: WInputs, batch_size: int) -> Array:
        if self.conditional:
            return self.get_probabilities_from_logits(inputs.logits)
        return jnp.full((batch_size, self.n_classes), 1.0 / self.n_classes)

    def get_probabilities_from_logits(self, logits: Array) -> Array:
        return temperature_softmax(logits, self.cf_temperature, axis=1)

    def _gaussian_sample(self, mu: Array, log_var: Array) -> Array:
        rng = self.make_rng('sampling')
        eps = jax.random.normal(rng, mu.shape)
        return eps * jnp.exp(0.5 * log_var) + mu

    def _get_input(self, x: Array | None) -> Array:
        if self.n_pseudo_inputs == 0:
            if x is None:
                raise ValueError('No input available.')
            return x
        if x is None:
            return self.pseudo_inputs
        return jnp.concatenate([x, self.pseudo_inputs], axis=0)


class WAETrainModule(nn.Module):
    """Stage-2 training shell: the inner CVAE with the frozen codebook held
    in a non-trained ``constants`` collection (the reference copies the
    codebook into a non-persistent buffer, train_w_autoencoder.py:37)."""

    wae: WAutoEncoder

    @nn.compact
    def __call__(self, inputs: WInputs, train: bool = False) -> Outputs:
        codebook = self.variable(
            'constants',
            'codebook',
            lambda: jnp.zeros((self.wae.n_codes, self.wae.book_size, self.wae.embedding_dim)),
        )
        return self.wae(inputs, codebook.value, train)


def get_w_autoencoder(cfg, conditional: bool = True) -> WAutoEncoder:
    """Build the inner CVAE from the full AllConfig."""
    from pccf.nn.w_networks import (
        ConditionalPrior,
        get_conditional_w_encoder,
        get_w_decoder,
        get_w_encoder,
    )

    ae = cfg.autoencoder.model
    wae = cfg.w_autoencoder.model
    return WAutoEncoder(
        encoder=get_w_encoder(cfg),
        decoder=get_w_decoder(cfg),
        z2_prior=ConditionalPrior(n_codes=ae.n_codes, z2_dim=wae.z2_dim),
        z2_posterior=get_conditional_w_encoder(cfg),
        n_codes=ae.n_codes,
        embedding_dim=ae.embedding_dim,
        book_size=ae.book_size,
        z1_dim=wae.z1_dim,
        z2_dim=wae.z2_dim,
        n_classes=cfg.data.dataset.n_classes,
        n_pseudo_inputs=wae.n_pseudo_inputs,
        conditional=conditional,
        cf_temperature=wae.cf_temperature,
    )
