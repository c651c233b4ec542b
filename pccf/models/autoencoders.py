"""Point-cloud autoencoders: VQ-VAE family (reference src/module/autoencoders.py).

The codebook is a parameter of the outer model; the inner W-autoencoder
receives it explicitly.  The train/inference output-point switch
(autoencoders.py:32-35) is the explicit ``train`` flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pccf.data.structures import Inputs, Outputs, WInputs
from pccf.kernels import ops
from pccf.models.w_autoencoders import WAutoEncoder, get_w_autoencoder

Array = jax.Array


class Oracle(nn.Module):
    """Oracle autoencoder: returns an input subset as the reconstruction
    (reference autoencoders.py:47-54; an upper-bound baseline for recon
    metrics, not in the factory registry)."""

    n_training_output_points: int
    n_inference_output_points: int

    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        n = self.n_training_output_points if train else self.n_inference_output_points
        return Outputs(recon=inputs.cloud[:, :n, :])


class VQVAE(nn.Module):
    """VQ-VAE over point clouds with an embedded (separately trained) inner CVAE.

    ``conditional=True`` corresponds to the reference ``CounterfactualVQVAE``;
    ``False`` to plain ``VQVAE``.
    """

    encoder: nn.Module
    decoder: nn.Module
    w_autoencoder: WAutoEncoder
    n_codes: int
    book_size: int
    embedding_dim: int
    n_training_output_points: int
    n_inference_output_points: int
    conditional: bool = True

    def setup(self) -> None:
        self.codebook = self.param(
            'codebook', nn.initializers.normal(1.0), (self.n_codes, self.book_size, self.embedding_dim)
        )

    def n_output_points(self, train: bool) -> int:
        return self.n_training_output_points if train else self.n_inference_output_points

    # ----------------------------------------------------------- main paths
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        """Encode -> quantise (straight-through) -> decode."""
        data = self.encode(inputs, train)
        return self.decode(data, inputs, train)

    def encode(self, inputs: Inputs, train: bool = False) -> Outputs:
        w_q = self.encoder(inputs.cloud, inputs.indices, train)
        return Outputs(w_q=w_q)

    def decode(self, data: Outputs, inputs: Inputs, train: bool = False) -> Outputs:
        w_e, idx, _ = ops.vq_assign(data.w_q, self.codebook)
        one_hot = ops.one_hot_idx(idx, self.book_size)
        # straight-through: forward w_e, gradient to w_q (autoencoders.py:110-115)
        w = ops.straight_through(w_e, data.w_q)
        data = data.replace(w_e=w_e, idx=idx, one_hot_idx=one_hot, w=w)
        return self._point_decode(data, inputs, train)

    def _point_decode(self, data: Outputs, inputs: Inputs, train: bool) -> Outputs:
        recon = self.decoder(data.w, self.n_output_points(train), inputs.initial_sampling, train)
        return data.replace(recon=recon)

    def encode_quantize(self, inputs: Inputs, train: bool = False) -> Outputs:
        """Frozen encode path for derived datasets (processed.py:89-95)."""
        data = self.encode(inputs, train)
        w_e, idx, _ = ops.vq_assign(data.w_q, self.codebook)
        return data.replace(w_e=w_e, idx=idx, one_hot_idx=ops.one_hot_idx(idx, self.book_size))

    # ------------------------------------------------------ double paths
    def double_reconstruct(self, inputs: Inputs) -> Outputs:
        """Encode -> inner CVAE roundtrip -> decode (autoencoders.py:142-148)."""
        if self.conditional:
            # the conditional inner CVAE needs class logits; without this
            # guard the failure is an opaque TypeError (None/temperature)
            # deep inside temperature_softmax at trace time. Mirrors the
            # reference split (autoencoders.py:142 vs :160).
            raise ValueError(
                'double_reconstruct on a conditional model: use '
                'double_reconstruct_with_logits(inputs, logits)'
            )
        w_q = self.encoder(inputs.cloud, inputs.indices, False)
        data = self.w_autoencoder(WInputs(w_q), self.codebook, False)
        return self._decode_from_idx(data, inputs)

    def double_reconstruct_with_logits(self, inputs: Inputs, logits: Array) -> Outputs:
        """Conditional inner roundtrip (autoencoders.py:160-166)."""
        w_q = self.encoder(inputs.cloud, inputs.indices, False)
        data = self.w_autoencoder(WInputs(w_q, logits), self.codebook, False)
        return self._decode_from_idx(data, inputs)

    def generate_counterfactual(
        self,
        inputs: Inputs,
        sample_logits: Array,
        target_dim: int | Array,
        target_value: float | Array = 1.0,
    ) -> Outputs:
        """Counterfactual decode (autoencoders.py:168-181): encode, interpolate
        the probability condition towards the target class, decode."""
        w_q = self.encoder(inputs.cloud, inputs.indices, False)
        data = self.w_autoencoder.generate_counterfactual(
            WInputs(w_q, sample_logits), self.codebook, target_dim, target_value
        )
        return self._decode_from_idx(data, inputs)

    def generate(
        self,
        batch_size: int = 1,
        initial_sampling: Array | None = None,
        z1_bias: Array | float = 0.0,
        probs: Array | None = None,
    ) -> Outputs:
        """Sample the generative prior and decode (autoencoders.py:121-136)."""
        data = self.w_autoencoder.generate_discrete_latent_space(
            self.codebook, z1_bias, batch_size, probs
        )
        inputs = Inputs(cloud=jnp.zeros((batch_size, 1, 3)), initial_sampling=initial_sampling)
        return self._decode_from_idx(data, inputs)

    def full_init(self, inputs: Inputs, logits: Array) -> Outputs:
        """Touch every submodule so ``init`` materialises the complete param
        tree (reconstruction + inner-CVAE paths).  Use as the ``method=`` of
        ``model.init`` when the checkpoint must cover the whole model, like
        the reference's eagerly-constructed module tree."""
        self(inputs, train=False)
        return self.double_reconstruct_with_logits(inputs, logits)

    def _decode_from_idx(self, data: Outputs, inputs: Inputs) -> Outputs:
        w = ops.vq_lookup(data.idx, self.codebook)
        data = data.replace(w_e=w, w=w)
        return self._point_decode(data, inputs, False)


def get_autoencoder(cfg) -> VQVAE:
    """Factory matching the reference registry (autoencoders.py:187-194)."""
    from pccf.config.options import AutoEncoders
    from pccf.nn.decoders import get_decoder
    from pccf.nn.encoders import get_encoder

    ae_cfg = cfg.autoencoder
    m = ae_cfg.model
    if m.class_name == AutoEncoders.AE:
        raise NotImplementedError(
            'Plain AE is vestigial in the reference (encode returns empty Outputs, '
            'autoencoders.py:71-74); only the VQ family is runnable.'
        )
    conditional = m.class_name == AutoEncoders.CounterfactualVQVAE
    return VQVAE(
        encoder=get_encoder(m),
        decoder=get_decoder(m),
        w_autoencoder=get_w_autoencoder(cfg, conditional=conditional),
        n_codes=m.n_codes,
        book_size=m.book_size,
        embedding_dim=m.embedding_dim,
        n_training_output_points=ae_cfg.n_training_output_points,
        n_inference_output_points=ae_cfg.objective.n_inference_output_points,
        conditional=conditional,
    )
