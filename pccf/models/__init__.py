"""Model compositions: VQ-VAE family + inner W-autoencoder + counterfactual API."""

from pccf.models.autoencoders import VQVAE, get_autoencoder
from pccf.models.w_autoencoders import WAutoEncoder, get_w_autoencoder

__all__ = ['VQVAE', 'WAutoEncoder', 'get_autoencoder', 'get_w_autoencoder']
