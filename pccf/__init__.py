"""pccf — TPU-native point-cloud counterfactual framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
nverchev/PointCloudCounterfactual: DGCNN classification, VQ-VAE point-cloud
autoencoding, hierarchical conditional W-autoencoder, and feed-forward
counterfactual generation — with Pallas TPU kernels for Chamfer / EMD /
kNN and pjit data-parallel training over a device mesh.
"""

__version__ = '0.1.0'
