"""Neural-network layer and module library (flax.linen, channels-last)."""

from pccf.nn.classifier import DGCNNClassifier, get_classifier
from pccf.nn.decoders import PCGenDecoder, get_decoder
from pccf.nn.encoders import DGCNNEncoder, LDGCNNEncoder, get_encoder
from pccf.nn.layers import (
    DenseBlock,
    MLPHead,
    TransformerDecoderLayer,
    TransformerEncoderLayer,
    default_act,
    gumbel_softmax,
    temperature_softmax,
)

__all__ = [
    'DGCNNClassifier',
    'DGCNNEncoder',
    'DenseBlock',
    'LDGCNNEncoder',
    'MLPHead',
    'PCGenDecoder',
    'TransformerDecoderLayer',
    'TransformerEncoderLayer',
    'default_act',
    'get_classifier',
    'get_decoder',
    'get_encoder',
    'gumbel_softmax',
    'temperature_softmax',
]
