"""Registries of selectable component names (reference src/config/options.py)."""

from __future__ import annotations

import enum


class StrEnum(str, enum.Enum):
    def __str__(self) -> str:  # pragma: no cover
        return self.value


class Datasets(StrEnum):
    ModelNet = 'ModelNet'
    ShapenetFlow = 'ShapenetFlow'
    Synthetic = 'Synthetic'  # pccf addition: offline deterministic shapes


class Encoders(StrEnum):
    DGCNN = 'DGCNN'
    LDGCNN = 'LDGCNN'


class Decoders(StrEnum):
    PCGen = 'PCGen'


class WEncoders(StrEnum):
    Convolutional = 'Convolutional'
    Transformer = 'Transformer'


class WDecoders(StrEnum):
    Linear = 'Linear'
    Transformer = 'Transformer'


class WConditionalEncoders(StrEnum):
    Transformer = 'Transformer'


class AutoEncoders(StrEnum):
    AE = 'AE'
    VQVAE = 'VQVAE'
    CounterfactualVQVAE = 'CounterfactualVQVAE'


class Classifiers(StrEnum):
    DGCNN = 'DGCNN'


class GradOp(StrEnum):
    GradParamNormalizer = 'GradParamNormalizer'
    GradZScoreNormalizer = 'GradZScoreNormalizer'
    GradValueClipper = 'GradValueClipper'
    GradNormClipper = 'GradNormClipper'
    HistClipper = 'HistClipper'
    ParamHistClipper = 'ParamHistClipper'


class ClipCriterion(StrEnum):
    ZStat = 'ZStat'
    EMA = 'EMA'


class Schedulers(StrEnum):
    Constant = 'Constant'
    Cosine = 'Cosine'
    Exponential = 'Exponential'


class ReconLosses(StrEnum):
    Chamfer = 'Chamfer'
    ChamferEMD = 'ChamferEMD'
    # Extension beyond the reference registry (options.py:86-88): entropic-OT
    # surrogate for the EMD term, cheaper/tunable vs ApproxMatch.
    ChamferSinkhorn = 'ChamferSinkhorn'
