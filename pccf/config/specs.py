"""Typed configuration tree (pydantic), JAX-native.

Mirrors the reference's config surface (src/config/specs.py) field-for-field;
torch-specific resolutions are replaced by JAX equivalents:

- ``act_name`` resolves to a ``jax.nn`` activation (``act_cls`` property).
- ``optimizer_name`` resolves to an optax constructor (``optimizer_cls``).
- ``user.device`` becomes the jax platform choice (``cpu`` flag).
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Annotated, Any, Callable, Self

from pydantic import Field, model_validator
from pydantic.dataclasses import dataclass

from pccf.config.environment import VERSION, EnvSettings
from pccf.config.options import (
    AutoEncoders,
    Classifiers,
    ClipCriterion,
    Datasets,
    Decoders,
    Encoders,
    GradOp,
    ReconLosses,
    Schedulers,
    WConditionalEncoders,
    WDecoders,
    WEncoders,
)

PositiveInt = Annotated[int, Field(ge=0)]
StrictlyPositiveInt = Annotated[int, Field(gt=0)]
PositiveFloat = Annotated[float, Field(ge=0)]
StrictlyPositiveFloat = Annotated[float, Field(gt=0)]


def get_activation(name: str) -> Callable:
    """Resolve a torch-style activation name to a jax.nn function.

    Returns *shared* callables (``default_act`` for the leaky-ReLU default)
    so fast-path dispatchers can identity-check the configured activation
    against the known monotone ones."""
    import jax

    from pccf.nn.layers import default_act, gelu_exact

    registry: dict[str, Callable] = {
        '': default_act,  # LeakyReLU(0.2), the reference DEFAULT_ACT
        'LeakyReLU': default_act,
        'ReLU': jax.nn.relu,
        # exact erf form (torch.nn.GELU default; jax defaults to tanh approx)
        'GELU': gelu_exact,
        'Hardtanh': jax.nn.hard_tanh,
        'Tanh': jax.nn.tanh,
        'SiLU': jax.nn.silu,
        'Sigmoid': jax.nn.sigmoid,
        'ELU': jax.nn.elu,
    }
    if name not in registry:
        raise ValueError(f'Unknown activation {name!r}')
    return registry[name]


def get_optimizer(name: str):
    """Resolve a torch-style optimizer name to an optax constructor."""
    import optax

    registry = {
        'AdamW': lambda lr, weight_decay=0.0, **kw: optax.adamw(lr, weight_decay=weight_decay, **kw),
        # torch Adam applies COUPLED L2 (grad += wd*p before the moment
        # estimates) — decay-before-transform, not AdamW's decoupled decay
        'Adam': lambda lr, weight_decay=0.0, **kw: optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.adam(lr, **kw),
        ),
        'SGD': lambda lr, weight_decay=0.0, momentum=0.0, **kw: optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.sgd(lr, momentum=momentum or None, **kw),
        ),
        'RMSprop': lambda lr, weight_decay=0.0, **kw: optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.rmsprop(lr, **kw),
        ),
    }
    if name not in registry:
        raise ValueError(f'Unknown optimizer {name!r}')
    return registry[name]


@dataclass
class DatasetConfig:
    name: Datasets
    n_classes: PositiveInt
    settings: dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclass
class DataConfig:
    dataset: DatasetConfig
    n_input_points: StrictlyPositiveInt
    n_target_points: StrictlyPositiveInt
    translate: bool
    rotate: bool
    jitter_sigma: PositiveFloat
    jitter_clip: PositiveFloat
    resample: bool
    n_neighbors: StrictlyPositiveInt


@dataclass(kw_only=True)
class ArchitectureConfig:
    """Optional conv + MLP/transformer architecture block."""

    conv_dims: tuple[StrictlyPositiveInt, ...] = dataclasses.field(default_factory=tuple)
    mlp_dims: tuple[StrictlyPositiveInt, ...] = dataclasses.field(default_factory=tuple)
    n_heads: StrictlyPositiveInt = 1
    proj_dim: StrictlyPositiveInt = 1
    dropout_rates: tuple[PositiveFloat, ...] = dataclasses.field(default_factory=tuple)
    act_name: str = ''

    @property
    def act_cls(self) -> Callable:
        return get_activation(self.act_name)

    @model_validator(mode='after')
    def _check_length_dropout(self) -> Self:
        if len(self.mlp_dims) > len(self.dropout_rates):
            msg = 'Number of hidden dimensions {} and dropouts {} not compatible.'
            raise ValueError(msg.format(len(self.mlp_dims), len(self.dropout_rates)))
        return self


@dataclass
class EncoderConfig(ArchitectureConfig):
    class_name: Encoders
    n_neighbors: StrictlyPositiveInt


@dataclass
class DecoderConfig(ArchitectureConfig):
    class_name: Decoders
    sample_dim: StrictlyPositiveInt
    n_components: StrictlyPositiveInt
    map_dims: tuple[StrictlyPositiveInt, ...]
    tau: PositiveFloat
    filter: bool


@dataclass
class WEncoderConfig(ArchitectureConfig):
    class_name: WEncoders


@dataclass
class WDecoderConfig(ArchitectureConfig):
    class_name: WDecoders


@dataclass
class WConditionalEncoderConfig(ArchitectureConfig):
    class_name: WConditionalEncoders


@dataclass
class AutoEncoderConfig:
    name: str
    class_name: AutoEncoders
    encoder: EncoderConfig
    decoder: DecoderConfig
    book_size: StrictlyPositiveInt
    embedding_dim: StrictlyPositiveInt
    w_dim: StrictlyPositiveInt
    vq_noise: PositiveFloat

    @model_validator(mode='after')
    def _w_dim_divisible(self):
        if self.w_dim % self.embedding_dim:
            raise ValueError(
                f'w_dim ({self.w_dim}) must be divisible by embedding_dim '
                f'({self.embedding_dim}): the latent reshapes to '
                f'(n_codes, embedding_dim)'
            )
        return self

    @property
    def n_codes(self) -> int:
        return self.w_dim // self.embedding_dim


@dataclass
class WAutoEncoderConfig:
    name: str
    w_decoder: WDecoderConfig
    w_encoder: WEncoderConfig
    conditional_w_encoder: WConditionalEncoderConfig
    z1_dim: StrictlyPositiveInt
    z2_dim: StrictlyPositiveInt
    # a divisor in temperature_softmax (layers.py): zero/negative would turn
    # every conditional encode into NaN/inverted probabilities
    cf_temperature: StrictlyPositiveFloat
    n_pseudo_inputs: PositiveInt


@dataclass
class ClassifierConfig(ArchitectureConfig):
    name: str
    class_name: Classifiers
    n_neighbors: StrictlyPositiveInt
    feature_dim: StrictlyPositiveInt


@dataclass
class SchedulerConfig:
    function: Schedulers
    restart_interval: PositiveInt
    restart_fraction: PositiveFloat
    warmup_steps: PositiveInt
    settings: dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclass
class LearningConfig:
    optimizer_name: str
    learning_rate: PositiveFloat
    grad_op: GradOp | None
    clip_criterion: ClipCriterion
    scheduler: SchedulerConfig
    opt_settings: dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def optimizer_cls(self):
        return get_optimizer(self.optimizer_name)


@dataclass
class EarlyStoppingConfig:
    active: bool
    window: int = 1
    patience: int = 10


@dataclass
class TrainingConfig:
    batch_size: StrictlyPositiveInt
    learn: LearningConfig
    n_epochs: StrictlyPositiveInt
    early_stopping: EarlyStoppingConfig
    n_subprocesses: PositiveInt = Field(default=0, alias='_n_subprocesses')

    @model_validator(mode='after')
    def _check_divisible(self) -> Self:
        if self.n_subprocesses and self.batch_size % self.n_subprocesses != 0:
            msg = 'Global batch size {} not divisible by number of devices {}.'
            raise ValueError(msg.format(self.batch_size, self.n_subprocesses))
        return self

    @property
    def batch_size_per_device(self) -> int:
        if self.n_subprocesses == 0:
            return self.batch_size
        return self.batch_size // self.n_subprocesses


@dataclass
class ObjectiveAEConfig:
    n_inference_output_points: StrictlyPositiveInt
    recon_loss: ReconLosses
    c_embedding: PositiveFloat


@dataclass
class ObjectiveWAEConfig:
    c_kld1: PositiveFloat
    c_kld2: PositiveFloat


@dataclass
class PlottingOptions:
    interactive: bool
    sample_indices: list[PositiveInt]


@dataclass
class GenerationOptions:
    batch_size: StrictlyPositiveInt
    bias_dim: PositiveInt
    bias_value: float


@dataclass
class ExportOptions:
    """Deployment-artifact export (export_artifact.py / pccf.export)."""

    path: str | None = None  # default: <version_dir>/artifacts/<name>
    platforms: tuple[str, ...] = dataclasses.field(default_factory=tuple)  # () = current
    include_generate: bool = True


@dataclass
class TrackerList:
    wandb: bool
    hydra: bool
    csv: bool
    tensorboard: bool
    sqlalchemy: bool


class PathSpecs:
    """Directory layout (env-var backed)."""

    def __init__(self) -> None:
        env = EnvSettings()
        self.root_exp_dir: pathlib.Path = env.root_exp_dir
        self.data_dir: pathlib.Path = env.dataset_dir
        self.metadata_dir: pathlib.Path = env.metadata_dir

    @property
    def version_dir(self) -> pathlib.Path:
        return self.root_exp_dir / f'v{VERSION}'


@dataclass
class UserSettings:
    cpu: bool
    n_workers: PositiveInt
    n_subprocesses: PositiveInt
    generate: GenerationOptions
    trackers: TrackerList
    plot: PlottingOptions
    seed: int | None
    checkpoint_every: PositiveInt
    n_inference_output_points: int
    load_checkpoint: int = -1
    counterfactual_value: PositiveFloat = 1.0
    export: ExportOptions = dataclasses.field(default_factory=ExportOptions)

    def __post_init__(self) -> None:
        self.path = PathSpecs()

    @property
    def platform(self) -> str | None:
        """jax platform override ('cpu' when requested, else default)."""
        return 'cpu' if self.cpu else None


@dataclass
class ExperimentConfig:
    name: str
    train: TrainingConfig
    model: Any
    objective: Any


@dataclass
class ClassifierExperimentConfig(ExperimentConfig):
    model: ClassifierConfig
    objective: Any = None


@dataclass
class AutoEncoderExperimentConfig(ExperimentConfig):
    model: AutoEncoderConfig
    objective: ObjectiveAEConfig
    diagnose_every: StrictlyPositiveInt
    n_training_output_points: StrictlyPositiveInt


@dataclass
class WAutoEncoderExperimentConfig(ExperimentConfig):
    model: WAutoEncoderConfig
    objective: ObjectiveWAEConfig


@dataclass
class AllConfig:
    variation: str
    final: bool
    classifier: ClassifierExperimentConfig
    autoencoder: AutoEncoderExperimentConfig
    w_autoencoder: WAutoEncoderExperimentConfig
    user: UserSettings
    data: DataConfig
    tags: list[str] = dataclasses.field(default_factory=list)

    version = f'v{VERSION}'

    @property
    def name(self) -> str:
        out = f'{self.variation}_final' if self.final else self.variation
        return out[:255]

    @property
    def project(self) -> str:
        return 'PointCloudCounterfactual' + str(self.version)


def validate_config(tree: dict[str, Any]) -> AllConfig:
    """Validate a composed dict into the typed AllConfig."""
    from pydantic import TypeAdapter

    return TypeAdapter(AllConfig).validate_python(tree)
