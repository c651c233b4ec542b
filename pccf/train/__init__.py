"""Training harness: objectives, losses, runners, schedulers, hooks, trackers."""

from pccf.train.hooks import (
    DiscreteSpaceOptimizer,
    EarlyStoppingCallback,
    Hook,
    StaticHook,
    call_every,
    get_moving_average,
    get_trailing_mean,
    saving_hook,
)
from pccf.train.loader import DataLoader, take_from_dataset
from pccf.train.losses import (
    get_autoencoder_loss,
    get_classification_loss,
    get_w_autoencoder_loss,
)
from pccf.train.model import Model, ModelEpoch
from pccf.train.objectives import Loss, Metric, Objective, compute_metrics
from pccf.train.runners import ConvergenceError, Diagnostic, StopTraining, Test, Trainer
from pccf.train.schedulers import LearningSchema, get_learning_schema
from pccf.train.tp import TPTrainer, tp_state, tp_train_step
from pccf.train.trackers import TrackerNotUsedError, get_trackers

__all__ = [
    'ConvergenceError',
    'DataLoader',
    'take_from_dataset',
    'Diagnostic',
    'DiscreteSpaceOptimizer',
    'EarlyStoppingCallback',
    'Hook',
    'LearningSchema',
    'Loss',
    'Metric',
    'Model',
    'ModelEpoch',
    'Objective',
    'StaticHook',
    'StopTraining',
    'Test',
    'TrackerNotUsedError',
    'Trainer',
    'call_every',
    'compute_metrics',
    'get_autoencoder_loss',
    'get_classification_loss',
    'get_learning_schema',
    'get_moving_average',
    'get_trackers',
    'get_trailing_mean',
    'get_w_autoencoder_loss',
    'saving_hook',
    'TPTrainer',
    'tp_state',
    'tp_train_step',
]
