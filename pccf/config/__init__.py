"""Configuration layer: YAML composition, typed specs, experiment context."""

from pccf.config.cli import DEFAULT_CONFIG_DIR, get_config_all, hydra_main
from pccf.config.compose import apply_overrides, compose
from pccf.config.experiment import Experiment, update_exp_name
from pccf.config.specs import (
    AllConfig,
    AutoEncoderConfig,
    AutoEncoderExperimentConfig,
    ClassifierConfig,
    ClassifierExperimentConfig,
    DataConfig,
    validate_config,
)

__all__ = [
    'DEFAULT_CONFIG_DIR',
    'AllConfig',
    'AutoEncoderConfig',
    'AutoEncoderExperimentConfig',
    'ClassifierConfig',
    'ClassifierExperimentConfig',
    'DataConfig',
    'Experiment',
    'apply_overrides',
    'compose',
    'get_config_all',
    'hydra_main',
    'update_exp_name',
    'validate_config',
]
