"""Stage-2 training: the inner hierarchical conditional W-autoencoder.

pccf counterpart of the reference entry point (train_w_autoencoder.py):
loads the trained classifier + CounterfactualVQVAE, derives the latent-code
dataset by running the frozen encoder/quantizer/classifier on device, trains
only the inner CVAE, and merges the trained weights back into the full
autoencoder checkpoint.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from pccf.config import AllConfig, Experiment, hydra_main
from pccf.data import Inputs, WInputs, get_datasets
from pccf.data.processed import WDatasetWithLogits
from pccf.dist import initialize_distributed
from pccf.models import get_autoencoder
from pccf.models.w_autoencoders import WAETrainModule, get_w_autoencoder
from pccf.nn import get_classifier
from pccf.train import (
    DataLoader,
    EarlyStoppingCallback,
    Model,
    ModelEpoch,
    Test,
    Trainer,
    get_learning_schema,
    get_moving_average,
    get_trackers,
    get_trailing_mean,
    get_w_autoencoder_loss,
)


def build_w_train_model(cfg, vqvae: Model, reset: bool = True, seed: int = 0) -> Model:
    """Wrap the VQVAE's inner CVAE for standalone training with the frozen
    codebook as a constant collection (reference :32-39: reset params unless
    resuming, copy codebook, unfreeze)."""
    shell = WAETrainModule(wae=get_w_autoencoder(cfg, conditional=True))
    model = ModelEpoch(shell, name=cfg.w_autoencoder.model.name, seed=seed)
    n_codes = cfg.autoencoder.model.n_codes
    embed = cfg.autoencoder.model.embedding_dim
    init_w = np.zeros((1, n_codes * embed), np.float32)
    init_logits = np.zeros((1, cfg.data.dataset.n_classes), np.float32)
    model.initialize(WInputs(init_w, init_logits), train=False)
    codebook = vqvae.params['codebook']
    vq_stats = vqvae.variables.get('batch_stats', {})
    if reset:
        params = {'wae': model.variables['params']['wae']}
        stats = model.variables.get('batch_stats')
    else:
        params = {'wae': vqvae.params['w_autoencoder']}
        # resume the trained BN statistics along with the weights
        stats = (
            {'wae': vq_stats['w_autoencoder']}
            if 'w_autoencoder' in vq_stats
            else model.variables.get('batch_stats')
        )
    new_vars = {'params': params, 'constants': {'codebook': codebook}}
    # BatchNorm-bearing inner networks (e.g. ConvolutionalWEncoder /
    # LinearWDecoder with DenseBlock batch_norm=True) need their
    # batch_stats collection carried over, or the first apply raises
    # ScopeCollectionNotFound
    if stats and jax.tree.leaves(stats):
        new_vars['batch_stats'] = stats
    model.variables = new_vars
    return model


def merge_back(vqvae: Model, w_model: Model) -> None:
    """Surgically merge trained inner weights into the full VQVAE state
    (reference :102 autoencoder.save_state after training the submodule)."""
    params = dict(vqvae.params)
    # normalise placement: trained weights come back mesh-replicated while the
    # frozen outer weights may be single-device; fetch to host so the merged
    # tree has one uniform placement
    params['w_autoencoder'] = jax.device_get(w_model.variables['params']['wae'])
    vqvae.params = params
    # BN statistics trained in stage 2 belong to the merged model too
    w_stats = w_model.variables.get('batch_stats')
    if w_stats and jax.tree.leaves(w_stats):
        stats = dict(vqvae.variables.get('batch_stats', {}))
        stats['w_autoencoder'] = jax.device_get(w_stats['wae'])
        vqvae.variables = {**vqvae.variables, 'batch_stats': stats}


def train_w_autoencoder(cfg, vqvae: Model, classifier: Model, trial: Any | None = None) -> float | None:
    """Train the inner CVAE on derived latent datasets (reference :25-72)."""
    cfg_w = cfg.w_autoencoder
    cfg_user = cfg.user

    # parity: the reference's stage 2 treats load_checkpoint as a BOOLEAN
    # (reference train_w_autoencoder.py:34-35 resets unless set, :100 always
    # loads the latest vqvae) — a specific index only selects checkpoints in
    # stage 1; here it likewise only gates the reset/skip-training behaviour
    w_model = build_w_train_model(cfg, vqvae, reset=not cfg_user.load_checkpoint, seed=cfg_user.seed or 0)

    train_dataset, test_dataset = get_datasets(cfg)
    train_w = WDatasetWithLogits(train_dataset, vqvae, classifier)
    test_w = WDatasetWithLogits(test_dataset, vqvae, classifier)
    train_loader = DataLoader(train_w, cfg_w.train.batch_size)
    test_loader = DataLoader(test_w, cfg_w.train.batch_size)

    loss_calc = get_w_autoencoder_loss(cfg)
    schema = get_learning_schema(cfg.w_autoencoder)
    trainer = Trainer(w_model, train_loader, loss_calc, schema)
    test_encoding = Test(w_model, test_loader, metric=loss_calc, name='TestEncoding')

    if not cfg.final:
        trainer.add_validation(test_loader)
    cfg_early = cfg_w.train.early_stopping
    if not cfg.final and cfg_early.active:
        trainer.post_epoch_hooks.register(
            EarlyStoppingCallback(
                metric=loss_calc,
                filter_fn=get_trailing_mean(cfg_early.window),
                patience=cfg_early.patience,
            )
        )
    if trial is not None:
        from pccf.utils.tuning import TrialCallback

        trainer.post_epoch_hooks.register(
            TrialCallback(trial, metric=loss_calc, filter_fn=get_moving_average())
        )

    # reference parity (train_w_autoencoder.py:69-70): load_checkpoint=-1
    # deliberately means "load latest, skip training, just re-test + merge";
    # any value >= 0 trains (0 = fresh start)
    if cfg_user.load_checkpoint >= 0:
        trainer.train_until(cfg_w.train.n_epochs)

    results = test_encoding()
    merge_back(vqvae, w_model)
    return results.get(loss_calc.name)


def load_models(cfg) -> tuple[Model, Model]:
    """Load classifier + CounterfactualVQVAE from their checkpoints
    (reference :84-100)."""
    classifier_module = get_classifier(cfg)
    classifier = Model(classifier_module, name=cfg.classifier.model.name, seed=cfg.user.seed or 0)
    init_cloud = np.zeros((1, cfg.data.n_input_points, 3), np.float32)
    classifier.initialize(Inputs(cloud=init_cloud), train=False)
    classifier.load_state()

    vqvae_module = get_autoencoder(cfg)
    vqvae = Model(vqvae_module, name=cfg.autoencoder.model.name, seed=cfg.user.seed or 0)
    init_logits = np.zeros((1, cfg.data.dataset.n_classes), np.float32)
    vqvae.initialize(Inputs(cloud=init_cloud), init_logits, method='full_init')
    vqvae.checkpoint.load()
    return classifier, vqvae


def setup_and_train(cfg: AllConfig) -> None:
    trackers = get_trackers(cfg)
    exp = Experiment(cfg, name=cfg.name, par_dir=cfg.user.path.version_dir, tags=cfg.tags)
    for tracker in trackers:
        exp.subscribe(tracker)
    with exp.create_run(resume=True):
        classifier, vqvae = load_models(cfg)
        train_w_autoencoder(cfg, vqvae, classifier)
        vqvae.save_state()


@hydra_main
def main(cfg: AllConfig) -> None:
    initialize_distributed()
    if cfg.user.n_subprocesses:
        from pccf.dist.launcher import DistributedWorker

        DistributedWorker(setup_and_train, cfg.user.n_subprocesses).spawn(cfg)
    else:
        setup_and_train(cfg)


if __name__ == '__main__':
    main()
