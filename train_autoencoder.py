"""Stage-1 training: the VQ-VAE point-cloud autoencoder.

pccf counterpart of the reference entry point (train_autoencoder.py):
Chamfer(+EMD) + embedding loss, codebook-maintenance hook every
``diagnose_every`` epochs, reconstruction logging each scheduler restart,
early stopping, checkpoint cadence, final EMD-augmented test.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from pccf.config import AllConfig, Experiment, hydra_main
from pccf.data import Inputs, get_datasets
from pccf.dist import initialize_distributed
from pccf.models import get_autoencoder
from pccf.train import (
    DataLoader,
    Diagnostic,
    DiscreteSpaceOptimizer,
    EarlyStoppingCallback,
    Hook,
    Model,
    StaticHook,
    Test,
    TrackerNotUsedError,
    Trainer,
    call_every,
    get_autoencoder_loss,
    get_learning_schema,
    get_moving_average,
    get_trackers,
    get_trailing_mean,
    saving_hook,
)
from pccf.train.losses import get_emd_loss, get_recon_loss


def train_autoencoder(trial: Any | None = None) -> float | None:
    """Train the VQ-VAE (reference train_autoencoder.py:25-86)."""
    cfg = Experiment.get_config()
    cfg_ae = cfg.autoencoder
    cfg_user = cfg.user
    cfg_early = cfg_ae.train.early_stopping

    ae = get_autoencoder(cfg)
    model = Model(ae, name=cfg_ae.model.name, seed=cfg_user.seed or 0)
    train_dataset, test_dataset = get_datasets(cfg)
    train_loader = DataLoader(
        train_dataset, cfg_ae.train.batch_size, n_workers=cfg_user.n_workers
    )
    test_loader = DataLoader(
        test_dataset, cfg_ae.train.batch_size, n_workers=cfg_user.n_workers
    )

    sample_inputs, _ = train_dataset[0]
    init_inputs = Inputs(cloud=np.stack([sample_inputs.cloud]))
    init_logits = np.zeros((1, cfg.data.dataset.n_classes), np.float32)
    model.initialize(init_inputs, init_logits, method='full_init')

    schema = get_learning_schema(cfg.autoencoder)
    loss = get_autoencoder_loss(cfg)
    # the embedded inner CVAE trains only in stage 2; stage 1 must not touch
    # it — not even via decoupled weight decay (reference freezes it with
    # requires_grad=False, src/module/autoencoders.py:96-98)
    trainer = Trainer(model, train_loader, loss, schema, frozen=('w_autoencoder',))
    diagnostic = Diagnostic(model, train_loader, objective=loss)
    # the final test adds the ApproxMatch EMD metric (reference
    # train_autoencoder.py:44) unless the training loss already carries an
    # 'EMD' term (ChamferEMD: same calculation; ChamferSinkhorn: the
    # surrogate deliberately reports under the same monitor name — attaching
    # ApproxMatch on top would collide)
    test_metric = loss if 'EMD' in loss.calculations else loss | get_emd_loss()
    test_all_metrics = Test(model, test_loader, metric=test_metric, name='FinalTest')

    if cfg_user.load_checkpoint:
        trainer.load_checkpoint(cfg_user.load_checkpoint)

    # codebook maintenance (reference hook wiring train_autoencoder.py:52-54)
    rearrange = StaticHook(DiscreteSpaceOptimizer(diagnostic, trainer, cfg)).bind(
        call_every(cfg_ae.diagnose_every)
    )
    trainer.post_epoch_hooks.register(rearrange)

    if not cfg.final:
        trainer.add_validation(test_loader)

    try:
        from pccf.train.hooks import TensorBoardLogReconstruction

        restart_interval = cfg_ae.train.learn.scheduler.restart_interval
        trainer.post_epoch_hooks.register(
            Hook(TensorBoardLogReconstruction(train_dataset)).bind(call_every(restart_interval))
        )
    except (TrackerNotUsedError, ImportError):
        pass

    if not cfg.final and cfg_early.active:
        trainer.post_epoch_hooks.register(
            EarlyStoppingCallback(
                metric=get_recon_loss(cfg),
                filter_fn=get_trailing_mean(cfg_early.window),
                patience=cfg_early.patience,
            )
        )

    if trial is None:
        if cfg_user.checkpoint_every:
            trainer.post_epoch_hooks.register(saving_hook.bind(call_every(cfg_user.checkpoint_every)))
    else:
        from pccf.utils.tuning import TrialCallback

        trainer.post_epoch_hooks.register(
            TrialCallback(trial, metric=get_recon_loss(cfg), filter_fn=get_moving_average())
        )

    trainer.train_until(cfg_ae.train.n_epochs)
    trainer.save_checkpoint()
    results = test_all_metrics()
    return results.get('Chamfer')


def setup_and_train(cfg: AllConfig) -> None:
    trackers = get_trackers(cfg)
    exp = Experiment(cfg, name=cfg.name, par_dir=cfg.user.path.version_dir, tags=cfg.tags)
    for tracker in trackers:
        exp.subscribe(tracker)
    with exp.create_run(resume=True):
        train_autoencoder()


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
