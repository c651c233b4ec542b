"""Train and evaluate the DGCNN point-cloud classifier.

pccf counterpart of the reference entry point (train_classifier.py): trains
with the cosine schedule + early stopping, runs the final test with stored
outputs, and logs the confusion matrix + misclassified indices.
"""

from __future__ import annotations

import numpy as np

from pccf.config import AllConfig, Experiment, hydra_main
from pccf.data import Inputs, get_datasets
from pccf.dist import initialize_distributed, is_main_process
from pccf.nn import get_classifier
from pccf.train import (
    DataLoader,
    EarlyStoppingCallback,
    Model,
    Test,
    Trainer,
    TrackerNotUsedError,
    call_every,
    get_classification_loss,
    get_learning_schema,
    get_trackers,
    get_trailing_mean,
    saving_hook,
)
from pccf.utils.visualization import confusion_matrix, plot_confusion_matrix_heatmap


def train_classifier() -> None:
    """Train the classifier and report final test performance
    (reference train_classifier.py:21-89)."""
    cfg = Experiment.get_config()
    cfg_class = cfg.classifier
    cfg_user = cfg.user

    module = get_classifier(cfg)
    model = Model(module, name=cfg_class.model.name, seed=cfg_user.seed or 0)
    train_dataset, test_dataset = get_datasets(cfg)
    train_loader = DataLoader(train_dataset, cfg_class.train.batch_size)
    test_loader = DataLoader(test_dataset, cfg_class.train.batch_size)

    sample_inputs, _ = train_dataset[0]
    model.initialize(Inputs(cloud=np.stack([sample_inputs.cloud])), train=False)

    loss_calc = get_classification_loss()
    schema = get_learning_schema(cfg.classifier)
    trainer = Trainer(model, train_loader, loss_calc, schema)
    final_test = Test(model, test_loader, metric=loss_calc, name='FinalTest')

    if cfg_user.load_checkpoint:
        trainer.load_checkpoint(cfg_user.load_checkpoint)
    if not cfg.final:
        trainer.add_validation(test_loader)
    if not cfg.final and cfg_class.train.early_stopping.active:
        window = cfg_class.train.early_stopping.window
        trainer.post_epoch_hooks.register(
            EarlyStoppingCallback(
                metric=loss_calc,
                filter_fn=get_trailing_mean(window),
                patience=cfg_class.train.early_stopping.patience,
            )
        )
    if cfg_user.checkpoint_every:
        trainer.post_epoch_hooks.register(saving_hook.bind(call_every(cfg_user.checkpoint_every)))

    trainer.train_until(cfg_class.train.n_epochs)
    trainer.save_checkpoint()
    final_test(store_outputs=True)
    if not is_main_process():
        return

    logits = np.concatenate([np.asarray(o) for o in final_test.outputs_list])
    predictions = logits.argmax(axis=1)
    test_dataset.set_inference(True)
    labels = np.asarray([int(test_dataset[i][1].label) for i in range(len(test_dataset))])
    misclassified = [int(i) for i in np.nonzero(predictions != labels)[0]]
    max_log = 100
    mis_str = str(misclassified[:max_log])
    if len(misclassified) > max_log:
        mis_str += f' ... (and {len(misclassified) - max_log} more)'

    names = cfg.data.dataset.settings.get('select_classes', [str(i) for i in range(cfg.data.dataset.n_classes)])
    cm = confusion_matrix(predictions, labels, cfg.data.dataset.n_classes)
    fig = plot_confusion_matrix_heatmap(cm, list(names), title='Model Confusion Matrix')
    try:
        from pccf.train.trackers import TensorBoardTracker

        writer = TensorBoardTracker.get_current().writer
        writer.add_figure(f'{model.name}/{final_test.name}-Confusion Matrix', fig)
        writer.add_text(
            f'{model.name}/{final_test.name}-Misclassified Indices',
            f'Total misclassified samples: {len(misclassified)}\nIndices: {mis_str}',
            global_step=model.epoch,
        )
    except (TrackerNotUsedError, ImportError):
        print(f'Confusion Matrix for classes {list(names)}')
        print(cm)
        print(f'Misclassified indices: {mis_str}')


def setup_and_train(cfg: AllConfig) -> None:
    trackers = get_trackers(cfg)
    exp = Experiment(cfg, name=cfg.name, par_dir=cfg.user.path.version_dir, tags=cfg.tags)
    for tracker in trackers:
        exp.subscribe(tracker)
    with exp.create_run(resume=cfg.user.load_checkpoint != 0):
        train_classifier()


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
