"""Counterfactual evaluation suites.

pccf counterpart of the reference entry point (evaluate_counterfactuals.py):
five suites — original classification, reconstructed classification,
per-target counterfeit success, misclassified reconstruction, and the
(pred=i, label=j) transition grid — with metric-state merging for overall
scores.
"""

from __future__ import annotations

import numpy as np

from pccf.config import AllConfig, Experiment, hydra_main
from pccf.data import Partitions, get_dataset
from pccf.data.processed import CounterfactualDatasetEncoder, DoubleReconstructedDatasetWithLogits
from pccf.train import DataLoader, Model, Test, compute_metrics, get_classification_loss


class Subset:
    """Index-subset view of a dataset (torch.utils.data.Subset counterpart)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = [int(i) for i in indices]

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]

    def set_inference(self, inference: bool) -> None:
        if hasattr(self.dataset, 'set_inference'):
            self.dataset.set_inference(inference)

    @property
    def seed(self) -> int:
        # forward the base dataset's (user.seed-derived) seed so derived
        # datasets built over a Subset draw seed-dependent sampling noise
        # instead of silently falling back to key(0)
        return int(getattr(self.dataset, 'seed', 0))


def get_label_distribution(dataset, num_classes: int) -> np.ndarray:
    dataset.set_inference(True)
    labels = np.asarray([int(dataset[i][1].label) for i in range(len(dataset))])
    distribution = {f'count_{i}': int((labels == i).sum()) for i in range(num_classes)}
    print('label distribution:', distribution)
    return labels


def evaluate_original(classifier, loader) -> Test:
    test = Test(classifier, loader, metric=get_classification_loss(), name='ClassificationOriginal')
    test(store_outputs=True)
    print_suite('ClassificationOriginal', test)
    return test


def evaluate_reconstructed(classifier, dataset, vqvae, batch_size) -> None:
    derived = DoubleReconstructedDatasetWithLogits(dataset, vqvae, classifier)
    loader = DataLoader(derived, batch_size)
    test = Test(classifier, loader, metric=get_classification_loss(), name='ClassificationReconstructed')
    test()
    print_suite('ClassificationReconstructed', test)


def evaluate_counterfactual_performance(
    classifier, dataset, vqvae, n_classes, batch_size, target_value
) -> None:
    merged = None
    for j in range(n_classes):
        derived = CounterfactualDatasetEncoder(dataset, vqvae, classifier, target_dim=j, target_value=target_value)
        loader = DataLoader(derived, batch_size)
        test = Test(classifier, loader, metric=get_classification_loss(), name=f'Counterfeit_to_{j}')
        test()
        print_suite(f'Counterfeit_to_{j}', test)
        if merged is None:
            merged = test.objective.copy()
        else:
            merged.merge_state(test.objective)
    if merged is not None:
        print('Overall counterfeit success:')
        for name, value in compute_metrics(merged).items():
            print(f'{name}: {round(value, 3)}')


def evaluate_misclassified(classifier, dataset, vqvae, labels, predictions, batch_size) -> None:
    mis = np.nonzero(predictions != labels)[0]
    if len(mis) == 0:
        print('MisclassifiedReconstructed: no misclassified samples')
        return
    derived = DoubleReconstructedDatasetWithLogits(Subset(dataset, mis), vqvae, classifier)
    loader = DataLoader(derived, batch_size)
    test = Test(classifier, loader, metric=get_classification_loss(), name='MisclassifiedReconstructed')
    test()
    print_suite('MisclassifiedReconstructed', test)


def evaluate_class_transitions(
    classifier, dataset, vqvae, labels, predictions, n_classes, batch_size, target_value
) -> None:
    merged = None
    for i in range(n_classes):
        for j in range(n_classes):
            if i == j:
                continue
            mask = (predictions == i) & (labels == j)
            if not mask.any():
                continue
            subset = Subset(dataset, np.nonzero(mask)[0])
            derived = CounterfactualDatasetEncoder(subset, vqvae, classifier, target_dim=j, target_value=target_value)
            loader = DataLoader(derived, batch_size)
            test = Test(classifier, loader, metric=get_classification_loss(), name=f'{i}_to_{j}')
            test()
            print_suite(f'{i}_to_{j}', test)
            if merged is None:
                merged = test.objective.copy()
            else:
                merged.merge_state(test.objective)
    if merged is not None:
        print('Overall misclassified counterfeit success:')
        for name, value in compute_metrics(merged).items():
            print(f'{name}: {round(value, 3)}')


def print_suite(name: str, test: Test) -> None:
    metrics = compute_metrics(test.objective)
    print(f'[{name}] ' + ', '.join(f'{k}: {round(v, 4)}' for k, v in metrics.items()))


def evaluate_counterfactuals(cfg, classifier: Model, vqvae: Model) -> dict[str, float]:
    num_classes = cfg.data.dataset.n_classes
    batch_size = cfg.classifier.train.batch_size
    target_value = cfg.user.counterfactual_value
    dataset = get_dataset(cfg, Partitions.test if cfg.final else Partitions.val)
    dataset.set_inference(True)
    loader = DataLoader(dataset, batch_size)

    labels = get_label_distribution(dataset, num_classes)
    test_original = evaluate_original(classifier, loader)
    evaluate_reconstructed(classifier, dataset, vqvae, batch_size)
    evaluate_counterfactual_performance(classifier, dataset, vqvae, num_classes, batch_size, target_value)
    logits = np.concatenate([np.asarray(o) for o in test_original.outputs_list])
    predictions = logits.argmax(axis=1)
    evaluate_misclassified(classifier, dataset, vqvae, labels, predictions, batch_size)
    evaluate_class_transitions(
        classifier, dataset, vqvae, labels, predictions, num_classes, batch_size, target_value
    )
    return compute_metrics(test_original.objective)


@hydra_main
def main(cfg: AllConfig) -> None:
    exp = Experiment(cfg, name=cfg.name, par_dir=cfg.user.path.version_dir, tags=cfg.tags)
    with exp.create_run(resume=True):
        from train_w_autoencoder import load_models

        classifier, vqvae = load_models(cfg)
        evaluate_counterfactuals(cfg, classifier, vqvae)


if __name__ == '__main__':
    main()
