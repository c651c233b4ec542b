"""ShapeNet loader over the PointFlow ``ShapeNetCore.v2.PC15k`` layout.

Capability parity with reference ``src/data/shapenet.py`` (same directory
contract: ``<synset>/<train|val|test>/<id>.npy`` 15k-point clouds; class
selection through ``shapenet_PointFlow_classes.json``; train_val = train+val;
without-replacement subsampling to ``n_input_points`` with an optional
disjoint reference resample). The implementation is pccf's own: clouds are
normalised at load into one stacked ``(K, 15000, 3)`` array, labels are a
vectorised synset-rank lookup, and sampling uses an explicit seeded
``np.random.Generator`` instead of process-global state.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

from pccf.data.augmentations import augment_clouds, normalise
from pccf.data.protocols import Partitions, PointCloudDataset, SplitCreator
from pccf.data.structures import Inputs, Targets

SHAPENET_LINK = 'https://drive.google.com/drive/folders/1G0rf-6HSHoTll6aH7voh-dXj6hCRhSAQ'

# Which layout subfolders feed each partition. train_val is the union used by
# the ``final`` pipeline stage.
_PARTITION_SOURCES: dict[Partitions, tuple[str, ...]] = {
    Partitions.train: ('train',),
    Partitions.val: ('val',),
    Partitions.test: ('test',),
    Partitions.train_val: ('train', 'val'),
}


class ShapenetFlowSplit(PointCloudDataset):
    """One partition of PC15k clouds, subsampled per access.

    Every ``__getitem__`` draws ``n_input_points`` indices without
    replacement from the 15k pool; with ``resample`` on, a second disjoint
    draw of the same size becomes the reference cloud (so input and target
    never share a point — the trait the Chamfer/EMD losses rely on).
    """

    def __init__(
        self,
        paths: list[pathlib.Path],
        cfg_data,
        seed: int = 0,
        synset_ranks: dict[str, int] | None = None,
    ) -> None:
        self.input_points = cfg_data.n_input_points
        self.resample = cfg_data.resample
        self.augment = augment_clouds(cfg_data)
        self.rng = np.random.default_rng(seed)
        self.seed = seed  # loaders derive their shuffle/worker streams from this
        clouds = []
        synsets = []
        for path in paths:
            unit_cloud, _ = normalise(np.load(path))
            cloud = np.asarray(unit_cloud, dtype=np.float32)
            if clouds and cloud.shape != clouds[0].shape:
                raise ValueError(
                    f'ShapeNet cloud {path} has shape {cloud.shape}, expected '
                    f'{clouds[0].shape} (all clouds in a split must match to stack)'
                )
            clouds.append(cloud)
            synsets.append(path.parent.parent.name)
        self.clouds = np.stack(clouds) if clouds else np.zeros((0, 0, 3), np.float32)
        # label = rank of the synset id in the DATASET-level universe when
        # provided (a split with a missing/empty synset subfolder must not
        # silently permute the labels of the classes it does have); the
        # per-split fallback covers standalone construction only
        rank = synset_ranks or {s: i for i, s in enumerate(sorted(set(synsets)))}
        self.labels = np.fromiter((rank[s] for s in synsets), dtype=np.int64, count=len(synsets))

    def __len__(self) -> int:
        return int(self.clouds.shape[0])

    def __getitem__(self, index: int) -> tuple[Inputs, Targets]:
        cloud = self.clouds[index]
        n = self.input_points
        draw = 2 * n if self.resample else n
        picks = self.rng.choice(cloud.shape[0], size=draw, replace=False)
        if self.resample:
            inp, ref = self.augment(self.rng, [cloud[picks[:n]], cloud[picks[n:]]])
        else:
            (inp,) = self.augment(self.rng, [cloud[picks]])
            ref = inp
        return Inputs(cloud=inp), Targets(ref_cloud=ref, label=np.int64(self.labels[index]))


class ShapeNetDatasetFlow(SplitCreator):
    """Split creator walking the ``ShapeNetCore.v2.PC15k`` tree once."""

    def __init__(self, cfg) -> None:
        self.cfg = cfg
        meta = cfg.user.path.metadata_dir / 'shapenet_PointFlow_classes.json'
        synset_to_name: dict[str, str] = json.loads(meta.read_text())
        self.shapenet_path = cfg.user.path.data_dir / 'ShapeNetCore.v2.PC15k'
        if not self.shapenet_path.exists():
            raise FileNotFoundError(
                f'ShapeNet PC15k not found at {self.shapenet_path}; '
                f'download from {SHAPENET_LINK}'
            )
        synset_dirs = sorted(p for p in self.shapenet_path.iterdir() if p.is_dir())
        if cfg.data.dataset.n_classes < 55:
            wanted = set(cfg.data.dataset.settings['select_classes'])
            synset_dirs = [d for d in synset_dirs if synset_to_name.get(d.name) in wanted]
            if not synset_dirs:
                raise ValueError(
                    f'none of the selected classes {sorted(wanted)} exist '
                    f'under {self.shapenet_path}'
                )
        # one label mapping for every split: synset rank in the selected set
        self.synset_ranks = {d.name: i for i, d in enumerate(synset_dirs)}
        self.paths = {
            part: [
                f
                for d in synset_dirs
                for sub in subs
                for f in sorted((d / sub).glob('*'))
            ]
            for part, subs in _PARTITION_SOURCES.items()
        }

    def split(self, split: Partitions) -> ShapenetFlowSplit:
        return ShapenetFlowSplit(
            self.paths[split],
            self.cfg.data,
            seed=self.cfg.user.seed or 0,
            synset_ranks=self.synset_ranks,
        )
