"""BatchNorm-semantics A/B: GSPMD global-batch stats vs reference per-replica.

Quantifies the documented deviation (PARITY.md "Known deviations",
pccf/train/runners.py docstring): the reference trains under DDP without
SyncBatchNorm, so BN statistics are per-replica (reference
src/utils/parallel.py:17-66); pccf's default computes them over the global
batch.  ``PCCF_BN_GROUPS=G`` (pccf/nn/layers.bn_groups) reproduces the
reference semantics with G replicas.

Runs two short surrogate trainings per arm (classifier + VQ-VAE, default 30
epochs each, same seed/data) with G=1 and G=8 and records the final test
metrics.  Arms run in SUBPROCESSES because the group count is read at trace
time and the experiment singletons are per-process.

Usage: python tools/bn_ab.py [--epochs N] [--groups 1 8] [--cpu] [--smoke]
Writes tools/bn_ab_results.json; transfer the deltas to PARITY.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_arm(groups: int, args) -> dict:
    """One arm in this process (invoked as a subprocess with --arm)."""
    os.environ['PCCF_BN_GROUPS'] = str(groups)
    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax

        jax.config.update('jax_platforms', 'cpu')
    import jax

    jax.config.update('jax_compilation_cache_dir', str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    os.environ['ROOT_EXP_DIR'] = str(REPO / 'experiments' / f'bn_ab_g{groups}')
    os.environ.setdefault('DATASET_DIR', str(REPO / 'datasets'))

    from pccf.config import Experiment, get_config_all
    from pccf.train import get_trackers

    overrides = [
        'data/dataset=synthetic',
        'data.dataset.n_classes=4',
        f'data.dataset.settings.n_train={args.n_train}',
        f'data.dataset.settings.n_test={args.n_test}',
        'data.dataset.settings.base_points=4096',
        'data.dataset.settings.variability=0.85',
        f'classifier.train.n_epochs={args.epochs}',
        f'autoencoder.train.n_epochs={args.epochs}',
        'classifier.train.early_stopping.active=false',
        'autoencoder.train.early_stopping.active=false',
        'user.checkpoint_every=0',
        'user.trackers.tensorboard=false',
        'user.trackers.csv=false',
        'user.seed=0',
        'final=True',
    ]
    if args.smoke:
        overrides += [
            'data.dataset.settings.base_points=96',
            'data.n_input_points=64',
            'data.n_target_points=64',
            'data.n_neighbors=6',
            'classifier.model.n_neighbors=6',
            'classifier.model.conv_dims=[8,8]',
            'classifier.model.mlp_dims=[16,16]',
            'classifier.model.feature_dim=16',
            'classifier.train.batch_size=8',
            'autoencoder.model.w_dim=32',
            'autoencoder.model.embedding_dim=4',
            'autoencoder.model.book_size=4',
            'autoencoder.model.encoder.n_neighbors=6',
            'autoencoder.model.decoder.map_dims=[8]',
            'autoencoder.model.decoder.conv_dims=[16,8]',
            'autoencoder.model.decoder.n_components=2',
            'autoencoder.model.decoder.sample_dim=4',
            'autoencoder.objective.recon_loss=Chamfer',
            'autoencoder.train.batch_size=8',
        ]
    cfg = get_config_all(overrides)
    exp = Experiment(cfg, name=f'bn_ab_g{groups}')
    for tracker in get_trackers(cfg):
        exp.subscribe(tracker)

    import io
    from contextlib import redirect_stdout

    rec: dict = {'groups': groups}
    with exp.create_run():
        from train_classifier import train_classifier

        t0 = time.time()
        buf = io.StringIO()

        class Tee(io.TextIOBase):
            def write(self, s):
                buf.write(s)
                sys.__stdout__.write(s)
                return len(s)

            def flush(self):
                sys.__stdout__.flush()

        with redirect_stdout(Tee()):
            train_classifier()
        rec['classifier_wall_s'] = round(time.time() - t0, 1)
        # the tracker metrics go to `logging` (stderr); the robust stdout
        # artifact is the misclassified-indices print (tensorboard off)
        m = re.search(r'Misclassified indices: \[([^\]]*)\]( \.\.\. \(and (\d+) more\))?',
                      buf.getvalue())
        if m:
            n_mis = len([s for s in m.group(1).split(',') if s.strip()])
            if m.group(3):
                n_mis += int(m.group(3))
            rec['classifier_test_accuracy'] = 1.0 - n_mis / args.n_test
            rec['classifier_misclassified'] = n_mis

        from train_autoencoder import train_autoencoder

        t0 = time.time()
        buf2 = io.StringIO()

        class Tee2(io.TextIOBase):
            def write(self, s):
                buf2.write(s)
                sys.__stdout__.write(s)
                return len(s)

            def flush(self):
                sys.__stdout__.flush()

        with redirect_stdout(Tee2()):
            chamfer = train_autoencoder()
        rec['autoencoder_wall_s'] = round(time.time() - t0, 1)
        rec['final_test_chamfer'] = float(chamfer) if chamfer is not None else None
        emds = re.findall(r"'EMD': ([0-9.eE+-]+)", buf2.getvalue())
        if emds:
            rec['final_test_emd'] = float(emds[-1])
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=30)
    ap.add_argument('--n-train', type=int, default=512)
    ap.add_argument('--n-test', type=int, default=128)
    ap.add_argument('--groups', type=int, nargs='+', default=[1, 8])
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--smoke', action='store_true')
    ap.add_argument('--arm', type=int, default=None, help='internal: run one arm')
    args = ap.parse_args()

    if args.arm is not None:
        print('BN_AB_ARM ' + json.dumps(run_arm(args.arm, args)), flush=True)
        return

    results = {}
    for g in args.groups:
        cmd = [sys.executable, __file__, '--arm', str(g),
               '--epochs', str(args.epochs), '--n-train', str(args.n_train),
               '--n-test', str(args.n_test)]
        if args.cpu:
            cmd.append('--cpu')
        if args.smoke:
            cmd.append('--smoke')
        print(f'=== arm G={g} ===', flush=True)
        proc = subprocess.run(cmd, capture_output=True, text=True)
        sys.stderr.write(proc.stderr[-2000:])
        m = re.search(r'^BN_AB_ARM (.*)$', proc.stdout, re.M)
        if not m:
            results[f'g{g}'] = {'error': proc.stdout[-1500:] + proc.stderr[-500:]}
            continue
        results[f'g{g}'] = json.loads(m.group(1))
        print(json.dumps(results[f'g{g}'], indent=1), flush=True)

    out = REPO / 'tools' / 'bn_ab_results.json'
    out.write_text(json.dumps(results, indent=1))
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
