"""Full 4-stage quality run on the offline synthetic surrogate (VERDICT r4 #4).

The reference's deliverable is end-to-end *quality*: counterfactual flip
rates and reconstructed-classification accuracy over real classes
(reference evaluate_counterfactuals.py:31-159).  The sandbox is offline
(the ModelNet auto-download URL, reference src/data/modelnet.py:116-118,
does not resolve), so this runs the run.sh sequence on the 4-class
synthetic surrogate with per-instance shape variability
(pccf/data/synthetic.py `variability`) at the FLAGSHIP shapes: 2048 points
in/out, k=25, w_dim 1024 = 256 codes x 4, book 16.  Two deliberate
deviations from the published config, both recorded in the output JSON:

- epochs are scaled (45 / 200 / 300 vs the reference's 45 / 1000 / 500)
  to fit a chip session;
- the stage-2 KLD weights default to 3.0 / 16.0 (reference
  vae_objective.yaml: 0.1 / 4.0) — the published values are calibrated to
  ShapeNet recon energy; on the synthetic surrogate both paid latent
  channels must be priced above the KLD-free conditioning route or the
  class information bypasses it and the counterfactual steer dies (the
  "information seesaw", BASELINE.md round-5 section; flips 0.25 at the
  reference-shaped weights vs 0.488 at 3/16, QUALITY_r5c.json).

The codebook-maintenance hook (diagnose_every=10, incl. final-epoch
dead-entry burial) and stage-2 KLD annealing run live, exactly as a real
training would.

Writes QUALITY_r5.json at the repo root and leaves checkpoints under
$ROOT_EXP_DIR (default: experiments/quality_r5/).

Usage: python tools/quality_run.py [--epochs-ae N] [--epochs-wae N]
           [--epochs-cls N] [--n-train N] [--n-test N] [--tag TAG]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs-cls', type=int, default=45)
    ap.add_argument('--epochs-ae', type=int, default=200)
    ap.add_argument('--epochs-wae', type=int, default=300)
    # Counterfactual-flip regime (round-5 campaign, BASELINE.md "information
    # seesaw"): the CVAE has three routes into the decoder — z1 (priced by
    # c_kld1), the z2 posterior delta (priced by c_kld2), and the KLD-free
    # conditioning probs -> p_mu2.  On the surrogate the class information
    # settles in whichever PAID channel is cheaper and the counterfactual
    # steer dies (QUALITY_r5: 0.3/4 -> delta-rich, flips 0.25; QUALITY_r5b:
    # 0.3/16 -> z1-rich, flips 0.25).  Pricing BOTH paid channels high makes
    # the free conditioning route the cheapest source of class information:
    # 3/16 measures flips 0.488 at flagship shapes (QUALITY_r5c) and 1.00 at
    # micro scale (tools/flip_probe.py).  The published values (0.1/4,
    # reference vae_objective.yaml) are calibrated to ShapeNet recon energy
    # and remain the config defaults for real data.
    ap.add_argument('--c-kld1', type=float, default=3.0)
    ap.add_argument('--c-kld2', type=float, default=16.0)
    ap.add_argument('--n-train', type=int, default=512)
    ap.add_argument('--n-test', type=int, default=128)
    ap.add_argument('--variability', type=float, default=0.85)
    ap.add_argument('--tag', default='quality_r5')
    ap.add_argument(
        '--smoke', action='store_true',
        help='tiny shapes + CPU-friendly dims: validates the scraping/record '
        'logic end-to-end without chip time',
    )
    ap.add_argument('--cpu', action='store_true', help='force the CPU backend')
    ap.add_argument(
        '--eval-only', action='store_true',
        help='skip the training stages and re-run the evaluate suites from '
        'the tag\'s existing checkpoints (for A/B of eval-path knobs, e.g. '
        'PCCF_KNN_MXU=bf16 fidelity)',
    )
    ap.add_argument(
        '--stage2-only', action='store_true',
        help='reuse the tag\'s classifier + VQ-VAE checkpoints and re-train '
        'only the W-autoencoder (then evaluate) — the KLD-regime sweep path; '
        'combine with --clone-from to keep the source tag untouched',
    )
    ap.add_argument(
        '--clone-from', default=None, metavar='TAG',
        help='copy TAG\'s experiment dir to this run\'s tag before starting '
        '(checkpoint reuse without overwriting the source)',
    )
    ap.add_argument('--out', default='QUALITY_r5.json', help='output JSON filename')
    args = ap.parse_args()

    if args.cpu:  # must happen before first device use (sitecustomize pins axon)
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax

        jax.config.update('jax_platforms', 'cpu')
    else:
        # fail fast if the axon tunnel is wedged: device init hangs forever in
        # that state (observed round 3/4) and the run would sit silent — probe
        # it from a daemon thread and bail loudly instead
        import threading

        import jax

        ready = threading.Event()
        threading.Thread(target=lambda: (jax.devices(), ready.set()), daemon=True).start()
        if not ready.wait(180):
            print('FATAL: device init did not complete in 180 s - tunnel wedged', flush=True)
            os._exit(3)
        print(f'device ready: {jax.devices()[0].platform}', flush=True)

    os.environ.setdefault('ROOT_EXP_DIR', str(REPO / 'experiments' / args.tag))
    os.environ.setdefault('DATASET_DIR', str(REPO / 'datasets'))
    if args.clone_from:
        import shutil

        src = REPO / 'experiments' / args.clone_from
        dst = Path(os.environ['ROOT_EXP_DIR'])
        if not dst.exists():
            shutil.copytree(src, dst)
            # the copied tree nests runs under the SOURCE tag name; mirror it
            # under the new tag so Experiment(name=args.tag) resumes from it
            for ver in dst.iterdir():
                nested = ver / args.clone_from
                if nested.is_dir() and not (ver / args.tag).exists():
                    nested.rename(ver / args.tag)

    # persistent compilation cache: the flagship-shape train steps cost
    # minutes of XLA compile; amortize across runs and the eval-only A/Bs
    import jax

    jax.config.update('jax_compilation_cache_dir', str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    from pccf.config import Experiment, get_config_all
    from pccf.train import get_trackers

    overrides = [
        'data/dataset=synthetic',
        'data.dataset.n_classes=4',
        f'data.dataset.settings.n_train={args.n_train}',
        f'data.dataset.settings.n_test={args.n_test}',
        'data.dataset.settings.base_points=4096',
        f'data.dataset.settings.variability={args.variability}',
        f'classifier.train.n_epochs={args.epochs_cls}',
        f'autoencoder.train.n_epochs={args.epochs_ae}',
        f'w_autoencoder.train.n_epochs={args.epochs_wae}',
        f'w_autoencoder.objective.c_kld1={args.c_kld1}',
        f'w_autoencoder.objective.c_kld2={args.c_kld2}',
        # quality-run practicality: no early stop (we want the full schedule
        # on the record), checkpoint at the end only
        'classifier.train.early_stopping.active=false',
        'autoencoder.train.early_stopping.active=false',
        'w_autoencoder.train.early_stopping.active=false',
        'user.checkpoint_every=0',
        'user.trackers.tensorboard=false',
        'user.trackers.csv=true',
        'user.seed=0',
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
            'classifier.train.batch_size=4',
            'autoencoder.model.w_dim=32',
            'autoencoder.model.embedding_dim=4',
            'autoencoder.model.book_size=4',
            'autoencoder.model.encoder.n_neighbors=6',
            'autoencoder.model.decoder.map_dims=[8]',
            'autoencoder.model.decoder.conv_dims=[16,8]',
            'autoencoder.model.decoder.n_components=2',
            'autoencoder.model.decoder.sample_dim=4',
            'autoencoder.objective.recon_loss=Chamfer',
            'autoencoder.train.batch_size=4',
            'autoencoder.diagnose_every=2',
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
    cfg = get_config_all(overrides)
    exp = Experiment(cfg, name=args.tag)
    for tracker in get_trackers(cfg):
        exp.subscribe(tracker)

    record: dict = {
        'tag': args.tag,
        'config': {
            'n_classes': 4,
            'variability': args.variability,
            'n_train': args.n_train,
            'n_test': args.n_test,
            'points': cfg.data.n_input_points,
            'epochs': [args.epochs_cls, args.epochs_ae, args.epochs_wae],
            'c_kld': [args.c_kld1, args.c_kld2],
            'batch_sizes': [
                cfg.classifier.train.batch_size,
                cfg.autoencoder.train.batch_size,
                cfg.w_autoencoder.train.batch_size,
            ],
            # reference vae_objective.yaml publishes c_kld1=0.1, c_kld2=4.0
            # (calibrated to ShapeNet); the surrogate default deviates — flag
            # it so downstream parity comparisons can't miss it (ADVICE r4)
            'objective_deviates_from_reference': (
                args.c_kld1 != 0.1 or args.c_kld2 != 4.0
            ),
        },
        'stages': {},
    }

    def stage(name: str, fn):
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
            out = fn()
        dt = time.time() - t0
        record['stages'][name] = {'wall_s': round(dt, 1)}
        print(f'== stage {name} done in {dt:.0f}s ==', flush=True)
        return out, buf.getvalue()

    with exp.create_run(resume=args.eval_only or args.stage2_only):
        if args.eval_only:
            from evaluate_counterfactuals import evaluate_counterfactuals
            from train_w_autoencoder import load_models

            record['knobs'] = {
                k: os.environ.get(k, '')
                for k in ('PCCF_KNN_MXU', 'PCCF_KNN_GROUP', 'PCCF_POOL_UNROLL')
            }
            classifier, vqvae = load_models(cfg)
            (metrics, eval_log) = stage(
                'evaluate', lambda: evaluate_counterfactuals(cfg, classifier, vqvae)
            )
            _scrape_eval(record, metrics, eval_log)
            record['exp_dir'] = os.environ['ROOT_EXP_DIR']
            out_path = REPO / args.out
            out_path.write_text(json.dumps(record, indent=1))
            print(json.dumps(record))
            print(f'wrote {out_path}')
            return

        if not args.stage2_only:
            from train_classifier import train_classifier

            _, cls_log = stage('classifier', train_classifier)
            # keep the confusion matrix the classifier entry prints (the
            # held-out test accuracy itself is on the evaluate-stage record
            # as the ClassificationOriginal suite)
            if 'Confusion Matrix' in cls_log:
                cm_at = cls_log.index('Confusion Matrix')
                record['stages']['classifier']['confusion_matrix_log'] = cls_log[
                    cm_at : cm_at + 400
                ]

            from train_autoencoder import train_autoencoder

            (chamfer, ae_log) = stage('autoencoder', train_autoencoder)
            record['stages']['autoencoder']['final_test_chamfer'] = (
                float(chamfer) if chamfer is not None else None
            )
            emds = re.findall(r"'EMD': ([0-9.eE+-]+)", ae_log)
            if emds:
                record['stages']['autoencoder']['final_test_emd'] = float(emds[-1])

        from train_w_autoencoder import load_models, train_w_autoencoder

        classifier, vqvae = load_models(cfg)
        (wloss, _) = stage('w_autoencoder', lambda: train_w_autoencoder(cfg, vqvae, classifier))
        record['stages']['w_autoencoder']['final_loss'] = (
            float(wloss) if wloss is not None else None
        )
        # final latent budget from the CSV tracker — the flip mechanism is a
        # KLD-regime property (KLD1 ~ z1 info, KLD2 ~ posterior-delta info),
        # so the record must carry it (round-5 anatomy: a delta at 6.7 nats
        # nullifies the conditioning channel regardless of wiring)
        try:
            import csv as _csv

            csv_path = (
                Path(os.environ['ROOT_EXP_DIR'])
                / cfg.user.path.version_dir.name
                / args.tag / 'metrics' / 'WAutoEncoder_Train.csv'
            )
            rows = list(_csv.DictReader(csv_path.open()))
            record['stages']['w_autoencoder']['final_klds'] = {
                k: float(rows[-1][k])
                for k in ('KLD1', 'KLD2', 'MSE', 'Quantisation Accuracy')
                if k in rows[-1]
            }
        except (OSError, KeyError, IndexError) as e:
            record['stages']['w_autoencoder']['final_klds_error'] = str(e)[:120]
        vqvae.save_state()

        from evaluate_counterfactuals import evaluate_counterfactuals

        (metrics, eval_log) = stage(
            'evaluate', lambda: evaluate_counterfactuals(cfg, classifier, vqvae)
        )
        _scrape_eval(record, metrics, eval_log)

    record['exp_dir'] = os.environ['ROOT_EXP_DIR']
    out_path = REPO / args.out
    out_path.write_text(json.dumps(record, indent=1))
    print(json.dumps(record))
    print(f'wrote {out_path}')


def _scrape_eval(record: dict, metrics: dict, eval_log: str) -> None:
    record['stages']['evaluate']['original_metrics'] = {
        k: float(v) for k, v in metrics.items()
    }
    # scrape every printed suite line: "[SuiteName] Metric: v, Metric: v"
    suites = {}
    for line in eval_log.splitlines():
        m = re.match(r'^\[([A-Za-z_0-9]+)\] (.*)$', line.strip())
        if m:
            vals = re.findall(r'([A-Za-z][\w ]*?): (-?[0-9.eE+-]+)(?:,|$)', m.group(2))
            suites[m.group(1)] = {k.strip(): float(v) for k, v in vals}
    record['stages']['evaluate']['suites'] = suites
    # overall success blocks: "Overall [misclassified ]counterfeit success:"
    for key, pat in (
        ('counterfeit_overall', r'Overall counterfeit success:'),
        ('misclassified_overall', r'Overall misclassified counterfeit success:'),
    ):
        mm = re.search(pat + r'\n((?:[\w ]+: -?[0-9.eE+-]+\n?)+)', eval_log)
        if mm:
            record['stages']['evaluate'][key] = {
                k.strip(): float(v)
                for k, v in re.findall(r'([\w ]+): (-?[0-9.eE+-]+)', mm.group(1))
            }


if __name__ == '__main__':
    main()
