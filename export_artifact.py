"""Export trained checkpoints as a self-contained serving artifact.

Beyond-parity entry point (the reference serves from Python checkpoints
only): loads the classifier + CounterfactualVQVAE exactly like
``evaluate_counterfactuals.py``, then writes StableHLO deployment artifacts
(see ``pccf/export.py``) to ``<version_dir>/artifacts/<name>/`` or the
``user.export.path`` override.

Usage::

    python export_artifact.py final=True user.counterfactual_value=1 \
        'user.export.platforms=[tpu,cpu]'
"""

from __future__ import annotations

from pathlib import Path

from pccf.config import AllConfig, Experiment, hydra_main
from pccf.export import export_server
from pccf.serve import CounterfactualServer


def export_from_config(cfg) -> dict:
    server = CounterfactualServer.from_config(cfg)
    export_cfg = cfg.user.export
    path = export_cfg.path or cfg.user.path.version_dir / 'artifacts' / cfg.name
    manifest = export_server(
        server,
        Path(path),
        n_points=cfg.data.n_input_points,
        n_classes=cfg.data.dataset.n_classes,
        platforms=export_cfg.platforms or None,
        include_generate=export_cfg.include_generate,
    )
    n_files = sum(
        len(e.get('buckets', {})) or 1
        for ep in manifest['endpoints'].values()
        for e in ep.values()
    )
    print(f'exported {n_files} modules for {manifest["platforms"]} -> {path}')
    return manifest


@hydra_main
def main(cfg: AllConfig) -> None:
    exp = Experiment(cfg, name=cfg.name, par_dir=cfg.user.path.version_dir, tags=cfg.tags)
    with exp.create_run(resume=True):
        export_from_config(cfg)


if __name__ == '__main__':
    main()
