"""Machine-local environment settings (.env / env vars).

Replaces the reference pydantic-settings layer (src/config/environment.py:16-20)
without the extra dependency: a plain ``.env`` parser + ``os.environ`` lookup.
"""

from __future__ import annotations

import os
import pathlib

VERSION = '0.1.0'


def _load_dotenv(path: pathlib.Path) -> dict[str, str]:
    if not path.exists():
        return {}
    out: dict[str, str] = {}
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith('#') or '=' not in line:
            continue
        k, v = line.split('=', 1)
        out[k.strip()] = v.strip().strip('"').strip("'")
    return out


class EnvSettings:
    """DATASET_DIR / ROOT_EXP_DIR / METADATA_DIR with .env fallback."""

    def __init__(self, dotenv: str | pathlib.Path = '.env') -> None:
        file_vars = _load_dotenv(pathlib.Path(dotenv))

        def get(key: str, default: str) -> pathlib.Path:
            return pathlib.Path(os.environ.get(key, file_vars.get(key, default)))

        repo_root = pathlib.Path(__file__).resolve().parents[2]
        self.dataset_dir = get('DATASET_DIR', str(repo_root / 'datasets'))
        self.root_exp_dir = get('ROOT_EXP_DIR', str(repo_root / 'experiments'))
        self.metadata_dir = get('METADATA_DIR', str(repo_root / 'dataset_metadata'))
