"""Rendering utilities (reference src/utils/visualization.py).

pyvista is not available in this environment; ``render_cloud`` uses a
matplotlib 3D scatter with the same call surface (clouds, title,
interactive, save_dir).
"""

from __future__ import annotations

import pathlib
import re
from typing import Any, Sequence

import numpy as np


def _slug(title: str) -> str:
    return re.sub(r'[^A-Za-z0-9_.-]+', '_', title)[:120] or 'cloud'


def render_cloud(
    clouds: Sequence[np.ndarray],
    title: str = '',
    interactive: bool = False,
    save_dir: str | pathlib.Path | None = None,
) -> pathlib.Path | None:
    """Render one or more point clouds; saves <save_dir>/<title>.png."""
    import matplotlib

    if not interactive:
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection='3d')
    for cloud in clouds:
        cloud = np.asarray(cloud)
        ax.scatter(cloud[:, 0], cloud[:, 2], cloud[:, 1], s=2, alpha=0.7)
    ax.set_title(title)
    ax.set_axis_off()
    out = None
    if save_dir is not None:
        save_dir = pathlib.Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        out = save_dir / f'{_slug(title)}.png'
        fig.savefig(out, dpi=120, bbox_inches='tight')
    if interactive:
        plt.show()
    plt.close(fig)
    return out


def plot_confusion_matrix_heatmap(matrix: np.ndarray, class_names: list[str], title: str = '') -> Any:
    """Confusion-matrix heatmap figure (reference visualization.py:100)."""
    import matplotlib

    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    try:
        import seaborn as sns

        fig, ax = plt.subplots(figsize=(5, 4))
        sns.heatmap(
            matrix, annot=True, fmt='d', cmap='Blues',
            xticklabels=class_names, yticklabels=class_names, ax=ax,
        )
    except ImportError:
        fig, ax = plt.subplots(figsize=(5, 4))
        ax.imshow(matrix, cmap='Blues')
        for i in range(matrix.shape[0]):
            for j in range(matrix.shape[1]):
                ax.text(j, i, str(int(matrix[i, j])), ha='center', va='center')
        ax.set_xticks(range(len(class_names)), class_names)
        ax.set_yticks(range(len(class_names)), class_names)
    ax.set_xlabel('Predicted')
    ax.set_ylabel('True')
    ax.set_title(title)
    fig.tight_layout()
    return fig


def confusion_matrix(predictions: np.ndarray, labels: np.ndarray, n_classes: int) -> np.ndarray:
    """Row = true class, column = prediction."""
    cm = np.zeros((n_classes, n_classes), dtype=np.int64)
    np.add.at(cm, (labels, predictions), 1)
    return cm
