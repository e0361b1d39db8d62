"""Latent-space scatter diagnostics (reference ``log_umap``,
second_stage_video.py:599-638 + utils/logging.py:28).

The reference projects {posterior z_m, posterior means, flow samples} with
UMAP; umap-learn is not a baked dependency here, so the projection is PCA
(SVD) — same diagnostic purpose: are flow samples covering the posterior?
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def pca_2d(x: np.ndarray, basis: np.ndarray = None):
    """Project (N, D) onto the top-2 principal components."""
    x = x.reshape(x.shape[0], -1).astype(np.float64)
    mean = x.mean(0)
    if basis is None:
        _, _, vt = np.linalg.svd(x - mean, full_matrices=False)
        basis = vt[:2]
    return (x - mean) @ basis.T, basis


def plot_latent_scatter(latents: Dict[str, np.ndarray], path: str):
    """latents: name -> (N, ...) arrays; writes a PCA scatter PNG.  The PCA
    basis is fit on the first entry and shared so clouds are comparable."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    basis = None
    for name, arr in latents.items():
        proj, basis = pca_2d(np.asarray(arr), basis)
        ax.scatter(proj[:, 0], proj[:, 1], s=8, alpha=0.5, label=name)
    ax.legend()
    ax.set_title("latent space (PCA)")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def plot_metric_errorbars(per_frame: Dict[str, np.ndarray], path: str,
                          csv_path: str = None):
    """Per-frame metric mean +/- std errorbar plot + CSV dump (reference
    ``make_errorbar_plot`` / csv dumps, utils/logging.py:979-1107,
    experiments/second_stage_video.py:116-158).

    per_frame: metric name -> (N, T) array."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(per_frame),
                             figsize=(4 * len(per_frame), 3.2))
    if len(per_frame) == 1:
        axes = [axes]
    rows = []
    for ax, (name, arr) in zip(axes, per_frame.items()):
        arr = np.asarray(arr)
        mean, std = arr.mean(0), arr.std(0)
        ax.errorbar(np.arange(1, arr.shape[1] + 1), mean, yerr=std,
                    capsize=3)
        ax.set_title(name)
        ax.set_xlabel("frame")
        rows.append((name, mean, std))
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    if csv_path:
        with open(csv_path, "w") as f:
            f.write("metric,frame,mean,std\n")
            for name, mean, std in rows:
                for t, (m, s) in enumerate(zip(mean, std)):
                    f.write(f"{name},{t + 1},{m:.6f},{s:.6f}\n")
    return path
