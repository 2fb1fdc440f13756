"""Visualization / analysis layer.

Replaces the reference's side layer (SURVEY.md §1 Lx):
registration/visu_utils.py (plot_grid_pcd, plot_pcd, aligned_plot_grid_pcd,
analyseDis/analyseDises histogram comparisons :212-273), completion/
vis_utils.py, deepgmr's plot_gmm, and the failure-case dumps
(registration/train_utils.py:556-561: pairs with rotation error > 70° get
their clouds rendered to Grads/*.png).

matplotlib only (the reference additionally used open3d for interactive
views; not available here and not needed for the artifacts).
"""

from __future__ import annotations

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_pcd(ax, pcd, color=None, size: float = 0.5, azim: float = -60,
             elev: float = 30):
    """Scatter one cloud on a 3D axis (reference visu_utils.plot_pcd)."""
    pcd = np.asarray(pcd)
    ax.view_init(elev=elev, azim=azim)
    if color is None:
        color = pcd[:, 0]
    ax.scatter(pcd[:, 0], pcd[:, 1], pcd[:, 2], c=color, s=size, cmap="viridis")
    lims = np.array([pcd.min(), pcd.max()])
    for setter in (ax.set_xlim, ax.set_ylim, ax.set_zlim):
        setter(lims)
    ax.set_axis_off()


def plot_grid_pcd(clouds, shape=None, save_path: str | None = None,
                  title: str = "", size: float = 0.5):
    """Grid of clouds in one figure (reference visu_utils.plot_grid_pcd —
    used for the >70°-error failure dumps)."""
    n = len(clouds)
    if shape is None:
        shape = (1, n)
    rows, cols = shape
    fig = plt.figure(figsize=(3 * cols, 3 * rows))
    if title:
        fig.suptitle(title)
    for i, pcd in enumerate(clouds):
        ax = fig.add_subplot(rows, cols, i + 1, projection="3d")
        plot_pcd(ax, pcd, size=size)
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig


def aligned_plot_grid_pcd(src, tgt, transform, save_path=None, title=""):
    """src / src-moved-by-transform / tgt side by side
    (reference visu_utils.aligned_plot_grid_pcd)."""
    src = np.asarray(src)
    t = np.asarray(transform)
    moved = src @ t[:3, :3].T + t[:3, 3]
    return plot_grid_pcd([src, moved, np.asarray(tgt)], shape=(1, 3),
                         save_path=save_path, title=title)


def plot_gmm(ax, pi, mu, sigma, cmap="tab20"):
    """Mixture means sized by weight and isotropic std (reference deepgmr
    visualize path). pi (J,), mu (J, 3), sigma (J, 3, 3)."""
    pi, mu = np.asarray(pi), np.asarray(mu)
    std = np.sqrt(np.asarray(sigma)[:, 0, 0])
    ax.scatter(mu[:, 0], mu[:, 1], mu[:, 2], s=2000 * pi, c=np.arange(len(pi)),
               cmap=cmap, alpha=0.6)
    for m, s in zip(mu, std):
        ax.plot([m[0] - s, m[0] + s], [m[1], m[1]], [m[2], m[2]], "k-", lw=0.3)


def analyse_distances(err_dict: dict[str, np.ndarray],
                      save_path: str | None = None,
                      bins: int = 50, log: bool = True,
                      xlabel: str = "rotation error (deg)"):
    """Histogram comparison of error distributions across solver variants
    (reference visu_utils.analyseDis/analyseDises:212-273 comparing
    unconstrained/sigmoid/sine runs)."""
    fig, ax = plt.subplots(figsize=(7, 4))
    for name, errs in err_dict.items():
        ax.hist(np.asarray(errs), bins=bins, histtype="step", label=name,
                log=log)
    ax.set_xlabel(xlabel)
    ax.set_ylabel("count")
    ax.legend()
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig


def dump_failure_cases(src, tgt, transforms, r_err, out_dir: str,
                       threshold: float = 70.0, max_dumps: int = 16):
    """Render every pair with rotation error above ``threshold``
    (reference train_utils.py:556-561). Returns the written paths."""
    r_err = np.asarray(r_err)
    paths = []
    for j in np.nonzero(r_err > threshold)[0][:max_dumps]:
        path = os.path.join(out_dir, f"bad_{int(j)}_{r_err[j]:.0f}deg.png")
        aligned_plot_grid_pcd(
            np.asarray(src)[j], np.asarray(tgt)[j],
            np.asarray(transforms)[j], save_path=path,
            title=f"pair {int(j)}: {r_err[j]:.1f} deg",
        )
        paths.append(path)
    return paths
