"""Trajectory/map visualisation.

The reference ships no visualizer ("no support for visualizer",
reference README.md:14) — its screenshot came from external tooling.  This
module provides the missing piece: a matplotlib plot of ground truth vs
estimate, the landmark map, and (optionally) covariance ellipses.
"""

from __future__ import annotations

import numpy as np


def plot_run(
    x_true,
    x_est,
    landmarks=None,
    features=None,
    active_mask=None,
    valid=None,
    title: str = "conan_slam_tpu valet loop",
    save_path: str | None = None,
):
    """Plot a simulation run.  Returns the matplotlib figure.

    Args:
      x_true, x_est: (T, 3) trajectories.
      landmarks: optional (N, 2) ground-truth landmark positions.
      features: optional (K, 2) estimated feature positions.
      active_mask: optional (K,) bool for valid features.
      valid: optional (T,) bool step mask.
      save_path: if given, also writes a PNG.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x_true = np.asarray(x_true)
    x_est = np.asarray(x_est)
    if valid is not None:
        v = np.asarray(valid)
        x_true, x_est = x_true[v], x_est[v]

    fig, ax = plt.subplots(figsize=(9, 8))
    if landmarks is not None:
        lm = np.asarray(landmarks)
        ax.plot(lm[:, 0], lm[:, 1], "k*", ms=8, alpha=0.5, label="landmarks (true)")
    if features is not None:
        f = np.asarray(features)
        if active_mask is not None:
            f = f[np.asarray(active_mask)]
        ax.plot(f[:, 0], f[:, 1], "rx", ms=6, label="landmarks (est)")
    ax.plot(x_true[:, 0], x_true[:, 1], "g-", lw=1.5, label="trajectory (true)")
    ax.plot(x_est[:, 0], x_est[:, 1], "b--", lw=1.0, label="trajectory (est)")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_title(title)
    ax.legend(loc="best")
    ax.axis("equal")
    ax.grid(alpha=0.3)
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
    return fig
