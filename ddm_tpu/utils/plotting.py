"""Matplotlib artifact helpers (scatter plots, training-curve figures).

Re-implementation of ``/root/reference/dddm/utils.py:7-93`` with the same
artifact semantics: fixed +-8 axis limits and equal aspect for the 2-D
scatter; multi-series curve plots driven by a history mapping with an
optional ``x_key``, skipping empty or length-mismatched series and raising
``ValueError`` when nothing was plotted. Matplotlib imports stay lazy so the
compute path never pays for them.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from typing import Sequence

import numpy as np

__all__ = ["save_scatter", "save_image_grid", "plot_training_curves"]


def save_scatter(points, path: str, lim: float = 8.0) -> None:
    """Scatter 2-D samples with fixed limits (reference ``utils.py:7-18``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = np.asarray(points)
    plt.figure(figsize=(4, 4))
    plt.scatter(pts[:, 0], pts[:, 1], s=3)
    plt.xlim(-lim, lim)
    plt.ylim(-lim, lim)
    plt.gca().set_aspect("equal", "box")
    plt.tight_layout()
    plt.savefig(path, dpi=150)
    plt.close()


def save_image_grid(images, path: str, nrow: int | None = None, padding: int = 2) -> None:
    """Tile images into a grid PNG.

    Replacement for torchvision's ``make_grid`` + ``save_image`` used by the
    reference CIFAR entry point (``train_cifar10_dit.py:239-256``). Accepts
    images in [0, 1], shape ``(B, H, W, C)`` or ``(B, C, H, W)``.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    imgs = np.asarray(images)
    if imgs.ndim != 4:
        raise ValueError("Expecting a batch of images (rank 4)")
    if imgs.shape[1] in (1, 3) and imgs.shape[-1] not in (1, 3):
        imgs = imgs.transpose(0, 2, 3, 1)  # NCHW -> NHWC
    B, H, W, C = imgs.shape
    if nrow is None:
        nrow = int(np.ceil(np.sqrt(B)))
    ncol = nrow
    nrow_grid = int(np.ceil(B / ncol))
    canvas = np.ones(
        (nrow_grid * (H + padding) + padding, ncol * (W + padding) + padding, C),
        dtype=np.float32,
    )
    for i in range(B):
        r, c = divmod(i, ncol)
        y = padding + r * (H + padding)
        x = padding + c * (W + padding)
        canvas[y : y + H, x : x + W] = np.clip(imgs[i], 0.0, 1.0)
    if C == 1:
        canvas = canvas[..., 0]
    plt.imsave(path, canvas, vmin=0.0, vmax=1.0, cmap=None if C != 1 else "gray")


def plot_training_curves(
    history: Mapping[str, Sequence[float]],
    path: str,
    *,
    title: str,
    xlabel: str,
    x_key: str | None = None,
    metrics: Iterable[str] | None = None,
) -> str:
    """Plot training/evaluation dynamics from a metrics history mapping.

    Same contract as the reference (``utils.py:21-93``): when ``x_key`` is
    given its entry supplies x coordinates for every series; series that are
    missing, empty, or length-mismatched are skipped; raises ``ValueError``
    if nothing was plotted. Returns ``path``.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if metrics is None:
        metrics = [k for k in history.keys() if k != x_key]

    x_values: Sequence[float] | None = None
    if x_key is not None:
        x_values = history.get(x_key)
        if x_values is not None and len(x_values) == 0:
            x_values = None

    fig, ax = plt.subplots(figsize=(6, 4))
    plotted = False
    for key in metrics:
        if key == x_key:
            continue
        values = history.get(key)
        if values is None or len(values) == 0:
            continue
        if x_values is None:
            xs: Sequence[float] = range(1, len(values) + 1)
        else:
            if len(x_values) != len(values):
                continue
            xs = x_values
        ax.plot(xs, values, label=key)
        plotted = True

    if not plotted:
        plt.close(fig)
        raise ValueError("No metrics available to plot training dynamics.")

    ax.set_title(title)
    ax.set_xlabel(xlabel)
    ax.set_ylabel("Value")
    ax.grid(True, linestyle="--", linewidth=0.5, alpha=0.6)
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path
