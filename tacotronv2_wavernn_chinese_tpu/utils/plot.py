"""Alignment / spectrogram plot artifacts (reference tacotron/utils/plot.py:16-78).

matplotlib is optional — functions no-op with a warning if it's absent.
"""

from __future__ import annotations

import numpy as np


def _mpl():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError:
        return None


def plot_alignment(alignment: np.ndarray, path: str, title: str = "", max_len: int | None = None) -> None:
    """Alignment heatmap [T_dec, T_in] -> PNG."""
    plt = _mpl()
    if plt is None:
        return
    if max_len is not None:
        alignment = alignment[:max_len]
    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(np.asarray(alignment).T, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("Decoder timestep")
    ax.set_ylabel("Encoder timestep")
    if title:
        ax.set_title(title, fontsize=8)
    fig.tight_layout()
    fig.savefig(path, format="png")
    plt.close(fig)


def plot_spectrogram(
    pred: np.ndarray,
    path: str,
    title: str = "",
    target: np.ndarray | None = None,
    max_len: int | None = None,
) -> None:
    """Predicted (and optionally target) mel spectrogram -> PNG."""
    plt = _mpl()
    if plt is None:
        return
    if max_len is not None:
        pred = pred[:max_len]
        target = target[:max_len] if target is not None else None
    n = 2 if target is not None else 1
    fig, axes = plt.subplots(n, 1, figsize=(10, 4 * n), squeeze=False)
    if target is not None:
        axes[0][0].imshow(np.asarray(target).T, aspect="auto", origin="lower", interpolation="none")
        axes[0][0].set_title("Target")
        axes[1][0].imshow(np.asarray(pred).T, aspect="auto", origin="lower", interpolation="none")
        axes[1][0].set_title("Predicted")
    else:
        axes[0][0].imshow(np.asarray(pred).T, aspect="auto", origin="lower", interpolation="none")
        if title:
            axes[0][0].set_title(title, fontsize=8)
    fig.tight_layout()
    fig.savefig(path, format="png")
    plt.close(fig)
