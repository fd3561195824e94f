"""Alignment / spectrogram plot artifacts (reference tacotron/utils/plot.py:16-78).

Uses matplotlib's object-oriented Figure/Agg API — no pyplot global state
machine — so rendering is safe from concurrent threads (the HTTP server's
handler threads call ``alignment_figure`` directly).  matplotlib is
optional; functions no-op with a warning if it's absent.
"""

from __future__ import annotations

import numpy as np


def _figure(figsize):
    try:
        from matplotlib.backends.backend_agg import FigureCanvasAgg
        from matplotlib.figure import Figure
    except ImportError:
        return None
    fig = Figure(figsize=figsize)
    FigureCanvasAgg(fig)
    return fig


def alignment_figure(alignment: np.ndarray, title: str = "", figsize=(8, 6)):
    """Alignment heatmap [T_dec, T_in] -> Figure (or None without mpl)."""
    fig = _figure(figsize)
    if fig is None:
        return None
    ax = fig.add_subplot()
    im = ax.imshow(
        np.asarray(alignment).T, aspect="auto", origin="lower", interpolation="none"
    )
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("Decoder timestep")
    ax.set_ylabel("Encoder timestep")
    if title:
        ax.set_title(title, fontsize=8)
    fig.tight_layout()
    return fig


def plot_alignment(
    alignment: np.ndarray, path: str, title: str = "", max_len: int | None = None
) -> None:
    """Alignment heatmap [T_dec, T_in] -> PNG file."""
    if max_len is not None:
        alignment = alignment[:max_len]
    fig = alignment_figure(alignment, title)
    if fig is not None:
        fig.savefig(path, format="png")


def plot_spectrogram(
    pred: np.ndarray,
    path: str,
    title: str = "",
    target: np.ndarray | None = None,
    max_len: int | None = None,
) -> None:
    """Predicted (and optionally target) mel spectrogram -> PNG."""
    if max_len is not None:
        pred = pred[:max_len]
        target = target[:max_len] if target is not None else None
    n = 2 if target is not None else 1
    fig = _figure((10, 4 * n))
    if fig is None:
        return
    if target is not None:
        ax0 = fig.add_subplot(2, 1, 1)
        ax0.imshow(np.asarray(target).T, aspect="auto", origin="lower", interpolation="none")
        ax0.set_title("Target")
        ax1 = fig.add_subplot(2, 1, 2)
        ax1.imshow(np.asarray(pred).T, aspect="auto", origin="lower", interpolation="none")
        ax1.set_title("Predicted")
    else:
        ax0 = fig.add_subplot()
        ax0.imshow(np.asarray(pred).T, aspect="auto", origin="lower", interpolation="none")
        if title:
            ax0.set_title(title, fontsize=8)
    fig.tight_layout()
    fig.savefig(path, format="png")
