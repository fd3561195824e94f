"""Scalar metrics logging + profiling hooks.

Replaces the reference's TensorBoard summaries (tf.summary scalars at
tacotron/train.py:41-62, written every summary_interval) with an append-only
JSONL stream per run — greppable, plottable, and dependency-free — plus
`jax.profiler` trace capture in place of the reference's nothing
(SURVEY §5: no profiler hooks existed).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping


class MetricsWriter:
    """Append-only scalars.jsonl: one {"step": N, "wall": t, ...} per write."""

    def __init__(self, log_dir: str, name: str = "scalars.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, name)
        self._f = open(self.path, "a", buffering=1, encoding="utf-8")
        self._t0 = time.time()

    def write(self, step: int, scalars: Mapping[str, Any]) -> None:
        row = {"step": int(step), "wall": round(time.time() - self._t0, 3)}
        for k, v in scalars.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = str(v)
        self._f.write(json.dumps(row) + "\n")

    def close(self) -> None:
        self._f.close()


def read_scalars(path: str) -> list[dict]:
    with open(path, encoding="utf-8") as f:
        return [json.loads(line) for line in f if line.strip()]


def dump_embedding_projector(embedding, symbols: list[str], out_dir: str) -> None:
    """Write the character-embedding table in TensorBoard-projector TSV
    format (embedding.tsv + metadata.tsv) — the reference logs the same
    table via the TB projector config (tacotron/train.py:26-39,220-227)."""
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    emb = np.asarray(embedding)
    with open(os.path.join(out_dir, "embedding.tsv"), "w", encoding="utf-8") as f:
        for row in emb:
            f.write("\t".join(f"{v:.6f}" for v in row) + "\n")
    with open(os.path.join(out_dir, "metadata.tsv"), "w", encoding="utf-8") as f:
        for i in range(emb.shape[0]):
            label = symbols[i] if i < len(symbols) else f"sym_{i}"
            f.write(label + "\n")


class Profiler:
    """jax.profiler trace capture for a step window.

    Usage: ``prof = Profiler(log_dir, start_step=10, num_steps=5)`` then call
    ``prof.step(step)`` once per training step; a TensorBoard-viewable trace
    lands under ``log_dir/plugins/profile``.
    """

    def __init__(self, log_dir: str | None, start_step: int = 10, num_steps: int = 5):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False
        self._warned = False

    def step(self, step: int) -> None:
        if self.log_dir is None:
            return
        import jax

        from . import is_axon_backend

        if is_axon_backend():
            # the axon tunnel hangs on profiler trace capture (it reports
            # backend "tpu", so detect via the PJRT platform_version — see
            # CLAUDE.md); refuse rather than wedge the device
            if not self._warned and step >= self.start_step:
                print("WARNING: jax.profiler unsupported on the axon backend; "
                      "skipping trace capture")
                self._warned = True
            return

        if not self._active and step == self.start_step:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
