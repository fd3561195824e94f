"""Console display helpers: progress bar, stream, ASCII tables.

Counterpart of the reference's wavernn/utils/display.py:9-121.
"""

from __future__ import annotations

import sys
import time
from typing import Iterable, Sequence


def stream(message: str) -> None:
    """Carriage-return streaming line (reference display.py stream)."""
    sys.stdout.write(f"\r{message}")
    sys.stdout.flush()


def progbar(i: int, n: int, size: int = 16) -> str:
    """Textual progress bar like ``|████    |`` (reference display.py progbar)."""
    done = int(size * i / max(n, 1))
    return "|" + "█" * done + " " * (size - done) + "|"


def simple_table(item_tuples: Sequence[tuple]) -> None:
    """Boxed two-row ASCII table of (heading, value) pairs
    (reference display.py simple_table)."""
    border_pattern = "+---------------------------------------"
    whitespace = "                                            "
    headings, cells = [], []
    for heading, cell in item_tuples:
        heading, cell = str(heading), str(cell)
        pad = abs(len(heading) - len(cell))
        pad_left = pad // 2
        pad_right = pad - pad_left
        if len(heading) < len(cell):
            heading = whitespace[:pad_left] + heading + whitespace[:pad_right]
        else:
            cell = whitespace[:pad_left] + cell + whitespace[:pad_right]
        headings.append(heading)
        cells.append(cell)
    border, head_row, cell_row = "", "", ""
    for h, c in zip(headings, cells):
        border += border_pattern[: len(h) + 3]
        head_row += f"| {h} "
        cell_row += f"| {c} "
    border += "+"
    print(border)
    print(head_row + "|")
    print(border)
    print(cell_row + "|")
    print(border)
    print(" ")


def time_since(started: float) -> str:
    """Elapsed m:ss / h:mm:ss string (reference display.py time_since)."""
    elapsed = time.time() - started
    m, s = divmod(int(elapsed), 60)
    h, m = divmod(m, 60)
    if h:
        return f"{h}h {m:02d}m {s:02d}s"
    return f"{m}m {s:02d}s"


def bar_stream(i: int, n: int, msg: str, size: int = 16) -> None:
    stream(f"{progbar(i, n, size)} {i}/{n} {msg}")
