"""Print variable names/shapes from a checkpoint (reference read_checkpoint.py).

Works on this framework's Orbax step-keyed checkpoint dirs and bare params
.npz exports.

Usage:
    python -m tools.inspect_checkpoint logs-tacotron/taco_pretrained
    python -m tools.inspect_checkpoint logs-tacotron/taco_pretrained/3
    python -m tools.inspect_checkpoint params.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def inspect_npz(path: str) -> None:
    data = np.load(path, allow_pickle=False)
    total = 0
    for name in sorted(data.files):
        arr = data[name]
        total += arr.size
        print(f"{name:80s} {str(arr.shape):20s} {arr.dtype}")
    print(f"\n{len(data.files)} arrays, {total:,} parameters")


def inspect_orbax(step_dir: str) -> None:
    import jax
    import jax.tree_util as jtu
    import orbax.checkpoint as ocp

    item = os.path.join(step_dir, "default")
    meta = ocp.StandardCheckpointer().metadata(item if os.path.isdir(item) else step_dir)
    tree = meta.item_metadata if hasattr(meta, "item_metadata") else meta
    total = 0
    rows = []
    for path, leaf in jtu.tree_leaves_with_path(tree):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        dtype = getattr(leaf, "dtype", "?")
        n = int(np.prod(shape)) if shape else 1
        total += n
        rows.append((jtu.keystr(path), shape, dtype))
    for name, shape, dtype in sorted(rows):
        print(f"{name:80s} {str(shape):20s} {dtype}")
    print(f"\n{len(rows)} arrays, {total:,} parameters")


def _latest_step_dir(ckpt_root: str) -> str:
    steps = sorted(int(d) for d in os.listdir(ckpt_root) if d.isdigit())
    if not steps:
        raise SystemExit(f"no step directories under {ckpt_root}")
    return os.path.join(ckpt_root, str(steps[-1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="checkpoint dir (root or step) or .npz file")
    args = ap.parse_args()
    path = args.path
    if os.path.isfile(path):
        inspect_npz(path)
        return
    if not os.path.isdir(path):
        raise SystemExit(f"{path} not found")
    entries = os.listdir(path)
    if any(d.isdigit() for d in entries):  # checkpoint root -> pick latest
        path = _latest_step_dir(path)
        print(f"latest checkpoint: {path}\n")
    inspect_orbax(path)


if __name__ == "__main__":
    main()
