"""Export a self-contained serving artifact.

Replaces the reference's SavedModel export (tacotron_model_export.py:11-65,
signature ``tacotron_fw`` with inputs input/input_length and outputs
mel/alignment): here the artifact is a directory holding

  tacotron_params.npz      flat param arrays
  wavernn_params.npz       (optional) vocoder params
  config.json              the full Config used at training time
  symbols.txt              frozen vocabulary (checkpoint <-> vocab pinned)
  MANIFEST.json            versions + contract description

``load_exported(path)`` reconstructs a ready Synthesizer — the jitted
inference function is the "served model"; no separate model server binary.

Usage:
    python -m tacotronv2_wavernn_chinese_tpu.serving.export \
        --ckpt-dir logs-tacotron/taco_pretrained \
        [--wavernn-ckpt-dir logs-wavernn/checkpoints] --out export/1
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import jax

from ..config import Config, default_config
from ..utils.checkpoints import load_params_npz, save_params_npz

MANIFEST = {
    "format": "tacotronv2_wavernn_chinese_tpu.export.v1",
    "signature": {
        "name": "tacotron_fw",
        "inputs": {"input": "int32 [1, None] phoneme ids", "input_length": "int32 [1]"},
        "outputs": {"mel": "float32 [T, 80] in [-4, 4]", "alignment": "float32 [T_dec, T_in]"},
    },
}


def export_artifact(
    cfg: Config,
    tacotron_params,
    out_dir: str,
    wavernn_params=None,
) -> str:
    os.makedirs(out_dir, exist_ok=True)
    save_params_npz(os.path.join(out_dir, "tacotron_params.npz"), jax.device_get(tacotron_params))
    if wavernn_params is not None:
        save_params_npz(os.path.join(out_dir, "wavernn_params.npz"), jax.device_get(wavernn_params))
    with open(os.path.join(out_dir, "config.json"), "w", encoding="utf-8") as f:
        json.dump(cfg.to_dict(), f, indent=2, default=str)
    symbols_src = os.path.join(os.path.dirname(__file__), "..", "frontend", "data", "symbols.txt")
    shutil.copy(symbols_src, os.path.join(out_dir, "symbols.txt"))
    with open(os.path.join(out_dir, "MANIFEST.json"), "w", encoding="utf-8") as f:
        json.dump(MANIFEST, f, indent=2)
    return out_dir


def _config_from_dict(d: dict) -> Config:
    """Rebuild the frozen dataclass tree from config.json."""
    import dataclasses

    cfg = default_config()

    def rebuild(template, data):
        if dataclasses.is_dataclass(template) and isinstance(data, dict):
            updates = {}
            for field in dataclasses.fields(template):
                if field.name in data:
                    cur = getattr(template, field.name)
                    new = rebuild(cur, data[field.name])
                    if isinstance(cur, tuple) and isinstance(new, list):
                        new = tuple(new)
                    updates[field.name] = new
            return dataclasses.replace(template, **updates)
        if isinstance(template, tuple) and isinstance(data, list):
            return tuple(data)
        return data

    return rebuild(cfg, d)


def load_exported(path: str, max_iters: int | None = None):
    """Artifact dir -> ready Synthesizer (vocabulary pinned to the
    artifact's symbols.txt, NOT the installed package's table — the
    embedding rows must match the table the checkpoint was trained with)."""
    from ..frontend.symbols import SymbolTable
    from ..infer.synthesizer import Synthesizer

    with open(os.path.join(path, "config.json"), encoding="utf-8") as f:
        cfg = _config_from_dict(json.load(f))
    params = load_params_npz(os.path.join(path, "tacotron_params.npz"))
    voc = None
    wav_path = os.path.join(path, "wavernn_params.npz")
    if os.path.exists(wav_path):
        voc = load_params_npz(wav_path)
    with open(os.path.join(path, "symbols.txt"), encoding="utf-8") as f:
        symbols = SymbolTable([line.rstrip("\n") for line in f if line.rstrip("\n")])
    return Synthesizer(
        cfg, params, vocoder_params=voc, max_iters=max_iters, symbols=symbols
    )


def main() -> None:
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--params-npz", default=None,
                    help="flat .npz Tacotron weights (tools/import_tf_checkpoint)")
    ap.add_argument("--wavernn-ckpt-dir", default=None)
    ap.add_argument("--wavernn-params-npz", default=None,
                    help="flat .npz WaveRNN weights (tools/import_torch_wavernn)")
    ap.add_argument("--out", default="export/1")
    ap.add_argument("--override", default="")
    args = ap.parse_args()

    cfg = default_config()
    if args.override:
        cfg = cfg.override(args.override)

    from ..train import tacotron_task as TT
    from ..utils.checkpoints import CheckpointManager, load_params_npz

    if not args.ckpt_dir and not args.params_npz:
        ap.error("one of --ckpt-dir / --params-npz is required")
    if args.ckpt_dir and args.params_npz:
        ap.error("--ckpt-dir and --params-npz are mutually exclusive")
    if args.wavernn_ckpt_dir and args.wavernn_params_npz:
        ap.error("--wavernn-ckpt-dir and --wavernn-params-npz are mutually exclusive")
    if args.params_npz:
        params = load_params_npz(args.params_npz)
    else:
        state = CheckpointManager(args.ckpt_dir).restore(
            TT.init_state(jax.random.PRNGKey(0), cfg)
        )
        if state is None:
            raise FileNotFoundError(f"no checkpoint under {args.ckpt_dir}")
        params = state.params
    voc_params = None
    if args.wavernn_params_npz:
        voc_params = load_params_npz(args.wavernn_params_npz)
    elif args.wavernn_ckpt_dir:
        from ..train import wavernn_task as WT

        wstate = CheckpointManager(args.wavernn_ckpt_dir).restore(
            WT.init_state(jax.random.PRNGKey(0), cfg)
        )
        if wstate is None:
            raise FileNotFoundError(f"no checkpoint under {args.wavernn_ckpt_dir}")
        voc_params = wstate.params
    out = export_artifact(cfg, params, args.out, voc_params)
    print(f"exported serving artifact -> {out}")


if __name__ == "__main__":
    main()
