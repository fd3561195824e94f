"""Vocode a mel .npy (or re-vocode a wav) with a trained WaveRNN.

Replaces the reference wavernn_gen.py:13-135, with ``batched`` a real flag
instead of force-overridden (:77).

Usage:
    python -m tacotronv2_wavernn_chinese_tpu.infer.wavernn_gen \
        --file mel.npy --ckpt-dir logs-wavernn/checkpoints [--unbatched]
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import numpy as np

from ..config import default_config
from ..dsp import spectrogram as S
from ..dsp.wav import load_wav, save_wav
from ..models import wavernn as W
from ..utils import logging as infolog
from ..utils.checkpoints import CheckpointManager
from ..train import wavernn_task as task


def gen_from_mel(cfg, params, mel: np.ndarray, out_path: str, seed: int = 0) -> str:
    """mel must be [T, 80] in [0, 1] (reference range check wavernn_gen.py:25-28)."""
    if mel.ndim != 2 or mel.shape[1] != cfg.audio.num_mels:
        raise ValueError(f"expected [T, {cfg.audio.num_mels}] mel, got {mel.shape}")
    if mel.min() < -0.01 or mel.max() > 1.01:
        raise ValueError(
            f"mel range [{mel.min():.3f}, {mel.max():.3f}] is not the unit "
            "vocoder contract; convert with dsp.spectrogram.mel_to_unit"
        )
    wav = W.generate(
        params,
        cfg.wavernn,
        cfg.wavernn_gen,
        mel.astype(np.float32),
        jax.random.PRNGKey(seed),
        bits=cfg.audio.bits,
        apply_mu_law=cfg.audio.mu_law,
    )
    save_wav(wav, out_path, cfg.audio.sample_rate)
    return out_path


def main() -> None:
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", required=True, help="mel .npy ([T,80] in [0,1]) or .wav")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--params-npz", default=None,
                    help="flat .npz weights (e.g. from tools/import_torch_wavernn)")
    ap.add_argument("--output", default=None)
    ap.add_argument("--unbatched", action="store_true")
    ap.add_argument("--target", type=int, default=None)
    ap.add_argument("--overlap", type=int, default=None)
    ap.add_argument("--override", default="")
    args = ap.parse_args()

    cfg = default_config()
    if args.override:
        cfg = cfg.override(args.override)
    gen = cfg.wavernn_gen
    if args.unbatched:
        gen = dataclasses.replace(gen, batched=False)
    if args.target is not None:
        gen = dataclasses.replace(gen, target=args.target)
    if args.overlap is not None:  # 0 is valid (disables crossfade)
        gen = dataclasses.replace(gen, overlap=args.overlap)
    cfg = dataclasses.replace(cfg, wavernn_gen=gen)

    if not args.ckpt_dir and not args.params_npz:
        ap.error("one of --ckpt-dir / --params-npz is required")
    if args.params_npz:
        from ..utils.checkpoints import load_params_npz

        params = load_params_npz(args.params_npz)
    else:
        state = CheckpointManager(args.ckpt_dir).restore(
            task.init_state(jax.random.PRNGKey(0), cfg)
        )
        if state is None:
            raise FileNotFoundError(f"no checkpoint under {args.ckpt_dir}")
        params = state.params

    if args.file.endswith(".npy"):
        mel = np.load(args.file)
    else:
        y = load_wav(args.file, cfg.audio.sample_rate)
        pipe = S.MelPipeline(cfg.audio)
        mel = np.asarray(S.mel_to_unit(pipe.melspectrogram(y), cfg.audio))

    base = os.path.splitext(os.path.basename(args.file))[0]
    kind = "unbatched" if not cfg.wavernn_gen.batched else (
        f"batched_t{cfg.wavernn_gen.target}_o{cfg.wavernn_gen.overlap}"
    )
    out = args.output or f"{base}_{kind}.wav"
    gen_from_mel(cfg, params, mel, out)
    infolog.log(f"wrote {out}")


if __name__ == "__main__":
    main()
