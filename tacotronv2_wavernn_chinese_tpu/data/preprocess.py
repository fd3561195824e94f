"""Corpus preprocessing: Biaobei transcripts + wavs -> (audio, mel) features.

Replaces the reference's ProcessPoolExecutor-per-utterance librosa pipeline
(tacotron/datasets/preprocessor.py:11-121, tacotron_preprocess.py:10-113)
with host-side wav conditioning + *batched on-device* mel extraction: wavs
are grouped into length buckets, padded, and run through the jitted STFT/mel
pipeline as one batch per bucket, so feature extraction rides the MXU.

Multi-host scaling is an utterance-shard: pass ``shard_index``/``num_shards``
and each host processes its own slice of the corpus (SURVEY §2.9).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..dsp.spectrogram import MelPipeline, num_frames
from ..dsp.wav import load_wav, preemphasis, rescale, trim_silence
from ..frontend import get_pyin


def condition_wav(audio_cfg, wav_path: str):
    """Shared wav-conditioning chain (trim -> preemphasis -> rescale), the
    single source of truth for feature extraction AND the mel-parity
    harness (tools/check_mel_parity.py).  Returns (wav, preemphasized) or
    None when the file is missing."""
    try:
        wav = load_wav(wav_path, audio_cfg.sample_rate)
    except FileNotFoundError:
        return None
    if audio_cfg.trim_silence:
        wav = trim_silence(
            wav, audio_cfg.trim_top_db, audio_cfg.trim_fft_size, audio_cfg.trim_hop_size
        )
    preem = preemphasis(wav, audio_cfg.preemphasis, audio_cfg.preemphasize).astype(np.float32)
    if audio_cfg.rescale:
        wav = rescale(wav, audio_cfg.rescaling_max)
        preem = rescale(preem, audio_cfg.rescaling_max).astype(np.float32)
    return wav.astype(np.float32), preem


@dataclass
class Utterance:
    index: str
    wav_path: str
    text: str
    pyin: str


def parse_biaobei(transcript_path: str, wav_dir: str) -> list[Utterance]:
    """Parse the Biaobei ``000001-010000.txt`` transcript (text line +
    pinyin line pairs; reference preprocessor.py:36-48).  The corpus pinyin
    line is skipped — G2P re-derives phonemes so frontend and training stay
    consistent."""
    utts = []
    with open(transcript_path, encoding="utf-8") as f:
        lines = [ln.rstrip("\n") for ln in f]
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        m = re.match(r"^(\d{6})\s+(.*)$", line)
        if m:
            index, text = m.group(1), m.group(2).strip()
            pyin, norm_text = get_pyin(text)
            utts.append(
                Utterance(index, os.path.join(wav_dir, f"{index}.wav"), norm_text, pyin)
            )
            i += 2  # skip the corpus pinyin line
        else:
            i += 1
    return utts


def process_corpus(
    cfg: Config,
    transcript_path: str,
    wav_dir: str,
    out_dir: str,
    shard_index: int = 0,
    num_shards: int = 1,
    bucket_batch: int = 16,
    log=print,
) -> list[tuple]:
    """Process a corpus shard; returns metadata rows
    (audio.npy|mel.npy|time_steps|mel_frames|text|pyin)."""
    a = cfg.audio
    os.makedirs(out_dir, exist_ok=True)
    pipe = MelPipeline(a)
    utts = parse_biaobei(transcript_path, wav_dir)[shard_index::num_shards]

    def condition(u: Utterance):
        """Host-side wav conditioning; None if the wav is missing."""
        return condition_wav(a, u.wav_path)

    # pass 1: conditioned lengths only, so the full corpus shard is never
    # resident — O(bucket_batch) audio in memory instead of ~2x corpus size
    # (the reference streams one file per pool task, preprocessor.py:53-72)
    lengths = []
    for u in utts:
        c = condition(u)
        if c is None:
            log(f"missing wav {u.wav_path}, skipping")
            continue
        lengths.append((len(c[1]), u))

    # pass 2: batched on-device mel extraction, bucketed by padded length;
    # each chunk re-conditions lazily (one-time CPU cost, constant memory)
    mel_fn = jax.jit(jax.vmap(pipe.melspectrogram))
    rows = []
    lengths.sort(key=lambda t: t[0])
    for start in range(0, len(lengths), bucket_batch):
        chunk = [
            (u, *c)
            for _, u in lengths[start : start + bucket_batch]
            if (c := condition(u)) is not None  # tolerate a wav vanishing mid-run
        ]
        if not chunk:
            continue
        max_len = max(len(p) for _, _, p in chunk)
        # pad to a coarse bucket (64 hops ~ 0.8 s) so the jitted mel program
        # compiles for a handful of shapes instead of one per chunk; the
        # per-item num_frames trim below removes the excess frames exactly
        bucket = 64 * a.hop_size
        pad_len = -(-max_len // bucket) * bucket
        batch = np.zeros((len(chunk), pad_len), np.float32)
        for i, (_, _, preem) in enumerate(chunk):
            batch[i, : len(preem)] = preem
        mels = np.asarray(mel_fn(jnp.asarray(batch)))  # [b, F_pad, 80]
        for (u, wav, preem), mel_padded in zip(chunk, mels):
            mel_frames = num_frames(len(preem), a.n_fft, a.hop_size)
            mel = mel_padded[:mel_frames]
            out = np.pad(wav, (0, max(0, mel_frames * a.hop_size - len(wav))))
            out = out[: mel_frames * a.hop_size]
            audio_fn = f"audio-{u.index}.npy"
            mel_fn_name = f"mel-{u.index}.npy"
            np.save(os.path.join(out_dir, audio_fn), out, allow_pickle=False)
            np.save(os.path.join(out_dir, mel_fn_name), mel, allow_pickle=False)
            rows.append((audio_fn, mel_fn_name, len(out), mel_frames, u.text, u.pyin))
    rows.sort(key=lambda r: r[0])
    return rows


def write_metadata(rows: list[tuple], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for r in rows:
            f.write("|".join(str(x) for x in r) + "\n")


def read_metadata(path: str) -> list[list[str]]:
    with open(path, encoding="utf-8") as f:
        return [line.strip().split("|") for line in f if line.strip()]


def main() -> None:
    """CLI (replaces reference tacotron_preprocess.py):

    python -m tacotronv2_wavernn_chinese_tpu.data.preprocess \
        --transcript dataset/BZNSYP/ProsodyLabeling/000001-010000.txt \
        --wav-dir dataset/BZNSYP/Wave --out-dir training_data
    """
    import argparse

    from ..config import default_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--transcript", required=True)
    ap.add_argument("--wav-dir", required=True)
    ap.add_argument("--out-dir", default="training_data")
    ap.add_argument("--shard-index", type=int, default=0)
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--bucket-batch", type=int, default=16)
    ap.add_argument("--override", default="")
    args = ap.parse_args()

    cfg = default_config()
    if args.override:
        cfg = cfg.override(args.override)
    rows = process_corpus(
        cfg,
        args.transcript,
        args.wav_dir,
        args.out_dir,
        shard_index=args.shard_index,
        num_shards=args.num_shards,
        bucket_batch=args.bucket_batch,
    )
    suffix = f".{args.shard_index}" if args.num_shards > 1 else ""
    meta = os.path.join(args.out_dir, f"train.txt{suffix}")
    write_metadata(rows, meta)
    hours = sum(int(r[2]) for r in rows) / cfg.audio.sample_rate / 3600
    print(f"wrote {len(rows)} utterances ({hours:.2f} h audio) -> {meta}")


if __name__ == "__main__":
    main()
