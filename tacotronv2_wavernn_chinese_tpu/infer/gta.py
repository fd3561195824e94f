"""GTA (ground-truth-aligned) bridge: Tacotron -> WaveRNN training data.

Replaces the reference's wavernn_preprocess.py:29-172: for every training
utterance, run the *teacher-forced* acoustic model (the reference's helper is
unconditionally teacher-forced, helpers.py:136-142, which is what makes GTA
work) and emit the triplet WaveRNN trains on:

  wav-XXXX.npy       mu-law 10-bit labels of the (preemphasized) audio
  gt_mel-XXXX.npy    ground-truth mel rescaled to [0, 1]
  pred_mel-XXXX.npy  teacher-forced predicted mel rescaled to [0, 1]

plus ``wavernn_training_data.txt`` rows ``wav|gt_mel|pred_mel|text``.

Multi-host: the utterance list is sharded by (shard_index, num_shards) —
GTA generation is embarrassingly parallel, so N hosts each process 1/N of
the corpus (SURVEY §2.9: the TPU-native replacement for the reference's
serial single-process loop).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, default_config
from ..data.loader import TacotronDataset
from ..data.preprocess import read_metadata
from ..dsp import mulaw
from ..dsp import spectrogram as S
from ..train import tacotron_task as task
from ..utils import logging as infolog
from ..utils.checkpoints import CheckpointManager


def generate_gta(
    cfg: Config,
    params,
    metadata_path: str,
    data_dir: str,
    out_dir: str,
    batch_size: int = 8,
    shard_index: int = 0,
    num_shards: int = 1,
    log=infolog.log,
) -> str:
    """Run teacher-forced synthesis over (a shard of) the corpus; returns the
    path of this shard's metadata file."""
    os.makedirs(out_dir, exist_ok=True)
    dataset = TacotronDataset(read_metadata(metadata_path), data_dir, cfg)
    # index the dataset's OWN row list (it may filter by clip_mels_length)
    rows = dataset.rows
    shard_rows = list(range(shard_index, len(rows), num_shards))

    mu = 2 ** cfg.audio.bits
    suffix = f".{shard_index}" if num_shards > 1 else ""
    meta_path = os.path.join(out_dir, f"wavernn_training_data.txt{suffix}")
    n_done = 0
    t0 = time.time()
    with open(meta_path, "w", encoding="utf-8") as meta:
        for batch in dataset.sequential_batches(batch_size, indices=shard_rows):
            arrays = {
                "inputs": jnp.asarray(batch.inputs),
                "input_lengths": jnp.asarray(batch.input_lengths),
                "mel_targets": jnp.asarray(batch.mel_targets),
                "stop_targets": jnp.asarray(batch.stop_targets),
                "target_lengths": jnp.asarray(batch.target_lengths),
            }
            _, out = task.eval_step(params, arrays, jax.random.PRNGKey(0), cfg)
            pred = np.asarray(out.mel_outputs)
            for j, row_idx in enumerate(batch.indices):
                row = rows[row_idx]
                T = int(batch.target_lengths[j])
                base = os.path.splitext(os.path.basename(row[1]))[0].replace("mel-", "")

                # xp=np: these per-utterance elementwise ops stay on host —
                # un-jitted jnp here would dispatch op-by-op through the
                # device tunnel (~32 ms RTT each) for every utterance
                audio = np.load(os.path.join(data_dir, row[0]))
                labels = mulaw.encode_mu_law(audio, mu=mu, xp=np).astype(np.int16)
                wav_name = f"wav-{base}.npy"
                np.save(os.path.join(out_dir, wav_name), labels)

                gt_unit = S.mel_to_unit(
                    np.asarray(batch.mel_targets[j][:T]), cfg.audio, xp=np
                ).astype(np.float32)
                gt_name = f"gt_mel-{base}.npy"
                np.save(os.path.join(out_dir, gt_name), gt_unit)

                pred_unit = S.mel_to_unit(pred[j][:T], cfg.audio, xp=np).astype(np.float32)
                pred_name = f"pred_mel-{base}.npy"
                np.save(os.path.join(out_dir, pred_name), pred_unit)

                text = row[4] if len(row) > 4 else ""
                meta.write(f"{wav_name}|{gt_name}|{pred_name}|{text}\n")
                n_done += 1
            if n_done % (batch_size * 8) < batch_size:
                rate = n_done / max(time.time() - t0, 1e-9)
                log(f"gta: {n_done}/{len(shard_rows)} utterances ({rate:.1f}/s)")
    log(f"gta shard {shard_index}/{num_shards}: wrote {n_done} utterances -> {meta_path}")
    return meta_path


def merge_shards(out_dir: str, num_shards: int) -> str:
    """Concatenate per-shard metadata into wavernn_training_data.txt."""
    final = os.path.join(out_dir, "wavernn_training_data.txt")
    with open(final, "w", encoding="utf-8") as out:
        for i in range(num_shards):
            with open(f"{final}.{i}", encoding="utf-8") as f:
                out.write(f.read())
    return final


def main() -> None:
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--metadata", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--out-dir", default="wavernn_training_data")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--shard-index", type=int, default=0)
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step to restore (default: latest) — "
                         "GTA should run from the BEST checkpoint, which "
                         "best-checkpoint selection may place before the "
                         "final one")
    ap.add_argument("--override", default="")
    args = ap.parse_args()

    cfg = default_config()
    if args.override:
        cfg = cfg.override(args.override)

    state = CheckpointManager(args.ckpt_dir).restore(
        task.init_state(jax.random.PRNGKey(0), cfg), step=args.step
    )
    if state is None:
        raise FileNotFoundError(f"no checkpoint under {args.ckpt_dir}")
    generate_gta(
        cfg,
        state.params,
        args.metadata,
        args.data_dir,
        args.out_dir,
        batch_size=args.batch_size,
        shard_index=args.shard_index,
        num_shards=args.num_shards,
    )


if __name__ == "__main__":
    main()
