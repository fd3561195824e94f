"""Headline benchmark: WaveRNN batched-fold generation throughput.

Prints ONE JSON line:
  {"metric": "wavernn_gen_audio_seconds_per_second", "value": N,
   "unit": "audio_s/s", "vs_baseline": N}

``vs_baseline`` is the ratio against the BASELINE.md north-star target of
50x realtime per chip (the reference records no numbers of its own — its
shipped driver is CPU-pinned, wavernn_train.py:46 / wavernn_gen.py:93, and
prints an unrecorded kHz rate, fatchord_version.py:267-271).

Method: full-size RAW 10-bit WaveRNN (rnn/fc 512, upsample (5,5,11)),
one long synthetic utterance folded into overlapping segments
(target 11000, overlap 550 — reference wavernn_hparams.py:55-57) that form
the batch axis of the autoregressive sample loop.  Steady-state timing
excludes compilation (first call) and host transfer of the mel.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.models import wavernn as W

BASELINE_X_REALTIME = 50.0


def main() -> None:
    cfg = default_config()
    hop = cfg.wavernn.total_upsample
    sr = cfg.audio.sample_rate

    # ~37.5 s of audio -> 3000 mel frames -> ~71 folds of 40+2*2 frames
    T_mel = 3000
    rng = np.random.RandomState(0)
    mel = rng.rand(T_mel, cfg.audio.num_mels).astype(np.float32)

    params = W.init_wavernn(
        jax.random.PRNGKey(0), cfg.wavernn, cfg.audio.num_mels, cfg.audio.bits
    )

    t_frames = cfg.wavernn_gen.target // hop
    ov_frames = cfg.wavernn_gen.overlap // hop
    folds, n_folds = W.fold_with_overlap(mel, t_frames, ov_frames)
    folds = np.stack([W.pad_mel_for_generation(f, cfg.wavernn.pad) for f in folds])
    folds_dev = jnp.asarray(folds)
    print(f"folds: {folds.shape} on {jax.devices()[0]}", file=sys.stderr)

    gen = jax.jit(
        lambda p, m, k: W.generate_scan(p, cfg.wavernn, m, k, cfg.audio.bits),
    )

    # compile + warmup
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    jax.block_until_ready(gen(params, folds_dev, key))
    print(f"compile+warmup: {time.time() - t0:.1f}s", file=sys.stderr)

    # steady state
    reps = 3
    t0 = time.time()
    for i in range(reps):
        out = gen(params, folds_dev, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    wall = (time.time() - t0) / reps

    audio_seconds = n_folds * (cfg.wavernn_gen.target + 2 * cfg.wavernn_gen.overlap) / sr
    value = audio_seconds / wall
    print(
        f"{audio_seconds:.1f}s audio in {wall:.2f}s wall "
        f"({value:.1f}x realtime, {n_folds} folds)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "wavernn_gen_audio_seconds_per_second",
                "value": round(value, 2),
                "unit": "audio_s/s",
                "vs_baseline": round(value / BASELINE_X_REALTIME, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
