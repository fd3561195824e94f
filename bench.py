"""Headline benchmark: WaveRNN batched-fold generation throughput.

Prints ONE JSON line:
  {"metric": "wavernn_gen_audio_seconds_per_second", "value": N,
   "unit": "audio_s/s", "vs_baseline": N}

``vs_baseline`` is the ratio against the BASELINE.md north-star target of
50x realtime per chip (the reference records no numbers of its own — its
shipped driver is CPU-pinned, wavernn_train.py:46 / wavernn_gen.py:93, and
prints an unrecorded kHz rate, fatchord_version.py:267-271).

Method: full-size RAW 10-bit WaveRNN (rnn/fc 512, upsample (5,5,11)), long
utterances folded into overlapping segments (TPU-tuned fold length 33000
samples, reference crossfade overlap 550 — wavernn_hparams.py:55-57) that
form the batch axis of the fused Pallas sample-loop kernel
(ops/wavernn_kernel.py: weights pinned in VMEM, on-chip Gumbel-argmax
sampling).  Timing notes: on the axon tunnel backend
``block_until_ready`` does not reliably block and large host transfers ride
a slow stdio relay, so each timed call is synchronized by reducing the
output to a scalar on device and transferring 4 bytes.  Fresh random seeds
per call prevent any result caching.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.models import wavernn as W

BASELINE_X_REALTIME = 50.0


def _sync_scalar(x) -> float:
    """Force execution; transfer only 4 bytes through the tunnel."""
    return float(np.asarray(jnp.sum(x)))


def main() -> None:
    from tacotronv2_wavernn_chinese_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = default_config()
    hop = cfg.wavernn.total_upsample
    sr = cfg.audio.sample_rate
    on_tpu = jax.default_backend() not in ("cpu",)

    # server-throughput scenario: a batch of 3 long utterances (~112 s each)
    # vocoded in ONE fused kernel call — all folds share the batch axis
    # (models/wavernn.py generate_batch).  CPU fallback shrinks the load so
    # the bench completes anywhere.
    T_mel = 9000 if on_tpu else 200
    n_utts = 3 if on_tpu else 1
    base = int.from_bytes(os.urandom(4), "little")
    rng = np.random.RandomState(base % 99991)
    mels = [rng.rand(T_mel, cfg.audio.num_mels).astype(np.float32) for _ in range(n_utts)]

    params = W.init_wavernn(
        jax.random.PRNGKey(0), cfg.wavernn, cfg.audio.num_mels, cfg.audio.bits
    )

    # Throughput-tuned fold length: 33,000 samples/fold cuts the
    # crossfade-overlap recompute from 10% (at the latency-oriented config
    # default of 11,000, reference wavernn_hparams.py:55-57) to 3.2% —
    # measured 596x -> 666x on v5e in a fold-length sweep.  Same 550-sample
    # crossfade, identical audio quality.  The CPU fallback keeps the small
    # default so the scan-path bench completes quickly anywhere.
    target = 33000 if on_tpu else cfg.wavernn_gen.target
    t_frames = target // hop
    ov_frames = cfg.wavernn_gen.overlap // hop
    all_folds = []
    n_folds = 0
    for mel in mels:
        folds, n = W.fold_with_overlap(mel, t_frames, ov_frames)
        all_folds.append(np.stack([W.pad_mel_for_generation(f, cfg.wavernn.pad) for f in folds]))
        n_folds += n
    folds_dev = jnp.asarray(np.concatenate(all_folds, axis=0))

    scan_gen = lambda k: W.generate_scan(params, cfg.wavernn, folds_dev, k, cfg.audio.bits)
    gen, path = scan_gen, "scan"
    if on_tpu:
        from tacotronv2_wavernn_chinese_tpu.ops import wavernn_kernel as K

        gen = lambda k: K.generate_pallas(params, cfg.wavernn, folds_dev, k, cfg.audio.bits)
        path = "pallas"
    print(f"folds: {folds_dev.shape} on {jax.devices()[0]} via {path}", file=sys.stderr)

    key = jax.random.PRNGKey(base)
    t0 = time.time()
    if path == "pallas":
        try:
            _sync_scalar(gen(key))
        except Exception as e:  # robust: never leave the driver without a number
            print(f"pallas path failed ({e}); falling back to scan", file=sys.stderr)
            gen, path = scan_gen, "scan"
            _sync_scalar(gen(key))
    else:
        _sync_scalar(gen(key))
    print(f"compile+warmup: {time.time() - t0:.1f}s ({path})", file=sys.stderr)

    walls = []
    for i in range(3):
        t0 = time.time()
        _sync_scalar(gen(jax.random.fold_in(key, i + 1)))
        walls.append(time.time() - t0)
    wall = min(walls)

    # deliverable audio only: the crossfaded overlaps and padded tails are
    # generated twice / discarded, so count T_mel * hop per utterance
    audio_seconds = n_utts * T_mel * hop / sr
    value = audio_seconds / wall
    print(
        f"{audio_seconds:.1f}s audio in {wall:.3f}s wall "
        f"({value:.1f}x realtime, {n_folds} folds, runs={['%.3f' % w for w in walls]})",
        file=sys.stderr,
    )

    # apples-to-apples companion numbers at the reference's OWN defaults
    # (single utterance, target 11000 / overlap 550, wavernn_hparams.py:55-57):
    # per-chip throughput at that geometry AND single-utterance vocoder
    # latency (time-to-audio for one ~11 s sentence) — the interactive figure
    # the reference's demo implies (tacotron_synthesize.py:200)
    ref_xrt = ref_latency_ms = None
    if on_tpu:
        try:
            t_ref = cfg.wavernn_gen.target // hop
            mel1 = mels[0][: 900]  # one ~11.2 s utterance
            rfolds, _ = W.fold_with_overlap(mel1, t_ref, ov_frames)
            rfolds = jnp.asarray(
                np.stack([W.pad_mel_for_generation(f, cfg.wavernn.pad) for f in rfolds])
            )
            from tacotronv2_wavernn_chinese_tpu.ops import wavernn_kernel as K

            rgen = lambda k: K.generate_pallas(params, cfg.wavernn, rfolds, k, cfg.audio.bits)
            _sync_scalar(rgen(key))  # warmup
            rw = []
            for i in range(3):
                t0 = time.time()
                _sync_scalar(rgen(jax.random.fold_in(key, 100 + i)))
                rw.append(time.time() - t0)
            ref_audio_s = mel1.shape[0] * hop / sr
            ref_xrt = round(ref_audio_s / min(rw), 2)
            ref_latency_ms = round(min(rw) * 1000.0, 1)
            print(
                f"reference-default folds ({cfg.wavernn_gen.target}/{cfg.wavernn_gen.overlap}): "
                f"{ref_xrt}x realtime, {ref_latency_ms} ms for {ref_audio_s:.1f}s audio",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"reference-default companion bench skipped: {e}", file=sys.stderr)

    row = {
        "metric": "wavernn_gen_audio_seconds_per_second",
        "value": round(value, 2),
        "unit": "audio_s/s",
        "vs_baseline": round(value / BASELINE_X_REALTIME, 3),
    }
    if ref_xrt is not None:
        row["at_reference_default_folds_x_realtime"] = ref_xrt
        row["single_utterance_vocoder_latency_ms"] = ref_latency_ms
    print(json.dumps(row))


if __name__ == "__main__":
    main()
