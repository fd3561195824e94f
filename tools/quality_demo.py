"""Mid-scale training demonstration -> QUALITY_r2.json.

The reference ships a 206,500-step Biaobei checkpoint as its only quality
evidence (logs-Tacotron-2/taco_pretrained/checkpoint:1); the Biaobei wavs are
absent from this mount, so this tool builds the strongest available fidelity
proxy: a few-hundred-utterance PROCEDURAL corpus (real reference transcripts,
deterministic formant-synthesized audio whose spectra encode phoneme
identity, with per-utterance tempo/pitch variation), trains Tacotron-2 to
attention acquisition and WaveRNN on its GTA mels — exercising length
bucketing, checkpoint rotation, and fused multi-step dispatch at realistic
shapes — and records loss curves, held-out teacher-forced mel L1, and
alignment diagnostics (entropy / monotonicity / coverage).

Usage:
    python -m tools.quality_demo --work /tmp/quality_r2 --out QUALITY_r2.json
    python -m tools.quality_demo --quick   # tiny CPU smoke run

Reference parity points: train loop semantics tacotron/train.py:170-218,
GTA bridge wavernn_preprocess.py:29-172, vocoder training wavernn_train.py.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import time

import numpy as np

SR = 22050
REF_TRAIN = "/root/reference/train.txt"


# ---------------------------------------------------------------------------
# procedural corpus
# ---------------------------------------------------------------------------


def _phone_params(token: str):
    """Deterministic per-phoneme acoustic identity: 3 spectral peaks +
    duration, spread by hash so phones are spectrally distinctive."""
    h = hashlib.md5(token.encode("utf-8")).digest()
    f1 = 150.0 + (h[0] / 255.0) * 500.0
    f2 = 700.0 + (h[1] / 255.0) * 1800.0
    f3 = 2500.0 + (h[2] / 255.0) * 3500.0
    dur = 0.07 + (h[3] / 255.0) * 0.09  # 70-160 ms
    amps = (1.0, 0.5 + h[4] / 510.0, 0.25 + h[5] / 1020.0)
    return (f1, f2, f3), amps, dur


_TONE_CONTOUR = {
    "1": (1.0, 1.0), "2": (0.85, 1.15), "3": (0.9, 0.75),
    "4": (1.2, 0.8), "0": (0.95, 0.95), "5": (0.95, 0.95),
}


def synth_utterance(pyin: str, seed: int) -> np.ndarray:
    """Formant-like synthesis: each phoneme token becomes a segment of
    summed sinusoids; tone digits shape an f0 contour; per-utterance tempo
    and pitch factors add speaker-like variation."""
    rng = np.random.default_rng(seed)
    tempo = rng.uniform(0.85, 1.25)
    pitch = rng.uniform(0.85, 1.2)
    segs = []
    for token in pyin.split():
        if token in ("，", "。", "？", "！"):
            segs.append(np.zeros(int(SR * 0.12 * tempo), np.float32))
            continue
        (f1, f2, f3), (a1, a2, a3), dur = _phone_params(token)
        n = int(SR * dur * tempo)
        t = np.arange(n, dtype=np.float32) / SR
        c0, c1 = _TONE_CONTOUR.get(token[-1], (1.0, 1.0))
        f0 = 120.0 * pitch * np.linspace(c0, c1, n).astype(np.float32)
        phase0 = np.cumsum(2 * np.pi * f0 / SR).astype(np.float32)
        sig = (
            0.5 * np.sin(phase0)
            + a1 * 0.3 * np.sin(2 * np.pi * f1 * pitch * t)
            + a2 * 0.2 * np.sin(2 * np.pi * f2 * t)
            + a3 * 0.1 * np.sin(2 * np.pi * f3 * t)
        )
        env = np.hanning(n).astype(np.float32) ** 0.5
        segs.append((sig * env).astype(np.float32))
    wav = np.concatenate(segs) if segs else np.zeros(SR // 10, np.float32)
    peak = np.abs(wav).max()
    return (0.7 * wav / peak).astype(np.float32) if peak > 0 else wav


def make_corpus(corpus_dir: str, n: int, seed: int = 0, log=print) -> tuple[str, str]:
    """Biaobei-layout procedural corpus from reference transcripts (or
    generated pinyin when the mount is absent).  Returns (transcript, wav_dir)."""
    from tacotronv2_wavernn_chinese_tpu.dsp.wav import save_wav
    from tacotronv2_wavernn_chinese_tpu.frontend import get_pyin

    wav_dir = os.path.join(corpus_dir, "Wave")
    os.makedirs(wav_dir, exist_ok=True)
    if os.path.exists(REF_TRAIN):
        rows = [l.strip().split("|") for l in open(REF_TRAIN, encoding="utf-8")]
        texts = [r[4] for r in rows if len(r) >= 6]
        stride = max(1, len(texts) // n)
        texts = texts[::stride][:n]
    else:  # mount-free fallback: synthetic sentences over the symbol table
        syllables = ["ni3", "hao3", "ma5", "tian1", "qi4", "zhen1", "bu2", "cuo4",
                     "wo3", "men2", "qu4", "gong1", "yuan2", "wan2", "ba5"]
        rng = np.random.default_rng(seed)
        texts = [
            " ".join(rng.choice(syllables, rng.integers(8, 30))) + "。"
            for _ in range(n)
        ]
    transcript = os.path.join(corpus_dir, "transcript.txt")
    with open(transcript, "w", encoding="utf-8") as f:
        for i, text in enumerate(texts):
            idx = f"{i+1:06d}"
            pyin, norm = get_pyin(text)
            wav = synth_utterance(pyin, seed=seed * 100003 + i)
            save_wav(wav, os.path.join(wav_dir, f"{idx}.wav"), SR)
            f.write(f"{idx}\t{norm}\n")
            f.write(f"\t{pyin}\n")
    log(f"procedural corpus: {len(texts)} utterances -> {corpus_dir}")
    return transcript, wav_dir


# ---------------------------------------------------------------------------
# alignment diagnostics
# ---------------------------------------------------------------------------


def alignment_diagnostics(aligns: np.ndarray, t_dec: int, t_in: int) -> dict:
    """Entropy (nats), monotonicity (fraction non-decreasing argmax), and
    coverage (max argmax / input length) over the valid region."""
    a = aligns[:t_dec, :t_in]
    a = a / np.maximum(a.sum(-1, keepdims=True), 1e-9)
    ent = float(np.mean(-np.sum(a * np.log(a + 1e-9), axis=-1)))
    arg = np.argmax(a, axis=-1)
    mono = float(np.mean(np.diff(arg) >= 0)) if len(arg) > 1 else 1.0
    cov = float(arg.max() + 1) / t_in
    return {"entropy": ent, "monotonicity": mono, "coverage": cov}


def heldout_eval(cfg, params, metadata_path: str, mel_dir: str) -> dict:
    """Teacher-forced mel L1 + alignment diagnostics over the holdout set."""
    import jax
    import jax.numpy as jnp

    from tacotronv2_wavernn_chinese_tpu.data.loader import TacotronDataset
    from tacotronv2_wavernn_chinese_tpu.data.preprocess import read_metadata
    from tacotronv2_wavernn_chinese_tpu.train import tacotron_task as task

    ds = TacotronDataset(read_metadata(metadata_path), mel_dir, cfg)
    l1s, diags = [], []
    for batch in ds.sequential_batches(8):
        arrays = {
            "inputs": jnp.asarray(batch.inputs),
            "input_lengths": jnp.asarray(batch.input_lengths),
            "mel_targets": jnp.asarray(batch.mel_targets),
            "stop_targets": jnp.asarray(batch.stop_targets),
            "target_lengths": jnp.asarray(batch.target_lengths),
            "loss_frames": jnp.asarray(batch.loss_frames),
        }
        _, out = task.eval_step(params, arrays, jax.random.PRNGKey(0), cfg)
        mel = np.asarray(out.mel_outputs)
        aligns = np.asarray(out.alignments)
        for i in range(mel.shape[0]):
            T = int(batch.target_lengths[i])
            if T == 0:
                continue
            tgt = np.asarray(batch.mel_targets[i][:T])
            l1s.append(float(np.mean(np.abs(mel[i][:T] - tgt))))
            diags.append(
                alignment_diagnostics(aligns[i], T, int(batch.input_lengths[i]))
            )
    agg = {
        k: float(np.mean([d[k] for d in diags])) for k in diags[0]
    } if diags else {}
    return {"mel_l1": float(np.mean(l1s)), "n_heldout": len(l1s), **agg}


# ---------------------------------------------------------------------------
# MCD (audio-domain quality) + best-checkpoint selection
# ---------------------------------------------------------------------------


def mcd_from_wavs(wav_pred: np.ndarray, wav_gt: np.ndarray, audio_cfg,
                  n_coeffs: int = 13, floor_db: float = -40.0) -> float:
    """Mel-cepstral distortion (dB) between two waveforms, DTW-free.

    The classic MCD: mel-cepstral coefficients are the orthonormal DCT-II of
    the ln-amplitude mel spectrum; per frame
    MCD = (10/ln10) * sqrt(2 * sum_{i=1..13} (c_p[i]-c_g[i])^2), averaged
    over frames (c0 — overall energy/gain — excluded).  Both wavs run
    through the SAME mel pipeline (the dB output is converted back to
    ln-amplitude: ln a = dB * ln10 / 20).

    Standard MCD practice, both required for a meaningful number: (a) the
    dynamic range floors at ``floor_db`` — the pipeline's raw -100 dB floor
    made digital-silence mel bands contribute ~60 dB swings against any
    generated signal's noise floor, scoring even the Griffin-Lim
    reconstruction of the TRUE mel at ~113 dB; (b) frames whose
    ground-truth mean level sits at the floor (silence) are excluded."""
    import jax.numpy as jnp
    from scipy.fftpack import dct as scipy_dct

    from tacotronv2_wavernn_chinese_tpu.dsp.spectrogram import MelPipeline, denormalize

    pipe = MelPipeline(audio_cfg)
    n = min(len(wav_pred), len(wav_gt))
    db_p = np.asarray(denormalize(pipe.melspectrogram(jnp.asarray(wav_pred[:n])), audio_cfg))
    db_g = np.asarray(denormalize(pipe.melspectrogram(jnp.asarray(wav_gt[:n])), audio_cfg))
    t = min(db_p.shape[0], db_g.shape[0])
    db_p = np.maximum(db_p[:t], floor_db)
    db_g = np.maximum(db_g[:t], floor_db)
    voiced = db_g.mean(axis=-1) > floor_db + 5.0
    if not voiced.any():
        voiced = np.ones(t, bool)
    ln_p = db_p * (np.log(10.0) / 20.0)
    ln_g = db_g * (np.log(10.0) / 20.0)
    c_p = scipy_dct(ln_p, type=2, axis=-1, norm="ortho")
    c_g = scipy_dct(ln_g, type=2, axis=-1, norm="ortho")
    diff = c_p[:, 1 : n_coeffs + 1] - c_g[:, 1 : n_coeffs + 1]
    per_frame = (10.0 / np.log(10.0)) * np.sqrt(2.0 * np.sum(diff**2, axis=-1))
    return float(np.mean(per_frame[voiced]))


def select_best_checkpoint(cfg, taco_log: str, holdout_meta: str, mel_dir: str,
                           log=print) -> dict:
    """Evaluate held-out teacher-forced mel L1 at EVERY kept checkpoint and
    mark the best (the round-2 run shipped a final checkpoint 26% worse than
    its best — reference has no selection at all, train.py:189).  Writes
    ``best_checkpoint.json`` beside the checkpoints and returns the row."""
    import jax

    from tacotronv2_wavernn_chinese_tpu.train import tacotron_task as task
    from tacotronv2_wavernn_chinese_tpu.utils.checkpoints import CheckpointManager

    ckpt_dir = os.path.join(taco_log, "taco_pretrained")
    mgr = CheckpointManager(ckpt_dir)
    template = task.init_state(jax.random.PRNGKey(0), cfg)
    per_step = []
    for step in sorted(mgr.all_steps()):
        state = mgr.restore(template, step=step)
        hold = heldout_eval(cfg, state.params, holdout_meta, mel_dir)
        per_step.append({"step": int(step), "mel_l1": hold["mel_l1"]})
        log(f"ckpt {step}: held-out mel L1 {hold['mel_l1']:.4f}")
    best = min(per_step, key=lambda r: r["mel_l1"])
    row = {"best_step": best["step"], "best_mel_l1": best["mel_l1"],
           "evaluated": per_step}
    with open(os.path.join(ckpt_dir, "best_checkpoint.json"), "w") as f:
        json.dump(row, f, indent=1)
    mgr.close()
    return row


def mcd_eval(cfg, taco_params, voc_log: str, holdout_meta: str, mel_dir: str,
             wav_dir: str, n_max: int = 12, log=print) -> dict:
    """Held-out text -> (teacher-forced) mel -> trained WaveRNN -> wav,
    scored with MCD against the ground-truth audio (reference quality loop
    is human listening, wavernn_train.py:139-141; this is its objective
    replacement).  Teacher-forced lengths make the comparison DTW-free.

    Ground truth is the CONDITIONED audio the preprocessor stored
    (audio-*.npy: trimmed + pre-emphasized + rescaled) — the domain the
    vocoder was trained in AND frame-aligned with the mel targets; the raw
    corpus wav differs by the trim offset and spectral tilt.

    The absolute number is corpus-limited: the procedural corpus is pure
    formant LINES over digital silence, and any mel-domain resynthesis
    smears a line into its mel band, so even reconstructing the TRUE mel
    scores high.  The artifact therefore also reports ``mcd_gl_oracle`` —
    Griffin-Lim resynthesis of the ground-truth mel, scored identically —
    as the achievable floor; the vocoder's quality signal is its distance
    to that oracle, not to zero."""
    import jax
    import jax.numpy as jnp

    from tacotronv2_wavernn_chinese_tpu.data.loader import TacotronDataset
    from tacotronv2_wavernn_chinese_tpu.data.preprocess import read_metadata
    from tacotronv2_wavernn_chinese_tpu.dsp.spectrogram import mel_to_unit
    from tacotronv2_wavernn_chinese_tpu.dsp.wav import load_wav
    from tacotronv2_wavernn_chinese_tpu.models import tacotron as T
    from tacotronv2_wavernn_chinese_tpu.models import wavernn as W
    from tacotronv2_wavernn_chinese_tpu.train import wavernn_task as WT
    from tacotronv2_wavernn_chinese_tpu.utils.checkpoints import CheckpointManager

    vmgr = CheckpointManager(os.path.join(voc_log, "checkpoints"))
    vtempl = WT.init_state(jax.random.PRNGKey(0), cfg)
    vstate = vmgr.restore(vtempl)
    vmgr.close()
    if vstate is None:
        return {"mcd": None, "note": "no vocoder checkpoint"}
    voc_params = jax.device_get(vstate.params)

    from tacotronv2_wavernn_chinese_tpu.dsp.griffin_lim import (
        inv_mel_spectrogram,
        preemphasis_fir,
    )
    from tacotronv2_wavernn_chinese_tpu.dsp.spectrogram import MelPipeline

    pipe = MelPipeline(cfg.audio)
    rows = read_metadata(holdout_meta)[:n_max]
    ds = TacotronDataset(rows, mel_dir, cfg)
    mcds = []
    oracle_mcds = []
    row_idx = 0
    for batch in ds.sequential_batches(4):
        out, _ = T.forward_teacher_forced(
            taco_params, cfg.tacotron, jnp.asarray(batch.inputs),
            jnp.asarray(batch.input_lengths), jnp.asarray(batch.mel_targets),
            False, jax.random.PRNGKey(0),
        )
        mel = np.asarray(out.mel_outputs)
        for i in range(mel.shape[0]):
            src = rows[row_idx]
            row_idx += 1
            Tlen = int(batch.target_lengths[i])
            utt = src[0].rsplit("-", 1)[-1].split(".")[0]
            gt_npy = os.path.join(mel_dir, src[0])
            gt_wav_path = os.path.join(wav_dir, f"{utt}.wav")
            if Tlen == 0 or not (os.path.exists(gt_npy) or os.path.exists(gt_wav_path)):
                continue
            unit = np.asarray(mel_to_unit(mel[i][:Tlen], cfg.audio, xp=np))
            unit = np.clip(unit, 0.0, 1.0)
            wav_pred = W.generate(
                voc_params, cfg.wavernn, cfg.wavernn_gen, unit,
                jax.random.PRNGKey(i), cfg.audio.bits,
            )
            if os.path.exists(gt_npy):
                wav_gt = np.load(gt_npy)
            else:  # fallback: raw corpus wav (trim/tilt mismatch possible)
                wav_gt = load_wav(gt_wav_path, cfg.audio.sample_rate)
            mcds.append(mcd_from_wavs(np.asarray(wav_pred), np.asarray(wav_gt), cfg.audio))
            # oracle: Griffin-Lim resynthesis of the TRUE mel (de-emphasized
            # by inv_mel_spectrogram; re-emphasize into the gt domain)
            gt_mel = jnp.asarray(batch.mel_targets[i][:Tlen])
            wav_o = inv_mel_spectrogram(gt_mel, pipe)
            wav_o = np.asarray(preemphasis_fir(wav_o, cfg.audio.preemphasis))
            oracle_mcds.append(mcd_from_wavs(wav_o, np.asarray(wav_gt), cfg.audio))
            log(f"mcd[{len(mcds)}] ({utt}): {mcds[-1]:.3f} dB "
                f"(GL oracle {oracle_mcds[-1]:.3f})")
    return {
        "mcd": float(np.mean(mcds)) if mcds else None,
        "mcd_gl_oracle": float(np.mean(oracle_mcds)) if oracle_mcds else None,
        "floor_db": -40.0,
        "n_scored": len(mcds),
    }


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------


def run(work: str, out_json: str, n_utts: int, taco_steps: int, voc_steps: int,
        quick: bool = False) -> dict:
    import jax

    from tacotronv2_wavernn_chinese_tpu.config import default_config
    from tacotronv2_wavernn_chinese_tpu.data.preprocess import (
        process_corpus, read_metadata, write_metadata,
    )
    from tacotronv2_wavernn_chinese_tpu.utils.compile_cache import enable_compile_cache
    from tacotronv2_wavernn_chinese_tpu.utils.metrics import read_scalars

    enable_compile_cache()
    t_start = time.time()
    os.makedirs(work, exist_ok=True)
    cfg = default_config()
    overrides = [
        "tacotron_train.checkpoint_interval=500",
        "tacotron_train.summary_interval=50",
        "tacotron_train.steps_per_dispatch=4",  # fused dispatch at scale
        "wavernn_train.test_samples=20",
    ]
    if quick:
        overrides += [
            "tacotron.embedding_dim=32", "tacotron.enc_conv_channels=32",
            "tacotron.encoder_lstm_units=32", "tacotron.decoder_lstm_units=32",
            "tacotron.attention_dim=16", "tacotron.attention_filters=8",
            "tacotron.attention_kernel=7", "tacotron.postnet_channels=32",
            "tacotron.prenet_layers=(32,32)",
            "tacotron_train.batch_size=4", "tacotron_train.checkpoint_interval=4",
            "tacotron_train.steps_per_dispatch=2",
            "wavernn.rnn_dims=32", "wavernn.fc_dims=32", "wavernn.compute_dims=16",
            "wavernn.res_out_dims=8", "wavernn.res_blocks=2",
            "wavernn_train.batch_size=4", "wavernn_train.checkpoint_every=4",
            "wavernn_train.test_samples=2",
        ]
    cfg = cfg.override(",".join(overrides))

    # 1. corpus
    corpus_dir = os.path.join(work, "corpus")
    transcript, wav_dir = make_corpus(corpus_dir, n_utts)
    feat_dir = os.path.join(work, "training_data")
    rows = process_corpus(cfg, transcript, wav_dir, feat_dir)
    write_metadata(rows, os.path.join(feat_dir, "all.txt"))
    n_hold = max(4, len(rows) // 16)
    write_metadata(rows[:-n_hold], os.path.join(feat_dir, "train.txt"))
    write_metadata(rows[-n_hold:], os.path.join(feat_dir, "holdout.txt"))
    audio_h = sum(int(r[2]) for r in rows) / SR / 3600

    # 2. tacotron training (restore-or-init; LossExplosion aborts loudly)
    from tacotronv2_wavernn_chinese_tpu.train.tacotron_train import run_training

    taco_log = os.path.join(work, "logs-tacotron")
    t0 = time.time()
    state = run_training(
        cfg, os.path.join(feat_dir, "train.txt"), feat_dir, taco_log,
        total_steps=taco_steps, render_eval=not quick,
    )
    taco_time = time.time() - t0
    params = jax.device_get(state.params)
    scalars = read_scalars(os.path.join(taco_log, "scalars.jsonl"))
    losses = [(s["step"], s["loss"]) for s in scalars if "loss" in s]

    # 3. held-out teacher-forced eval (final checkpoint) + BEST-checkpoint
    #    selection over every kept checkpoint (the r2 run shipped a final
    #    checkpoint 26% worse than its best; the best one drives GTA + MCD)
    hold = heldout_eval(cfg, params, os.path.join(feat_dir, "holdout.txt"), feat_dir)
    best = select_best_checkpoint(
        cfg, taco_log, os.path.join(feat_dir, "holdout.txt"), feat_dir
    )
    if best["best_step"] != int(state.step):
        from tacotronv2_wavernn_chinese_tpu.train import tacotron_task as _task
        from tacotronv2_wavernn_chinese_tpu.utils.checkpoints import (
            CheckpointManager as _CM,
        )

        _mgr = _CM(os.path.join(taco_log, "taco_pretrained"))
        _tmpl = _task.init_state(jax.random.PRNGKey(0), cfg)
        params = jax.device_get(_mgr.restore(_tmpl, step=best["best_step"]).params)
        _mgr.close()

    # 4. GTA bridge over the train split (best checkpoint)
    from tacotronv2_wavernn_chinese_tpu.infer.gta import generate_gta

    gta_dir = os.path.join(work, "gta")
    gta_meta = generate_gta(
        cfg, params, os.path.join(feat_dir, "train.txt"), feat_dir, gta_dir,
        batch_size=4 if quick else 8,
    )

    # 5. WaveRNN on GTA mels
    from tacotronv2_wavernn_chinese_tpu.train.wavernn_train import (
        run_training as voc_run,
    )

    voc_log = os.path.join(work, "logs-wavernn")
    t0 = time.time()
    voc_run(cfg, gta_meta, gta_dir, voc_log, total_steps=voc_steps,
            gen_at_checkpoint=False)
    voc_time = time.time() - t0
    voc_scalars = read_scalars(os.path.join(voc_log, "scalars.jsonl"))
    voc_losses = [(s["step"], s["loss"]) for s in voc_scalars if "loss" in s]

    # 6. audio-domain quality: held-out text -> wav (trained WaveRNN) vs
    #    ground truth, scored with MCD
    mcd = mcd_eval(
        cfg, params, voc_log, os.path.join(feat_dir, "holdout.txt"), feat_dir,
        wav_dir, n_max=4 if quick else 12,
    )

    ckpts = sorted(os.listdir(os.path.join(taco_log, "taco_pretrained")))
    report = {
        "provenance": {
            "tool": "tools/quality_demo.py",
            "n_utterances": len(rows),
            "audio_hours": round(audio_h, 3),
            "holdout": n_hold,
            "tacotron_steps": taco_steps,
            "wavernn_steps": voc_steps,
            "steps_per_dispatch": cfg.tacotron_train.steps_per_dispatch,
            "batch_size": cfg.tacotron_train.batch_size,
            "backend": jax.default_backend(),
            "wall_s": round(time.time() - t_start, 1),
        },
        "tacotron": {
            "loss_curve": losses,
            "loss_first": losses[0][1] if losses else None,
            "loss_last": losses[-1][1] if losses else None,
            "sec_per_step": round(taco_time / max(taco_steps, 1), 4),
            "checkpoints_kept": len(ckpts),
        },
        "heldout": hold,
        "best_checkpoint": best,
        "mcd": mcd,
        "wavernn": {
            "loss_curve": voc_losses[:: max(1, len(voc_losses) // 50)],
            "loss_first": voc_losses[0][1] if voc_losses else None,
            "loss_last": voc_losses[-1][1] if voc_losses else None,
            "sec_per_step": round(voc_time / max(voc_steps, 1), 4),
        },
    }
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "tacotron"} |
                     {"tacotron": {k: v for k, v in report["tacotron"].items()
                                   if k != "loss_curve"}}, indent=1))
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/quality_r2")
    ap.add_argument("--out", default="QUALITY_r2.json")
    ap.add_argument("--n-utts", type=int, default=320)
    ap.add_argument("--taco-steps", type=int, default=3000)
    ap.add_argument("--voc-steps", type=int, default=1500)
    ap.add_argument("--quick", action="store_true",
                    help="tiny CPU smoke run (mechanics only)")
    args = ap.parse_args()
    if args.quick:
        run(args.work, args.out, n_utts=12, taco_steps=8, voc_steps=8, quick=True)
    else:
        run(args.work, args.out, args.n_utts, args.taco_steps, args.voc_steps)


if __name__ == "__main__":
    main()
