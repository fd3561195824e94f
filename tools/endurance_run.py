"""Endurance + crash-resume run -> ENDURANCE_r3.json.

One full-pipeline pass at reference corpus scale (10k utterances — the
Biaobei count, preprocessor.py:33) through the REAL CLI entrypoints:

  preprocess -> tacotron train (with a SIGKILL mid-run and a restart
  proving restore-from-latest continuity, reference train.py:146-164)
  -> GTA bridge -> WaveRNN train -> batch synthesis

recording wall-clock per stage, step-time stability (percentiles from the
scalars log), checkpoint-rotation behavior (kept <= max_to_keep), and the
kill/resume evidence (last step before SIGKILL, restored step after).

The Biaobei audio is absent from the mount (.MISSING_LARGE_BLOBS), so the
corpus is the quality-demo's procedural one (real reference transcripts,
formant-synthesized wavs) — the pipeline mechanics, shapes, and IO are the
real thing.  This is the closest available stand-in for the reference's
206k-step training provenance.

SIGKILL safety on the axon backend: a client killed mid-XLA-compile can
wedge the remote TPU agent (CLAUDE.md), so the kill fires only AFTER the
scalars log proves optimizer steps are flowing (compiles for the bucketed
shapes are behind us) and immediately after a fresh scalars append (the
process is then inside an already-compiled dispatch).

Usage: python -m tools.endurance_run [--n-utts 10000] [--taco-steps 10000]
       [--voc-steps 3000] [--work /tmp/endurance_r3] [--out ENDURANCE_r3.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args: list[str], log_path: str) -> float:
    t0 = time.time()
    with open(log_path, "a") as f:
        subprocess.run([sys.executable, "-m"] + args, cwd=REPO, stdout=f,
                       stderr=subprocess.STDOUT, check=True)
    return time.time() - t0


def read_scalar_steps(path: str) -> list[dict]:
    rows = []
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return rows


def train_with_kill(meta: str, mel_dir: str, log_dir: str, total_steps: int,
                    kill_after_step: int, override: str, log_path: str) -> dict:
    """Launch the tacotron train CLI, SIGKILL it once ``kill_after_step``
    optimizer steps are recorded, relaunch, and let it finish."""
    scalars = os.path.join(log_dir, "scalars.jsonl")
    args = [sys.executable, "-m", "tacotronv2_wavernn_chinese_tpu.train.tacotron_train",
            "--metadata", meta, "--mel-dir", mel_dir, "--log-dir", log_dir,
            "--steps", str(total_steps), "--override", override, "--no-render"]
    return kill_restart_cycle(args, scalars, kill_after_step, log_path)


def kill_restart_cycle(args: list[str], scalars: str, kill_after_step: int,
                       log_path: str, resume_lo: int = 620,
                       resume_hi: int = 120) -> dict:
    """Generic SIGKILL + restart cycle for any train CLI that appends
    step-keyed rows to ``scalars`` and logs "Step N [X sec/step" lines.

    The kill lands only after optimizer steps are flowing AND immediately
    after a fresh scalars append (inside an already-compiled dispatch — a
    client killed mid-XLA-compile can wedge the axon remote agent).
    ``resume_lo``/``resume_hi`` bound the accepted restore point relative
    to the kill step (one checkpoint interval + dispatch group)."""
    logf = open(log_path, "a")
    t0 = time.time()
    proc = subprocess.Popen(args, cwd=REPO, stdout=logf, stderr=subprocess.STDOUT)
    killed_at = None
    last_size = -1
    while proc.poll() is None:
        time.sleep(1.0)
        rows = read_scalar_steps(scalars)
        if rows and rows[-1].get("step", 0) >= kill_after_step:
            # wait for the NEXT append so the kill lands inside an
            # already-compiled dispatch, then fire immediately
            size = os.path.getsize(scalars)
            if last_size < 0:
                last_size = size
                continue
            if size != last_size:
                # re-read AFTER the size check: an append can land between
                # read_scalar_steps and getsize, and killed_at must reflect
                # the append that triggered the kill or the tight resume
                # windows (resume_check: ka-46..ka+4) can false-fail
                rows = read_scalar_steps(scalars)
                killed_at = rows[-1]["step"]
                proc.send_signal(signal.SIGKILL)
                break
            last_size = size
    proc.wait()
    t_kill = time.time() - t0
    if killed_at is None:
        raise RuntimeError("training finished before the kill step was reached")

    # restart: restore-from-latest is the CLI default (reference
    # tacotron_train.py restore=True, train.py:146-164)
    t1 = time.time()
    proc = subprocess.Popen(args, cwd=REPO, stdout=logf, stderr=subprocess.STDOUT)
    rc = proc.wait()
    logf.close()
    if rc != 0:
        raise RuntimeError(f"restarted training failed rc={rc}")
    rows = read_scalar_steps(scalars)
    steps = [r["step"] for r in rows if "step" in r]
    # the scalars log appends across runs: the first step <= its
    # predecessor marks the restart; it reveals the restore point
    restart_first = None
    for i in range(1, len(steps)):
        if steps[i] <= steps[i - 1]:
            restart_first = steps[i]
            break
    # step-time stability from the driver's "Step N [X sec/step" lines.
    # The logged figure is a 100-step rolling average, so EACH process's
    # first (restore + upload-cold) dispatch contaminates its first
    # ~window's worth of readings even with every shape pre-compiled.
    # Segment the readings at restart boundaries (the step number jumps
    # backward) and drop the first 15 of each segment — steady-state
    # cadence starts once the window flushes.
    pairs = [(int(s), float(v)) for s, v in
             re.findall(r"Step\s+(\d+) \[(\d+\.\d+) sec/step", open(log_path).read())]
    segs: list[list[tuple[int, float]]] = []
    cur: list[tuple[int, float]] = []
    for st, v in pairs:
        if cur and st <= cur[-1][0]:
            segs.append(cur)
            cur = []
        cur.append((st, v))
    if cur:
        segs.append(cur)
    spd = [v for seg in segs
           for _, v in (seg[15:] if len(seg) > 30 else seg)]
    return {
        "killed_at_step": int(killed_at),
        "wall_to_kill_s": round(t_kill, 1),
        "wall_restart_to_done_s": round(time.time() - t1, 1),
        "final_step": int(steps[-1]) if steps else None,
        "restart_first_recorded_step": restart_first,
        # resume continuity: the restart's first recorded step sits at/after
        # the last checkpoint (<= kill step, within one ckpt interval + K)
        "resume_from_latest_ok": bool(
            restart_first is not None
            and killed_at - resume_lo <= restart_first <= killed_at + resume_hi
        ),
        "sec_per_step_p50": round(float(np.percentile(spd, 50)), 4) if spd else None,
        "sec_per_step_p95": round(float(np.percentile(spd, 95)), 4) if spd else None,
        "sec_per_step_max": round(float(np.max(spd)), 4) if spd else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/endurance_r3")
    ap.add_argument("--out", default="ENDURANCE_r3.json")
    ap.add_argument("--n-utts", type=int, default=10000)
    ap.add_argument("--taco-steps", type=int, default=10000)
    ap.add_argument("--kill-after", type=int, default=4000)
    ap.add_argument("--voc-steps", type=int, default=3000)
    ap.add_argument("--synth-sentences", type=int, default=32)
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    log_path = os.path.join(args.work, "driver.log")
    report = {"provenance": {
        "tool": "tools/endurance_run.py", "n_utts": args.n_utts,
        "taco_steps": args.taco_steps, "voc_steps": args.voc_steps,
        "corpus": "procedural (reference transcripts, formant audio)"}}
    t_all = time.time()

    # 1. corpus + preprocess (host-side synth, device-batched mels).
    # Both stages are resumable: a completed corpus/feature dir from an
    # interrupted run is reused as-is.
    from tools.quality_demo import make_corpus

    corpus = os.path.join(args.work, "corpus")
    transcript = os.path.join(corpus, "transcript.txt")
    wav_dir = os.path.join(corpus, "Wave")
    t0 = time.time()
    done = (os.path.exists(transcript)
            and sum(1 for _ in open(transcript)) >= 2 * args.n_utts
            and len(os.listdir(wav_dir)) >= args.n_utts)
    if not done:
        transcript, wav_dir = make_corpus(corpus, args.n_utts)
    report["corpus_synth_s"] = round(time.time() - t0, 1)
    feat = os.path.join(args.work, "training_data")
    meta = os.path.join(feat, "train.txt")
    t0 = time.time()
    if not (os.path.exists(meta)
            and sum(1 for _ in open(meta)) >= 0.9 * args.n_utts):
        run_cli(["tacotronv2_wavernn_chinese_tpu.data.preprocess",
                 "--transcript", transcript, "--wav-dir", wav_dir,
                 "--out-dir", feat], log_path)
    report["preprocess_s"] = round(time.time() - t0, 1)
    n_rows = sum(1 for _ in open(meta))
    report["preprocessed_utts"] = n_rows

    # 2. tacotron train with mid-run SIGKILL + restart
    taco_log = os.path.join(args.work, "logs-tacotron")
    override = ("tacotron_train.steps_per_dispatch=4,"
                "tacotron_train.checkpoint_interval=500,"
                "tacotron_train.summary_interval=100")
    report["tacotron"] = train_with_kill(
        meta, feat, taco_log, args.taco_steps, args.kill_after, override, log_path
    )
    ckpt_dir = os.path.join(taco_log, "taco_pretrained")
    kept = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    report["tacotron"]["checkpoints_kept"] = len(kept)
    report["tacotron"]["max_to_keep_respected"] = len(kept) <= 20

    # 3. GTA bridge
    gta_dir = os.path.join(args.work, "gta")
    dt = run_cli(["tacotronv2_wavernn_chinese_tpu.infer.gta",
                  "--metadata", meta, "--data-dir", feat,
                  "--out-dir", gta_dir, "--ckpt-dir", ckpt_dir,
                  "--batch-size", "16"], log_path)
    report["gta_s"] = round(dt, 1)

    # 4. WaveRNN train on GTA mels (native C++ loader)
    voc_log = os.path.join(args.work, "logs-wavernn")
    dt = run_cli(["tacotronv2_wavernn_chinese_tpu.train.wavernn_train",
                  "--metadata", os.path.join(gta_dir, "wavernn_training_data.txt"),
                  "--data-dir", gta_dir, "--log-dir", voc_log,
                  "--steps", str(args.voc_steps), "--no-gen", "--native-loader",
                  "--override", "wavernn_train.steps_per_dispatch=4"], log_path)
    report["wavernn_train_s"] = round(dt, 1)
    voc_rows = read_scalar_steps(os.path.join(voc_log, "scalars.jsonl"))
    voc_losses = [r["loss"] for r in voc_rows if "loss" in r]
    report["wavernn_loss_first_last"] = (
        [round(voc_losses[0], 3), round(voc_losses[-1], 3)] if voc_losses else None
    )

    # 5. batch synthesis through both trained models
    t0 = time.time()
    import jax

    from tacotronv2_wavernn_chinese_tpu.config import default_config
    from tacotronv2_wavernn_chinese_tpu.infer.synthesizer import Synthesizer

    cfg = default_config()
    synth = Synthesizer.from_checkpoints(
        cfg, ckpt_dir, os.path.join(voc_log, "checkpoints")
    )
    texts = [l.split("\t")[1].strip() for i, l in enumerate(open(transcript, encoding="utf-8"))
             if i % 2 == 0][: args.synth_sentences]
    out_dir = os.path.join(args.work, "synth_out")
    os.makedirs(out_dir, exist_ok=True)
    audio_s = 0.0
    for i, text in enumerate(texts):
        res = synth.synthesize(text, out_dir=out_dir, seed=i)
        audio_s += len(res["wav"]) / cfg.audio.sample_rate
    report["synthesis"] = {
        "sentences": len(texts),
        "wall_s": round(time.time() - t0, 1),
        "audio_s": round(audio_s, 1),
    }

    report["total_wall_s"] = round(time.time() - t_all, 1)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
