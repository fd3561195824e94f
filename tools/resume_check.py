"""Small-scale SIGKILL + restore-from-latest check on the current trainer.

The round-4 endurance rerun (ENDURANCE_r4_PARTIAL.json) proved the
bucket-precompile fix but was frozen by an infrastructure outage before its
mid-train kill fired, so the round-4 training driver (precompile path +
fused_decoder="auto") had no resume demonstration of its own — round 3's
proof ran the round-3 driver.  This tool reuses the endurance harness's
kill/restart machinery (tools/endurance_run.train_with_kill: the SIGKILL
lands only after optimizer steps are flowing, inside a compiled dispatch)
on a tiny procedural corpus so the whole check completes in minutes.
Matches the reference's restore-from-latest contract
(/root/reference/tacotron/train.py:146-164, restore=True default).

Usage (real TPU, from /root/repo):
    python -m tools.resume_check [--out RESUME_r4.json]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import sys

from tools.endurance_run import kill_restart_cycle, run_cli, train_with_kill

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/resume_r4")
    ap.add_argument("--out", default=None)
    ap.add_argument("--n-utts", type=int, default=300)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--kill-after", type=int, default=100)
    ap.add_argument("--voc-steps", type=int, default=200)
    ap.add_argument("--voc-kill-after", type=int, default=80)
    ap.add_argument("--skip-taco", action="store_true",
                    help="reuse the tacotron section of an existing --out "
                         "report (and its checkpoints in --work)")
    args = ap.parse_args()

    if args.skip_taco and not (args.out and os.path.exists(args.out)):
        # --skip-taco keeps the stale logs-tacotron dir on the assumption a
        # prior report supplies the tacotron section; without one, the run
        # would fall through to retraining on that stale dir and die with
        # the confusing "training finished before the kill step was reached"
        raise SystemExit("--skip-taco requires an existing --out report "
                         "whose tacotron section (and checkpoints in --work) "
                         "can be reused")
    os.makedirs(args.work, exist_ok=True)
    # A reused --work dir keeps corpus + features (expensive, reusable) but
    # must NOT keep training state: a prior run's checkpoints + append-only
    # scalars.jsonl make the trainer restore at its old final step and exit
    # before the kill step, surfacing as a confusing "training finished
    # before the kill step was reached".  Clear the log dirs up front
    # (tacotron's only when it is actually being retrained).
    import shutil

    stale = [os.path.join(args.work, "logs-wavernn")]
    if not args.skip_taco:
        stale += [os.path.join(args.work, "logs-tacotron"),
                  os.path.join(args.work, "gta")]
    for d in stale:
        if os.path.exists(d):
            print(f"clearing stale training dir {d}")
            shutil.rmtree(d)
    # the driver logs are append-only and feed the sec/step percentile
    # regex — stale "Step N [" lines from a prior run would pollute them
    for f, when in (("driver.log", not args.skip_taco), ("driver_wavernn.log", True)):
        p = os.path.join(args.work, f)
        if when and os.path.exists(p):
            os.remove(p)
    log_path = os.path.join(args.work, "driver.log")
    report = {"provenance": {
        "tool": "tools/resume_check.py", "n_utts": args.n_utts,
        "steps": args.steps, "kill_after": args.kill_after,
        "voc_steps": args.voc_steps, "voc_kill_after": args.voc_kill_after,
        "note": ("mid-train SIGKILL + restore-from-latest on BOTH round-4 "
                 "trainers (tacotron: bucket precompile + fused_decoder="
                 "auto; wavernn: native C++ loader, GTA mels), tiny "
                 "procedural corpus; completes the resume demonstration the "
                 "outage-interrupted endurance rerun never reached and adds "
                 "the vocoder-side kill round 3 never exercised")}}
    t_all = time.time()

    from tools.quality_demo import make_corpus

    corpus = os.path.join(args.work, "corpus")
    transcript = os.path.join(corpus, "transcript.txt")
    if not os.path.exists(transcript):
        transcript, wav_dir = make_corpus(corpus, args.n_utts)
    else:
        wav_dir = os.path.join(corpus, "Wave")
    feat = os.path.join(args.work, "training_data")
    meta = os.path.join(feat, "train.txt")
    if not os.path.exists(meta):
        run_cli(["tacotronv2_wavernn_chinese_tpu.data.preprocess",
                 "--transcript", transcript, "--wav-dir", wav_dir,
                 "--out-dir", feat], log_path)

    if args.skip_taco and args.out and os.path.exists(args.out):
        with open(args.out) as f:
            report["tacotron"] = json.load(f)["tacotron"]
    else:
        # checkpoint every 50 steps so the kill at 100 has a real restore
        # point
        override = ("tacotron_train.steps_per_dispatch=2,"
                    "tacotron_train.checkpoint_interval=50,"
                    "tacotron_train.summary_interval=20")
        report["tacotron"] = train_with_kill(
            meta, feat, os.path.join(args.work, "logs-tacotron"),
            args.steps, args.kill_after, override, log_path,
        )
        # stricter than train_with_kill's endurance-scale window: with
        # checkpoint_interval=50 a genuine restore resumes within one
        # interval (+dispatch group) of the kill step — a from-scratch
        # restart would record step 1 first and fail this
        rf = report["tacotron"]["restart_first_recorded_step"]
        ka = report["tacotron"]["killed_at_step"]
        report["tacotron"]["resume_within_one_ckpt_interval"] = bool(
            rf is not None and ka - 52 <= rf <= ka + 4
        )

    # GTA bridge, then the same SIGKILL + restore cycle on the WaveRNN
    # trainer (round 3's endurance run only killed the tacotron side;
    # wavernn_train has its own restore-or-init path, wavernn_train.py:64-67)
    ckpt_dir = os.path.join(args.work, "logs-tacotron", "taco_pretrained")
    gta_dir = os.path.join(args.work, "gta")
    if not os.path.exists(os.path.join(gta_dir, "wavernn_training_data.txt")):
        run_cli(["tacotronv2_wavernn_chinese_tpu.infer.gta",
                 "--metadata", meta, "--data-dir", feat,
                 "--out-dir", gta_dir, "--ckpt-dir", ckpt_dir,
                 "--batch-size", "16"], log_path)
    voc_log = os.path.join(args.work, "logs-wavernn")
    voc_args = [sys.executable, "-m",
                "tacotronv2_wavernn_chinese_tpu.train.wavernn_train",
                "--metadata", os.path.join(gta_dir, "wavernn_training_data.txt"),
                "--data-dir", gta_dir, "--log-dir", voc_log,
                "--steps", str(args.voc_steps), "--no-gen", "--native-loader",
                "--override", ("wavernn_train.steps_per_dispatch=2,"
                               "wavernn_train.checkpoint_every=40,"
                               "wavernn_train.summary_interval=10")]
    # kill/restore stats go to a phase-local log so sec/step percentiles
    # aren't polluted by the tacotron phase's "Step N [" lines
    voc_driver_log = os.path.join(args.work, "driver_wavernn.log")
    report["wavernn"] = kill_restart_cycle(
        voc_args, os.path.join(voc_log, "scalars.jsonl"),
        args.voc_kill_after, voc_driver_log,
        resume_lo=46, resume_hi=4,  # one 40-step ckpt interval + K=2 group
    )
    report["total_wall_s"] = round(time.time() - t_all, 1)
    out = json.dumps(report, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
