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

from tools.endurance_run import run_cli, train_with_kill

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/resume_r4")
    ap.add_argument("--out", default=None)
    ap.add_argument("--n-utts", type=int, default=300)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--kill-after", type=int, default=100)
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    log_path = os.path.join(args.work, "driver.log")
    report = {"provenance": {
        "tool": "tools/resume_check.py", "n_utts": args.n_utts,
        "steps": args.steps, "kill_after": args.kill_after,
        "note": ("mid-train SIGKILL + restore-from-latest on the round-4 "
                 "trainer (bucket precompile + fused_decoder=auto), tiny "
                 "procedural corpus; completes the resume demonstration the "
                 "outage-interrupted endurance rerun never reached")}}
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

    # checkpoint every 50 steps so the kill at 100 has a real restore point
    override = ("tacotron_train.steps_per_dispatch=2,"
                "tacotron_train.checkpoint_interval=50,"
                "tacotron_train.summary_interval=20")
    report["tacotron"] = train_with_kill(
        meta, feat, os.path.join(args.work, "logs-tacotron"),
        args.steps, args.kill_after, override, log_path,
    )
    # stricter than train_with_kill's endurance-scale window: with
    # checkpoint_interval=50 a genuine restore resumes within one interval
    # (+dispatch group) of the kill step — a from-scratch restart would
    # record step 1 first and fail this
    rf = report["tacotron"]["restart_first_recorded_step"]
    ka = report["tacotron"]["killed_at_step"]
    report["tacotron"]["resume_within_one_ckpt_interval"] = bool(
        rf is not None and ka - 52 <= rf <= ka + 4
    )
    report["total_wall_s"] = round(time.time() - t_all, 1)
    out = json.dumps(report, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
