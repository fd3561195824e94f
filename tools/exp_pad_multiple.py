"""Measured end-to-end training-throughput comparison of mel_pad_multiple.

Backs the round-5 default change (64 -> 32) with a real number: runs the
tacotron train CLI twice on the campaign corpus (same steps, same seed,
fresh log dirs), once per multiple, and compares steady-state sec/step
from the driver's rolling-window readings (each process's cold first
window dropped, as in endurance_run).  The padding_stats arithmetic says
~4.5% (8.6% -> 4.3% of decoder frames); this measures it.

Usage (TPU): python -m tools.exp_pad_multiple [--steps 600]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(mm: int, steps: int, work: str, meta: str, feat: str) -> dict:
    log_dir = os.path.join(work, f"logs-mm{mm}")
    if os.path.exists(log_dir):
        shutil.rmtree(log_dir)
    log_path = os.path.join(work, f"driver-mm{mm}.log")
    if os.path.exists(log_path):
        os.remove(log_path)
    override = ("tacotron_train.steps_per_dispatch=4,"
                "tacotron_train.checkpoint_interval=1000000,"
                "tacotron_train.summary_interval=100,"
                f"tacotron_train.mel_pad_multiple={mm}")
    args = [sys.executable, "-m",
            "tacotronv2_wavernn_chinese_tpu.train.tacotron_train",
            "--metadata", meta, "--mel-dir", feat, "--log-dir", log_dir,
            "--steps", str(steps), "--override", override, "--no-render"]
    t0 = time.time()
    with open(log_path, "w") as f:
        subprocess.run(args, cwd=REPO, stdout=f, stderr=subprocess.STDOUT,
                       check=True)
    wall = time.time() - t0
    txt = open(log_path).read()
    spd = [float(v) for v in re.findall(r"Step\s+\d+ \[(\d+\.\d+) sec/step", txt)]
    spd = spd[15:] if len(spd) > 30 else spd
    m = re.search(r"bucket pre-compile done in (\d+\.\d+)s", txt)
    pad = re.search(r"bucket padding waste \(epoch 0\): mel (\d+\.\d+)%", txt)
    return {
        "mel_pad_multiple": mm,
        "steps": steps,
        "wall_s": round(wall, 1),
        "prewarm_s": float(m.group(1)) if m else None,
        "padding_pct_logged": float(pad.group(1)) if pad else None,
        "sec_per_step_p50": round(float(np.percentile(spd, 50)), 4) if spd else None,
        "sec_per_step_mean": round(float(np.mean(spd)), 4) if spd else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/padcmp_r5")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--data", default="/tmp/campaign_r5/training_data")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    os.makedirs(args.work, exist_ok=True)
    meta = os.path.join(args.data, "train.txt")
    rows = [run_one(mm, args.steps, args.work, meta, args.data)
            for mm in (64, 32)]
    a, b = rows
    if a["sec_per_step_mean"] and b["sec_per_step_mean"]:
        speedup = a["sec_per_step_mean"] / b["sec_per_step_mean"]
    else:
        speedup = None
    report = {"runs": rows, "speedup_32_over_64": round(speedup, 4) if speedup else None}
    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
