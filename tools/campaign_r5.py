"""Round-5 flagship campaign: quality at scale + endurance in ONE pass.

One 10k-utterance (reference corpus scale, preprocessor.py:33) training
campaign through the REAL CLI entrypoints that produces BOTH round-5
artifacts from the same wall-clock:

  QUALITY_r5.json   — >=20k Tacotron steps with the reference's exponential
                      LR decay actually engaged (tacotron_hparams.py:199-204,
                      scaled proportionally: 300k-step schedule -> 20k-step
                      schedule), per-checkpoint held-out mel L1 curve (the
                      round-3 overfit question: best ckpt at 2000/7000 on a
                      0.37 h corpus), best-checkpoint selection, GTA ->
                      >=10k WaveRNN steps, MCD vs the Griffin-Lim oracle.
  ENDURANCE_r5.json — full-length run on the current driver with mid-train
                      SIGKILL + restore on BOTH trainers (reference
                      restore contract train.py:146-164), steady-state
                      step-time percentiles (p95 <= 2x p50 gate), checkpoint
                      rotation, measured bucket padding waste, end synthesis.

Every stage is resumable: completed stages persist a stage_<name>.json in
--work and are skipped on relaunch (tunnel wedges cost a relaunch, not the
campaign).

Usage (real TPU, from /root/repo):
    python -m tools.campaign_r5 [--work /tmp/campaign_r5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from tools.endurance_run import kill_restart_cycle, read_scalar_steps, run_cli

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def stage(work: str, name: str, fn):
    """Run ``fn`` unless a completed stage marker exists; persist result."""
    marker = os.path.join(work, f"stage_{name}.json")
    if os.path.exists(marker):
        with open(marker) as f:
            row = json.load(f)
        print(f"[campaign] stage {name}: resumed from marker", flush=True)
        return row
    t0 = time.time()
    print(f"[campaign] stage {name}: start", flush=True)
    row = fn() or {}
    row["wall_s"] = round(time.time() - t0, 1)
    with open(marker, "w") as f:
        json.dump(row, f, indent=1)
    print(f"[campaign] stage {name}: done in {row['wall_s']}s", flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/campaign_r5")
    ap.add_argument("--n-utts", type=int, default=10000)
    ap.add_argument("--holdout", type=int, default=256)
    ap.add_argument("--taco-steps", type=int, default=20000)
    ap.add_argument("--taco-kill-after", type=int, default=8000)
    ap.add_argument("--voc-steps", type=int, default=10000)
    ap.add_argument("--voc-kill-after", type=int, default=4000)
    ap.add_argument("--quality-out", default="QUALITY_r5.json")
    ap.add_argument("--endurance-out", default="ENDURANCE_r5.json")
    ap.add_argument("--ckpt-interval", type=int, default=1000)
    ap.add_argument("--summary-interval", type=int, default=100)
    ap.add_argument("--spd", type=int, default=4,
                    help="steps per fused dispatch (both trainers)")
    ap.add_argument("--model-override", default="",
                    help="extra cfg overrides applied everywhere "
                         "(tiny dims for the CPU smoke run)")
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    work = args.work
    log_path = os.path.join(work, "driver.log")

    # LR schedule scaled from the reference 300k-step regime to this run:
    # decay_start 66k/300k -> 22%; lr reaches final_lr (1e-5) ~2/3 through
    # (66k + 20k*log2(100) = 199k of 300k)
    frac = args.taco_steps / 300000.0
    decay_start = max(1, int(66000 * frac))
    decay_steps = max(1, int(20000 * frac))
    taco_override = (
        f"tacotron_train.steps_per_dispatch={args.spd},"
        f"tacotron_train.checkpoint_interval={args.ckpt_interval},"
        f"tacotron_train.summary_interval={args.summary_interval},"
        f"tacotron_train.decay_start={decay_start},"
        f"tacotron_train.decay_steps={decay_steps}"
    )
    if args.model_override:
        taco_override += "," + args.model_override
    voc_override = (f"wavernn_train.steps_per_dispatch={args.spd},"
                    f"wavernn_train.checkpoint_every={args.ckpt_interval},"
                    f"wavernn_train.summary_interval={args.summary_interval}")
    if args.model_override:
        voc_override += "," + args.model_override
    ckpt_iv = args.ckpt_interval

    # ---- corpus + preprocess (reuses the endurance procedural corpus) ----
    def do_corpus():
        from tools.quality_demo import make_corpus

        corpus = os.path.join(work, "corpus")
        transcript = os.path.join(corpus, "transcript.txt")
        wav_dir = os.path.join(corpus, "Wave")
        done = (os.path.exists(transcript)
                and sum(1 for _ in open(transcript)) >= 2 * args.n_utts
                and len(os.listdir(wav_dir)) >= args.n_utts)
        if not done:
            make_corpus(corpus, args.n_utts)
        return {"transcript": transcript, "wav_dir": wav_dir}

    c = stage(work, "corpus", do_corpus)
    feat = os.path.join(work, "training_data")
    meta_all = os.path.join(feat, "all.txt")
    meta_train = os.path.join(feat, "train.txt")
    meta_hold = os.path.join(feat, "holdout.txt")

    def do_preprocess():
        from tacotronv2_wavernn_chinese_tpu.data.preprocess import (
            read_metadata, write_metadata,
        )

        run_cli(["tacotronv2_wavernn_chinese_tpu.data.preprocess",
                 "--transcript", c["transcript"], "--wav-dir", c["wav_dir"],
                 "--out-dir", feat], log_path)
        # preprocess writes train.txt over ALL rows; carve a held-out tail
        rows = read_metadata(meta_train)
        write_metadata(rows, meta_all)
        write_metadata(rows[:-args.holdout], meta_train)
        write_metadata(rows[-args.holdout:], meta_hold)
        sr = 22050
        return {"n_rows": len(rows), "holdout": args.holdout,
                "audio_hours": round(sum(int(r[2]) for r in rows) / sr / 3600, 2)}

    pre = stage(work, "preprocess", do_preprocess)

    # measured padding waste of the actual training batches (VERDICT r4 #6)
    def do_padding():
        from tacotronv2_wavernn_chinese_tpu.config import default_config
        from tacotronv2_wavernn_chinese_tpu.data.loader import TacotronDataset
        from tacotronv2_wavernn_chinese_tpu.data.preprocess import read_metadata

        cfg = default_config().override(taco_override)
        ds = TacotronDataset(read_metadata(meta_train), feat, cfg)
        seeds = [cfg.tacotron_train.data_seed + e for e in range(4)]
        return ds.padding_stats(seeds)

    padding = stage(work, "padding", do_padding)

    # ---- tacotron: full run with mid-train SIGKILL + restore ----
    taco_log = os.path.join(work, "logs-tacotron")
    ckpt_dir = os.path.join(taco_log, "taco_pretrained")

    def do_taco():
        taco_args = [sys.executable, "-m",
                     "tacotronv2_wavernn_chinese_tpu.train.tacotron_train",
                     "--metadata", meta_train, "--mel-dir", feat,
                     "--log-dir", taco_log, "--steps", str(args.taco_steps),
                     "--override", taco_override, "--no-render"]
        row = kill_restart_cycle(
            taco_args, os.path.join(taco_log, "scalars.jsonl"),
            args.taco_kill_after, os.path.join(work, "driver_taco.log"),
            resume_lo=ckpt_iv + args.spd, resume_hi=args.spd,
        )
        kept = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
        row["checkpoints_kept"] = len(kept)
        row["max_to_keep_respected"] = len(kept) <= 20
        return row

    taco = stage(work, "tacotron", do_taco)

    # ---- per-checkpoint held-out curve + best-checkpoint selection ----
    def do_select():
        import jax

        from tacotronv2_wavernn_chinese_tpu.config import default_config
        from tacotronv2_wavernn_chinese_tpu.utils.compile_cache import (
            enable_compile_cache,
        )
        from tools.quality_demo import select_best_checkpoint

        enable_compile_cache()
        cfg = default_config().override(taco_override)
        return select_best_checkpoint(cfg, taco_log, meta_hold, feat)

    best = stage(work, "select", do_select)

    # ---- GTA bridge from the BEST checkpoint ----
    gta_dir = os.path.join(work, "gta")
    gta_meta = os.path.join(gta_dir, "wavernn_training_data.txt")

    def do_gta():
        run_cli(["tacotronv2_wavernn_chinese_tpu.infer.gta",
                 "--metadata", meta_train, "--data-dir", feat,
                 "--out-dir", gta_dir, "--ckpt-dir", ckpt_dir,
                 "--step", str(best["best_step"]),
                 "--override", taco_override,
                 "--batch-size", "16"], log_path)
        return {"rows": sum(1 for _ in open(gta_meta))}

    gta = stage(work, "gta", do_gta)

    # ---- wavernn: full run with its own SIGKILL + restore ----
    voc_log = os.path.join(work, "logs-wavernn")

    def do_voc():
        voc_args = [sys.executable, "-m",
                    "tacotronv2_wavernn_chinese_tpu.train.wavernn_train",
                    "--metadata", gta_meta, "--data-dir", gta_dir,
                    "--log-dir", voc_log, "--steps", str(args.voc_steps),
                    "--no-gen", "--native-loader",
                    "--override", voc_override]
        row = kill_restart_cycle(
            voc_args, os.path.join(voc_log, "scalars.jsonl"),
            args.voc_kill_after, os.path.join(work, "driver_voc.log"),
            resume_lo=ckpt_iv + args.spd, resume_hi=args.spd,
        )
        kept = [d for d in os.listdir(os.path.join(voc_log, "checkpoints"))
                if d.isdigit()]
        row["checkpoints_kept"] = len(kept)
        row["max_to_keep_respected"] = len(kept) <= 20
        return row

    voc = stage(work, "wavernn", do_voc)

    # ---- MCD (held-out text -> best-ckpt mel -> trained WaveRNN -> wav) ----
    def do_mcd():
        import jax

        from tacotronv2_wavernn_chinese_tpu.config import default_config
        from tacotronv2_wavernn_chinese_tpu.train import tacotron_task as task
        from tacotronv2_wavernn_chinese_tpu.utils.checkpoints import (
            CheckpointManager,
        )
        from tacotronv2_wavernn_chinese_tpu.utils.compile_cache import (
            enable_compile_cache,
        )
        from tools.quality_demo import heldout_eval, mcd_eval

        enable_compile_cache()
        cfg = default_config().override(taco_override)
        mgr = CheckpointManager(ckpt_dir)
        template = task.init_state(jax.random.PRNGKey(0), cfg)
        params = jax.device_get(
            mgr.restore(template, step=best["best_step"]).params)
        final_params = jax.device_get(mgr.restore(template).params)
        mgr.close()
        hold_final = heldout_eval(cfg, final_params, meta_hold, feat)
        mcd = mcd_eval(cfg, params, voc_log, meta_hold, feat,
                       os.path.join(work, "corpus", "Wave"), n_max=12)
        return {"heldout_final": hold_final, "mcd": mcd}

    quality = stage(work, "mcd", do_mcd)

    # ---- synthesis smoke through both trained models ----
    def do_synth():
        import jax

        from tacotronv2_wavernn_chinese_tpu.config import default_config
        from tacotronv2_wavernn_chinese_tpu.infer.synthesizer import Synthesizer
        from tacotronv2_wavernn_chinese_tpu.utils.compile_cache import (
            enable_compile_cache,
        )

        enable_compile_cache()
        # taco_override carries any --model-override dims, which must match
        # the checkpoint shapes
        cfg = default_config().override(taco_override)
        synth = Synthesizer.from_checkpoints(
            cfg, ckpt_dir, os.path.join(voc_log, "checkpoints"),
            step=best["best_step"],
        )
        transcript = c["transcript"]
        texts = [l.split("\t")[1].strip()
                 for i, l in enumerate(open(transcript, encoding="utf-8"))
                 if i % 2 == 0][:16]
        out_dir = os.path.join(work, "synth_out")
        os.makedirs(out_dir, exist_ok=True)
        t0 = time.time()
        audio_s = 0.0
        for i, text in enumerate(texts):
            r = synth.synthesize(text, out_dir=out_dir, seed=i)
            audio_s += len(r["wav"]) / cfg.audio.sample_rate
        return {"sentences": len(texts), "audio_s": round(audio_s, 1),
                "synth_wall_s": round(time.time() - t0, 1)}

    synth = stage(work, "synth", do_synth)

    # ---- artifacts ----
    taco_scalars = read_scalar_steps(os.path.join(taco_log, "scalars.jsonl"))
    losses = [(s["step"], round(s["loss"], 4)) for s in taco_scalars if "loss" in s]
    voc_scalars = read_scalar_steps(os.path.join(voc_log, "scalars.jsonl"))
    voc_losses = [(s["step"], round(s["loss"], 4)) for s in voc_scalars if "loss" in s]

    def thin(curve, n=60):
        return curve[:: max(1, len(curve) // n)] + curve[-1:]

    endurance = {
        "provenance": {
            "tool": "tools/campaign_r5.py",
            "n_utts": args.n_utts,
            "taco_steps": args.taco_steps,
            "voc_steps": args.voc_steps,
            "corpus": "procedural 10k (reference transcripts, formant audio)",
            "note": ("full-length round-5 campaign on the current driver: "
                     "SIGKILL + restore-from-latest exercised mid-run on "
                     "BOTH trainers; step-time percentiles are rolling-"
                     "window readings with each process's cold first "
                     "window dropped (see endurance_run.kill_restart_cycle)"),
        },
        "preprocess": pre,
        "padding_waste": padding,
        "tacotron": {**taco,
                     "gate_p95_le_2x_p50": bool(
                         taco.get("sec_per_step_p95") is not None
                         and taco["sec_per_step_p95"] <= 2 * taco["sec_per_step_p50"])},
        "gta": gta,
        "wavernn": {**voc,
                    "gate_p95_le_2x_p50": bool(
                        voc.get("sec_per_step_p95") is not None
                        and voc["sec_per_step_p95"] <= 2 * voc["sec_per_step_p50"])},
        "synthesis": synth,
    }
    with open(args.endurance_out, "w") as f:
        json.dump(endurance, f, indent=1)

    quality_report = {
        "provenance": {
            "tool": "tools/campaign_r5.py",
            "n_utterances": pre.get("n_rows"),
            "audio_hours": pre.get("audio_hours"),
            "holdout": args.holdout,
            "tacotron_steps": args.taco_steps,
            "wavernn_steps": args.voc_steps,
            "lr_schedule": {"initial": 1e-3, "final": 1e-5,
                            "decay_start": decay_start,
                            "decay_steps": decay_steps, "decay_rate": 0.5,
                            "scaled_from": "reference tacotron_hparams.py:199-204"},
            "corpus": "procedural (reference transcripts, formant audio)",
        },
        "tacotron": {"loss_curve": thin(losses),
                     "loss_first": losses[0][1] if losses else None,
                     "loss_last": losses[-1][1] if losses else None},
        "heldout_curve": best.get("evaluated"),
        "best_checkpoint": {k: best[k] for k in ("best_step", "best_mel_l1")
                            if k in best},
        "heldout_final": quality.get("heldout_final"),
        "mcd": quality.get("mcd"),
        "wavernn": {"loss_curve": thin(voc_losses),
                    "loss_first": voc_losses[0][1] if voc_losses else None,
                    "loss_last": voc_losses[-1][1] if voc_losses else None},
    }
    with open(args.quality_out, "w") as f:
        json.dump(quality_report, f, indent=1)
    print(json.dumps({"endurance": {k: v for k, v in endurance.items()
                                    if k not in ("provenance",)},
                      "quality_summary": {
                          "best": quality_report["best_checkpoint"],
                          "heldout_final": quality_report["heldout_final"],
                          "mcd": quality_report["mcd"]}}, indent=1))


if __name__ == "__main__":
    main()
