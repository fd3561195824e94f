"""Mel-fidelity parity harness (the BASELINE.md north star, one command).

Target: teacher-forced mel allclose (atol 1e-3) against the reference
Tacotron-2 checkpoint on N Biaobei sentences.  Both reference weight blobs
are absent from this mount (.MISSING_LARGE_BLOBS), so the gate cannot run
today — this harness makes it a single command the moment the artifacts
exist, with every piece already value-validated:

* weights:  --tf-ckpt  (tools/import_tf_checkpoint + tools/tf_bundle — the
            importer is oracle-validated in tests/test_tf_import.py) or
            --params (.npz from either importer).
* targets:  --wav-dir (Biaobei wavs; GT mels come from our DSP, which is
            pinned to the reference's by tests/test_dsp.py) or --gt-mels
            (precomputed mel-XXXXXX.npy [T,80] in [-4,4]).
* oracle:   --ref-mels — mels the REFERENCE graph produced for the same
            sentences (the reference's own GTA bridge writes them:
            wavernn_preprocess.py:160-166; run it once on a TF-1.14
            machine).  [0,1]-scaled reference dumps are detected and
            rescaled.

For each sentence: G2P -> encode -> teacher-forced decode (the
deterministic path; reference helpers.py:136-142 always feeds ground truth)
-> compare post-postnet mels.  Reports per-sentence L1 / max-abs-diff /
allclose(atol) and writes a JSON verdict.

Usage:
    python -m tools.check_mel_parity --tf-ckpt tacotron_model.ckpt-206500 \
        --wav-dir BZNSYP/Wave --ref-mels ref_gta/ --out MEL_PARITY.json
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_params(cfg, tf_ckpt: str | None, npz: str | None):
    import jax

    if npz:
        from tacotronv2_wavernn_chinese_tpu.utils.checkpoints import load_params_npz

        return load_params_npz(npz)
    from tools.import_tf_checkpoint import import_checkpoint, load_tf_variables

    params, unmatched, missing = import_checkpoint(cfg, load_tf_variables(tf_ckpt, None))
    if missing:
        raise SystemExit(f"ckpt is missing {len(missing)} mapped variables: {missing[:5]}")
    if unmatched:
        print(f"note: {len(unmatched)} ckpt variables unused: {unmatched[:5]}")
    return jax.tree_util.tree_map(np.asarray, params)


def gt_mel_for(cfg, index: str, wav_dir: str | None, gt_mels: str | None) -> np.ndarray:
    if gt_mels:
        return np.load(os.path.join(gt_mels, f"mel-{index}.npy"))
    # the SAME conditioning chain that produced the training features
    from tacotronv2_wavernn_chinese_tpu.data.preprocess import condition_wav
    from tacotronv2_wavernn_chinese_tpu.dsp.spectrogram import MelPipeline

    a = cfg.audio
    cond = condition_wav(a, os.path.join(wav_dir, f"{index}.wav"))
    if cond is None:
        raise FileNotFoundError(os.path.join(wav_dir, f"{index}.wav"))
    _, preem = cond
    return np.asarray(MelPipeline(a).melspectrogram(preem))


def teacher_forced_mel(cfg, params, pyin: str, gt_mel: np.ndarray) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from tacotronv2_wavernn_chinese_tpu.frontend import default_symbols
    from tacotronv2_wavernn_chinese_tpu.models import tacotron as T

    syms = default_symbols()
    ids = np.asarray(syms.encode(pyin), np.int32)[None, :]
    r = cfg.tacotron.outputs_per_step
    T_out = -(-gt_mel.shape[0] // r) * r
    mel_in = np.zeros((1, T_out, gt_mel.shape[1]), np.float32)
    mel_in[0, : gt_mel.shape[0]] = gt_mel
    out, _ = T.forward_teacher_forced(
        params, cfg.tacotron, jnp.asarray(ids),
        jnp.asarray([ids.shape[1]], jnp.int32), jnp.asarray(mel_in),
        train=False, rng=jax.random.PRNGKey(0),
    )
    return np.asarray(out.mel_outputs[0])[: gt_mel.shape[0]]


def run(cfg, params, rows, wav_dir, gt_mels, ref_mels, atol: float, log=print,
        ref_scale: str = "auto"):
    from tacotronv2_wavernn_chinese_tpu.frontend import get_pyin

    per = []
    for index, text in rows:
        pyin, _ = get_pyin(text)
        gt = gt_mel_for(cfg, index, wav_dir, gt_mels)
        ours = teacher_forced_mel(cfg, params, pyin, gt)
        ref = np.load(os.path.join(ref_mels, f"mel-{index}.npy"))
        if ref.ndim == 2 and ref.shape[1] != 80 and ref.shape[0] == 80:
            ref = ref.T
        # the reference GTA bridge saves [0,1]-scaled mels
        # (wavernn_preprocess.py:156-159); --ref-scale makes the choice
        # explicit ('auto' falls back to a range heuristic and can be
        # fooled by interpolation overshoots — prefer unit/acoustic)
        is_unit = {
            "unit": True,
            "acoustic": False,
            "auto": bool(ref.max() <= 1.001 and ref.min() >= -0.001),
        }[ref_scale]
        if is_unit:
            from tacotronv2_wavernn_chinese_tpu.dsp.spectrogram import unit_to_mel

            ref = np.asarray(unit_to_mel(ref, cfg.audio))
        n = min(len(ours), len(ref))
        diff = np.abs(ours[:n] - ref[:n])
        row = {
            "index": index,
            "frames": n,
            "l1": float(diff.mean()),
            "max_abs": float(diff.max()),
            "allclose": bool(diff.max() <= atol),
        }
        per.append(row)
        log(f"{index}: L1={row['l1']:.5f} max={row['max_abs']:.5f} "
            f"{'PASS' if row['allclose'] else 'FAIL'}")
    if not per:
        raise SystemExit(
            "no sentences to compare — check --train-txt format and --sentences"
        )
    return {
        "atol": atol,
        "n_sentences": len(per),
        "n_pass": sum(r["allclose"] for r in per),
        "mean_l1": float(np.mean([r["l1"] for r in per])),
        "passed": all(r["allclose"] for r in per),
        "per_sentence": per,
    }


def main() -> None:
    from tacotronv2_wavernn_chinese_tpu.config import default_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--tf-ckpt", default=None)
    ap.add_argument("--params", default=None, help=".npz params")
    ap.add_argument("--train-txt", default="/root/reference/train.txt")
    ap.add_argument("--sentences", type=int, default=20)
    ap.add_argument("--wav-dir", default=None)
    ap.add_argument("--gt-mels", default=None, help="dir of mel-XXXXXX.npy targets")
    ap.add_argument("--ref-mels", required=True,
                    help="dir of reference-produced mel-XXXXXX.npy to compare against")
    ap.add_argument("--ref-scale", choices=("auto", "unit", "acoustic"), default="auto",
                    help="scale of --ref-mels dumps ([0,1] unit vs [-4,4] acoustic)")
    ap.add_argument("--atol", type=float, default=1e-3)
    ap.add_argument("--out", default="MEL_PARITY.json")
    ap.add_argument("--override", default="")
    args = ap.parse_args()
    if not args.tf_ckpt and not args.params:
        ap.error("one of --tf-ckpt / --params is required")
    if not args.wav_dir and not args.gt_mels:
        ap.error("one of --wav-dir / --gt-mels is required")

    cfg = default_config()
    if args.override:
        cfg = cfg.override(args.override)
    params = load_params(cfg, args.tf_ckpt, args.params)

    rows = []
    for line in open(args.train_txt, encoding="utf-8"):
        f = line.strip().split("|")
        if len(f) >= 6:
            # audio-XXXXXX.npy -> XXXXXX
            index = f[0].split("-")[-1].split(".")[0]
            rows.append((index, f[4]))
        if len(rows) >= args.sentences:
            break

    report = run(cfg, params, rows, args.wav_dir, args.gt_mels, args.ref_mels,
                 args.atol, ref_scale=args.ref_scale)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "per_sentence"}))
    if not report["passed"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
