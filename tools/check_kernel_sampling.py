"""On-TPU sampling-distribution check for the fused WaveRNN kernel.

The kernel's Gumbel-argmax categorical sampling rides pltpu.prng_random_bits
(ops/wavernn_kernel.py), which interpret mode cannot emulate — greedy is the
only path with bit-level parity coverage in tests/.  This tool closes that
hole on real hardware: every parameter is zeroed except the fc3 bias, so the
per-step logits are a KNOWN constant vector and every emitted sample is an
iid draw from softmax(bias); the empirical class counts are then chi-square
tested against the exact probabilities (alpha 1e-3), plus a greedy-mode
determinism check.  Writes SAMPLING_r2.json when invoked with --out.

Usage (real TPU, from /root/repo):
    python -m tools.check_kernel_sampling [--out SAMPLING_r2.json]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def target_logits(n_classes: int, lo: int = 100, k: int = 16) -> np.ndarray:
    """Mass concentrated on k classes with distinct probabilities."""
    logits = np.full((n_classes,), -30.0, np.float32)
    w = np.arange(1, k + 1, dtype=np.float32)
    logits[lo : lo + k] = np.log(w / w.sum())
    return logits


def zeroed_params_with_bias(cfg, bits: int, bias: np.ndarray):
    import jax
    import jax.numpy as jnp

    from tacotronv2_wavernn_chinese_tpu.models.wavernn import init_wavernn

    params = init_wavernn(jax.random.PRNGKey(0), cfg.wavernn, bits=bits)
    params = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a), params)
    params["fc3"]["b"] = jnp.asarray(bias)
    return params


def chi_square(labels: np.ndarray, logits: np.ndarray, lo: int, k: int):
    """(statistic, critical_at_1e-3, df) over the k target classes + tail."""
    from scipy.stats import chi2

    p = np.exp(logits - logits.max())
    p = p / p.sum()
    n = labels.size
    counts = np.bincount(labels.ravel(), minlength=logits.size)
    obs = np.concatenate([counts[lo : lo + k], [n - counts[lo : lo + k].sum()]])
    exp = np.concatenate([p[lo : lo + k] * n, [max(n * (1 - p[lo : lo + k].sum()), 1e-9)]])
    stat = float(np.sum((obs - exp) ** 2 / np.maximum(exp, 1e-9)))
    df = k  # k+1 bins - 1
    return stat, float(chi2.ppf(1 - 1e-3, df)), df


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--folds", type=int, default=8)
    ap.add_argument("--frames", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tacotronv2_wavernn_chinese_tpu.config import default_config
    from tacotronv2_wavernn_chinese_tpu.ops import wavernn_kernel as WK
    from tacotronv2_wavernn_chinese_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    assert jax.default_backend() != "cpu", "run on the real TPU (cwd /root/repo)"
    cfg = default_config()
    bits = cfg.audio.bits
    n_classes = 2 ** bits
    lo, k = 100, 16
    logits = target_logits(n_classes, lo, k)
    params = zeroed_params_with_bias(cfg, bits, logits)

    pad = cfg.wavernn.pad
    mels = jnp.zeros((args.folds, args.frames + 2 * pad, 80), jnp.float32)

    out = WK.generate_pallas(
        params, cfg.wavernn, mels, jax.random.PRNGKey(1234), bits, apply_mu_law=False
    )
    x = np.asarray(out)
    labels = np.rint((x + 1.0) * (n_classes - 1) / 2.0).astype(np.int64)
    stat, crit, df = chi_square(labels, logits, lo, k)
    in_support = float(np.isin(labels, np.arange(lo, lo + k)).mean())

    greedy = WK.generate_pallas(
        params, cfg.wavernn, mels[:1, : 2 + 2 * pad], jax.random.PRNGKey(7), bits,
        apply_mu_law=False, greedy=True,
    )
    glabels = np.rint((np.asarray(greedy) + 1.0) * (n_classes - 1) / 2.0).astype(np.int64)
    greedy_ok = bool(np.all(glabels == int(np.argmax(logits))))

    report = {
        "tool": "tools/check_kernel_sampling.py",
        "backend": jax.default_backend(),
        "n_samples": int(labels.size),
        "chi_square_statistic": round(stat, 2),
        "chi_square_critical_alpha_1e-3": round(crit, 2),
        "df": df,
        "support_mass": round(in_support, 6),
        "greedy_is_argmax": greedy_ok,
        "passed": bool(stat < crit and in_support > 0.999 and greedy_ok),
    }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    if not report["passed"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
