"""Round-3 experiment: tacotron/wavernn train-step throughput levers.

Measures, on the real chip:
  - tacotron train_step at B in {32, 64, 128} x scan_unroll in {1, 2, 4}
  - wavernn train_step at B in {32, 64, 128}
  - fused K=8 dispatch at the best settings

Emits one JSON line per row (examples/s, s/step, MFU).  Throwaway-ish but
kept under tools/ so the numbers are reproducible.

Usage: python -m tools.exp_train_speed [--quick] [--taco-only|--voc-only]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.utils.compile_cache import enable_compile_cache

PEAK_FLOPS_BF16 = 197e12


def sync(x) -> float:
    return float(np.asarray(jnp.sum(x)))


def timed(f, key, reps=3):
    sync(f(key))
    ts = []
    for i in range(reps):
        t0 = time.time()
        sync(f(jax.random.fold_in(key, i + 1)))
        ts.append(time.time() - t0)
    return min(ts)


def xla_flops(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca["flops"])
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--taco-only", action="store_true")
    ap.add_argument("--voc-only", action="store_true")
    args = ap.parse_args()
    enable_compile_cache()

    cfg0 = default_config()
    key = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))
    rows = []

    def emit(**row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    from tacotronv2_wavernn_chinese_tpu.train import tacotron_task as TT
    from tacotronv2_wavernn_chinese_tpu.train import wavernn_task as WT

    T_in, T_out = 64, 512
    hop = cfg0.audio.hop_size

    if not args.voc_only:
        unrolls = (1, 2) if args.quick else (1, 2, 4)
        batches_to_try = (32,) if args.quick else (32, 64, 128)
        # unroll sweep at B=32 first
        best_unroll, best_dt = 1, None
        for u in unrolls:
            cfg = cfg0.override(f"tacotron_train.scan_unroll={u}")
            state = TT.init_state(jax.random.PRNGKey(0), cfg)
            B = 32
            batch = {
                "inputs": jnp.ones((B, T_in), jnp.int32),
                "input_lengths": jnp.full((B,), T_in, jnp.int32),
                "mel_targets": jnp.zeros((B, T_out, 80), jnp.float32),
                "stop_targets": jnp.ones((B, T_out), jnp.float32),
                "target_lengths": jnp.full((B,), T_out, jnp.int32),
            }
            box = [state]

            def once(k):
                s2, m = TT.train_step(box[0], batch, k, cfg)
                box[0] = s2
                return m["loss"]

            dt = timed(once, key)
            fl = xla_flops(TT.train_step, box[0], batch, key, cfg)
            emit(exp="taco_unroll", unroll=u, batch=B, s_per_step=round(dt, 4),
                 examples_per_s=round(B / dt, 1),
                 mfu=round(fl / dt / PEAK_FLOPS_BF16, 4) if fl else None)
            if best_dt is None or dt < best_dt:
                best_unroll, best_dt = u, dt

        # batch sweep at the winning unroll
        for B in batches_to_try:
            cfg = cfg0.override(f"tacotron_train.scan_unroll={best_unroll}")
            state = TT.init_state(jax.random.PRNGKey(0), cfg)
            batch = {
                "inputs": jnp.ones((B, T_in), jnp.int32),
                "input_lengths": jnp.full((B,), T_in, jnp.int32),
                "mel_targets": jnp.zeros((B, T_out, 80), jnp.float32),
                "stop_targets": jnp.ones((B, T_out), jnp.float32),
                "target_lengths": jnp.full((B,), T_out, jnp.int32),
            }
            box = [state]

            def once(k):
                s2, m = TT.train_step(box[0], batch, k, cfg)
                box[0] = s2
                return m["loss"]

            dt = timed(once, key)
            fl = xla_flops(TT.train_step, box[0], batch, key, cfg)
            emit(exp="taco_batch", unroll=best_unroll, batch=B,
                 s_per_step=round(dt, 4), examples_per_s=round(B / dt, 1),
                 mfu=round(fl / dt / PEAK_FLOPS_BF16, 4) if fl else None)

    if not args.taco_only:
        sf = cfg0.wavernn_train.seq_len_hops
        for B in ((32,) if args.quick else (32, 64, 128)):
            wstate = WT.init_state(jax.random.PRNGKey(0), cfg0)
            wbatch = {
                "x": jnp.zeros((B, sf * hop), jnp.float32),
                "y": jnp.zeros((B, sf * hop), jnp.int32),
                "mels": jnp.zeros((B, sf + 2 * cfg0.wavernn.pad, 80), jnp.float32),
            }
            box = [wstate]

            def once(k):
                s2, m = WT.train_step(box[0], wbatch, cfg0)
                box[0] = s2
                return m["loss"]

            dt = timed(once, key)
            fl = xla_flops(WT.train_step, box[0], wbatch, cfg0)
            emit(exp="voc_batch", batch=B, s_per_step=round(dt, 4),
                 examples_per_s=round(B / dt, 1),
                 mfu=round(fl / dt / PEAK_FLOPS_BF16, 4) if fl else None)

    with open("exp_train_speed.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("# wrote exp_train_speed.json", flush=True)


if __name__ == "__main__":
    main()
