"""Data-parallel scaling-efficiency benchmark (BASELINE.md: >=85% at 2 hosts).

Measures weak-scaling throughput of the two DP workloads over increasing
mesh sizes and reports efficiency relative to the 1-device rate:

  - ``train``: WaveRNN train step (global batch = per-device batch x N,
    parameters replicated, gradient psum inserted by GSPMD) — the path the
    reference only sketched (wavernn/utils/__init__.py:19-36, unreachable
    because its driver pins CPU, wavernn_train.py:46).
  - ``gen``: fold-sharded WaveRNN generation (`parallel/generate.py`), the
    sequence-parallel axis of fatchord_version.py:293-340 mapped onto the
    mesh.

On a real pod, run one process per host after
``parallel.distributed.initialize()`` and the mesh spans all chips (ICI
within a slice, DCN across hosts) — efficiency there is the BASELINE gate.
With ``--virtual N`` the run uses N virtual CPU devices
(xla_force_host_platform_device_count): virtual devices share one host's
cores, so throughput numbers are NOT hardware-meaningful; the mode
validates that the sharded programs compile, execute, and that per-device
work is balanced (the same harness then transfers to a pod unchanged).

Usage:
  python -m tools.bench_scaling --virtual 8            # mechanics check
  python -m tools.bench_scaling --which train,gen      # real devices

Prints one JSON line per (workload, mesh size).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time


def _parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force an N-device virtual CPU platform")
    ap.add_argument("--which", default="train,gen")
    ap.add_argument("--batch-per-device", type=int, default=4)
    ap.add_argument("--folds-per-device", type=int, default=2)
    ap.add_argument("--seq-len", type=int, default=0,
                    help="training window in samples (0 = tiny default)")
    ap.add_argument("--reps", type=int, default=3)
    return ap.parse_args(argv)


def _tiny_config():
    """Shrunk-but-structurally-real config so CPU steps take ~100 ms."""
    from tacotronv2_wavernn_chinese_tpu.config import default_config

    cfg = default_config()
    return dataclasses.replace(
        cfg,
        wavernn=dataclasses.replace(
            cfg.wavernn, rnn_dims=64, fc_dims=64, compute_dims=32,
            res_out_dims=32, res_blocks=2,
        ),
    )


def _sync(x) -> float:
    """Scalar-reduce sync (works on CPU and the axon tunnel alike)."""
    import jax.numpy as jnp
    import numpy as np

    return float(np.asarray(jnp.sum(x)))


def _mesh_sizes(n: int) -> list[int]:
    sizes, k = [], 1
    while k <= n:
        sizes.append(k)
        k *= 2
    if sizes[-1] != n:
        sizes.append(n)
    return sizes


def bench_train(mesh_devices, cfg, batch_per_device: int, seq_len: int, reps: int):
    """Examples/s of the DP WaveRNN train step on the given devices."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tacotronv2_wavernn_chinese_tpu.parallel.mesh import (
        make_mesh, replicate_tree, shard_batch)
    from tacotronv2_wavernn_chinese_tpu.train import wavernn_task as task

    n = len(mesh_devices)
    mesh = make_mesh(mesh_devices)
    state = task.init_state(jax.random.PRNGKey(0), cfg)
    state = task.WaveRNNTrainState(
        state.step, replicate_tree(mesh, state.params),
        replicate_tree(mesh, state.opt_state))

    hop = cfg.wavernn.total_upsample
    frames = seq_len // hop + 2 * cfg.wavernn.pad
    B = batch_per_device * n
    rng = np.random.default_rng(0)
    batch = {
        "x": rng.random((B, seq_len), np.float32).astype(np.float32),
        "y": rng.integers(0, 2 ** cfg.audio.bits, (B, seq_len)).astype(np.int32),
        "mels": rng.random((B, frames, cfg.audio.num_mels)).astype(np.float32),
    }
    batch = shard_batch(mesh, batch)
    state, m = task.train_step(state, batch, cfg)  # compile + 1 step
    _sync(m["loss"])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = task.train_step(state, batch, cfg)
    _sync(m["loss"])
    dt = (time.perf_counter() - t0) / reps
    return B / dt, dt


def bench_gen(mesh_devices, cfg, folds_per_device: int, reps: int):
    """Audio-seconds/s of fold-sharded generation on the given devices."""
    import jax
    import numpy as np

    from tacotronv2_wavernn_chinese_tpu.parallel.generate import (
        generate_folds_sharded)
    from tacotronv2_wavernn_chinese_tpu.parallel.mesh import make_mesh
    from tacotronv2_wavernn_chinese_tpu.models import wavernn as W

    n = len(mesh_devices)
    mesh = make_mesh(mesh_devices)
    params = W.init_wavernn(
        jax.random.PRNGKey(0), cfg.wavernn,
        num_mels=cfg.audio.num_mels, bits=cfg.audio.bits)
    frames = 8 + 2 * cfg.wavernn.pad
    F = folds_per_device * n
    folds = np.random.default_rng(1).random(
        (F, frames, cfg.audio.num_mels)).astype(np.float32)
    import jax.numpy as jnp

    key = jax.random.PRNGKey(2)
    wav = generate_folds_sharded(
        params, cfg.wavernn, mesh, jnp.asarray(folds), key,
        cfg.audio.bits, True)
    _sync(wav)
    t0 = time.perf_counter()
    for i in range(reps):
        wav = generate_folds_sharded(
            params, cfg.wavernn, mesh, jnp.asarray(folds),
            jax.random.fold_in(key, i), cfg.audio.bits, True)
    _sync(wav)
    dt = (time.perf_counter() - t0) / reps
    audio_s = wav.shape[0] * wav.shape[1] / cfg.audio.sample_rate
    return audio_s / dt, dt


def main(argv=None) -> None:
    args = _parse_args(argv)
    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    devices = jax.devices()
    cfg = _tiny_config()
    seq_len = args.seq_len or cfg.wavernn.total_upsample * 5
    which = set(args.which.split(","))
    base: dict[str, float] = {}
    for n in _mesh_sizes(len(devices)):
        devs = devices[:n]
        if "train" in which:
            rate, dt = bench_train(devs, cfg, args.batch_per_device, seq_len, args.reps)
            base.setdefault("train", rate / n)
            print(json.dumps({
                "metric": "wavernn_dp_train_examples_per_second",
                "n_devices": n, "value": round(rate, 3), "unit": "examples/s",
                "step_seconds": round(dt, 4),
                "efficiency": round(rate / (n * base["train"]), 4),
            }), flush=True)
        if "gen" in which:
            rate, dt = bench_gen(devs, cfg, args.folds_per_device, args.reps)
            base.setdefault("gen", rate / n)
            print(json.dumps({
                "metric": "wavernn_sharded_gen_audio_seconds_per_second",
                "n_devices": n, "value": round(rate, 3), "unit": "audio_s/s",
                "call_seconds": round(dt, 4),
                "efficiency": round(rate / (n * base["gen"]), 4),
            }), flush=True)


if __name__ == "__main__":
    main()
