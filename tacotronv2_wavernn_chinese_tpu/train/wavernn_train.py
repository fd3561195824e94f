"""WaveRNN training loop + CLI.

Mirrors the reference driver's operational behavior (wavernn_train.py:20-153):
restore-or-init, NaN-gradient warning, periodic named checkpoints, and a
held-out listening test (a few full AR generations to wav) at every
checkpoint — with the device honest instead of CPU-pinned (wavernn_train.py:46)
and data parallelism real (GSPMD mesh) instead of the unreachable
``data_parallel_workaround``.

Usage:
    python -m tacotronv2_wavernn_chinese_tpu.train.wavernn_train \
        --metadata wavernn_training_data/wavernn_training_data.txt \
        --data-dir wavernn_training_data --log-dir logs-wavernn [--steps N]
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, default_config
from ..data.loader import VocoderDataset
from ..data.preprocess import read_metadata
from ..dsp.wav import save_wav
from ..models import wavernn as W
from ..parallel.mesh import make_mesh, replicate_tree, shard_batch, shard_stacked_batch
from ..utils import logging as infolog
from ..utils.checkpoints import CheckpointManager
from ..utils.metrics import MetricsWriter
from . import wavernn_task as task
from .grouping import fused_groups


def run_training(
    cfg: Config,
    metadata_path: str,
    data_dir: str,
    log_dir: str,
    total_steps: int | None = None,
    use_mesh: bool = True,
    gen_at_checkpoint: bool = True,
    use_native_loader: bool = False,
    log=infolog.log,
) -> task.WaveRNNTrainState:
    wc = cfg.wavernn_train
    total_steps = total_steps or wc.total_steps
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    out_dir = os.path.join(log_dir, "model_outputs")
    os.makedirs(out_dir, exist_ok=True)
    metrics_writer = MetricsWriter(log_dir)

    dataset = VocoderDataset(read_metadata(metadata_path), data_dir, cfg)
    log(f"vocoder dataset: {len(dataset.train_indices)} train / "
        f"{len(dataset.test_indices)} test utterances")
    mesh = make_mesh() if use_mesh else None

    state = task.init_state(jax.random.PRNGKey(wc.seed), cfg)
    mgr = CheckpointManager(ckpt_dir, max_to_keep=wc.max_checkpoints_to_keep)
    restored = mgr.restore(state)
    if restored is not None:
        state = restored
        log(f"restored checkpoint at step {int(state.step)}")
    if mesh is not None:
        state = replicate_tree(mesh, state)

    native = None
    if use_native_loader:
        from ..data.native_loader import NativeVocoderLoader

        if NativeVocoderLoader.available():
            native = NativeVocoderLoader(
                dataset.rows, data_dir, cfg, seed=wc.seed,
                indices=dataset.train_indices,
            )
            log(f"native C++ loader active ({native.num_utts} utterances)")
        else:
            log("native loader requested but unavailable; using Python loader")

    def batch_stream(epoch):
        if native is not None:
            return iter(native)
        return dataset.batches(epoch_seed=wc.seed + epoch)

    time_win, loss_win = infolog.ValueWindow(100), infolog.ValueWindow(100)
    step = int(state.step)
    epoch = 0
    spd = max(1, int(wc.steps_per_dispatch))

    def dispatch(group):
        """Run len(group) steps — ONE fused dispatch when K>1 (vocoder
        windows are fixed-size, so any K batches stack)."""
        nonlocal state, step
        t0 = time.time()
        k = len(group)
        trees = [{"x": b.x, "y": b.y, "mels": b.mels} for b in group]
        if k == 1:
            arrays = trees[0]
            if mesh is not None:
                arrays = shard_batch(mesh, arrays)
            state, metrics = task.train_step(state, arrays, cfg)
            mhost = {kk: np.asarray(v)[None] for kk, v in jax.device_get(metrics).items()}
        else:
            arrays = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)
            if mesh is not None:
                arrays = shard_stacked_batch(mesh, arrays)
            state, metrics = task.train_step_many(state, arrays, cfg)
            mhost = {kk: np.asarray(v) for kk, v in jax.device_get(metrics).items()}
        dt = (time.time() - t0) / k
        ckpt_due = False
        for i in range(k):
            sub = step + i + 1
            loss = float(mhost["loss"][i])
            gnorm = float(mhost["grad_norm"][i])
            time_win.append(dt)
            loss_win.append(loss)
            if np.isnan(gnorm):
                log(f"WARNING: NaN grad norm at step {sub}")  # wavernn_train.py:126-128
            if np.isnan(loss):
                raise RuntimeError(f"loss is NaN at step {sub}")
            if sub % 10 == 0 or sub < 10:
                log(
                    f"Step {sub:7d} [{time_win.average:.3f} sec/step, "
                    f"loss={loss:.5f}, avg={loss_win.average:.5f}]"
                )
            if sub % wc.summary_interval == 0 or sub < 5:
                metrics_writer.write(sub, {"loss": loss, "grad_norm": gnorm})
            if sub % wc.checkpoint_every == 0:
                ckpt_due = True
        step = int(state.step)
        if ckpt_due:
            mgr.save(step, jax.device_get(state))
            log(f"saved checkpoint at step {step}")
            if gen_at_checkpoint:
                _gen_testset(cfg, state.params, dataset, out_dir, step, log)

    if wc.precompile and step < total_steps:
        # near the end of a resumed run the fused K-step variant can never
        # execute (fused_groups only forms full-K groups while
        # step + K <= total_steps) — don't pay its compile for nothing
        warm_spd = spd if total_steps - step >= spd else 1
        _prewarm_shapes(cfg, state, mesh, warm_spd, log)

    while step < total_steps:
        # vocoder windows are fixed-size, so any spd consecutive batches
        # stack (no key_fn needed)
        step_at_epoch_start = step
        for group in fused_groups(batch_stream(epoch), spd, lambda: step, total_steps):
            dispatch(group)
        if step == step_at_epoch_start:
            # zero batches this epoch (train split smaller than batch size):
            # fail loudly instead of spinning epochs forever
            raise ValueError(
                f"vocoder epoch produced no batches: {len(dataset.train_indices)}"
                f" train utterances < batch_size {cfg.wavernn_train.batch_size}"
                " (lower wavernn_train.batch_size or wavernn_train.test_samples)"
            )
        epoch += 1
    mgr.save(step, jax.device_get(state))
    mgr.close()
    metrics_writer.close()
    if native is not None:
        native.close()
    return state


def _prewarm_shapes(cfg, state, mesh, spd, log):
    """Compile the train-step program(s) BEFORE the first real step.

    Vocoder windows are fixed-size (seq_len = hop * seq_len_hops), so there
    are exactly two programs: ``train_step`` and (when steps_per_dispatch>1)
    ``train_step_many``.  Without this, the first dispatch of each process —
    including every post-SIGKILL restart — pays the XLA compile (or the
    persistent-cache deserialize) inside the timed step loop, which put a
    5.87 s p95 against a 0.43 s p50 in RESUME_r4.json.  Mirrors
    ``tacotron_train._prewarm_bucket_shapes`` including its crash tolerance:
    the remote compile helper can die transiently, and a pre-warm failure
    must never kill a training launch (retry once, then fall back to lazy
    compile)."""
    import jax.numpy as jnp

    wc = cfg.wavernn_train
    bs = wc.batch_size
    hop = cfg.audio.hop_size
    seq_len = wc.seq_len_hops * hop
    frames = wc.seq_len_hops + 2 * cfg.wavernn.pad
    arrays = {
        "x": np.zeros((bs, seq_len), np.float32),
        "y": np.zeros((bs, seq_len), np.int32),
        "mels": np.zeros((bs, frames, cfg.audio.num_mels), np.float32),
    }
    t0 = time.time()

    def make_warm():
        # train_step donates its input state: warm steps chain through a
        # sacrificial jitted deep copy, leaving the real state untouched
        return jax.jit(lambda s: jax.tree_util.tree_map(jnp.copy, s))(state)

    try:
        warm = make_warm()
    except Exception as e:  # noqa: BLE001 — pre-warm is best-effort
        log(f"pre-warm skipped (state copy failed: {type(e).__name__}: {e})")
        return
    for attempt in range(2):
        try:
            if spd > 1:
                stacked = jax.tree_util.tree_map(
                    lambda v: np.broadcast_to(v, (spd,) + v.shape).copy(), arrays
                )
                stacked = (shard_stacked_batch(mesh, stacked)
                           if mesh is not None else stacked)
                warm, _ = task.train_step_many(warm, stacked, cfg)
            sharded = shard_batch(mesh, arrays) if mesh is not None else arrays
            warm, _ = task.train_step(warm, sharded, cfg)
            # sync so compile time lands here, not in the first timed step
            # (works through the axon relay, where block_until_ready does not)
            float(np.asarray(warm.step))
            log(f"train-step pre-compile done in {time.time() - t0:.1f}s")
            break
        except Exception as e:  # noqa: BLE001
            what = "retrying" if attempt == 0 else "skipping (lazy compile)"
            log(f"train-step pre-warm failed ({type(e).__name__}: {e}) — {what}")
            if attempt == 0:
                try:
                    warm = make_warm()
                except Exception as e2:  # noqa: BLE001 — never kill the launch
                    log(f"pre-warm aborted (state copy failed: "
                        f"{type(e2).__name__}: {e2})")
                    return
    del warm


def _gen_testset(cfg, params, dataset: VocoderDataset, out_dir, step, log):
    """Held-out listening test (reference gen_testset, dataset.py:18-42):
    fully generate a few test utterances to wav."""
    try:
        n = min(cfg.wavernn_train.gen_at_checkpoint, len(dataset.test_indices))
        for i in range(n):
            _, mel = dataset.example(dataset.test_indices[i])
            wav = W.generate(
                params,
                cfg.wavernn,
                cfg.wavernn_gen,
                mel,
                jax.random.PRNGKey(step + i),
                bits=cfg.audio.bits,
                apply_mu_law=cfg.audio.mu_law,
            )
            kind = "batched" if cfg.wavernn_gen.batched else "unbatched"
            save_wav(
                wav,
                os.path.join(out_dir, f"step{step}_{kind}_sample{i}.wav"),
                cfg.audio.sample_rate,
            )
    except Exception as e:  # listening tests must never kill training
        log(f"gen_testset failed: {e}")


def main() -> None:
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--metadata", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--log-dir", default="logs-wavernn")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--override", default="")
    ap.add_argument("--no-gen", action="store_true")
    ap.add_argument("--native-loader", action="store_true",
                    help="use the C++ prefetch loader (native/vocoder_loader.cc)")
    args = ap.parse_args()

    cfg = default_config()
    if args.override:
        cfg = cfg.override(args.override)
    infolog.init(os.path.join(args.log_dir, "train.log"), "wavernn")
    run_training(
        cfg,
        args.metadata,
        args.data_dir,
        args.log_dir,
        total_steps=args.steps,
        gen_at_checkpoint=not args.no_gen,
        use_native_loader=args.native_loader,
    )


if __name__ == "__main__":
    main()
