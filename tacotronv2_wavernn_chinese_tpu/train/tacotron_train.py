"""Tacotron training loop + CLI.

Mirrors the reference driver's operational guards (tacotron/train.py:80-238):
loss-explosion/NaN abort, restore-or-init from the latest checkpoint, rolling
time/loss windows, and per-checkpoint eval artifacts (Griffin-Lim wav +
alignment/mel PNGs) — with the render running on-device instead of 60 numpy
G&L iterations on the host.

Usage:
    python -m tacotronv2_wavernn_chinese_tpu.train.tacotron_train \
        --metadata training_data/train.txt --mel-dir training_data \
        --log-dir logs-tacotron [--steps N] [--override a.b=c,...]
"""

from __future__ import annotations

import argparse
import contextlib
import os
import time

import jax
import numpy as np

from ..config import Config, default_config
from ..data.loader import TacotronDataset
from ..data.preprocess import read_metadata
from ..dsp.griffin_lim import inv_mel_spectrogram
from ..dsp.spectrogram import MelPipeline
from ..dsp.wav import save_wav
from ..parallel.mesh import make_mesh, replicate_tree, shard_batch, shard_stacked_batch
from ..utils import logging as infolog
from ..utils.checkpoints import CheckpointManager
from ..utils.metrics import MetricsWriter, Profiler
from ..utils.plot import plot_alignment, plot_spectrogram
from . import tacotron_task as task
from .grouping import fused_groups


class LossExplosion(Exception):
    pass


def _batch_arrays(batch):
    return {
        "inputs": batch.inputs,
        "input_lengths": batch.input_lengths,
        "mel_targets": batch.mel_targets,
        "stop_targets": batch.stop_targets,
        "target_lengths": batch.target_lengths,
        "loss_frames": batch.loss_frames,
    }


def batch_to_device(batch, mesh):
    arrays = _batch_arrays(batch)
    return shard_batch(mesh, arrays) if mesh is not None else arrays


def stacked_to_device(group, mesh):
    """Stack K same-shape batches into [K, B, ...] for train_step_many."""
    trees = [_batch_arrays(b) for b in group]
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)
    return shard_stacked_batch(mesh, stacked) if mesh is not None else stacked


def run_training(
    cfg: Config,
    metadata_path: str,
    mel_dir: str,
    log_dir: str,
    total_steps: int | None = None,
    use_mesh: bool = True,
    render_eval: bool = True,
    profile_dir: str | None = None,
    log=infolog.log,
) -> task.TrainState:
    tc = cfg.tacotron_train
    total_steps = total_steps or tc.train_steps
    os.makedirs(log_dir, exist_ok=True)
    ckpt_dir = os.path.join(log_dir, "taco_pretrained")
    eval_dir = os.path.join(log_dir, "eval")
    os.makedirs(eval_dir, exist_ok=True)
    metrics_writer = MetricsWriter(log_dir)
    profiler = Profiler(profile_dir)

    dataset = TacotronDataset(read_metadata(metadata_path), mel_dir, cfg)
    pad_stats = dataset.padding_stats([tc.data_seed])
    if pad_stats.get("n_batches"):
        log(f"bucket padding waste (epoch 0): mel {pad_stats['frac_pad_mel']:.1%}"
            f" of frames ({pad_stats['frac_pad_mel_bucket']:.1%} from shape"
            f" multiples), inputs {pad_stats['frac_pad_inputs']:.1%}")
    mesh = make_mesh() if use_mesh else None
    pipe = MelPipeline(cfg.audio)

    state = task.init_state(jax.random.PRNGKey(tc.shuffle_seed), cfg)
    mgr = CheckpointManager(ckpt_dir, max_to_keep=tc.max_checkpoints_to_keep)
    restored = mgr.restore(state)
    if restored is not None:
        state = restored
        log(f"restored checkpoint at step {int(state.step)}")
    if mesh is not None:
        state = replicate_tree(mesh, state)

    rng = jax.random.PRNGKey(tc.shuffle_seed + 1)
    time_win, loss_win = infolog.ValueWindow(100), infolog.ValueWindow(100)
    step = int(state.step)
    epoch = 0
    spd = max(1, int(tc.steps_per_dispatch))
    ctx = mesh if mesh is not None else contextlib.nullcontext()

    def dispatch(group):
        """Run len(group) steps — ONE fused device dispatch when K>1 —
        then apply the per-step guards/logging to every sub-step."""
        nonlocal state, step
        t0 = time.time()
        k = len(group)
        if k == 1:
            arrays = batch_to_device(group[0], mesh)
            state, metrics = task.train_step(
                state, arrays, jax.random.fold_in(rng, step), cfg
            )
            mhost = {kk: np.asarray(v)[None] for kk, v in jax.device_get(metrics).items()}
        else:
            arrays = stacked_to_device(group, mesh)
            state, metrics = task.train_step_many(
                state, arrays, jax.random.fold_in(rng, step), cfg
            )
            mhost = {kk: np.asarray(v) for kk, v in jax.device_get(metrics).items()}
        dt = (time.time() - t0) / k
        ckpt_due = False
        for i in range(k):
            sub = step + i + 1
            loss = float(mhost["loss"][i])
            time_win.append(dt)
            loss_win.append(loss)
            profiler.step(sub)
            if np.isnan(loss) or loss > tc.loss_explosion_threshold:
                log(f"Loss exploded to {loss:.5f} at step {sub}")
                raise LossExplosion("loss exploded, aborting")
            if sub % tc.summary_interval == 0 or sub < 5:
                metrics_writer.write(sub, {kk: v[i] for kk, v in mhost.items()})
            if sub % 10 == 0 or sub < 10:
                log(
                    f"Step {sub:7d} [{time_win.average:.3f} sec/step, "
                    f"loss={loss:.5f}, avg_loss={loss_win.average:.5f}, "
                    f"lr={float(mhost['lr'][i]):.2e}]"
                )
            if sub % tc.checkpoint_interval == 0:
                ckpt_due = True
        step = int(state.step)
        if ckpt_due:
            # with K>1 the save lands at the end of the fused group — at most
            # K-1 steps past the exact boundary (exact when spd == 1)
            mgr.save(step, jax.device_get(state))
            log(f"saved checkpoint at step {step}")
            if render_eval:
                arrays1 = batch_to_device(group[-1], mesh)
                _render_eval(cfg, state.params, group[-1], arrays1, pipe, eval_dir, step, log)
                _dump_embedding(state.params, eval_dir, log)

    with ctx:
        if tc.precompile_buckets and step < total_steps:
            # same end-of-run gate as the wavernn prewarm: the fused K-step
            # variant can't execute when fewer than K steps remain
            warm_spd = spd if total_steps - step >= spd else 1
            _prewarm_bucket_shapes(
                cfg, dataset, state, mesh, warm_spd, total_steps, step, log
            )
        while step < total_steps:
            stream = dataset.batches(epoch_seed=tc.data_seed + epoch)
            step_at_epoch_start = step
            for group in fused_groups(
                stream, spd, lambda: step, total_steps,
                key_fn=lambda b: (b.inputs.shape, b.mel_targets.shape),
            ):
                dispatch(group)
            if step == step_at_epoch_start:
                # zero batches this epoch (fewer utterances than batch_size
                # with drop_remainder): fail loudly instead of spinning
                raise ValueError(
                    f"epoch produced no batches: {len(dataset.rows)} utterances"
                    f" < batch_size {tc.batch_size} (lower tacotron_train.batch_size)"
                )
            epoch += 1
    mgr.save(step, jax.device_get(state))
    mgr.close()
    metrics_writer.close()
    profiler.close()
    return state


def _prewarm_bucket_shapes(cfg, dataset, state, mesh, spd, total_steps, start_step, log):
    """Compile every bucketed batch shape BEFORE the first real step.

    Replays the epoch shuffle+bucket logic from metadata lengths alone
    (``TacotronDataset.batch_shapes``) to enumerate the exact (T_in, T_out)
    set the planned epochs will produce, then executes one throwaway
    train_step per shape on a COPY of the state with zero batches — the jit
    dispatch cache (and the persistent compile cache, for restarts) then
    already hold every program, so steady-state step time has no
    multi-second compile tail (round-3 endurance: p95 2.32 s vs p50
    0.156 s from exactly this churn; the reference's cadence is flat,
    tacotron/train.py:177)."""
    import jax.numpy as jnp

    tc = cfg.tacotron_train
    bs = tc.batch_size
    n_batches = len(dataset.train_indices) // bs
    if n_batches == 0:
        return
    # enumerate the epochs this run will actually execute (capped: the
    # shape set saturates after a few shuffles)
    n_epochs = min(-(-max(total_steps - start_step, 1) // n_batches), 64)
    shapes = dataset.batch_shapes([tc.data_seed + e for e in range(n_epochs)])
    log(f"pre-compiling {len(shapes)} bucket shapes "
        f"(epochs planned: {n_epochs}, {n_batches} batches/epoch)")
    t0 = time.time()
    # one jitted deep copy: train_step donates its input state, so the warm
    # steps chain through a sacrificial copy and the real state is untouched
    def make_warm():
        return jax.jit(lambda s: jax.tree_util.tree_map(jnp.copy, s))(state)

    try:
        warm = make_warm()
    except Exception as e:  # noqa: BLE001 — a pre-warm failure must never
        # kill the launch, and even the copy is a device call that can die
        # on a persistent tunnel fault: bail to lazy compiles
        log(f"bucket pre-warm skipped (state copy failed: {type(e).__name__}: {e})")
        return
    rng = jax.random.PRNGKey(0)
    M = 80
    for n, (max_in, max_out) in enumerate(shapes):
        arrays = {
            "inputs": np.zeros((bs, max_in), np.int32),
            "input_lengths": np.full((bs,), max_in, np.int32),
            "mel_targets": np.zeros((bs, max_out, M), np.float32),
            "stop_targets": np.ones((bs, max_out), np.float32),
            "target_lengths": np.full((bs,), max_out, np.int32),
            "loss_frames": np.full((bs,), max_out, np.int32),
        }
        t1 = time.time()
        # the remote compile helper can crash transiently on big programs
        # ("response body closed" / helper subprocess exit); a pre-warm
        # failure must never kill the run — retry once, then skip the shape
        # (it just compiles lazily when training first meets it)
        for attempt in range(2):
            try:
                if spd > 1:
                    stacked = jax.tree_util.tree_map(
                        lambda x: np.broadcast_to(x, (spd,) + x.shape).copy(), arrays
                    )
                    stacked = (shard_stacked_batch(mesh, stacked)
                               if mesh is not None else stacked)
                    warm, _ = task.train_step_many(warm, stacked, rng, cfg)
                # the single-step variant runs regardless (spd==1 always; K>1
                # runs it for epoch-tail groups), so it is always warmed
                sharded = shard_batch(mesh, arrays) if mesh is not None else arrays
                warm, _ = task.train_step(warm, sharded, rng, cfg)
                # sync so compile/launch time is attributed per shape in the
                # log (works through the axon relay, where block_until_ready
                # does not)
                float(np.asarray(warm.step))
                log(f"  shape ({bs}, {max_in})x({bs}, {max_out}, {M}) "
                    f"[{n + 1}/{len(shapes)}] {time.time() - t1:.1f}s")
                break
            except Exception as e:  # noqa: BLE001 — pre-warm is best-effort
                what = "retrying" if attempt == 0 else "skipping (lazy compile)"
                log(f"  shape ({bs}, {max_in})x({bs}, {max_out}, {M}) "
                    f"pre-warm failed ({type(e).__name__}: {e}) — {what}")
                # train_step donates its input: after a failed call the warm
                # state may hold invalidated buffers, so rebuild the copy —
                # itself a device call; if THAT fails the fault is persistent
                # and the whole pre-warm bails out (lazy compiles) rather
                # than letting the exception escape and abort training
                try:
                    warm = make_warm()
                except Exception as e2:  # noqa: BLE001
                    log(f"bucket pre-warm aborted (state copy failed: "
                        f"{type(e2).__name__}: {e2})")
                    return
    del warm
    log(f"bucket pre-compile done in {time.time() - t0:.1f}s")


def _render_eval(cfg, params, batch, arrays, pipe, eval_dir, step, log):
    """Griffin-Lim wav + alignment/mel PNGs from training sample 0
    (reference tacotron/train.py:189-218)."""
    try:
        aux, out = task.eval_step(params, arrays, jax.random.PRNGKey(0), cfg)
        T = int(batch.target_lengths[0])
        mel = np.asarray(out.mel_outputs[0])[:T]
        align = np.asarray(out.alignments[0])[:T]
        wav = np.asarray(inv_mel_spectrogram(mel, pipe))
        save_wav(wav, os.path.join(eval_dir, f"step-{step}-wave-from-mel.wav"), cfg.audio.sample_rate)
        plot_alignment(align, os.path.join(eval_dir, f"step-{step}-align.png"),
                       title=f"step {step}, eval loss {float(aux['loss']):.4f}")
        plot_spectrogram(mel, os.path.join(eval_dir, f"step-{step}-mel.png"),
                         target=np.asarray(batch.mel_targets[0])[:T])
    except Exception as e:  # eval artifacts must never kill training
        log(f"eval render failed: {e}")


def _dump_embedding(params, eval_dir, log):
    """Character-embedding projector TSVs (reference train.py:26-39)."""
    try:
        from ..frontend import default_symbols
        from ..utils.metrics import dump_embedding_projector

        dump_embedding_projector(
            params["embedding"], list(default_symbols().symbols), eval_dir
        )
    except Exception as e:
        log(f"embedding dump failed: {e}")


def main() -> None:
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--metadata", required=True)
    ap.add_argument("--mel-dir", required=True)
    ap.add_argument("--log-dir", default="logs-tacotron")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--override", default="", help="comma-separated a.b=c overrides")
    ap.add_argument("--no-render", action="store_true")
    ap.add_argument("--profile-dir", default=None,
                    help="capture a jax.profiler trace of steps 10-15 here")
    ap.add_argument("--fine-tune", action="store_true",
                    help="speaker adaptation: freeze embedding + encoder "
                         "(reference tacotron.py:167-169)")
    args = ap.parse_args()

    cfg = default_config()
    if args.override:
        cfg = cfg.override(args.override)
    if args.fine_tune:
        cfg = cfg.override("tacotron_train.fine_tune=true")
    infolog.init(os.path.join(args.log_dir, "train.log"), "tacotron")
    infolog.log(cfg.debug_string())
    run_training(
        cfg,
        args.metadata,
        args.mel_dir,
        args.log_dir,
        total_steps=args.steps,
        render_eval=not args.no_render,
        profile_dir=args.profile_dir,
    )


if __name__ == "__main__":
    main()
