"""Tacotron training: state, optimizer, jitted data-parallel train step.

Optimization recipe per reference tacotron.py:255-313: Adam(0.9, 0.999,
1e-6), exponential LR decay from ``decay_start`` clipped to
[final_lr, initial_lr], global-norm-1.0 gradient clipping.  Fine-tune mode
freezes embedding + encoder (reference tacotron.py:167-169).

The step is one jit: forward (teacher-forced scan) + loss + grads + clip +
Adam + BN-stat update.  Under a ``Mesh`` with batches sharded on ``data``,
XLA inserts the gradient psum (GSPMD) — this is the multi-chip story.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models import tacotron as T
from ..utils import precision as P


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def lr_schedule(cfg: Config):
    tc = cfg.tacotron_train

    def lr(step):
        t = jnp.maximum(0.0, step.astype(jnp.float32) - tc.decay_start)
        lr = tc.initial_lr * tc.decay_rate ** (t / tc.decay_steps)
        return jnp.clip(lr, tc.final_lr, tc.initial_lr)

    return lr


def teacher_forcing_schedule(cfg: Config, step):
    """Teacher-forcing ratio at ``step``: constant, or cosine decay from
    init to final ratio (reference helpers.py:153-186)."""
    tc = cfg.tacotron_train
    if tc.teacher_forcing_mode == "constant":
        # return the bare float: decode_teacher_forced's static always_gt
        # fast path (pre/post-scan batched prenet + projections, no per-step
        # uniform draw) keys off a PYTHON number >= 1.0 — a traced array
        # would disable it for every real training step (path equivalence is
        # pinned by test_teacher_forcing_static_ratio_matches_traced)
        return float(tc.teacher_forcing_ratio)
    # one decay floor, reference-style: alpha = final/init when final_ratio
    # is set, else the explicit cosine-decay alpha
    if tc.teacher_forcing_final_ratio is not None:
        alpha = float(tc.teacher_forcing_final_ratio) / float(tc.teacher_forcing_init_ratio)
    else:
        assert tc.teacher_forcing_decay_alpha is not None, (
            "scheduled teacher forcing needs final_ratio or decay_alpha"
        )
        alpha = float(tc.teacher_forcing_decay_alpha)
    t = jnp.clip(
        step.astype(jnp.float32) - tc.teacher_forcing_start_decay,
        0.0,
        float(tc.teacher_forcing_decay_steps),
    )
    frac = t / tc.teacher_forcing_decay_steps
    cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
    decayed = (1.0 - alpha) * cosine + alpha
    return tc.teacher_forcing_init_ratio * decayed


def _frozen_mask(params: Any) -> Any:
    """True for embedding/encoder leaves (the ones fine-tune freezes)."""
    frozen_top = {"embedding", "enc_convs", "enc_lstm_fw", "enc_lstm_bw"}

    def mask_for(top_key, subtree):
        frozen = top_key in frozen_top
        return jax.tree_util.tree_map(lambda _: frozen, subtree)

    return {k: mask_for(k, v) for k, v in params.items()}


def tf1_adam(learning_rate, b1: float, b2: float, eps: float) -> optax.GradientTransformation:
    """Adam with TF-1.x epsilon semantics (tf.train.AdamOptimizer, the
    reference optimizer, tacotron.py:303-306).

    TF1 computes ``update = lr * sqrt(1-b2^t)/(1-b1^t) * m / (sqrt(v)+eps)``
    — epsilon is added to the UNcorrected second-moment root.  optax.adam
    adds it after bias correction (``m_hat/(sqrt(v_hat)+eps)``), which makes
    the effective epsilon ~sqrt(1-b2^t) smaller early in training (~32x at
    step 1 for b2=0.999) and diverges from the reference trajectory.
    """

    def init(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32), mu=zeros(), nu=zeros()
        )

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, grads
        )
        c = count.astype(jnp.float32)
        lr_factor = jnp.sqrt(1.0 - b2**c) / (1.0 - b1**c)
        updates = jax.tree_util.tree_map(
            lambda m, v: lr_factor * m / (jnp.sqrt(v) + eps), mu, nu
        )
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.chain(
        optax.GradientTransformation(init, update),
        optax.scale_by_learning_rate(learning_rate),
    )


def make_optimizer(cfg: Config, params: Any) -> optax.GradientTransformation:
    tc = cfg.tacotron_train
    opt = optax.chain(
        optax.clip_by_global_norm(tc.grad_clip_norm),
        tf1_adam(lr_schedule(cfg), b1=tc.adam_beta1, b2=tc.adam_beta2, eps=tc.adam_eps),
    )
    if tc.fine_tune:
        opt = optax.chain(opt, optax.masked(optax.set_to_zero(), _frozen_mask(params)))
    return opt


def init_state(key, cfg: Config) -> TrainState:
    params = T.init_tacotron(key, cfg.tacotron)
    opt = make_optimizer(cfg, params)
    return TrainState(jnp.zeros((), jnp.int32), params, opt.init(params))


def _use_fused_decoder(cfg: Config, batch, teacher_forcing_ratio) -> bool:
    """Route through the fused Pallas training decoder
    (ops/tacotron_trainer_kernel.py) when the config and shapes qualify.

    "auto" (the default) requires the TPU backend (Mosaic-only lowering)
    AND batch <= fused_auto_max_batch: the VMEM-resident kernel pair beats
    the XLA scan 1.50x at B=8 (12.1 vs 18.2 ms marginal whole-step,
    T_out=512 v5e — the scan's per-step HBM weight restream is
    B-independent, so small batches pay it undiluted) and ties at B=16
    (22.7 vs 23.0); at B>=32 the kernel's sequential 8-row Mosaic groups
    lose (43.6 vs 31.7) and the scan is the right path.  Measured in
    exp_tk_sweep/BASELINE.md (round 4)."""
    mode = cfg.tacotron_train.fused_decoder
    if mode == "off":
        return False
    from ..ops import tacotron_trainer_kernel as TK

    static_ratio = (
        isinstance(teacher_forcing_ratio, (int, float)) and teacher_forcing_ratio >= 1.0
    )
    ok = (
        static_ratio
        and TK.train_supported(cfg.tacotron)
        and TK.train_supported_shape(
            batch["inputs"].shape[0], batch["inputs"].shape[1], cfg.tacotron
        )
    )
    if not ok:
        return False
    if mode == "on":
        return True
    if batch["inputs"].shape[0] > cfg.tacotron_train.fused_auto_max_batch:
        return False
    from ..utils import is_tpu_backend

    return is_tpu_backend()


def loss_fn(params, cfg: Config, batch, rng, train: bool = True, teacher_forcing_ratio=1.0):
    master = params
    if cfg.tacotron_train.mixed_precision:
        # bf16 weights (BN stats + attention stay f32); grads flow back to
        # the f32 master through the cast (utils/precision.py)
        params = P.cast_params(params)
    fused = _use_fused_decoder(cfg, batch, teacher_forcing_ratio)
    out, new_params = T.forward_teacher_forced(
        params,
        cfg.tacotron,
        batch["inputs"],
        batch["input_lengths"],
        batch["mel_targets"],
        train,
        rng,
        teacher_forcing_ratio=teacher_forcing_ratio,
        unroll=cfg.tacotron_train.scan_unroll,
        fused_core=fused,
        fused_wgrads=cfg.tacotron_train.fused_wgrads,
    )
    tc = cfg.tacotron_train
    if tc.mixed_precision:
        # rebuild the f32 master (updated BN stats from the forward, weights
        # from the master) and compute the loss in f32
        new_params = P.merge_master(master, new_params)
        out = P.cast_to_float32(out)
    reg_weight = tc.reg_weight
    if tc.scale_regularization:
        # rescale for the mel output range (reference tacotron.py:237-241)
        m = cfg.audio.max_abs_value
        reg_weight *= 1.0 / (2.0 * m) if cfg.audio.symmetric_mels else 1.0 / m
    loss, aux = T.tacotron_loss(
        out,
        batch["mel_targets"],
        batch["stop_targets"],
        batch["target_lengths"],
        # L2 reg over f32 weights: in mixed mode the merged master tree (its
        # weight leaves ARE the master tensors, so the reg grads attach there)
        new_params if tc.mixed_precision else params,
        cfg.tacotron,
        reg_weight=reg_weight,
        mask_decoder=tc.mask_decoder,
        stop_pos_weight=tc.stop_pos_weight,
        linear_targets=batch.get("linear_targets"),
        sample_rate=cfg.audio.sample_rate,
        loss_frames=batch.get("loss_frames"),
    )
    return loss, (aux, new_params, out)


def _train_step_core(state: TrainState, batch, rng, cfg: Config):
    """One optimization step; returns (new_state, metrics)."""
    tf_ratio = teacher_forcing_schedule(cfg, state.step)
    (loss, (aux, new_params, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, cfg, batch, rng, True, tf_ratio
    )
    opt = make_optimizer(cfg, state.params)
    updates, opt_state = opt.update(grads, state.opt_state, new_params)
    # apply updates to new_params so BN running stats advance too (their
    # grads are zero, so Adam leaves them untouched)
    params = optax.apply_updates(new_params, updates)
    gnorm = optax.global_norm(grads)
    metrics = dict(aux, grad_norm=gnorm, lr=lr_schedule(cfg)(state.step))
    return TrainState(state.step + 1, params, opt_state), metrics


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_step(state: TrainState, batch, rng, cfg: Config):
    """One optimization step; returns (new_state, metrics)."""
    return _train_step_core(state, batch, rng, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_step_many(state: TrainState, batches, rng, cfg: Config):
    """K optimization steps fused into ONE device dispatch.

    ``batches`` is the ``train_step`` batch pytree with a leading [K] axis
    (all K sub-batches must share static shapes — the driver groups
    same-bucket batches, train/tacotron_train.py).  A ``lax.scan`` runs the
    K steps back-to-back on device, so the host pays one dispatch + one
    metrics transfer per K steps instead of per step.  On the axon tunnel
    that removes a ~32 ms RTT per step; on real pods it keeps the device
    busy during what would be host-loop time.  Returns (new_state,
    metrics stacked [K]) — the driver still applies its loss-explosion
    guard to every sub-step value.
    """

    def body(st, xs):
        batch, i = xs
        return _train_step_core(st, batch, jax.random.fold_in(rng, i), cfg)

    K = jax.tree_util.tree_leaves(batches)[0].shape[0]
    return jax.lax.scan(body, state, (batches, jnp.arange(K)))


@functools.partial(jax.jit, static_argnames=("cfg",))
def eval_step(params, batch, rng, cfg: Config):
    """Teacher-forced eval: loss + predicted mels/alignments for artifacts."""
    loss, (aux, _, out) = loss_fn(params, cfg, batch, rng, train=False)
    return aux, out
