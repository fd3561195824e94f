"""WaveRNN training: state, optimizer, jitted data-parallel train step.

Recipe per reference wavernn_train.py:20-153: Adam(lr 1e-4), cross-entropy
over mu-law classes, global-norm gradient clipping at 4.0.  The step count
travels with the train state (the reference stores it as a model buffer,
fatchord_version.py:125, so it survives checkpointing — here the whole
TrainState is the checkpoint unit).

Under a ``Mesh`` with batches sharded on ``data`` the gradient psum is
inserted by GSPMD — the honest version of the reference's unreachable
``data_parallel_workaround`` (wavernn/utils/__init__.py:19-36).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models import wavernn as W
from ..utils import precision as P


class WaveRNNTrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    wc = cfg.wavernn_train
    return optax.chain(
        optax.clip_by_global_norm(wc.grad_clip_norm),
        optax.adam(wc.lr),
    )


def init_state(key, cfg: Config) -> WaveRNNTrainState:
    params = W.init_wavernn(key, cfg.wavernn, num_mels=cfg.audio.num_mels, bits=cfg.audio.bits)
    opt = make_optimizer(cfg)
    return WaveRNNTrainState(jnp.zeros((), jnp.int32), params, opt.init(params))


def loss_fn(params, cfg: Config, batch, train: bool = True):
    master = params
    if cfg.wavernn_train.mixed_precision:
        # bf16 weights, f32 master/activations/loss (utils/precision.py)
        params = P.cast_params(params)
    logits, new_params = W.forward(params, cfg.wavernn, batch["x"], batch["mels"], train)
    if cfg.wavernn_train.mixed_precision:
        new_params = P.merge_master(master, new_params)
        logits = logits.astype(jnp.float32)
    loss = W.wavernn_loss(logits, batch["y"], mode=cfg.wavernn.mode, bits=cfg.audio.bits)
    return loss, (new_params, logits)


def _train_step_core(state: WaveRNNTrainState, batch, cfg: Config):
    (loss, (new_params, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, cfg, batch, True
    )
    opt = make_optimizer(cfg)
    updates, opt_state = opt.update(grads, state.opt_state, new_params)
    # updates apply to new_params so BN running stats advance alongside Adam
    params = optax.apply_updates(new_params, updates)
    gnorm = optax.global_norm(grads)
    metrics = {"loss": loss, "grad_norm": gnorm}
    return WaveRNNTrainState(state.step + 1, params, opt_state), metrics


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_step(state: WaveRNNTrainState, batch, cfg: Config):
    return _train_step_core(state, batch, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_step_many(state: WaveRNNTrainState, batches, cfg: Config):
    """K steps fused into ONE dispatch (see tacotron_task.train_step_many).

    WaveRNN windows are fixed-size (seq_len = hop * seq_len_hops), so any K
    consecutive loader batches stack directly; metrics come back [K]."""

    def body(st, batch):
        return _train_step_core(st, batch, cfg)

    return jax.lax.scan(body, state, batches)


@functools.partial(jax.jit, static_argnames=("cfg",))
def eval_step(params, batch, cfg: Config):
    loss, _ = loss_fn(params, cfg, batch, train=False)
    return {"loss": loss}
