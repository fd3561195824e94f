"""Fused multi-step training dispatch (train_step_many).

One device dispatch runs K optimizer steps via lax.scan — the TPU-native
replacement for the reference's per-step sess.run host loop
(tacotron/train.py:170-183).  These tests pin the semantics: a fused K-step
dispatch produces the same states/metrics as K sequential core steps.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from conftest import make_tiny_cfg as tiny_cfg
from tacotronv2_wavernn_chinese_tpu.train import tacotron_task, wavernn_task



def _taco_batches(K=3, B=2, T_in=10, T_out=20):
    rng = np.random.RandomState(0)
    return {
        "inputs": jnp.asarray(rng.randint(1, 50, size=(K, B, T_in)), jnp.int32),
        "input_lengths": jnp.full((K, B), T_in, jnp.int32),
        "mel_targets": jnp.asarray(rng.randn(K, B, T_out, 80).astype(np.float32) * 0.5),
        "stop_targets": jnp.zeros((K, B, T_out), jnp.float32),
        "target_lengths": jnp.full((K, B), T_out, jnp.int32),
    }


def test_tacotron_fused_matches_sequential():
    cfg = tiny_cfg()
    key = jax.random.PRNGKey(0)
    batches = _taco_batches()
    K = 3

    s_seq = tacotron_task.init_state(key, cfg)
    seq_losses = []
    for i in range(K):
        batch = jax.tree_util.tree_map(lambda x: x[i], batches)
        s_seq, m = tacotron_task._train_step_core(
            s_seq, batch, jax.random.fold_in(key, i), cfg
        )
        seq_losses.append(float(m["loss"]))

    s_fused = tacotron_task.init_state(key, cfg)
    s_fused, metrics = tacotron_task.train_step_many(s_fused, batches, key, cfg)

    assert int(s_fused.step) == K
    np.testing.assert_allclose(
        np.asarray(metrics["loss"]), np.asarray(seq_losses), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_fused.params), jax.tree_util.tree_leaves(s_seq.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_wavernn_fused_matches_sequential():
    cfg = tiny_cfg()
    key = jax.random.PRNGKey(1)
    rng = np.random.RandomState(1)
    K, B, frames = 3, 2, 3
    hop = cfg.wavernn.total_upsample
    batches = {
        "x": jnp.asarray(rng.rand(K, B, frames * hop).astype(np.float32) * 2 - 1),
        "y": jnp.asarray(
            rng.randint(0, 2**cfg.audio.bits, size=(K, B, frames * hop)), jnp.int32
        ),
        "mels": jnp.asarray(
            rng.rand(K, B, frames + 2 * cfg.wavernn.pad, 80).astype(np.float32)
        ),
    }

    s_seq = wavernn_task.init_state(key, cfg)
    seq_losses = []
    for i in range(K):
        batch = jax.tree_util.tree_map(lambda x: x[i], batches)
        s_seq, m = wavernn_task._train_step_core(s_seq, batch, cfg)
        seq_losses.append(float(m["loss"]))

    s_fused = wavernn_task.init_state(key, cfg)
    s_fused, metrics = wavernn_task.train_step_many(s_fused, batches, cfg)

    assert int(s_fused.step) == K
    np.testing.assert_allclose(
        np.asarray(metrics["loss"]), np.asarray(seq_losses), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_fused.params), jax.tree_util.tree_leaves(s_seq.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_fused_works_with_mixed_precision():
    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        tacotron_train=dataclasses.replace(
            cfg.tacotron_train, mixed_precision=True, steps_per_dispatch=3
        ),
    )
    key = jax.random.PRNGKey(2)
    state = tacotron_task.init_state(key, cfg)
    state, metrics = tacotron_task.train_step_many(state, _taco_batches(), key, cfg)
    assert int(state.step) == 3
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert all(
        x.dtype == jnp.float32 for x in jax.tree_util.tree_leaves(state.params)
    )


def test_fused_on_data_parallel_mesh():
    """train_step_many under a mesh: steps replicated, batch dim sharded."""
    from tacotronv2_wavernn_chinese_tpu.parallel.mesh import (
        make_mesh,
        replicate_tree,
        shard_stacked_batch,
    )

    cfg = tiny_cfg()
    key = jax.random.PRNGKey(3)
    mesh = make_mesh(jax.devices()[:4])
    batches = _taco_batches(K=2, B=4)
    with mesh:
        state = replicate_tree(mesh, tacotron_task.init_state(key, cfg))
        sharded = shard_stacked_batch(mesh, batches)
        state, metrics = tacotron_task.train_step_many(state, sharded, key, cfg)
    assert int(state.step) == 2
    assert np.isfinite(np.asarray(metrics["loss"])).all()
