"""Mixed-precision (bf16 weights / f32 master) training for both models.

The reference trains f32-only (TF 1.14 defaults; torch CPU,
wavernn_train.py:46).  Our ``mixed_precision`` flag is a TPU-native
addition (utils/precision.py): these tests pin the policy — which leaves
get cast, that masters stay f32 through a step, and that the mixed-mode
loss/grads track the f32 trajectory closely.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from conftest import make_tiny_cfg as tiny_cfg
from tacotronv2_wavernn_chinese_tpu.models import tacotron as T
from tacotronv2_wavernn_chinese_tpu.models import wavernn as W
from tacotronv2_wavernn_chinese_tpu.train import tacotron_task, wavernn_task
from tacotronv2_wavernn_chinese_tpu.utils import precision as P



def _tacotron_batch(B=2, T_in=12, T_out=24):
    rng = np.random.RandomState(0)
    return {
        "inputs": jnp.asarray(rng.randint(1, 50, size=(B, T_in)), jnp.int32),
        "input_lengths": jnp.asarray([T_in, T_in - 3], jnp.int32),
        "mel_targets": jnp.asarray(rng.randn(B, T_out, 80) * 0.5, jnp.float32),
        "stop_targets": jnp.zeros((B, T_out), jnp.float32),
        "target_lengths": jnp.asarray([T_out, T_out - 4], jnp.int32),
    }


def _wavernn_batch(cfg, B=2, frames=3):
    rng = np.random.RandomState(1)
    hop = cfg.wavernn.total_upsample
    return {
        "x": jnp.asarray(rng.rand(B, frames * hop) * 2 - 1, jnp.float32),
        "y": jnp.asarray(rng.randint(0, 2**cfg.audio.bits, size=(B, frames * hop)), jnp.int32),
        "mels": jnp.asarray(rng.rand(B, frames + 2 * cfg.wavernn.pad, 80), jnp.float32),
    }


def _leaf_dtypes(tree):
    return [x.dtype for x in jax.tree_util.tree_leaves(tree)]


def test_cast_params_policy():
    """BN subtrees and the attention tree stay f32; everything else bf16."""
    cfg = tiny_cfg()
    params = T.init_tacotron(jax.random.PRNGKey(0), cfg.tacotron)
    cast = P.cast_params(params)
    # attention untouched (object identity — not even copied)
    assert cast["attention"] is params["attention"]
    for lp in cast["enc_convs"]["layers"]:
        assert lp["conv"]["w"].dtype == jnp.bfloat16
        assert all(d == jnp.float32 for d in _leaf_dtypes(lp["bn"]))
    assert cast["dec_lstm1"]["w"].dtype == jnp.bfloat16
    assert cast["embedding"].dtype == jnp.bfloat16

    wparams = W.init_wavernn(jax.random.PRNGKey(1), cfg.wavernn, 80, cfg.audio.bits)
    wcast = P.cast_params(wparams)
    assert wcast["gru1"]["wi"].dtype == jnp.bfloat16
    assert all(d == jnp.float32 for d in _leaf_dtypes(wcast["resnet"]["bn_in"]))
    assert all(d == jnp.float32 for d in _leaf_dtypes(wcast["resnet"]["blocks"][0]["bn1"]))


def test_merge_master_exact_weights():
    """Master weights never round-trip through bf16; BN stats come back."""
    cfg = tiny_cfg()
    master = T.init_tacotron(jax.random.PRNGKey(0), cfg.tacotron)
    computed = P.cast_params(master)
    # simulate a forward's BN-stat update
    bn = computed["enc_convs"]["layers"][0]["bn"]
    computed["enc_convs"]["layers"][0]["bn"] = dict(bn, mean=bn["mean"] + 1.0)
    merged = P.merge_master(master, computed)
    np.testing.assert_array_equal(
        np.asarray(merged["dec_lstm1"]["w"]), np.asarray(master["dec_lstm1"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(merged["enc_convs"]["layers"][0]["bn"]["mean"]),
        np.asarray(master["enc_convs"]["layers"][0]["bn"]["mean"]) + 1.0,
    )
    assert all(d == jnp.float32 for d in _leaf_dtypes(merged))


def test_tacotron_mixed_step_tracks_f32():
    key = jax.random.PRNGKey(42)
    batch = _tacotron_batch()

    cfg32 = tiny_cfg(mixed_precision=False)
    cfg16 = tiny_cfg(mixed_precision=True)
    s32 = tacotron_task.init_state(key, cfg32)
    s16 = tacotron_task.init_state(key, cfg16)

    for _ in range(3):
        s32, m32 = tacotron_task.train_step(s32, batch, key, cfg32)
        s16, m16 = tacotron_task.train_step(s16, batch, key, cfg16)

    # masters stay f32 and the step count advanced
    assert all(d == jnp.float32 for d in _leaf_dtypes(s16.params))
    assert int(s16.step) == 3
    l32, l16 = float(m32["loss"]), float(m16["loss"])
    assert np.isfinite(l16)
    # same data, same rng: bf16 weights should track the f32 trajectory
    assert abs(l16 - l32) / abs(l32) < 0.05, (l16, l32)
    assert float(m16["grad_norm"]) > 0.0 and np.isfinite(float(m16["grad_norm"]))
    # BN running stats actually moved off their init
    bn = s16.params["enc_convs"]["layers"][0]["bn"]
    assert float(jnp.abs(bn["mean"]).max()) > 0.0


def test_wavernn_mixed_step_tracks_f32():
    key = jax.random.PRNGKey(7)
    cfg32 = tiny_cfg(mixed_precision=False)
    cfg16 = tiny_cfg(mixed_precision=True)
    batch = _wavernn_batch(cfg32)

    s32 = wavernn_task.init_state(key, cfg32)
    s16 = wavernn_task.init_state(key, cfg16)
    for _ in range(3):
        s32, m32 = wavernn_task.train_step(s32, batch, cfg32)
        s16, m16 = wavernn_task.train_step(s16, batch, cfg16)

    assert all(d == jnp.float32 for d in _leaf_dtypes(s16.params))
    l32, l16 = float(m32["loss"]), float(m16["loss"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / abs(l32) < 0.05, (l16, l32)


def test_mixed_grads_cover_all_leaves():
    """Every master leaf (except non-trainable BN stats) gets a gradient."""
    cfg = tiny_cfg(mixed_precision=True)
    key = jax.random.PRNGKey(3)
    batch = _tacotron_batch()
    params = T.init_tacotron(key, cfg.tacotron)
    grads = jax.grad(
        lambda p: tacotron_task.loss_fn(p, cfg, batch, key, True, 1.0)[0]
    )(params)
    assert all(d == jnp.float32 for d in _leaf_dtypes(grads))
    # attention (kept f32) still trains
    gmax = float(jnp.abs(grads["attention"]["memory_layer"]["w"]).max())
    assert gmax > 0.0
    # a cast weight (bf16 in compute) still gets a master-f32 grad
    assert float(jnp.abs(grads["dec_lstm1"]["w"]).max()) > 0.0
