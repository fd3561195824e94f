"""DP x TP sharding of WaveRNN training (parallel/tp.py) on the virtual mesh.

Annotation-driven GSPMD: fc3 / GRU / fc kernels column-shard over 'model',
batch shards over 'data', and the UNCHANGED train_step must produce the
same loss as a single-device step, with TP placements surviving the donated
state update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from conftest import make_tiny_cfg

from tacotronv2_wavernn_chinese_tpu.parallel import tp
from tacotronv2_wavernn_chinese_tpu.parallel.mesh import shard_batch
from tacotronv2_wavernn_chinese_tpu.train import wavernn_task as WT


def _batch(cfg, B=8):
    sf, hop = 3, cfg.wavernn.total_upsample
    r = np.random.RandomState(0)
    return {
        "x": jnp.asarray(r.uniform(-1, 1, (B, sf * hop)).astype(np.float32)),
        "y": jnp.asarray(r.randint(0, 2 ** cfg.audio.bits, (B, sf * hop)), jnp.int32),
        "mels": jnp.asarray(
            r.rand(B, sf + 2 * cfg.wavernn.pad, 80).astype(np.float32)
        ),
    }


def test_tp_divisibility_gate():
    cfg = make_tiny_cfg()
    assert tp.tp_divisible(cfg, 2)
    assert tp.tp_divisible(cfg, 4)
    import dataclasses

    odd = dataclasses.replace(
        cfg, wavernn=dataclasses.replace(cfg.wavernn, rnn_dims=30)
    )
    assert not tp.tp_divisible(odd, 4)


def test_dp_tp_train_step_matches_single_device():
    cfg = make_tiny_cfg()
    key = jax.random.PRNGKey(0)
    batch = _batch(cfg)

    _, m0 = WT.train_step(WT.init_state(key, cfg), batch, cfg)
    loss0 = float(m0["loss"])

    mesh = tp.make_mesh_2d(jax.devices(), dp=4, tp=2)
    with mesh:
        state = tp.place_wavernn_state(mesh, WT.init_state(key, cfg))
        assert state.params["fc3"]["w"].sharding.spec == jax.sharding.PartitionSpec(
            None, "model"
        )
        sb = shard_batch(mesh, batch)
        state, m = WT.train_step(state, sb, cfg)
        # TP placement survives the donated update (no silent re-replication)
        assert state.params["fc3"]["w"].sharding.spec == jax.sharding.PartitionSpec(
            None, "model"
        )
        assert state.params["gru1"]["wi"].sharding.spec[-1] == "model"
    assert abs(float(m["loss"]) - loss0) < 1e-4 * max(1.0, abs(loss0))


def test_tp_two_steps_stay_consistent():
    """Optimizer moments shard like their params, so a second step runs
    without resharding churn and keeps matching the unsharded run."""
    cfg = make_tiny_cfg()
    key = jax.random.PRNGKey(1)
    batch = _batch(cfg)

    s0 = WT.init_state(key, cfg)
    s0, _ = WT.train_step(s0, batch, cfg)
    s0, m0 = WT.train_step(s0, batch, cfg)

    mesh = tp.make_mesh_2d(jax.devices(), dp=2, tp=4)
    with mesh:
        s = tp.place_wavernn_state(mesh, WT.init_state(key, cfg))
        sb = shard_batch(mesh, batch)
        s, _ = WT.train_step(s, sb, cfg)
        s, m = WT.train_step(s, sb, cfg)
    np.testing.assert_allclose(float(m["loss"]), float(m0["loss"]), rtol=2e-4)
