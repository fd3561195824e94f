"""Focused trainer-kernel timing: MARGINAL whole-step cost via fused K-step
dispatch (kills the ~25-32 ms axon dispatch RTT that pollutes single-call
numbers), for the XLA scan vs the fused accum kernel pair; plus the
standalone accum backward.

Usage: python -m tools.exp_tk_focus
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.utils.compile_cache import enable_compile_cache
from tools.benchlib import sync, timed






def main():
    enable_compile_cache()
    from tacotronv2_wavernn_chinese_tpu.train import tacotron_task as TT

    cfg0 = default_config()
    key = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))
    B, T_in, T_out = 32, 64, 512
    batch = {
        "inputs": jnp.ones((B, T_in), jnp.int32),
        "input_lengths": jnp.full((B,), T_in, jnp.int32),
        "mel_targets": jnp.zeros((B, T_out, 80), jnp.float32),
        "stop_targets": jnp.ones((B, T_out), jnp.float32),
        "target_lengths": jnp.full((B,), T_out, jnp.int32),
    }
    rows = []

    def emit(**row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    for mode, wg in (("off", "-"), ("on", "accum"), ("on", "stream")):
        cfg = cfg0.override(
            "tacotron_train.fused_decoder=%s" % mode
            + (",tacotron_train.fused_wgrads=%s" % wg if wg != "-" else "")
        )
        state = TT.init_state(jax.random.PRNGKey(0), cfg)
        marg = {}
        box = [state]
        try:
            for K in (2, 6):
                stacked = jax.tree_util.tree_map(
                    lambda x: jnp.broadcast_to(x, (K,) + x.shape) * 1.0
                    if x.dtype == jnp.float32
                    else jnp.broadcast_to(x, (K,) + x.shape),
                    batch,
                )

                def once(k, stacked=stacked):
                    s2, m = TT.train_step_many(box[0], stacked, k, cfg)
                    box[0] = s2
                    return m["loss"]

                marg[K] = timed(once, key)
        except Exception as e:
            emit(exp="whole_step_marginal", fused=mode, wgrads=wg, error=str(e)[:160])
            continue
        per_step = (marg[6] - marg[2]) / 4
        emit(exp="whole_step_marginal", fused=mode, wgrads=wg, batch=B,
             ms_per_step=round(1000 * per_step, 2),
             ms_k2=round(1000 * marg[2], 2), ms_k6=round(1000 * marg[6], 2))

    with open("exp_tk_focus.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("# wrote exp_tk_focus.json", flush=True)


if __name__ == "__main__":
    main()
