import json, os, time
import jax, jax.numpy as jnp, numpy as np
from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
cfg0 = default_config()
key = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))
def sync(x): return float(np.asarray(jnp.sum(x)))
def timed(f, key, reps=3):
    t0=time.time(); sync(f(key)); print("  compile+warm", round(time.time()-t0,1), "s", flush=True)
    ts=[]
    for i in range(reps):
        t0=time.time(); sync(f(jax.random.fold_in(key,i+1))); ts.append(time.time()-t0)
    return min(ts)
from tacotronv2_wavernn_chinese_tpu.train import tacotron_task as TT
T_in, T_out = 64, 512
for B, mode in [(32, "auto"), (32, "off"), (128, "auto")]:
    cfg = cfg0.override(f"tacotron_train.fused_decoder={mode},tacotron_train.scan_unroll=4")
    state = TT.init_state(jax.random.PRNGKey(0), cfg)
    batch = {
        "inputs": jnp.ones((B, T_in), jnp.int32),
        "input_lengths": jnp.full((B,), T_in, jnp.int32),
        "mel_targets": jnp.zeros((B, T_out, 80), jnp.float32),
        "stop_targets": jnp.ones((B, T_out), jnp.float32),
        "target_lengths": jnp.full((B,), T_out, jnp.int32),
    }
    box=[state]
    def once(k):
        s2,m = TT.train_step(box[0], batch, k, cfg); box[0]=s2; return m["loss"]
    print(f"B={B} fused={mode} ...", flush=True)
    dt = timed(once, key)
    print(json.dumps(dict(batch=B, fused=mode, s_per_step=round(dt,4), examples_per_s=round(B/dt,1))), flush=True)
