import time, sys
import jax, jax.numpy as jnp, numpy as np
from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.models import tacotron as T
from tacotronv2_wavernn_chinese_tpu.ops import tacotron_trainer_kernel as TK
from tacotronv2_wavernn_chinese_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
def sync(x): return float(np.asarray(jnp.sum(x)))
cfg = default_config().tacotron
params = T.init_tacotron(jax.random.PRNGKey(0), cfg)
B, T_in, Td = 32, 64, 512
group = int(sys.argv[1]) if len(sys.argv) > 1 else 8
TK._GROUP = group
# monkeypatch group size
import tacotronv2_wavernn_chinese_tpu.ops.tacotron_trainer_kernel as tk
src_apply = tk.fused_core_apply
inputs = jnp.arange(B*T_in).reshape(B,T_in) % 50
lens = jnp.full((B,), T_in, jnp.int32)
memory, _ = T.encode(params, cfg, inputs, lens, False, jax.random.PRNGKey(1))
mask = jnp.ones((B, T_in), jnp.float32)
from tacotronv2_wavernn_chinese_tpu.models import attention as A
keys = A.precompute_keys(params["attention"], cfg, memory)
pre_seq = jax.random.normal(jax.random.PRNGKey(2), (Td, B, cfg.prenet_layers[-1]))
u = cfg.decoder_lstm_units
masks = tuple(jnp.ones((Td, B, u), jnp.float32) for _ in range(4))

def apply_grouped(p, pre):
    outs = []
    for st in range(0, B, group):
        en = st + group
        static = (group, T_in, Td, 16, cfg.prenet_layers[-1], u, memory.shape[2],
                  cfg.attention_dim, cfg.attention_kernel, float(cfg.zoneout_rate),
                  True, False, "bf16")
        m_g = tuple(m[:, st:en] for m in masks)
        outs.append(tk._core(static, tk.fused_core_apply.__wrapped__ if False else _weights(p), pre[:, st:en], m_g, keys[st:en], memory[st:en], mask[st:en]))
    return tuple(jnp.concatenate([o[i] for o in outs], axis=1) for i in range(3))

def _weights(p):
    att = p["attention"]; l1 = p["dec_lstm1"]["w"]; l2 = p["dec_lstm2"]["w"]
    pre_d = cfg.prenet_layers[-1]; V = memory.shape[2]
    w_loc = att["location_layer"]["w"]
    w_comb = jnp.einsum("kif,fa->ka", att["location_conv"]["w"], w_loc, precision="highest")
    ball = (jnp.matmul(att["location_conv"]["b"], w_loc, precision="highest") + att["b"])[None]
    return (l1[:pre_d], l1[pre_d:pre_d+V], l1[pre_d+V:], p["dec_lstm1"]["b"][None],
            l2[:u], l2[u:], p["dec_lstm2"]["b"][None],
            att["query_layer"]["w"], w_comb, ball, att["v"][None],
            att["mu_layer"]["w"][:V], att["mu_layer"]["w"][V:], att["mu_layer"]["b"][None])

fwd = jax.jit(lambda p, pre: sum(jnp.sum(x) for x in apply_grouped(p, pre)))
t0=time.time(); sync(fwd(params, pre_seq)); print("fwd compile", round(time.time()-t0,1), flush=True)
ts=[]
for i in range(3):
    t0=time.time(); sync(fwd(params, pre_seq + i*1e-6)); ts.append(time.time()-t0)
print(f"group={group} fwd-only: {min(ts)*1000:.1f} ms", flush=True)

g = jax.jit(jax.grad(lambda p, pre: sum(jnp.sum(x) for x in apply_grouped(p, pre))))
t0=time.time(); sync(g(params, pre_seq)["dec_lstm1"]["w"]); print("grad compile", round(time.time()-t0,1), flush=True)
ts=[]
for i in range(3):
    t0=time.time(); sync(g(params, pre_seq + i*1e-6)["dec_lstm1"]["w"]); ts.append(time.time()-t0)
print(f"group={group} fwd+bwd: {min(ts)*1000:.1f} ms", flush=True)
