"""Import the reference's PyTorch WaveRNN weights into our param tree.

The reference ships ``latest_weights.pyt`` (torch ``state_dict``, absent
from this mount — .MISSING_LARGE_BLOBS) saved by the fatchord WaveRNN
(reference wavernn/models/fatchord_version.py:92-128, checkpoint I/O
:407-430).  This tool maps every state_dict entry onto our pytree with the
layout transforms each module class needs, completing the import story next
to the TF Tacotron importer (tools/import_tf_checkpoint.py).

Layout facts the mapping encodes (reference file:line):
* nn.Linear stores [out, in]  -> our dense w [in, out]: transpose.
* nn.Conv1d stores [out, in, k] -> our conv1d w [k, in, out]: (2, 1, 0).
* nn.GRU gate order is (r, z, n) with weight_ih_l0 [3H, in] — our
  layers.gru_* uses the same torch order, so wi = weight_ih.T etc.
* nn.BatchNorm1d: weight->scale, bias->bias, running_mean->mean,
  running_var->var (num_batches_tracked dropped); eps 1e-5 / momentum 0.1
  are baked into models.wavernn.melresnet.
* UpsampleNetwork up_layers alternate [Stretch2d, Conv2d(1,1,(1,2s+1),
  bias=False)] (fatchord_version.py:73-80), so the Conv2d weights sit at
  odd ModuleList indices; each [1,1,1,2s+1] kernel IS the shared taps
  vector our _stretch_smooth applies depthwise.
* the ``step`` buffer (fatchord_version.py:125) is returned separately so
  a resumed TrainState can carry it.

Usage:
    python -m tools.import_torch_wavernn --pyt latest_weights.pyt --out voc.npz
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np


def import_state_dict(cfg, state: Dict[str, np.ndarray]):
    """torch state_dict (tensors or ndarrays) -> (our params, step, unused).

    Raises on any shape mismatch; ``unused`` lists ignorable leftovers.
    """
    import jax

    from tacotronv2_wavernn_chinese_tpu.models.wavernn import init_wavernn

    sd = {k: np.asarray(v) for k, v in state.items()}
    used = set()

    def take(name: str) -> np.ndarray:
        if name not in sd:
            raise KeyError(f"state_dict missing {name!r}")
        used.add(name)
        return sd[name]

    def dense(prefix: str) -> dict:
        return {"w": take(f"{prefix}.weight").T, "b": take(f"{prefix}.bias")}

    def conv(prefix: str, bias: bool) -> dict:
        p = {"w": take(f"{prefix}.weight").transpose(2, 1, 0)}
        if bias:
            p["b"] = take(f"{prefix}.bias")
        return p

    def bn(prefix: str) -> dict:
        sd.pop(f"{prefix}.num_batches_tracked", None)
        used.add(f"{prefix}.num_batches_tracked")
        return {
            "scale": take(f"{prefix}.weight"),
            "bias": take(f"{prefix}.bias"),
            "mean": take(f"{prefix}.running_mean"),
            "var": take(f"{prefix}.running_var"),
        }

    def gru(prefix: str) -> dict:
        return {
            "wi": take(f"{prefix}.weight_ih_l0").T,
            "wh": take(f"{prefix}.weight_hh_l0").T,
            "bi": take(f"{prefix}.bias_ih_l0"),
            "bh": take(f"{prefix}.bias_hh_l0"),
        }

    wc = cfg.wavernn
    blocks = [
        {
            "conv1": conv(f"upsample.resnet.layers.{i}.conv1", bias=False),
            "bn1": bn(f"upsample.resnet.layers.{i}.batch_norm1"),
            "conv2": conv(f"upsample.resnet.layers.{i}.conv2", bias=False),
            "bn2": bn(f"upsample.resnet.layers.{i}.batch_norm2"),
        }
        for i in range(wc.res_blocks)
    ]
    params = {
        "resnet": {
            "conv_in": conv("upsample.resnet.conv_in", bias=False),
            "bn_in": bn("upsample.resnet.batch_norm"),
            "blocks": blocks,
            "conv_out": conv("upsample.resnet.conv_out", bias=True),
        },
        "upsample": {
            "kernels": [
                take(f"upsample.up_layers.{2 * j + 1}.weight").reshape(-1)
                for j in range(len(wc.upsample_factors))
            ]
        },
        "I": dense("I"),
        "gru1": gru("rnn1"),
        "gru2": gru("rnn2"),
        "fc1": dense("fc1"),
        "fc2": dense("fc2"),
        "fc3": dense("fc3"),
    }
    step = int(np.asarray(sd.get("step", 0)).reshape(-1)[0]) if "step" in sd else 0
    used.add("step")

    # shape-check against a freshly initialized tree
    ref = jax.tree_util.tree_map(
        np.asarray,
        init_wavernn(jax.random.PRNGKey(0), wc, cfg.audio.num_mels, cfg.audio.bits),
    )

    def check(a, b, path=""):
        if isinstance(b, dict):
            for k in b:
                if k not in a:
                    raise KeyError(f"missing {path}/{k}")
                check(a[k], b[k], f"{path}/{k}")
        elif isinstance(b, list):
            for i, bb in enumerate(b):
                check(a[i], bb, f"{path}/{i}")
        else:
            if tuple(np.shape(a)) != tuple(np.shape(b)):
                raise ValueError(
                    f"shape mismatch at {path}: torch {np.shape(a)} vs ours {np.shape(b)}"
                )

    check(params, ref)
    params = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), params,
        is_leaf=lambda x: isinstance(x, np.ndarray),
    )
    unused = sorted(set(sd) - used)
    return params, step, unused


def main() -> None:
    from tacotronv2_wavernn_chinese_tpu.config import default_config
    from tacotronv2_wavernn_chinese_tpu.utils.checkpoints import save_params_npz

    ap = argparse.ArgumentParser()
    ap.add_argument("--pyt", required=True, help="torch state_dict file (.pyt)")
    ap.add_argument("--out", required=True, help="output params .npz")
    ap.add_argument("--override", default="")
    args = ap.parse_args()

    import torch

    cfg = default_config()
    if args.override:
        cfg = cfg.override(args.override)
    state = torch.load(args.pyt, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    state = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in state.items()}
    params, step, unused = import_state_dict(cfg, state)
    if unused:
        print(f"WARNING: {len(unused)} state_dict entries not consumed:")
        for n in unused[:10]:
            print("  ", n)
    save_params_npz(args.out, params)
    print(f"wrote {args.out} (reference step {step})")


if __name__ == "__main__":
    main()
