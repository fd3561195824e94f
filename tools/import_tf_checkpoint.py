"""Import the reference's TF-1.14 Tacotron checkpoint into our param tree.

The reference ships ``tacotron_model.ckpt-206500`` (variable names confirmed
from the .index; only the .index is present in this mount — the .data blob is
listed in ``.MISSING_LARGE_BLOBS``, so retrain-to-parity is the fallback,
BASELINE.md caveat).  This tool is the forward path for when the blob is
available: a complete TF-name -> (our pytree path, transform) mapping plus a
loader that reads via ``tensorflow`` when installed or an ``.npz`` export of
the checkpoint otherwise.

Layout facts the mapping encodes (reference file:line):
* conv1d kernels are [width, in, out] in both frameworks — no transpose
  (tf.layers.conv1d; our layers.conv1d uses WIO dimension numbers).
* dense kernels are [in, out] in both.
* LSTM kernels are [in+units, 4*units] with TF gate order (i, j, f, o) and
  forget bias handled *outside* the variable in both (tf LSTMCell
  forget_bias=1.0; our layers.lstm_step adds +1.0) — direct copy.
* batch_normalization: gamma->scale, beta->bias, moving_mean->mean,
  moving_variance->var (tf.layers.batch_normalization, modules.py:379-391).
* attention (BahdanauAttention internals + location layer,
  attention.py:131-147): memory_layer/query_layer (no bias),
  location_features_convolution [31, 1, 32], location_features_layer,
  attention_variable_projection (v), attention_bias (b); the
  forward-attention transition dense is ``decoder/dense`` (attention.py:229).

Usage:
    python -m tools.import_tf_checkpoint --ckpt path/to/tacotron_model.ckpt-206500 \
        --out params.npz          # or --npz ckpt_export.npz
"""

from __future__ import annotations

import argparse
from typing import Callable, Dict, Tuple

import numpy as np

P = "Tacotron_model/inference"


def tf_name_map(cfg) -> Dict[str, Tuple[Tuple, Callable]]:
    """tf_variable_name -> ((our pytree path...), transform(np.ndarray))."""
    ident = lambda x: x
    m: Dict[str, Tuple[Tuple, Callable]] = {
        f"{P}/inputs_embedding": (("embedding",), ident),
    }
    # encoder convs (modules.py:163-183: scope enc_conv_layers ->
    # conv_layer_{i}_encoder_convolutions)
    for i in range(cfg.tacotron.enc_conv_layers):
        s = f"{P}/encoder_convolutions/conv_layer_{i+1}_encoder_convolutions"
        m[f"{s}/conv1d/kernel"] = (("enc_convs", "layers", i, "conv", "w"), ident)
        m[f"{s}/conv1d/bias"] = (("enc_convs", "layers", i, "conv", "b"), ident)
        for tf_bn, ours in (("gamma", "scale"), ("beta", "bias"),
                            ("moving_mean", "mean"), ("moving_variance", "var")):
            m[f"{s}/batch_normalization/{tf_bn}"] = (
                ("enc_convs", "layers", i, "bn", ours), ident)
    # encoder BiLSTM (modules.py:185-217: scope encoder_LSTM, cells named
    # encoder_fw_LSTM / encoder_bw_LSTM inside bidirectional_dynamic_rnn)
    for d, ours in (("fw", "enc_lstm_fw"), ("bw", "enc_lstm_bw")):
        s = f"{P}/encoder_LSTM/bidirectional_rnn/{d}/encoder_{d}_LSTM"
        m[f"{s}/kernel"] = ((ours, "w"), ident)
        m[f"{s}/bias"] = ((ours, "b"), ident)
    # prenet (modules.py:220-251; tacotron.py:62 passes scope='decoder_prenet',
    # and the scope opens at CALL time inside the decoder while_loop scope)
    for i in range(len(cfg.tacotron.prenet_layers)):
        s = f"{P}/decoder/decoder_prenet/dense_{i+1}"
        m[f"{s}/kernel"] = (("prenet", "layers", i, "w"), ident)
        m[f"{s}/bias"] = (("prenet", "layers", i, "b"), ident)
    # decoder LSTMs (modules.py:254-284: decoder_LSTM scope, MultiRNNCell
    # cells named decoder_LSTM_{i})
    for i, ours in ((0, "dec_lstm1"), (1, "dec_lstm2")):
        s = f"{P}/decoder/decoder_LSTM/multi_rnn_cell/cell_{i}/decoder_LSTM_{i+1}"
        m[f"{s}/kernel"] = ((ours, "w"), ident)
        m[f"{s}/bias"] = ((ours, "b"), ident)
    # attention (tacotron.py:60-70 + tf BahdanauAttention internals).
    # memory_layer is applied to the encoder memory at mechanism CONSTRUCTION
    # (_BaseAttentionMechanism.__init__), i.e. outside the decoder scope —
    # its variable lives at {P}/memory_layer; query/location layers build
    # lazily at the first __call__ inside decoder/Location_Sensitive_Attention.
    a = f"{P}/decoder"
    m[f"{P}/memory_layer/kernel"] = (("attention", "memory_layer", "w"), ident)
    m[f"{a}/Location_Sensitive_Attention/query_layer/kernel"] = (
        ("attention", "query_layer", "w"), ident)
    m[f"{a}/Location_Sensitive_Attention/location_features_convolution/kernel"] = (
        ("attention", "location_conv", "w"), ident)
    m[f"{a}/Location_Sensitive_Attention/location_features_convolution/bias"] = (
        ("attention", "location_conv", "b"), ident)
    m[f"{a}/Location_Sensitive_Attention/location_features_layer/kernel"] = (
        ("attention", "location_layer", "w"), ident)
    m[f"{a}/Location_Sensitive_Attention/attention_variable_projection"] = (
        ("attention", "v"), ident)
    m[f"{a}/Location_Sensitive_Attention/attention_bias"] = (
        ("attention", "b"), ident)
    # forward-attention transition prob mu = sigmoid(dense(...)) (attention.py:229)
    if cfg.tacotron.attention_mode == "forward":
        m[f"{a}/dense/kernel"] = (("attention", "mu_layer", "w"), ident)
        m[f"{a}/dense/bias"] = (("attention", "mu_layer", "b"), ident)
    # projections (modules.py:287-342: scope linear_transform_projection /
    # stop_token_projection, inner dense named projection_{scope})
    m[f"{a}/linear_transform_projection/projection_linear_transform_projection/kernel"] = (
        ("frame_projection", "w"), ident)
    m[f"{a}/linear_transform_projection/projection_linear_transform_projection/bias"] = (
        ("frame_projection", "b"), ident)
    m[f"{a}/stop_token_projection/projection_stop_token_projection/kernel"] = (
        ("stop_projection", "w"), ident)
    m[f"{a}/stop_token_projection/projection_stop_token_projection/bias"] = (
        ("stop_projection", "b"), ident)
    # postnet (modules.py:345-376) + residual projection (tacotron.py:115-122)
    for i in range(cfg.tacotron.postnet_layers):
        s = f"{P}/postnet_convolutions/conv_layer_{i+1}_postnet_convolutions"
        m[f"{s}/conv1d/kernel"] = (("postnet", "layers", i, "conv", "w"), ident)
        m[f"{s}/conv1d/bias"] = (("postnet", "layers", i, "conv", "b"), ident)
        for tf_bn, ours in (("gamma", "scale"), ("beta", "bias"),
                            ("moving_mean", "mean"), ("moving_variance", "var")):
            m[f"{s}/batch_normalization/{tf_bn}"] = (
                ("postnet", "layers", i, "bn", ours), ident)
    m[f"{P}/postnet_projection/projection_postnet_projection/kernel"] = (
        ("postnet_projection", "w"), ident)
    m[f"{P}/postnet_projection/projection_postnet_projection/bias"] = (
        ("postnet_projection", "b"), ident)
    return m


def _varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _block_entries(block: bytes):
    """Decode one leveldb-format block: prefix-compressed (key, value) pairs."""
    import struct

    n_restarts = struct.unpack("<I", block[-4:])[0]
    data_end = len(block) - 4 - 4 * n_restarts
    pos, key, out = 0, b"", []
    while pos < data_end:
        shared, pos = _varint(block, pos)
        unshared, pos = _varint(block, pos)
        vlen, pos = _varint(block, pos)
        key = key[:shared] + block[pos : pos + unshared]
        pos += unshared
        out.append((key, block[pos : pos + vlen]))
        pos += vlen
    return out


def read_index_keys(path: str) -> list[str]:
    """Variable names from a TF tensor-bundle ``.index`` file (an SSTable).

    Dependency-free: parses the leveldb table footer -> index block -> data
    blocks.  Lets the name mapping be validated against a reference
    checkpoint even when the .data blob (and tensorflow itself) is absent.
    """
    data = open(path, "rb").read()
    magic = bytes([0x57, 0xFB, 0x80, 0x8B, 0x24, 0x75, 0x47, 0xDB])
    if data[-8:] != magic:
        raise ValueError(f"{path}: not an SSTable (bad footer magic)")
    pos = len(data) - 48
    _, pos = _varint(data, pos)  # metaindex offset
    _, pos = _varint(data, pos)  # metaindex size
    ioff, pos = _varint(data, pos)  # index block offset
    isize, pos = _varint(data, pos)  # index block size

    def block(off: int, size: int) -> bytes:
        ctype = data[off + size]  # 1-byte compression tag after the block
        if ctype != 0:
            raise ValueError(f"compressed SSTable block (type {ctype}) unsupported")
        return data[off : off + size]

    keys: list[str] = []
    for _, handle in _block_entries(block(ioff, isize)):
        off, p = _varint(handle, 0)
        size, _ = _varint(handle, p)
        keys.extend(k.decode("utf-8") for k, _ in _block_entries(block(off, size)))
    return [k for k in keys if k]


def _set_path(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def _get_path(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def load_tf_variables(ckpt_path: str | None, npz_path: str | None) -> Dict[str, np.ndarray]:
    if npz_path:
        return dict(np.load(npz_path, allow_pickle=False))
    # PRIMARY path: the dependency-free tensor-bundle reader
    # (tools/tf_bundle.py, bit-exact cross-validated against TF's own reader
    # and writer in tests/test_tf_import.py) — parses the .index SSTable +
    # .data shards directly with crc verification.  tensorflow, when
    # installed, is only a fallback for exotic bundles; it is NOT imported
    # here by default because loading TF beside JAX/torch in one process can
    # segfault at interpreter teardown.
    from tools.tf_bundle import read_bundle

    try:
        return read_bundle(ckpt_path)
    except FileNotFoundError as e:
        raise SystemExit(
            f"checkpoint data shard missing: {e}.\n"
            f"Only '{ckpt_path}.index' appears to be present — the "
            "reference mount ships the .index but lists the .data blob "
            "in .MISSING_LARGE_BLOBS.  Obtain the full checkpoint "
            "(<prefix>.data-00000-of-00001 next to the .index), or "
            "export it elsewhere to .npz "
            "(np.savez(path, **{name: tensor})) and pass --npz."
        ) from e
    except ValueError as bundle_err:
        # fallback for non-standard bundles ONLY when tensorflow exists;
        # otherwise surface the native reader's diagnosis (a crc mismatch
        # here usually means real corruption, not an exotic format)
        try:
            import tensorflow as tf
        except ImportError:
            raise SystemExit(
                f"failed to read tensor bundle: {bundle_err} "
                "(and tensorflow is not installed for a second opinion)"
            ) from bundle_err
        print(f"note: native bundle reader failed ({bundle_err}); retrying via tensorflow")
        reader = tf.train.load_checkpoint(ckpt_path)
        return {
            name: reader.get_tensor(name)
            for name in reader.get_variable_to_shape_map()
        }


def import_checkpoint(cfg, tf_vars: Dict[str, np.ndarray]):
    """Returns (params pytree, unmatched_tf_names, missing_our_names)."""
    import jax

    from tacotronv2_wavernn_chinese_tpu.models import tacotron as T

    params = jax.tree_util.tree_map(
        np.asarray, T.init_tacotron(jax.random.PRNGKey(0), cfg.tacotron)
    )
    mapping = tf_name_map(cfg)
    used, missing = set(), []
    for tf_name, (path, transform) in mapping.items():
        if tf_name not in tf_vars:
            missing.append(tf_name)
            continue
        value = transform(np.asarray(tf_vars[tf_name]))
        target = _get_path(params, path)
        if tuple(target.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch for {tf_name}: ckpt {value.shape} vs ours {target.shape}"
            )
        _set_path(params, path, value.astype(np.float32))
        used.add(tf_name)
    unmatched = [
        n for n in tf_vars
        if n not in used and "optimizer" not in n and "global_step" not in n
    ]
    return params, unmatched, missing


def main() -> None:
    from tacotronv2_wavernn_chinese_tpu.config import default_config
    from tacotronv2_wavernn_chinese_tpu.utils.checkpoints import save_params_npz

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="TF checkpoint prefix")
    ap.add_argument("--npz", default=None, help=".npz export of the TF checkpoint")
    ap.add_argument("--out", default=None, help="output params .npz")
    ap.add_argument(
        "--validate-index",
        default=None,
        help="path to a TF .index file: check the name mapping against its "
        "key set and exit (works without the .data blob or tensorflow)",
    )
    ap.add_argument("--override", default="")
    args = ap.parse_args()

    cfg = default_config()
    if args.override:
        cfg = cfg.override(args.override)

    if args.validate_index:
        keys = {
            k
            for k in read_index_keys(args.validate_index)
            if "optimizer" not in k and "Adam" not in k and k != "global_step"
        }
        mapped = set(tf_name_map(cfg))
        missing = sorted(mapped - keys)
        extra = sorted(keys - mapped)
        for n in missing:
            print(f"MAPPED BUT ABSENT: {n}")
        for n in extra:
            print(f"IN CKPT, UNMAPPED: {n}")
        if missing or extra:
            raise SystemExit(1)
        print(f"mapping OK: all {len(mapped)} names match {args.validate_index}")
        return

    if not args.ckpt and not args.npz:
        ap.error("one of --ckpt / --npz is required")
    if not args.out:
        ap.error("--out is required")
    tf_vars = load_tf_variables(args.ckpt, args.npz)
    params, unmatched, missing = import_checkpoint(cfg, tf_vars)
    if missing:
        print(f"WARNING: {len(missing)} mapped names absent from ckpt:")
        for n in missing[:10]:
            print("  ", n)
    if unmatched:
        print(f"WARNING: {len(unmatched)} ckpt vars not consumed:")
        for n in unmatched[:10]:
            print("  ", n)
    save_params_npz(args.out, params)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
