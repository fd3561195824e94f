"""Checkpoint tooling + metrics writer tests."""

import json
import os

import jax
import numpy as np
import pytest

from tacotronv2_wavernn_chinese_tpu.config import default_config
from tacotronv2_wavernn_chinese_tpu.models import tacotron as T
from tacotronv2_wavernn_chinese_tpu.utils.metrics import MetricsWriter, read_scalars
from tools.import_tf_checkpoint import (
    _get_path,
    import_checkpoint,
    read_index_keys,
    tf_name_map,
)

REF_INDEX = (
    "/root/reference/logs-Tacotron-2/taco_pretrained/"
    "tacotron_model.ckpt-206500.index"
)


@pytest.mark.skipif(not os.path.exists(REF_INDEX), reason="reference mount absent")
def test_tf_name_map_matches_reference_checkpoint_index():
    """Golden parity: the importer's TF-name mapping must EXACTLY equal the
    variable set of the shipped reference checkpoint (ckpt-206500 .index —
    parseable without tensorflow or the .data blob).  Catches silent scope
    mismatches (e.g. decoder_prenet vs prenet, memory_layer living outside
    the decoder scope) that import_checkpoint only warns about."""
    keys = {
        k
        for k in read_index_keys(REF_INDEX)
        if "optimizer" not in k and "Adam" not in k and k != "global_step"
    }
    mapped = set(tf_name_map(default_config()))
    assert mapped == keys, (
        f"mapped-but-absent: {sorted(mapped - keys)[:5]}; "
        f"in-ckpt-unmapped: {sorted(keys - mapped)[:5]}"
    )


def test_tf_name_map_covers_all_trainable_leaves():
    """Every mapped path resolves, and together the mapped paths cover the
    whole Tacotron param tree (nothing silently left at random init)."""
    cfg = default_config()
    params = T.init_tacotron(jax.random.PRNGKey(0), cfg.tacotron)
    mapping = tf_name_map(cfg)
    covered = set()
    for name, (path, _) in mapping.items():
        arr = _get_path(params, path)
        assert hasattr(arr, "shape"), name
        covered.add(path)

    all_paths = set()

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                walk(v, path + (i,))
        else:
            all_paths.add(path)

    walk(params, ())
    missing = all_paths - covered
    assert not missing, f"param leaves not covered by TF import map: {missing}"


def test_import_checkpoint_roundtrip_and_shape_guard():
    cfg = default_config()
    params = T.init_tacotron(jax.random.PRNGKey(0), cfg.tacotron)
    mapping = tf_name_map(cfg)
    tf_vars = {n: np.asarray(_get_path(params, p)) for n, (p, _) in mapping.items()}
    p2, unmatched, missing = import_checkpoint(cfg, tf_vars)
    assert not unmatched and not missing
    np.testing.assert_array_equal(
        np.asarray(p2["embedding"]), np.asarray(params["embedding"])
    )

    bad = dict(tf_vars)
    name = next(iter(mapping))
    bad[name] = np.zeros((3, 3), np.float32)
    try:
        import_checkpoint(cfg, bad)
        raise AssertionError("expected shape mismatch error")
    except ValueError as e:
        assert "shape mismatch" in str(e)


def test_import_reports_missing_and_unmatched():
    cfg = default_config()
    params = T.init_tacotron(jax.random.PRNGKey(0), cfg.tacotron)
    mapping = tf_name_map(cfg)
    tf_vars = {n: np.asarray(_get_path(params, p)) for n, (p, _) in mapping.items()}
    dropped = next(iter(mapping))
    del tf_vars[dropped]
    tf_vars["Tacotron_model/extraneous_var"] = np.zeros(3, np.float32)
    _, unmatched, missing = import_checkpoint(cfg, tf_vars)
    assert missing == [dropped]
    assert unmatched == ["Tacotron_model/extraneous_var"]


def test_metrics_writer_roundtrip(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.write(1, {"loss": 1.5, "lr": 1e-3})
    w.write(2, {"loss": np.float32(1.2)})
    w.close()
    rows = read_scalars(str(tmp_path / "scalars.jsonl"))
    assert [r["step"] for r in rows] == [1, 2]
    assert rows[0]["loss"] == 1.5
    assert isinstance(rows[1]["loss"], float)
    # appending across writer instances keeps history
    w2 = MetricsWriter(str(tmp_path))
    w2.write(3, {"loss": 1.0})
    w2.close()
    assert len(read_scalars(str(tmp_path / "scalars.jsonl"))) == 3


def test_metrics_rows_are_json_lines(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.write(1, {"note": "text-ok"})
    w.close()
    line = open(tmp_path / "scalars.jsonl").readline()
    row = json.loads(line)
    assert row["note"] == "text-ok" and "wall" in row


def test_embedding_projector_dump(tmp_path):
    from tacotronv2_wavernn_chinese_tpu.frontend import default_symbols
    from tacotronv2_wavernn_chinese_tpu.utils.metrics import dump_embedding_projector

    emb = np.arange(12, dtype=np.float32).reshape(4, 3)
    dump_embedding_projector(emb, list(default_symbols().symbols), str(tmp_path))
    rows = open(tmp_path / "embedding.tsv").read().strip().split("\n")
    assert len(rows) == 4 and len(rows[0].split("\t")) == 3
    meta = open(tmp_path / "metadata.tsv", encoding="utf-8").read().strip().split("\n")
    assert len(meta) == 4 and meta[0] == "_"


def test_override_tuple_values():
    """Comma-containing tuple overrides parse correctly (paren-aware split)."""
    from tacotronv2_wavernn_chinese_tpu.config import default_config

    cfg = default_config().override(
        "wavernn.upsample_factors=(5,5,11),tacotron.prenet_layers=(128,128),audio.bits=9"
    )
    assert cfg.wavernn.upsample_factors == (5, 5, 11)
    assert cfg.tacotron.prenet_layers == (128, 128)
    assert cfg.audio.bits == 9


def test_value_window_evicts_at_size_one():
    from tacotronv2_wavernn_chinese_tpu.utils.logging import ValueWindow

    w = ValueWindow(1)
    for v in (1.0, 2.0, 3.0):
        w.append(v)
    assert w.count == 1 and w.average == 3.0
    w5 = ValueWindow(3)
    for v in range(10):
        w5.append(float(v))
    assert w5.count == 3 and w5.average == 8.0


def test_bench_scaling_mechanics():
    """Scaling harness (tools/bench_scaling.py): sharded train + gen programs
    compile and run on the 8-device mesh and efficiency is well-formed."""
    import dataclasses

    import jax

    from tacotronv2_wavernn_chinese_tpu.config import default_config
    from tools.bench_scaling import _mesh_sizes, bench_gen, bench_train

    assert _mesh_sizes(8) == [1, 2, 4, 8]
    assert _mesh_sizes(6) == [1, 2, 4, 6]

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        wavernn=dataclasses.replace(
            cfg.wavernn, upsample_factors=(2, 2, 5), rnn_dims=32, fc_dims=32,
            compute_dims=16, res_out_dims=16, res_blocks=2,
        ),
        audio=dataclasses.replace(cfg.audio, bits=8),
    )
    devs = jax.devices()[:2]
    rate, dt = bench_train(devs, cfg, batch_per_device=1,
                           seq_len=cfg.wavernn.total_upsample * 2, reps=1)
    assert rate > 0 and dt > 0
    rate_g, dt_g = bench_gen(devs, cfg, folds_per_device=1, reps=1)
    assert rate_g > 0 and dt_g > 0


def test_profiler_axon_guard(tmp_path, monkeypatch, capsys):
    """On the axon tunnel the profiler must refuse trace capture (it wedges
    the stdio relay) and close() must NOT call stop_trace afterwards."""
    from tacotronv2_wavernn_chinese_tpu import utils as U
    from tacotronv2_wavernn_chinese_tpu.utils.metrics import Profiler

    # CPU backend is not axon
    assert U.is_axon_backend() is False

    monkeypatch.setattr(U, "is_axon_backend", lambda: True)
    calls = []
    import jax

    monkeypatch.setattr(jax.profiler, "start_trace", lambda *a, **k: calls.append("start"))
    monkeypatch.setattr(jax.profiler, "stop_trace", lambda *a, **k: calls.append("stop"))
    prof = Profiler(str(tmp_path), start_step=1, num_steps=2)
    for s in range(5):
        prof.step(s)
    prof.close()
    assert calls == []  # never traced, never stop_trace'd
    assert "unsupported on the axon backend" in capsys.readouterr().out


def test_profiler_traces_on_non_axon(tmp_path, monkeypatch):
    from tacotronv2_wavernn_chinese_tpu import utils as U
    from tacotronv2_wavernn_chinese_tpu.utils.metrics import Profiler

    monkeypatch.setattr(U, "is_axon_backend", lambda: False)
    calls = []
    import jax

    monkeypatch.setattr(jax.profiler, "start_trace", lambda *a, **k: calls.append("start"))
    monkeypatch.setattr(jax.profiler, "stop_trace", lambda *a, **k: calls.append("stop"))
    prof = Profiler(str(tmp_path), start_step=1, num_steps=2)
    for s in range(5):
        prof.step(s)
    assert calls == ["start", "stop"]
