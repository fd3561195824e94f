"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding logic is tested on a virtual CPU mesh
(xla_force_host_platform_device_count) so no real pod is needed; the real
TPU chip is exercised by bench.py, not the unit tests.

The axon sitecustomize pins JAX_PLATFORMS=axon, so the env var alone is not
enough — we must update jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The full suite compiles ~200 XLA:CPU programs (several at full model
    size) in one process; retaining every executable eventually segfaulted
    inside backend_compile_and_load near the end of the run (exit 139,
    order-dependent — the tail files alone pass).  Releasing compiled
    programs per module keeps the live-executable footprint bounded."""
    yield
    jax.clear_caches()


def make_tiny_cfg(**train_kw):
    """Shared tiny model config for fast CPU tests (importable via
    ``from conftest import make_tiny_cfg``).  ``train_kw`` overrides apply
    to BOTH tacotron_train and wavernn_train."""
    import dataclasses

    from tacotronv2_wavernn_chinese_tpu.config import default_config

    cfg = default_config()
    return dataclasses.replace(
        cfg,
        tacotron=dataclasses.replace(
            cfg.tacotron,
            embedding_dim=32,
            enc_conv_channels=32,
            enc_conv_layers=2,
            encoder_lstm_units=32,
            attention_dim=16,
            attention_filters=8,
            attention_kernel=7,
            prenet_layers=(32, 32),
            decoder_lstm_units=32,
            postnet_channels=32,
            postnet_layers=2,
        ),
        wavernn=dataclasses.replace(
            cfg.wavernn,
            upsample_factors=(2, 2, 5),
            rnn_dims=32,
            fc_dims=32,
            compute_dims=16,
            res_out_dims=16,
            res_blocks=2,
        ),
        audio=dataclasses.replace(cfg.audio, hop_size=20, bits=8),
        tacotron_train=dataclasses.replace(cfg.tacotron_train, **train_kw),
        wavernn_train=dataclasses.replace(cfg.wavernn_train, **train_kw),
    )
