"""Persistent XLA compilation cache.

Remote TPU compiles through the axon tunnel cost 100-400 s for the big
autoregressive programs; the persistent cache makes every later process
reuse them (measured 1.5 s -> 0.2 s for the WaveRNN kernel).  Every CLI and
bench.py call ``enable_compile_cache()`` before building programs.
"""

from __future__ import annotations

import os


def enable_compile_cache(directory: str | None = None) -> str:
    import jax

    directory = (
        directory
        or os.environ.get("TTS_COMPILE_CACHE")
        or os.path.join(os.path.expanduser("~"), ".cache", "tacotron_tpu_jax")
    )
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return directory
