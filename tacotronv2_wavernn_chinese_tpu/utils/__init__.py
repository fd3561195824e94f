def round_up(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m`` (shape-bucketing helper shared
    by the data loader and the synthesizer)."""
    return x if x % m == 0 else x + m - x % m


def is_tpu_backend() -> bool:
    """True when the default JAX backend is a TPU (the axon tunnel also
    reports "tpu"). The fused Mosaic kernels in ``ops/`` only lower on TPU;
    every Pallas-vs-scan path selection gates on this, so other accelerators
    (gpu/rocm) fall back to the portable scan paths."""
    import jax

    return jax.default_backend() == "tpu"


def is_axon_backend() -> bool:
    """True when the TPU is reached through the axon stdio-relay tunnel.

    The tunnel reports ``default_backend() == "tpu"`` like real TPUs, but its
    PJRT ``platform_version`` identifies the plugin; profiler trace capture
    hangs this transport (see CLAUDE.md), so callers gate on this."""
    import jax

    try:
        devs = jax.devices()
        if not devs:
            return False
        return "axon" in getattr(devs[0].client, "platform_version", "").lower()
    except Exception:
        return False
