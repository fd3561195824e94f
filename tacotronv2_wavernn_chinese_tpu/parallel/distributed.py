"""Multi-host runtime glue.

The reference has no working distributed backend (NCCL workaround
unreachable, wavernn/utils/__init__.py:19-36; TF multi-tower hparams never
consumed).  Here multi-host is the standard JAX recipe: every host calls
``initialize()``, the GSPMD mesh spans all processes' devices, gradient
psum rides ICI within a slice and DCN across hosts, and host-local work
(data loading, preprocessing, GTA) shards by ``process_index``.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the multi-host runtime (no-op for single process).

    With TPU pod metadata available, ``jax.distributed.initialize()`` needs
    no arguments; explicit args support CPU/GPU clusters and tests.
    """
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def host_shard() -> tuple[int, int]:
    """(shard_index, num_shards) for host-local corpus sharding — feeds
    ``data.preprocess.process_corpus`` and ``infer.gta.generate_gta``."""
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the host that should write logs/checkpoints/metadata."""
    return jax.process_index() == 0
