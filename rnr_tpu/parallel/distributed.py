"""Multi-host (DCN) entry point.

The reference is strictly single-host (SURVEY §2.7: DataParallel + a
hand-placed 2-GPU split).  rnr_tpu scales over hosts the JAX way: every
host runs the SAME program, `jax.distributed.initialize` wires the
processes into one runtime, and the (dp, sp) `Mesh` is laid over the
GLOBAL device list — dp (batch) as the outer axis so its gradient
all-reduce is the only cross-host (DCN) collective, while sp (image
rows, halo exchanges, norm reductions) stays inside each host's ICI
domain.

Usage (one command per host):

  python -m rnr_tpu.drivers.train_rnr ... \
      --coordinator_address HOST0:1234 --num_processes 2 --process_id $I

Works on real TPU pods and on CPU processes (Gloo collectives) — the
latter is how `tests/test_multiprocess.py` verifies the path without
multi-chip hardware.
"""

from __future__ import annotations

import jax


def init_distributed(
    coordinator_address: str | None,
    num_processes: int | None,
    process_id: int | None,
    local_device_count: int | None = None,
) -> bool:
    """Initialize the multi-process runtime if flags were given.

    Returns True when running distributed.  Must be called before any
    other jax API touches the backend.  `local_device_count` forces N
    virtual CPU devices per process (testing without hardware).
    """
    if coordinator_address is None:
        return False
    if num_processes is None or process_id is None:
        raise ValueError(
            "--coordinator_address requires --num_processes and --process_id"
        )
    if local_device_count:
        jax.config.update("jax_num_cpu_devices", local_device_count)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_main_process() -> bool:
    """True on the process that owns logging/checkpoint writes."""
    return jax.process_index() == 0


def fetch_global(x):
    """Fetch a jax.Array to host numpy, all-gathering first when it
    spans non-addressable devices (multi-host sharded outputs)."""
    import numpy as np

    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def host_local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(local batch size, this process's start offset) for dp sharding
    where each host feeds only its own views."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} % {n} processes != 0")
    local = global_batch // n
    return local, local * jax.process_index()
