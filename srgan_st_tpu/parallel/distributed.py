"""Multi-host (multi-process) runtime support.

The reference is strictly single-process / single-device ("cuda:0",
reference config.py:17; SURVEY.md §2.10 — no NCCL/Gloo/MPI anywhere).
The TPU-native multi-host path (SURVEY.md §2.10 "jax.distributed + DCN"
plan) is:

  1. every process calls `initialize_distributed()` once at entry (the
     train/warmup drivers do this automatically);
  2. the mesh is built over `jax.devices()` — the GLOBAL device list;
  3. each process's data source loads only its own contiguous slice of
     every global batch (`process_slice`, wired through data/pipeline.py);
  4. `parallel.mesh.shard_batch/shard_chunk` assemble the per-process
     slices into global jax.Arrays via
     `jax.make_array_from_process_local_data`;
  5. XLA runs the psum gradient reductions and sync-BN collectives over
     ICI within a slice and DCN across slices — no framework transport.

Launch contract (any scheduler): set SRGAN_ST_COORDINATOR=host:port,
SRGAN_ST_NUM_PROCESSES=N, SRGAN_ST_PROCESS_ID=i (or pass them explicitly),
start N identical processes. On Cloud TPU pods the three variables may be
omitted and jax autodetects the topology; single-process runs need nothing.
Tested by tests/test_distributed.py on a 2-process x 2-virtual-CPU-device
mesh.
"""

from __future__ import annotations

import os


_initialized = False


def _int_env(name: str):
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else None


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Idempotent `jax.distributed.initialize` entry hook.

    Arguments default to the SRGAN_ST_COORDINATOR / SRGAN_ST_NUM_PROCESSES /
    SRGAN_ST_PROCESS_ID environment variables. Returns True when running
    multi-process (after initializing the runtime), False for plain
    single-process runs (no-op). Must be called before the first jax
    backend use.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "SRGAN_ST_COORDINATOR"
    )
    if num_processes is None:
        num_processes = _int_env("SRGAN_ST_NUM_PROCESSES")
    if process_id is None:
        process_id = _int_env("SRGAN_ST_PROCESS_ID")
    if coordinator_address is None and num_processes is None:
        return False  # single-process run; nothing to do

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def process_info(
    process_index: int | None = None, process_count: int | None = None
) -> tuple[int, int]:
    """(process_index, process_count), defaulting to the jax runtime's.
    Overridable so data-sharding logic is unit-testable single-process."""
    if process_count is None or process_index is None:
        import jax

        if process_count is None:
            process_count = jax.process_count()
        if process_index is None:
            process_index = jax.process_index()
    return process_index, process_count


def process_slice(
    global_batch_size: int,
    process_index: int | None = None,
    process_count: int | None = None,
) -> slice:
    """This process's contiguous slice of a global batch.

    Contiguous blocks (not strided) because with a 1-D ('data',) mesh over
    `jax.devices()` — which orders devices process-contiguously — rows
    [i*B/P, (i+1)*B/P) are exactly process i's addressable shards, the
    layout `jax.make_array_from_process_local_data` assembles for free.
    """
    pi, pc = process_info(process_index, process_count)
    if global_batch_size % pc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{pc} processes"
        )
    local = global_batch_size // pc
    return slice(pi * local, (pi + 1) * local)


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/logs (process 0)."""
    import jax

    return jax.process_index() == 0
