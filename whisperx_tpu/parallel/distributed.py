"""Multi-host initialization and data-parallel work distribution.

The reference has no distributed layer at all (SURVEY §2c: no
torch.distributed/NCCL anywhere); scaling past one host is a new capability
here. Design: each host runs the identical program; `jax.distributed`
bootstraps the global device view; the (data, model) mesh spans all chips
with "data" crossing hosts over DCN and "model" staying intra-slice on ICI.
Utterance chunks are data-parallel: each host feeds its local shard of every
global batch (`local_batch_slice`), and pjit's output sharding keeps results
host-local until token decode.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Bootstrap multi-host JAX (no-op on a single process).

    Arguments default from the standard env vars (COORDINATOR_ADDRESS,
    NUM_PROCESSES, PROCESS_ID) or the TPU metadata environment; call once at
    program start, before any jax computation.
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or _env_int("NUM_PROCESSES")
    process_id = process_id if process_id is not None else _env_int("PROCESS_ID")

    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process run

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def _env_int(name: str):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def local_batch_slice(global_batch: int) -> slice:
    """This host's rows of a data-parallel global batch."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def shard_files(files, process_index: Optional[int] = None, process_count: Optional[int] = None):
    """Static round-robin split of a file list across hosts.

    The coarsest (and cheapest) data parallelism for batch transcription
    jobs: each host owns every process_count-th file, no cross-host
    coordination needed beyond the initial jax.distributed handshake. Use
    for CLI fleets; use ``local_batch_slice`` when sharding chunk batches of
    a single file instead.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [f for i, f in enumerate(files) if i % pc == pi]
