"""Device mesh construction for (data, model) parallelism.

The scaling design (SURVEY.md §2c): VAD-cut utterance batches are data
parallel across hosts/chips on the "data" axis; Whisper large attention heads
and MLPs are tensor-sharded on the "model" axis (intra-slice, so the
collectives pjit inserts ride ICI). There is no sequence/pipeline axis —
chunking bounds sequence length by construction, which is what keeps this
workload pjit-friendly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    With defaults, all devices go to the data axis (pure DP — the right
    layout for ≤large models that fit on one chip). Set ``n_model`` to shard
    tensors over ICI neighbors.
    """
    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    if n_data is None:
        assert total % n_model == 0, f"{total} devices not divisible by model={n_model}"
        n_data = total // n_model
    assert n_data * n_model == total, f"mesh {n_data}x{n_model} != {total} devices"
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-leading arrays: shard dim 0 over "data", replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along the data axis."""
    return jax.device_put(batch, data_sharding(mesh))


def pad_rows_to_mesh(mesh: Mesh, rows, granule: int = 8):
    """Pad (B, ...) host rows to a data-axis-divisible granule and shard.

    Used by the align/diarize stages to run their fixed-shape window/segment
    batches data-parallel: the row count rounds up to lcm(granule, n_data)
    (zero rows are cheap — same compile-signature bucketing the single-device
    path already does), then dim 0 shards over "data".
    """
    import math

    import numpy as np

    n = int(mesh.devices.shape[0])
    g = granule * n // math.gcd(granule, n)
    B = rows.shape[0]
    Bp = max(g, -(-B // g) * g)
    if Bp != B:
        rows = np.concatenate(
            [rows, np.zeros((Bp - B,) + rows.shape[1:], rows.dtype)], axis=0
        )
    return shard_batch(mesh, rows)
