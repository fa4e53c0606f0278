"""Device-mesh construction for DP x TP SPMD.

The reference is strictly single-GPU (SURVEY.md §2.3 — no torch.distributed
anywhere); this layer is the TPU-native scaling design that replaces it:
a ``jax.sharding.Mesh`` with a ``data`` axis (batch sharding, gradient
psum over ICI) and a ``model`` axis (tensor-parallel sharding for the
scaled 12L/1024d ViT config). Multi-host initialization goes through
``jax.distributed.initialize``; each host feeds its local shard of the
batch (see ``data.dataset.VoiceBankDataset.shard``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (no-op single-host). Safe to call repeatedly."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    ``data_parallel=-1`` consumes all remaining devices on the data axis.
    The model axis is innermost so TP collectives ride the fastest ICI
    links (scaling-book layout: contiguous model groups).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_parallel <= 0:
        model_parallel = 1
    if n % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} does not divide {n} devices"
        )
    if data_parallel == -1:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} != {n} devices"
        )
    arr = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def mesh_for_data_parallel(n: int) -> Optional[Mesh]:
    """Pure data-parallel mesh for the inference/serving CLIs' common
    ``--data-parallel N`` flag; ``None`` for N <= 1 (single device)."""
    if n is None or n <= 1:
        return None
    return make_mesh(data_parallel=n)


def mesh_from_config(config: dict, devices=None) -> Mesh:
    mc = config.get("mesh", {})
    return make_mesh(
        data_parallel=mc.get("data_parallel", -1),
        model_parallel=mc.get("model_parallel", 1),
        devices=devices,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data', rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def distribute_batch(batch: dict, mesh: Mesh) -> dict:
    """Turn per-host local batches into global sharded arrays (multi-host
    input pipeline: each host loads its shard of the files via
    ``VoiceBankDataset.shard`` and contributes its rows here). No-op on a
    single host."""
    if jax.process_count() == 1:
        return batch
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    dp = mesh.shape[DATA_AXIS]
    if global_batch % dp != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data axis {dp}"
        )
    return global_batch // dp
