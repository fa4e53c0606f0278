"""Parameter sharding rules (tensor parallelism for the scaled ViT).

With the default 28M-param model everything is replicated and only the
batch is sharded (pure DP). For the scaled config (12 layers / 1024 dim /
16 heads — BASELINE.json config #4) the transformer weights can be sharded
over the ``model`` axis, Megatron-style:

  * qkv Dense kernel  [D, 3D]  -> shard output dim   (column parallel)
  * attn proj kernel  [D, D]   -> shard input dim    (row parallel)
  * mlp Dense_0       [D, 4D]  -> shard output dim   (column parallel)
  * mlp Dense_1       [4D, D]  -> shard input dim    (row parallel)

XLA's SPMD partitioner inserts the (all-gather / reduce-scatter)
collectives from these NamedSharding annotations — no hand-written
communication (scaling-book recipe: annotate, compile, profile).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def _tp_spec_for(path: tuple[str, ...], leaf) -> P:
    """PartitionSpec for one param, keyed on its flax module path."""
    names = [p for p in path]
    joined = "/".join(names)
    if "transformer" in joined and "attn" in joined:
        if "Dense_0" in joined and names[-1] == "kernel":  # qkv
            return P(None, MODEL_AXIS)
        if "Dense_0" in joined and names[-1] == "bias":
            return P(MODEL_AXIS)
        if "Dense_1" in joined and names[-1] == "kernel":  # out proj
            return P(MODEL_AXIS, None)
    if "transformer" in joined and "mlp" in joined:
        if "Dense_0" in joined and names[-1] == "kernel":
            return P(None, MODEL_AXIS)
        if "Dense_0" in joined and names[-1] == "bias":
            return P(MODEL_AXIS)
        if "Dense_1" in joined and names[-1] == "kernel":
            return P(MODEL_AXIS, None)
    return P()  # replicated


def tp_param_specs(variables: Any) -> Any:
    """PartitionSpec pytree matching ``variables`` (params + batch_stats)."""

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]

    def spec_of(path_entries, leaf):
        keys = tuple(
            getattr(e, "key", getattr(e, "name", str(e))) for e in path_entries
        )
        return _tp_spec_for(keys, leaf)

    specs = [spec_of(path, leaf) for path, leaf in flat]
    treedef = jax.tree_util.tree_structure(variables)
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_variables(variables: Any, mesh: Mesh, use_tp: bool = False) -> Any:
    """Place a variable pytree on the mesh (replicated, or TP-sharded)."""
    if use_tp and mesh.shape[MODEL_AXIS] > 1:
        specs = tp_param_specs(variables)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            variables,
            specs,
        )
    return jax.device_put(variables, NamedSharding(mesh, P()))
