"""Checkpoint save/load/export.

TPU-native replacement for the reference's torch-pickle checkpoints
(reference: utils/checkpoint.py, training/trainer.py:350-412) using orbax
pytree checkpoints plus a msgpack weights-only format. The metadata
contract is preserved: ``epoch``, ``global_step``, ``best_val_loss``,
``config`` travel with the state so ``--resume`` restores the exact loop
position (SURVEY.md §5 checkpoint/resume).

Model export (the reference's ONNX export, utils/checkpoint.py:185-226)
maps to ``jax.export`` StableHLO serialization.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except Exception:  # pragma: no cover
    ocp = None

from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str | Path,
    state_tree: Any,
    *,
    epoch: int = 0,
    global_step: int = 0,
    best_val_loss: float = float("inf"),
    config: Optional[Dict] = None,
    metadata: Optional[Dict] = None,
    backend: str = "msgpack",
) -> Path:
    """Save a full training checkpoint (pytree + JSON metadata).

    Backends: ``msgpack`` (default; single file ``<path>/state.msgpack``)
    or ``orbax`` (``<path>/orbax`` tree via orbax.checkpoint — the
    multi-host/async-friendly format). Metadata always lands in
    ``<path>/meta.json``; ``load_checkpoint`` auto-detects the backend.
    """
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    host_tree = _to_host(state_tree)
    if backend == "orbax":
        if ocp is None:  # pragma: no cover
            raise RuntimeError("orbax not available")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save((path / "orbax").absolute(), host_tree, force=True)
        ckptr.wait_until_finished()
    elif backend == "msgpack":
        (path / "state.msgpack").write_bytes(serialization.to_bytes(host_tree))
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    meta = {
        "epoch": int(epoch),
        "global_step": int(global_step),
        "best_val_loss": float(best_val_loss),
        "config": config or {},
        "format": "sevit-msgpack-v1",
    }
    meta.update(metadata or {})
    (path / "meta.json").write_text(json.dumps(meta, indent=2, default=str))
    return path


def load_checkpoint(path: str | Path, target: Any) -> tuple[Any, Dict]:
    """Load a checkpoint into the structure of ``target``; returns
    (state_tree, metadata)."""
    path = Path(path)
    if (path / "state.msgpack").exists():
        blob = (path / "state.msgpack").read_bytes()
        if target is None:
            tree = serialization.msgpack_restore(blob)
        else:
            tree = serialization.from_bytes(target, blob)
    elif (path / "orbax").exists():
        if ocp is None:  # pragma: no cover
            raise RuntimeError("orbax not available")
        ckptr = ocp.StandardCheckpointer()
        if target is None:
            tree = ckptr.restore((path / "orbax").absolute())
        else:
            tree = ckptr.restore(
                (path / "orbax").absolute(),
                target=jax.tree_util.tree_map(np.asarray, target),
            )
    else:
        raise FileNotFoundError(f"no checkpoint found under {path}")
    meta = {}
    mp = path / "meta.json"
    if mp.exists():
        try:
            meta = json.loads(mp.read_text())
        except (json.JSONDecodeError, OSError) as e:
            # a truncated meta.json (interrupted save) must not make the
            # weights unloadable — the state tree is the recovery payload
            print(f"warning: unreadable meta.json under {path} ({e})")
            meta = {}
    if not isinstance(meta, dict):
        meta = {}
    return tree, meta


def save_model_weights(
    path: str | Path, variables: Any, config: Optional[Dict] = None
) -> Path:
    """Weights-only save for inference (reference:
    utils/checkpoint.py:164-182)."""
    return save_checkpoint(path, variables, config=config)


def load_model_weights(path: str | Path, variables_template: Any) -> Any:
    """Weights-only load (reference: utils/checkpoint.py:127-161). Accepts
    either a weights-only checkpoint or a full training checkpoint (the
    variables are extracted from the train state)."""
    path = Path(path)
    tree, meta = load_checkpoint(path, None)  # raw nested dicts
    # full train-state checkpoints carry params/batch_stats under the state
    if isinstance(tree, dict) and "params" in tree and "batch_stats" in tree:
        candidate = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    elif isinstance(tree, dict) and "state" in tree and "params" in tree.get("state", {}):
        candidate = {
            "params": tree["state"]["params"],
            "batch_stats": tree["state"]["batch_stats"],
        }
    else:
        candidate = tree
    return serialization.from_state_dict(variables_template, candidate)


def checkpoint_info(path: str | Path) -> Dict:
    """Introspect a checkpoint (reference: utils/checkpoint.py:229-275)."""
    path = Path(path)
    meta = {}
    if (path / "meta.json").exists():
        meta = json.loads((path / "meta.json").read_text())
    size = sum(f.stat().st_size for f in path.glob("**/*") if f.is_file())
    meta["size_bytes"] = size
    meta["path"] = str(path)
    return meta


def export_stablehlo(
    path: str | Path,
    apply_fn,
    example_args: tuple,
) -> Path:
    """Serialize a jitted forward to portable StableHLO bytes — the TPU
    equivalent of the reference's ONNX export (utils/checkpoint.py:185-226).
    Reload with ``jax.export.deserialize``."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(apply_fn))(*example_args)
    blob = exported.serialize()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(blob)
    return path
