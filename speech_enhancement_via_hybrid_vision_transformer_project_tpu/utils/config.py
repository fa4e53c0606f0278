"""YAML config system.

Same contract as the reference (reference: utils/config.py): three YAML
files — data_config, model_config, train_config — recursively merged in
that order (reference: utils/config.py:93-97), dot-path accessors, and
validation. Consumers use ``.get(..., default)`` so partial configs work.
"""

from __future__ import annotations

import copy
import json
from pathlib import Path
from typing import Any, Dict

import yaml

CONFIG_FILES = ("data_config.yaml", "model_config.yaml", "train_config.yaml")


def load_config(path: str | Path) -> Dict[str, Any]:
    """Load a single YAML file (reference: utils/config.py:13-35)."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Config file not found: {path}")
    with open(path) as f:
        cfg = yaml.safe_load(f)
    return cfg or {}


def save_config(config: Dict[str, Any], path: str | Path) -> None:
    """Write a config dict to YAML (reference: utils/config.py:38-48)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(config, f, default_flow_style=False, sort_keys=False)


def merge_configs(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Recursive dict merge; override wins on leaves
    (reference: utils/config.py:51-74)."""
    out = copy.deepcopy(base)
    for k, v in (override or {}).items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_configs(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_all_configs(config_dir: str | Path = "config") -> Dict[str, Any]:
    """Load + merge data/model/train configs, in that order
    (reference: utils/config.py:77-110)."""
    config_dir = Path(config_dir)
    merged: Dict[str, Any] = {}
    for name in CONFIG_FILES:
        p = config_dir / name
        if p.exists():
            merged = merge_configs(merged, load_config(p))
    return merged


def get_config_value(config: Dict[str, Any], path: str, default: Any = None) -> Any:
    """Dot-path getter: ``get_config_value(cfg, 'model.transformer.embed_dim')``
    (reference: utils/config.py:113-140)."""
    node: Any = config
    for key in path.split("."):
        if not isinstance(node, dict) or key not in node:
            return default
        node = node[key]
    return node


def set_config_value(config: Dict[str, Any], path: str, value: Any) -> None:
    """Dot-path setter, creating intermediate dicts
    (reference: utils/config.py:143-169)."""
    keys = path.split(".")
    node = config
    for key in keys[:-1]:
        node = node.setdefault(key, {})
        if not isinstance(node, dict):
            raise TypeError(f"Cannot set {path}: {key} is not a mapping")
    node[keys[-1]] = value


def validate_config(config: Dict[str, Any]) -> list[str]:
    """Sanity-check the merged config; returns a list of problems
    (reference: utils/config.py:172-202 raises — we report, callers decide).
    """
    problems = []
    embed_dim = get_config_value(config, "model.transformer.embed_dim", 512)
    num_heads = get_config_value(config, "model.transformer.num_heads", 8)
    if embed_dim % num_heads != 0:
        problems.append(
            f"embed_dim ({embed_dim}) not divisible by num_heads ({num_heads})"
        )
    n_fft = get_config_value(config, "audio.n_fft", 512)
    hop = get_config_value(config, "audio.hop_length", 128)
    win = get_config_value(config, "audio.win_length", n_fft)
    if win > n_fft:
        problems.append(f"win_length ({win}) > n_fft ({n_fft})")
    if hop <= 0 or n_fft <= 0:
        problems.append("n_fft and hop_length must be positive")
    n_bins = get_config_value(config, "spectrogram.n_freq_bins", None)
    if n_bins is not None and n_bins != n_fft // 2 + 1:
        problems.append(
            f"spectrogram.n_freq_bins ({n_bins}) != n_fft//2+1 ({n_fft//2+1})"
        )
    bs = get_config_value(config, "training.batch_size", 16)
    if bs <= 0:
        problems.append("training.batch_size must be positive")
    lr = get_config_value(config, "training.optimizer.lr", 1e-4)
    if lr <= 0:
        problems.append("training.optimizer.lr must be positive")
    split = get_config_value(config, "data.train_val_split", 0.9)
    if not (0.0 < split < 1.0):
        problems.append("data.train_val_split must be in (0, 1)")
    return problems


def print_config(config: Dict[str, Any]) -> str:
    """Pretty-print (reference: utils/config.py:205-218)."""
    text = json.dumps(config, indent=2, default=str)
    print(text)
    return text
