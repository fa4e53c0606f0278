"""Runtime knobs: persistent compilation cache + jitted module init.

On remote/tunneled TPUs two costs dominate cold starts: (1) XLA
compilation (minutes for the 28M model) and (2) eager ``model.init``
dispatching hundreds of tiny ops. Both are structural fixes, not
micro-optimizations:

* ``enable_compilation_cache`` turns on JAX's persistent cache so every
  CLI/bench invocation after the first reuses compiled programs.
* ``jit_init`` compiles the whole parameter initialization into one
  program (measured: 131s eager -> seconds jitted on a v5e tunnel).
"""

from __future__ import annotations

import functools
import os
from pathlib import Path

import jax

_DEFAULT_CACHE = "~/.cache/sevit_jax_cache"


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable the persistent XLA compilation cache (idempotent)."""
    path = str(
        Path(
            cache_dir
            or os.environ.get("SEVIT_JAX_CACHE", _DEFAULT_CACHE)
        ).expanduser()
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags
        pass
    return path


def set_prng_impl(impl: str) -> None:
    """Select JAX's default PRNG ('threefry2x32' | 'rbg' | 'unsafe_rbg').

    Dropout/DropPath/SpecAugment mask generation is a measurable slice of
    a masked training step on TPU; 'rbg' uses the hardware RNG path and is
    substantially cheaper than the default counter-based threefry. Streams
    differ between impls (each is deterministic given the seed), so this
    is a per-run choice — config knob ``tpu.prng_impl``.
    """
    if impl in ("threefry2x32", "rbg", "unsafe_rbg"):
        jax.config.update("jax_default_prng_impl", impl)
    else:
        raise ValueError(f"unknown prng impl {impl!r}")


def resolve_prng_impl(configured: str | None, backend: str) -> str | None:
    """Effective PRNG impl for a run: the ``tpu.prng_impl`` config value if
    set, else 'rbg' on accelerator backends (measured ~8% faster scaled
    train step than threefry on v5e, PERF.md #12) and None (jax default
    threefry) on CPU, so CPU tests/runs keep the portable stream."""
    if configured:
        return configured
    return "rbg" if backend != "cpu" else None


def jit_init(model, *example_args, train: bool = False, **example_kwargs):
    """Run ``model.init`` as one compiled program."""
    init = jax.jit(functools.partial(model.init, train=train))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    return init(rngs, *example_args, **example_kwargs)
