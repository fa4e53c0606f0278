"""Test harness config: force the CPU backend with 8 virtual XLA devices so
multi-device sharding tests run without TPU hardware (SURVEY.md §4's
fake-backend mechanism). Must set env vars before jax is imported anywhere.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The image preimports jax via a .pth hook with JAX_PLATFORMS=axon (remote
# TPU), so the env var above is captured too late — override via config,
# which works as long as no backend has been initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def sine_wav(rng):
    """1.5 s of 16 kHz noisy speech-like signal."""
    sr = 16000
    t = np.arange(int(1.5 * sr)) / sr
    clean = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 880 * t + 0.3)
        + 0.1 * np.sin(2 * np.pi * 1760 * t)
    ).astype(np.float32)
    noisy = clean + 0.05 * rng.standard_normal(len(t)).astype(np.float32)
    return clean, noisy, sr
