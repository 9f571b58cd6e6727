"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(mesh/pjit/shard_map) are exercised without TPU hardware — the same
simulation strategy the driver's dryrun uses. Must be set before jax
initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The image's sitecustomize pre-imports jax and registers a TPU backend in
# every process; backend *selection* is still lazy, so forcing the platform
# through jax.config here (before any device use) pins tests to CPU.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def sine_wave():
    """Pure 220 Hz sine, 1 s @ 16 kHz."""
    sr = 16000
    t = np.arange(sr) / sr
    return (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32), sr


@pytest.fixture
def chirp_wave():
    """Linear chirp 100->400 Hz, 1 s @ 16 kHz."""
    sr = 16000
    t = np.arange(sr) / sr
    f0, f1 = 100.0, 400.0
    phase = 2 * np.pi * (f0 * t + 0.5 * (f1 - f0) * t * t)
    return (0.5 * np.sin(phase)).astype(np.float32), sr


@pytest.fixture
def voiced_unvoiced_wave():
    """Alternating 0.25 s voiced (200 Hz sine) / unvoiced (noise) @ 16 kHz."""
    sr = 16000
    rng = np.random.default_rng(0)
    seg = sr // 4
    parts = []
    for i in range(4):
        t = np.arange(seg) / sr
        if i % 2 == 0:
            parts.append(0.5 * np.sin(2 * np.pi * 200.0 * t))
        else:
            parts.append(0.05 * rng.standard_normal(seg))
    return np.concatenate(parts).astype(np.float32), sr
