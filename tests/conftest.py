"""Test configuration: run everything on a virtual 8-device CPU mesh.

Setting the platform and device count via env vars BEFORE jax initializes gives
every test a deterministic 8-way CPU "TPU slice" (SURVEY.md §4's implication:
multi-device tests must run hermetically on CPU).
"""

import os

# Hard-override: the host environment pins JAX_PLATFORMS to the real TPU
# platform; tests must be hermetic on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The host sitecustomize registers the TPU PJRT plugin and pins JAX_PLATFORMS
# before conftest runs; override at the config level as well.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: this host has ONE cpu core, so the suite's
# wall time is dominated by compiles of the jitted test programs. The first
# run populates the cache; every later run (local iteration, per-round CI)
# loads compiled executables from disk instead.
_cache_dir = os.path.join(os.path.dirname(__file__), ".xla_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1986)  # seed parity: greek_sft.yaml:5-8


@pytest.fixture(scope="session")
def harvard_wav():
    """The reference's committed real-speech fixture, if present."""
    path = "/root/reference/Backend/harvard.wav"
    if not os.path.exists(path):
        pytest.skip("harvard.wav fixture unavailable")
    return path


@pytest.fixture(scope="session")
def short_audio_wav():
    path = "/root/reference/input_audio_short.wav"
    if not os.path.exists(path):
        pytest.skip("input_audio_short.wav fixture unavailable")
    return path
