"""Core: typed layered config, component registry, error taxonomy."""

from .config import (
    AppConfig,
    AudioConfig,
    ConfigError,
    ServeConfig,
    ServiceEndpoints,
    TrainConfig,
    load_config,
)
from .errors import (
    ESTError,
    ResourceError,
    ValidationError,
    error_id,
)
from .registry import Registry

__all__ = [
    "AppConfig",
    "AudioConfig",
    "ConfigError",
    "ESTError",
    "Registry",
    "ResourceError",
    "ServeConfig",
    "ServiceEndpoints",
    "TrainConfig",
    "ValidationError",
    "error_id",
    "load_config",
]


def enable_persistent_compilation_cache(cache_dir=None) -> None:
    """Point JAX's persistent compilation cache at a shared store (the same
    one the test suite and bench use). Axon remote compiles take minutes at
    reference scale; with the cache, the second server/bench/test start pays
    none of them. Safe to call multiple times."""
    import os
    from pathlib import Path

    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "EST_COMPILE_CACHE",
            str(Path(__file__).resolve().parents[2] / "tests" / ".xla_cache"))
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
