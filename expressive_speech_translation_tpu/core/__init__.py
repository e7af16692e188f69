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
