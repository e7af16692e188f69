"""Early platform pinning for CLI entry points.

On hosts where a TPU plugin force-registers itself (sitecustomize), the
standard ``JAX_PLATFORMS`` env var is overridden and CPU smoke runs of the
CLIs silently initialize — and can hang on — the TPU backend. ``EST_PLATFORM``
pins the JAX platform through ``jax.config`` (which the plugin cannot
override) *before* the first backend touch::

    EST_PLATFORM=cpu python -m expressive_speech_translation_tpu.train.run --tiny ...

Every ``main()`` entry point calls :func:`pin_platform_from_env` first.
No effect when the variable is unset or the backend is already initialized.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)


def pin_platform_from_env(var: str = "EST_PLATFORM") -> None:
    value = os.environ.get(var, "").strip().lower()
    if not value:
        return
    import jax

    try:
        jax.config.update("jax_platforms", value)
    except Exception as e:  # noqa: BLE001 — backend already up; pin is moot
        log.warning("%s=%s ignored (backend already initialized): %s",
                    var, value, e)
