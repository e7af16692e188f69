"""expressive_speech_translation_tpu — TPU-native expressive speech-to-speech translation.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
RobMills28/Expressive-Speech-Translation reference (a CUDA/torch cascaded
Whisper → NLLB-200 → CosyVoice2 → MuseTalk S2ST system; see SURVEY.md):

- ``core``     typed layered config, component registry, errors
- ``parallel`` device mesh / sharding (pjit over ICI; dp/tp axes)
- ``ops``      audio DSP compute path: STFT, log-mel, resample, EQ — jnp + Pallas
- ``models``   whisper / nllb / cosyvoice / musetalk / ecapa / openvoice in JAX
- ``media``    host-side media I/O (C++ libav shim + pure-python WAV fallback)
- ``pipeline`` cascade orchestration: backends, manager, audio processor,
               temporal mappers, diagnostics, watermarking
- ``serve``    HTTP facade (Werkzeug WSGI) preserving the reference's routes
- ``train``    CosyVoice SFT training loop (data-parallel pjit, Orbax checkpoints)
- ``batch``    manifest-driven batch inference (SLURM-array compatible)
- ``evals``    evaluation metric battery
- ``obs``      logging tree, request IDs, RTF/xRT counters, profiler hooks

Import as ``import expressive_speech_translation_tpu as est``.
"""

__version__ = "0.1.0"

# Short, stable aliases for the subpackages (lazy — importing the root package
# must stay cheap; models pull in jax and can be slow on first import).
import importlib as _importlib

_SUBPACKAGES = (
    "core", "parallel", "ops", "models", "media", "pipeline",
    "serve", "train", "batch", "evals", "obs",
)


def __getattr__(name):
    if name in _SUBPACKAGES:
        return _importlib.import_module(f"{__name__}.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBPACKAGES))
