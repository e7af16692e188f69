"""Shared tiny-SFT fixtures for the two-process distributed test: the worker
subprocesses and the in-process single-device reference must build bit-
identical params and batches, so both import from here."""

import numpy as np

from expressive_speech_translation_tpu.models import cosyvoice as cv
from expressive_speech_translation_tpu.models import qwen2 as q2

TINY_LM = cv.SpeechLMConfig(
    backbone=q2.Qwen2Config(hidden=64, layers=2, heads=4, kv_heads=2,
                            ffn_dim=128, max_positions=256),
    text_vocab=97,
    speech_token_size=61,
)

ACCUM, B, TT, TS = 2, 4, 6, 10


def make_optimizer():
    import optax

    return optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-4))


def make_batch():
    """Deterministic [accum, B, ...] SFT batch (numpy, host-side)."""
    g = np.random.default_rng(17)
    return (
        g.integers(0, TINY_LM.text_vocab, (ACCUM, B, TT)).astype(np.int32),
        np.ones((ACCUM, B, TT), bool),
        g.integers(0, TINY_LM.speech_token_size, (ACCUM, B, TS)).astype(np.int32),
        np.ones((ACCUM, B, TS), bool),
    )
