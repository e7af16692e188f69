"""Benchmark: end-to-end audio S2ST RTF on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full cascade at the reference's model scales (Whisper-medium ASR,
NLLB-600M NMT, CosyVoice Qwen2-0.5B TTS — services/cascaded_backend.py:418/:434,
Docker/cosyvoice_api.py) with randomly initialised weights (the reference repo
ships no weights — .MISSING_LARGE_BLOBS). Decode lengths are pinned to realistic
token budgets for a 10 s utterance so RTF reflects per-token compute, not
random-weight stopping behaviour:

  ASR: 10 s audio → fused Pallas log-mel → encoder + 48 greedy tokens
  NMT: 48-token source → beam-1 decode, 64 tokens
  TTS: 250 speech tokens (25 Hz) → 10 Euler-step flow → 500 mel frames → vocoder

North star (BASELINE.md): RTF < 0.3 on v5e-8; this runs on ONE v5e chip.
vs_baseline = 0.3 / measured_RTF  (>1 = beats the per-chip budget).

Env knobs: EST_BENCH_SCALE=small|full (default full), EST_BENCH_REPEATS,
EST_BENCH_QUANT=int8 (weight-only int8 speech-LM decode).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _sync(out):
    """Force full completion. jax.block_until_ready is NOT reliable on the
    axon relay (observed returning before execution finished); materialising a
    reduction of every leaf to host is."""
    import jax
    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype"):
            float(jnp.sum(leaf.astype(jnp.float32)))
    return out


def _timed(fn, *args, repeats=3):
    out = _sync(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> int:
    import jax
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import cosyvoice as cv
    from expressive_speech_translation_tpu.models import nllb as nj
    from expressive_speech_translation_tpu.models import qwen2 as q2
    from expressive_speech_translation_tpu.models import whisper as wj
    from expressive_speech_translation_tpu.models.common import cast_floats
    from expressive_speech_translation_tpu.ops.pallas_mel import whisper_log_mel_pallas

    scale = os.environ.get("EST_BENCH_SCALE", "full")
    repeats = int(os.environ.get("EST_BENCH_REPEATS", "3"))
    audio_seconds = 10.0
    dtype = jnp.bfloat16

    if scale == "full":
        asr_cfg = wj.WhisperConfig.medium()
        nmt_cfg = nj.NLLBConfig.distilled_600m()
        tts_cfg = cv.CosyVoiceConfig()
    else:
        asr_cfg = wj.WhisperConfig.tiny()
        nmt_cfg = nj.NLLBConfig(d_model=256, encoder_layers=4, decoder_layers=4,
                                heads=8, ffn_dim=1024, vocab_size=8192)
        tts_cfg = cv.CosyVoiceConfig(
            lm=cv.SpeechLMConfig(
                backbone=q2.Qwen2Config(hidden=256, layers=4, heads=8, kv_heads=2,
                                        ffn_dim=1024, max_positions=1024),
                text_vocab=2000, speech_token_size=512),
            flow=cv.FlowConfig(token_vocab=515, dim=256, layers=4, heads=8),
            vocoder=cv.VocoderConfig(base_channels=256),
        )

    g = np.random.default_rng(0)
    stage_seconds = {}

    quant = os.environ.get("EST_BENCH_QUANT", "") == "int8"

    # ---------------- ASR ----------------
    asr_params = cast_floats(wj.init_whisper(jax.random.PRNGKey(0), asr_cfg), dtype)
    if quant:
        asr_params = wj.quantize_whisper_decoder(asr_params)
    audio = jnp.asarray((0.1 * g.standard_normal(int(16000 * audio_seconds))).astype(np.float32))
    prompt = jnp.asarray(
        [[asr_cfg.bos_token, 50259, asr_cfg.task_transcribe, asr_cfg.no_timestamps]], jnp.int32
    )

    @jax.jit
    def asr(params, audio, prompt):
        mel = whisper_log_mel_pallas(audio).astype(dtype)
        return wj.greedy_decode(params, asr_cfg, mel[None], prompt,
                                max_new_tokens=48, min_new_tokens=48)

    stage_seconds["asr"], asr_tokens = _timed(asr, asr_params, audio, prompt, repeats=repeats)
    del asr_params

    # ---------------- NMT ----------------
    nmt_params = cast_floats(nj.init_nllb(jax.random.PRNGKey(1), nmt_cfg), dtype)
    if quant:
        nmt_params = nj.quantize_nllb_decoder(nmt_params)
    src = jnp.asarray(g.integers(4, min(nmt_cfg.vocab_size - 4, 250_000), (1, 48)), jnp.int32)

    @jax.jit
    def nmt(params, src):
        return nj.generate(params, nmt_cfg, src, 256_001 % nmt_cfg.vocab_size,
                           num_beams=1, max_new_tokens=64, min_new_tokens=64)

    stage_seconds["nmt"], _ = _timed(nmt, nmt_params, src, repeats=repeats)
    del nmt_params

    # ---------------- TTS ----------------
    tts_params = cast_floats(cv.init_cosyvoice(jax.random.PRNGKey(2), tts_cfg), dtype)
    if quant:
        # weight-only int8 LM decode (1.7x at 0.5B; see models/cosyvoice.py
        # quantize_speech_lm) — off by default so the headline stays bf16
        tts_params = dict(tts_params)
        tts_params["lm"] = cv.quantize_speech_lm(tts_params["lm"])
    text = jnp.asarray(g.integers(0, tts_cfg.lm.text_vocab, (1, 64)), jnp.int32)
    tmask = jnp.ones((1, 64), bool)
    psp = jnp.asarray(g.integers(0, tts_cfg.lm.speech_token_size, (1, 75)), jnp.int32)
    psm = jnp.ones((1, 75), bool)
    spk = jnp.asarray(g.standard_normal((1, tts_cfg.flow.spk_embed_dim)), dtype)
    pmel = jnp.asarray(g.standard_normal((1, 150, tts_cfg.flow.n_mels)), dtype)
    pmm = jnp.ones((1, 150), bool)
    n_tts_tokens = int(audio_seconds * 25)  # 25 Hz speech tokens

    @jax.jit
    def tts(params, key):
        return cv.synthesize(
            params, tts_cfg, key, text, tmask, psp, psm, spk, pmel, pmm,
            max_new_tokens=n_tts_tokens, min_new_tokens=n_tts_tokens,
        )["audio"]

    stage_seconds["tts"], _ = _timed(tts, tts_params, jax.random.PRNGKey(3), repeats=repeats)
    del tts_params

    total = sum(stage_seconds.values())
    rtf = total / audio_seconds
    xrt = {k: round(v / audio_seconds, 5) for k, v in stage_seconds.items()}
    result = {
        "metric": "audio_s2st_rtf_1chip",
        "value": round(rtf, 5),
        "unit": f"RTF (10s utterance; scale={scale}; xrt={xrt})",
        "vs_baseline": round(0.3 / max(rtf, 1e-9), 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
