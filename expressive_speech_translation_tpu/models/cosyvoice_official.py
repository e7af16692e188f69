"""Official-architecture CosyVoice2 TTS assembly: LM + matcha flow + HiFT.

This is the real-weights synthesis path. The reference serves the pretrained
CosyVoice2-0.5B triple (llm.pt / flow.pt / hift.pt) through
``inference_zero_shot`` (Docker/cosyvoice_api.py:128); each submodel now has a
native converter:

- speech-LM:  models/cosyvoice.from_cosyvoice_llm_state_dict (the checkpoint
  the reference's Greek SFT trains, Dockerfile.cosyvoice:49-52)
- flow:       models/flow_matcha.from_flow_state_dict
- vocoder:    models/hift.from_hift_state_dict

:func:`synthesize_official` mirrors the official inference chain: RAS-sampled
speech tokens → prompt-conditioned conformer/CFM mel → NSF-iSTFT waveform.
The TPU-native stack in models/cosyvoice.py (DiT flow + HiFi-GAN vocoder)
remains the weightless/bench path; this one exists so a deployment with real
checkpoints reproduces the reference's numerics.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import cosyvoice as cv
from . import flow_matcha as fm
from . import hift as hm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class OfficialTtsConfig:
    lm: cv.SpeechLMConfig = dataclasses.field(default_factory=cv.SpeechLMConfig)
    flow: fm.OfficialFlowConfig = dataclasses.field(
        default_factory=fm.OfficialFlowConfig)
    hift: hm.HiFTConfig = dataclasses.field(default_factory=hm.HiFTConfig)
    sample_rate: int = 24_000

    @classmethod
    def tiny(cls) -> "OfficialTtsConfig":
        from . import qwen2 as q2

        return cls(
            lm=cv.SpeechLMConfig(
                backbone=q2.Qwen2Config(hidden=32, layers=1, heads=4,
                                        kv_heads=2, ffn_dim=64,
                                        max_positions=512),
                text_vocab=128, speech_token_size=61),
            flow=dataclasses.replace(fm.OfficialFlowConfig.tiny(),
                                     vocab_size=64, output_size=8),
            hift=hm.HiFTConfig.tiny(),
        )


def init_official_tts(key, cfg: OfficialTtsConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "lm": cv.init_speech_lm(k1, cfg.lm),
        "flow": fm.init_official_flow(k2, cfg.flow),
        "hift": hm.init_hift(k3, cfg.hift),
    }


def synthesize_official(
    params: Params,
    cfg: OfficialTtsConfig,
    key,
    text_tokens: jnp.ndarray,
    text_mask: jnp.ndarray,
    prompt_speech_tokens: jnp.ndarray,
    prompt_speech_mask: jnp.ndarray,
    spk_embedding: jnp.ndarray,        # [B, 192] raw x-vector
    prompt_mel: jnp.ndarray,           # [B, ratio·T_ptok, 80]
    *,
    max_new_tokens: int = 512,
    min_new_tokens: int = 2,
    deterministic_source: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Zero-shot TTS through the official architecture.

    Matches CosyVoice2's chain: Qwen2LM RAS decode → CausalMaskedDiffWithXvec
    (prompt tokens + mel as continuation context, CFG Euler) → HiFTGenerator.
    Returns 24 kHz audio for the NEW speech only (prompt frames stripped by
    the flow, official ``feat[:, :, mel_len1:]`` semantics).
    """
    k_lm, k_flow, k_hift = jax.random.split(key, 3)
    # A fine-tuned LM exported with MTP heads (train/run.py --export-dir,
    # cfg.lm.mtp > 1) decodes K tokens per backbone pass even when serving
    # through the official flow+HiFT chain — the reference's own deployment
    # pattern of swapping just llm.pt (Docker/Dockerfile.cosyvoice:49-52).
    gen = cv.select_generator(cfg.lm, text_tokens.shape[0])
    tokens, lengths = gen(
        params["lm"], cfg.lm, k_lm, text_tokens, text_mask,
        prompt_speech_tokens, prompt_speech_mask,
        max_new_tokens=max_new_tokens, min_new_tokens=min_new_tokens,
    )
    token_mask = jnp.arange(tokens.shape[1])[None, :] < lengths[:, None]
    safe_tokens = jnp.where(token_mask, tokens, 0)
    mel, frame_mask = fm.flow_inference(
        params["flow"], cfg.flow, k_flow, safe_tokens, token_mask,
        jnp.where(prompt_speech_mask, prompt_speech_tokens, 0),
        prompt_speech_mask, prompt_mel, spk_embedding,
    )
    audio = hm.hift_inference(params["hift"], cfg.hift, k_hift, mel,
                              deterministic=deterministic_source,
                              frame_mask=frame_mask)
    return {
        "audio": audio,
        "mel": mel,
        "speech_tokens": tokens,
        "token_lengths": lengths,
        "frame_mask": frame_mask,
    }


# ================================================================ streaming


@functools.partial(jax.jit, static_argnames=("cfg", "deterministic"))
def _hift_chunk(hift_params: Params, cfg: hm.HiFTConfig, key,
                cache_mel: jnp.ndarray,       # [1, Cm, n_mels]
                cache_source: jnp.ndarray,    # [1, Cm·hop, 1]
                use_cache: jnp.ndarray,       # scalar bool
                new_mel: jnp.ndarray,         # [1, F, n_mels]
                *, deterministic: bool):
    """One streaming HiFT pass, the official ``hift_cache`` recipe
    (CosyVoice2 model.py token2wav): re-vocode the cached mel tail ahead of
    the new frames, and splice the PREVIOUS chunk's source excitation over
    the cached span so the NSF sine source doesn't restart phase at the
    join. Returns (wave [(Cm+F)·hop], tail mel cache, tail source cache)."""
    mel_in = jnp.concatenate([cache_mel, new_mel], axis=1)
    f0 = hm.f0_predict(hift_params, cfg, mel_in)
    src = hm.harmonic_source(hift_params, cfg, key, f0,
                             deterministic=deterministic)
    cm = cache_mel.shape[1]
    n_cache = cm * cfg.hop
    splice = (jnp.arange(src.shape[1]) < n_cache)[None, :, None] & use_cache
    padded_cache = jnp.pad(
        cache_source, ((0, 0), (0, src.shape[1] - n_cache), (0, 0)))
    src = jnp.where(splice, padded_cache, src)
    wave = hm.hift_decode(hift_params, cfg, mel_in, src)
    return wave, mel_in[:, -cm:], src[:, -n_cache:]


_flow_prefix_j = jax.jit(fm.flow_inference, static_argnames=("cfg",))


def synthesize_streaming_official(
    params: Params,
    cfg: OfficialTtsConfig,
    key,
    text_tokens: jnp.ndarray,
    text_mask: jnp.ndarray,
    prompt_speech_tokens: jnp.ndarray,
    prompt_speech_mask: jnp.ndarray,
    spk_embedding: jnp.ndarray,
    prompt_mel: jnp.ndarray,
    *,
    chunk_tokens: int = 25,            # greek_sft.yaml:20 chunk_size (1 s)
    mel_cache_frames: int = 20,        # official mel_cache_len
    fade_samples: int = 1024,
    max_new_tokens: int = 512,
    min_new_tokens: int = 2,
    deterministic_source: bool = False,
):
    """Incremental zero-shot TTS through the official chain: yields 24 kHz
    np.float32 chunks.

    Per chunk: (1) the LM emits ``chunk_tokens`` speech tokens from its
    resumable KV state (same streamed LM as the native chain); (2) the
    matcha flow re-runs on the bucket-padded token PREFIX (its conformer
    attention is global, so the prefix is recomputed rather than cached;
    prefix lengths bucket to doublings of ``chunk_tokens``, bounding
    compiles at log2(max/chunk)) and the new frames are sliced out; (3) the
    HiFT pass re-vocodes ``mel_cache_frames`` of cached mel ahead of the
    new frames with the previous chunk's source excitation spliced over the
    cached span (:func:`_hift_chunk`), and consecutive emissions crossfade
    over ``fade_samples``. Single stream (B == 1), static device shapes.
    """
    if text_tokens.shape[0] != 1:
        raise ValueError("streaming synthesis is single-stream (batch == 1); "
                         "use synthesize_official for batched offline TTS")
    r = cfg.flow.token_mel_ratio
    hop = cfg.hift.hop
    n_mels = cfg.flow.output_size
    c = chunk_tokens
    cm = mel_cache_frames
    n_chunks = -(-max_new_tokens // c)
    total_tok = n_chunks * c
    # token-prefix buckets: c, 2c, 4c, … (log-bounded compile count)
    buckets = [c]
    while buckets[-1] < total_tok:
        buckets.append(min(buckets[-1] * 2, total_tok))
    # one eager RNG op for the whole stream (per-chunk splits are relay
    # RPCs); DISTINCT keys for the LM chunk and the HiFT source per chunk —
    # sharing one key would correlate token sampling with sine-phase/noise
    all_keys = np.asarray(jax.random.split(key, 2 * n_chunks + 1))
    lm_keys, src_keys = all_keys[:n_chunks], all_keys[n_chunks:2 * n_chunks]
    k_flow = jnp.asarray(all_keys[-1])

    lm_state = cv._lm_stream_start_j(
        params["lm"], cfg.lm, text_tokens, text_mask,
        prompt_speech_tokens, prompt_speech_mask, max_new_tokens=total_tok,
    )
    p_len = 2 + text_tokens.shape[1] + prompt_speech_tokens.shape[1]
    safe_prompt = jnp.where(prompt_speech_mask, prompt_speech_tokens, 0)

    prefix = np.zeros((1, total_tok), np.int32)
    count = 0
    cache_mel = jnp.zeros((1, cm, n_mels), jnp.float32)
    cache_src = jnp.zeros((1, cm * hop, 1), jnp.float32)
    use_cache = jnp.asarray(False)
    held = None

    for ci in range(n_chunks):
        tokens, lm_state = cv._lm_stream_chunk_j(
            params["lm"], cfg.lm, jnp.asarray(lm_keys[ci]), lm_state,
            chunk_tokens=c, min_new_tokens=min_new_tokens, p_len=p_len,
        )
        tok_np = np.asarray(tokens[0])
        eos_hits = tok_np == cfg.lm.eos_speech
        n_valid = int(np.argmax(eos_hits)) if eos_hits.any() else c
        if n_valid == 0:
            break
        prev, count = count, count + n_valid
        prefix[0, prev:count] = tok_np[:n_valid]

        p_b = next(b for b in buckets if count <= b)
        toks_b = jnp.asarray(prefix[:, :p_b])
        mask_b = jnp.asarray((np.arange(p_b) < count)[None, :])
        mel, _ = _flow_prefix_j(
            params["flow"], cfg.flow, jax.random.fold_in(k_flow, p_b),
            toks_b, mask_b, safe_prompt, prompt_speech_mask,
            prompt_mel, spk_embedding,
        )
        new_mel = np.asarray(mel[0, r * prev: r * count], np.float32)
        nm = np.zeros((1, r * c, n_mels), np.float32)
        nm[0, : len(new_mel)] = new_mel

        wave, cache_mel, cache_src = _hift_chunk(
            params["hift"], cfg.hift, jnp.asarray(src_keys[ci]),
            cache_mel, cache_src, use_cache, jnp.asarray(nm),
            deterministic=deterministic_source,
        )
        use_cache = jnp.asarray(True)
        wav = np.asarray(wave[0], np.float32)
        start, end = cm * hop, (cm + len(new_mel)) * hop
        fade = min(fade_samples, cm * hop, end - start)
        out = wav[start:end]
        if held is not None and fade > 0:
            ramp = np.linspace(0.0, 1.0, len(held), dtype=np.float32)
            out = np.concatenate(
                [held * (1 - ramp) + wav[start - len(held):start] * ramp, out])
        if fade > 0:
            held = out[len(out) - fade:]
            out = out[: len(out) - fade]
        if len(out):
            yield out
        if n_valid < c:
            break
    if held is not None and len(held):
        yield held
