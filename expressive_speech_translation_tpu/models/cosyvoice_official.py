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
from typing import Any, Dict

import jax
import jax.numpy as jnp

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
    tokens, lengths = cv.generate_speech_tokens(
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
                              deterministic=deterministic_source)
    return {
        "audio": audio,
        "mel": mel,
        "speech_tokens": tokens,
        "token_lengths": lengths,
        "frame_mask": frame_mask,
    }
