"""MuseTalk's DEFAULT audio condition is 50 Hz Whisper ENCODER states
(reference: Docker/api_inference_logic.py:63-72 loads a resident WhisperModel;
:99-102 aligns its encoder features to video fps). These tests pin the
feature rate, the fps window alignment against the reference's chunking, and
that the pipeline actually switches from the log-mel fallback to the encoder
when a width-matched whisper is supplied."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.models import musetalk as mt, whisper as wj
from expressive_speech_translation_tpu.pipeline.musetalk_pipeline import (
    MuseTalkPipeline, _mel_audio_features, whisper_feature_fn,
)

WCFG = wj.WhisperConfig(d_model=48, encoder_layers=1, decoder_layers=1,
                        heads=2, ffn_dim=96, vocab_size=1024)


@pytest.fixture(scope="module")
def w_params():
    return wj.init_whisper(jax.random.PRNGKey(2), WCFG)


def test_whisper_features_are_50hz(w_params):
    fn = whisper_feature_fn(w_params, WCFG, dtype=jnp.float32)
    for seconds in (0.5, 2.0, 3.3):
        audio = np.zeros(int(16_000 * seconds), np.float32)
        feats = fn(audio)
        assert feats.shape == (int(np.ceil(seconds * 50)), WCFG.d_model)


def test_window_alignment_matches_reference_chunking(w_params):
    """Per video frame: a ctx-step window of 50 Hz features centred at the
    frame time — frame i at fps f covers feature indices around i·50/f,
    the musetalk get_whisper_chunk invariant."""
    fn = whisper_feature_fn(w_params, WCFG, dtype=jnp.float32)
    fps, n_frames = 25.0, 10
    audio = np.random.default_rng(0).standard_normal(int(16_000 * n_frames / fps)).astype(np.float32)
    feats = fn(audio)
    ctx = 6
    win = mt.whisper_chunks_for_video(feats, n_frames=n_frames, fps=fps, ctx=ctx)
    assert win.shape == (n_frames, ctx, WCFG.d_model)
    t_feat = feats.shape[0]
    for i in range(n_frames):
        center = int(i / fps * 50.0)
        start = min(max(center - ctx // 2, 0), max(t_feat - ctx, 0))
        idx = np.clip(np.arange(start, start + ctx), 0, t_feat - 1)
        np.testing.assert_allclose(np.asarray(win[i]), np.asarray(feats[idx]),
                                   atol=0)


def test_pipeline_prefers_whisper_when_width_matches(w_params):
    cfg = mt.MuseTalkConfig(image_size=32, vae_channels=(8, 16), vae_layers=1,
                            unet_channels=(8, 16), unet_layers=1,
                            audio_dim=WCFG.d_model, audio_ctx=6, heads=2,
                            norm_groups=4)
    params = mt.init_musetalk(jax.random.PRNGKey(3), cfg)
    pipe = MuseTalkPipeline(params, cfg, whisper=(w_params, WCFG),
                            dtype=jnp.float32)
    audio = np.random.default_rng(1).standard_normal(16_000).astype(np.float32)
    feats = pipe.audio_feature_fn(audio)
    expected = whisper_feature_fn(w_params, WCFG, dtype=jnp.float32)(audio)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(expected), atol=1e-5)
    # and it is NOT the mel fallback
    mel = _mel_audio_features(audio, cfg.audio_dim)
    assert feats.shape[-1] == cfg.audio_dim
    assert not np.allclose(np.asarray(feats)[: mel.shape[0]],
                           np.asarray(mel)[: feats.shape[0]])


def test_pipeline_falls_back_on_width_mismatch(w_params, caplog):
    cfg = mt.MuseTalkConfig(image_size=32, vae_channels=(8, 16), vae_layers=1,
                            unet_channels=(8, 16), unet_layers=1,
                            audio_dim=12, audio_ctx=6, heads=2, norm_groups=4)
    params = mt.init_musetalk(jax.random.PRNGKey(4), cfg)
    import logging

    with caplog.at_level(logging.WARNING):
        pipe = MuseTalkPipeline(params, cfg, whisper=(w_params, WCFG),
                                dtype=jnp.float32)
    assert any("audio_dim" in r.message for r in caplog.records)
    audio = np.zeros(8000, np.float32)
    feats = pipe.audio_feature_fn(audio)
    np.testing.assert_allclose(np.asarray(feats),
                               np.asarray(_mel_audio_features(audio, 12)), atol=1e-6)
