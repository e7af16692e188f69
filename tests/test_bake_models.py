"""Model baking round-trip (deploy/Dockerfile.models → models/loaders.py):
HF checkpoint dir → bake_models → native orbax tree → jax_engines serves it
with weights reported as loaded.
"""

import json

import numpy as np
import pytest
import torch

from expressive_speech_translation_tpu.models import loaders, whisper as wj
from expressive_speech_translation_tpu.models.loaders import WeightsNotFoundError


@pytest.fixture(scope="module")
def hf_whisper_dir(tmp_path_factory):
    from transformers import WhisperConfig as HFConfig, WhisperForConditionalGeneration

    hf_cfg = HFConfig(
        vocab_size=1024, num_mel_bins=80, encoder_layers=1,
        encoder_attention_heads=4, decoder_layers=1, decoder_attention_heads=4,
        d_model=64, encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=1500, max_target_positions=448,
        eos_token_id=999, bos_token_id=998, pad_token_id=999,
        decoder_start_token_id=998,
    )
    torch.manual_seed(1)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    d = tmp_path_factory.mktemp("hf_whisper")
    model.save_pretrained(d, safe_serialization=True)
    return d


def test_bake_and_load_roundtrip(hf_whisper_dir, tmp_path):
    loaders.bake_models(tmp_path, asr=str(hf_whisper_dir))
    assert (tmp_path / "asr" / "config.json").exists()

    params, cfg = loaders.load_converted(tmp_path / "asr", wj.WhisperConfig)
    assert cfg.d_model == 64 and cfg.encoder_layers == 1
    direct, _ = loaders.load_whisper(hf_whisper_dir)
    # converted tree equals the direct conversion leaf-for-leaf
    import jax

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(direct),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_jax_engines_picks_up_baked_weights(hf_whisper_dir, tmp_path, monkeypatch):
    loaders.bake_models(tmp_path, asr=str(hf_whisper_dir))
    monkeypatch.setenv("EST_MODELS_DIR", str(tmp_path))
    from expressive_speech_translation_tpu.pipeline.jax_engines import jax_engines

    eng = jax_engines()
    assert eng.asr.weightless is False
    assert eng.asr.cfg.d_model == 64
    # NMT dir absent → stays random-weight and says so
    assert eng.nmt.weightless is True
    out = eng.asr.transcribe(
        (0.1 * np.random.default_rng(0).standard_normal(16000)).astype(np.float32),
        language="eng")
    assert "text" in out and "words" in out


def test_bake_tts_honestly_unimplemented(tmp_path):
    with pytest.raises(WeightsNotFoundError, match="CosyVoice checkpoint conversion"):
        loaders.bake_models(tmp_path, tts="/nonexistent")


def test_loaders_cli(hf_whisper_dir, tmp_path):
    assert loaders.main(["--asr", str(hf_whisper_dir), "--out", str(tmp_path)]) == 0
    cfg = json.loads((tmp_path / "asr" / "config.json").read_text())
    assert cfg["d_model"] == 64
