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


def test_jax_engines_picks_up_baked_conditioning(tmp_path, monkeypatch):
    """A baked ecapa/ tree must reach the TTS voice-prompt conditioning —
    otherwise cloning silently runs on a random x-vector even when every
    main model is loaded."""
    import jax

    from expressive_speech_translation_tpu.models import ecapa as ec
    from expressive_speech_translation_tpu.models.common import host_init

    cfg = ec.EcapaConfig(channels=32, bottleneck=16, attn_channels=16)
    params = host_init(ec.init_ecapa, 7, cfg)
    loaders.save_converted(params, cfg, tmp_path / "ecapa")
    monkeypatch.setenv("EST_MODELS_DIR", str(tmp_path))
    from expressive_speech_translation_tpu.pipeline.jax_engines import jax_engines

    eng = jax_engines(scale="toy")
    tts = eng.tts
    assert tts.conditioning_weightless is False
    assert tts._ecapa_cfg.channels == 32
    # random main weights + loaded conditioning is fine (no cond=random tag);
    # the tag is for the inverse quadrant
    assert "cond=random" not in eng.decode_info()["tts"]


def test_decode_info_flags_random_conditioning():
    """Loaded main weights + random conditioning must be operator-visible."""
    from expressive_speech_translation_tpu.models import cosyvoice as cv, qwen2 as q2m
    from expressive_speech_translation_tpu.models.common import host_init
    from expressive_speech_translation_tpu.pipeline.engines import (
        Engines, FakeAsr, FakeNmt,
    )
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxCosyVoiceTts

    cfg = cv.CosyVoiceConfig(
        lm=cv.SpeechLMConfig(
            backbone=q2m.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                     ffn_dim=64, max_positions=512),
            text_vocab=128, speech_token_size=61),
        flow=cv.FlowConfig(token_vocab=64, dim=32, layers=1, heads=4, n_steps=2),
        vocoder=cv.VocoderConfig(base_channels=32, upsample_rates=(8, 6, 10),
                                 upsample_kernels=(16, 12, 20)),
    )
    params = host_init(cv.init_cosyvoice, 2, cfg)   # "loaded" main weights
    tts = JaxCosyVoiceTts(cfg, params, seconds_per_char=0.02)
    assert tts.conditioning_weightless is True and tts.weightless is False
    info = Engines(asr=FakeAsr(), nmt=FakeNmt(), tts=tts).decode_info()
    assert "cond=random" in info["tts"]


def test_bake_tts_llm(tmp_path):
    """--tts bakes the speech-LM (llm.pt, the Greek-SFT checkpoint); missing
    checkpoints fail with the actionable not-found error."""
    from test_cosyvoice_convert import H, HEADS, KV, FFN, LAYERS, SPEECH

    from transformers import Qwen2Config as HFQwen2Config, Qwen2ForCausalLM

    torch.manual_seed(2)
    hf = Qwen2ForCausalLM(HFQwen2Config(
        vocab_size=300, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, num_key_value_heads=KV,
        intermediate_size=FFN, max_position_embeddings=256))
    state = {f"llm.model.{k}": v for k, v in hf.state_dict().items()}
    state["llm_embedding.weight"] = torch.randn(2, H)
    state["speech_embedding.weight"] = torch.randn(SPEECH + 3, H)
    state["llm_decoder.weight"] = torch.randn(SPEECH + 3, H)
    ckpt_dir = tmp_path / "cosy"
    ckpt_dir.mkdir()
    torch.save(state, ckpt_dir / "llm.pt")

    import expressive_speech_translation_tpu.models.cosyvoice as cv
    import expressive_speech_translation_tpu.models.qwen2 as q2

    cfg = cv.SpeechLMConfig(
        backbone=q2.Qwen2Config(hidden=H, layers=LAYERS, heads=HEADS,
                                kv_heads=KV, ffn_dim=FFN, max_positions=256),
        text_vocab=300, speech_token_size=SPEECH)
    params, _ = loaders.load_cosyvoice_llm(ckpt_dir, cfg=cfg)
    loaders.save_converted(params, cfg, tmp_path / "out" / "tts_llm")
    assert (tmp_path / "out" / "tts_llm" / "config.json").exists()

    with pytest.raises(WeightsNotFoundError):
        loaders.bake_models(tmp_path / "out2", tts="/nonexistent")


def test_loaders_cli(hf_whisper_dir, tmp_path):
    assert loaders.main(["--asr", str(hf_whisper_dir), "--out", str(tmp_path)]) == 0
    cfg = json.loads((tmp_path / "asr" / "config.json").read_text())
    assert cfg["d_model"] == 64


def test_loaders_cli_accepts_every_bake_flag(tmp_path):
    """The standalone converter CLI and `est bake` must support the same
    model set — --seamless was missing from one of them once."""
    import argparse

    for flag in ("--asr", "--nmt", "--tts", "--musetalk", "--musetalk-whisper",
                 "--diff2lip", "--openvoice", "--ecapa", "--seamless"):
        # argparse exits 2 on unknown flags; a missing-file error from the
        # converter itself proves the flag parsed
        with pytest.raises((WeightsNotFoundError, Exception)) as e:
            loaders.main([flag, str(tmp_path / "nope"), "--out", str(tmp_path)])
        assert not isinstance(e.value, (SystemExit, argparse.ArgumentError)), flag


@pytest.mark.slow
def test_bake_musetalk_roundtrip(tmp_path):
    """MuseTalk release layout (sd-vae-ft-mse/ + musetalk/) → bake_models
    --musetalk → orbax tree that reloads config-true and output-identical
    (incl. the None leaves for blocks without down/upsamplers)."""
    from test_musetalk_convert import CFG as MCFG, TorchUNet, TorchVAE

    from expressive_speech_translation_tpu.models import musetalk as mt

    root = tmp_path / "MuseTalk_models"
    vae_dir = root / "sd-vae-ft-mse"
    unet_dir = root / "musetalk"
    vae_dir.mkdir(parents=True)
    unet_dir.mkdir()

    torch.manual_seed(5)
    tv, tu = TorchVAE(MCFG).eval(), TorchUNet(MCFG).eval()
    torch.save(tv.state_dict(), vae_dir / "diffusion_pytorch_model.bin")
    (vae_dir / "config.json").write_text(json.dumps({
        "block_out_channels": list(MCFG.vae_channels),
        "layers_per_block": MCFG.vae_layers,
        "latent_channels": MCFG.latent_channels,
        "norm_num_groups": MCFG.norm_groups,
    }))
    torch.save(tu.state_dict(), unet_dir / "pytorch_model.bin")
    (unet_dir / "musetalk.json").write_text(json.dumps({
        "block_out_channels": list(MCFG.unet_channels),
        "layers_per_block": MCFG.unet_layers,
        "cross_attention_dim": MCFG.audio_dim,
        "attention_head_dim": MCFG.heads,
    }))

    out = tmp_path / "baked"
    loaders.bake_models(out, musetalk=str(root))
    params, cfg = loaders.load_converted(out / "musetalk", mt.MuseTalkConfig)
    assert cfg.audio_dim == MCFG.audio_dim
    assert cfg.unet_channels == MCFG.unet_channels
    # None placeholders (no downsampler in the last block) survive the trip
    assert params["vae"]["encoder"]["down"][-1]["downsample"] is None

    g = np.random.default_rng(7)
    imgs = np.asarray(g.uniform(-1, 1, (1, 32, 32, 3)), np.float32)
    import jax.numpy as jnp

    direct = mt.from_hf_state_dict(tv.state_dict(), tu.state_dict(), MCFG)
    a = mt.vae_encode(params["vae"], cfg, jnp.asarray(imgs))
    b = mt.vae_encode(direct["vae"], MCFG, jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_bake_seamless_roundtrip(tmp_path):
    """HF seamless-m4t-v2 dir (tiny) → bake_models --seamless → orbax tree
    that reloads config-true, plus the generation-maps sidecar."""
    from test_seamless_convert import _hf_pair

    from expressive_speech_translation_tpu.models import seamless as sm

    model, direct, cfg = _hf_pair()
    src = tmp_path / "hf_seamless"
    src.mkdir()
    model.save_pretrained(src, safe_serialization=True)
    (src / "generation_config.json").write_text(json.dumps({
        "text_decoder_lang_to_code_id": {"fra": 5},
        "vocoder_lang_code_to_id": {"fra": 2},
        "id_to_text": {"4": "▁le"},
        "char_to_id": {"l": 9, "e": 10},
    }))

    out = tmp_path / "baked"
    loaders.bake_models(out, seamless=str(src))
    params, got_cfg = loaders.load_converted(out / "seamless", sm.SeamlessConfig)
    assert got_cfg.hidden == cfg.hidden
    assert got_cfg.upsample_rates == cfg.upsample_rates
    maps = json.loads((out / "seamless" / "generation_maps.json").read_text())
    assert maps["text_decoder_lang_to_code_id"]["fra"] == 5

    import jax.numpy as jnp
    g = np.random.default_rng(11)
    feats = g.standard_normal((1, 12, 160)).astype(np.float32)
    a, _ = sm.encode_speech(params, got_cfg, jnp.asarray(feats))
    b, _ = sm.encode_speech(direct, cfg, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
