"""End-to-end real-weights TTS path: official-naming .pt checkpoints →
bake_models --tts → load_official_tts → synthesize_official.

The reference deploys llm.pt/flow.pt/hift.pt baked into its image
(Docker/Dockerfile.cosyvoice:37-52); no checkpoint ships here, so the triple
is emitted synthetically in the official naming (models/flow_matcha
to_flow_state_dict, models/hift to_hift_state_dict, an llm.pt built in the
Qwen2LM layout) and driven through the exact production loading chain.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.models import (
    cosyvoice as cv,
    cosyvoice_official as co,
    flow_matcha as fm,
    hift as hm,
    loaders,
    qwen2 as q2,
)

TINY = co.OfficialTtsConfig.tiny()


def _tiny_llm_state(cfg: cv.SpeechLMConfig) -> dict:
    """Emit an official-naming Qwen2LM llm.pt state dict from random values
    (llm.model.* HF backbone + llm_embedding + speech_embedding +
    llm_decoder, models/cosyvoice.from_cosyvoice_llm_state_dict contract)."""
    g = torch.Generator().manual_seed(0)
    b = cfg.backbone

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    state = {
        "llm_embedding.weight": r(2, b.hidden),
        "speech_embedding.weight": r(cfg.speech_token_size + 3, b.hidden),
        "llm_decoder.weight": r(cfg.speech_token_size + 3, b.hidden),
        "llm_decoder.bias": r(cfg.speech_token_size + 3),
        "llm.model.model.embed_tokens.weight": r(cfg.text_vocab, b.hidden),
        "llm.model.model.norm.weight": torch.ones(b.hidden),
    }
    head_dim = b.hidden // b.heads
    for i in range(b.layers):
        p = f"llm.model.model.layers.{i}"
        state.update({
            f"{p}.input_layernorm.weight": torch.ones(b.hidden),
            f"{p}.post_attention_layernorm.weight": torch.ones(b.hidden),
            f"{p}.self_attn.q_proj.weight": r(b.heads * head_dim, b.hidden),
            f"{p}.self_attn.q_proj.bias": r(b.heads * head_dim),
            f"{p}.self_attn.k_proj.weight": r(b.kv_heads * head_dim, b.hidden),
            f"{p}.self_attn.k_proj.bias": r(b.kv_heads * head_dim),
            f"{p}.self_attn.v_proj.weight": r(b.kv_heads * head_dim, b.hidden),
            f"{p}.self_attn.v_proj.bias": r(b.kv_heads * head_dim),
            f"{p}.self_attn.o_proj.weight": r(b.hidden, b.heads * head_dim),
            f"{p}.mlp.gate_proj.weight": r(b.ffn_dim, b.hidden),
            f"{p}.mlp.up_proj.weight": r(b.ffn_dim, b.hidden),
            f"{p}.mlp.down_proj.weight": r(b.hidden, b.ffn_dim),
        })
    return state


@pytest.fixture(scope="module")
def baked_root(tmp_path_factory):
    src = tmp_path_factory.mktemp("cosyvoice_ckpt")
    out = tmp_path_factory.mktemp("baked")

    torch.save(_tiny_llm_state(TINY.lm), src / "llm.pt")
    flow_params = fm.init_official_flow(jax.random.PRNGKey(0), TINY.flow)
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in fm.to_flow_state_dict(flow_params, TINY.flow).items()},
               src / "flow.pt")
    hift_params = hm.init_hift(jax.random.PRNGKey(1), TINY.hift)
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in hm.to_hift_state_dict(hift_params, TINY.hift).items()},
               src / "hift.pt")

    loaders.bake_models(out, tts=str(src), tts_llm_cfg=TINY.lm,
                        tts_flow_cfg=TINY.flow, tts_hift_cfg=TINY.hift)
    return out, flow_params, hift_params


def test_bake_produces_all_three_submodels(baked_root):
    out, _, _ = baked_root
    for sub in ("tts_llm", "tts_flow", "tts_hift"):
        assert (out / sub / "config.json").exists(), f"{sub} not baked"


def test_load_official_tts_roundtrips_params(baked_root):
    out, flow_params, hift_params = baked_root
    params, cfg = loaders.load_official_tts(out)
    assert cfg.flow.vocab_size == TINY.flow.vocab_size
    assert cfg.hift.base_channels == TINY.hift.base_channels
    for a, b in zip(jax.tree_util.tree_leaves(params["flow"]),
                    jax.tree_util.tree_leaves(flow_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(params["hift"]),
                    jax.tree_util.tree_leaves(hift_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow


def test_synthesize_official_end_to_end(baked_root):
    """The full official chain on baked weights: RAS LM decode → prompt-
    conditioned CFM mel → NSF-iSTFT vocoder, 24 kHz out."""
    out, _, _ = baked_root
    params, cfg = loaders.load_official_tts(out)
    g = np.random.default_rng(0)
    b, tt, tp = 1, 6, 4
    text = jnp.asarray(g.integers(0, cfg.lm.text_vocab, (b, tt)), jnp.int32)
    ptok = jnp.asarray(g.integers(0, min(cfg.lm.speech_token_size,
                                         cfg.flow.vocab_size), (b, tp)), jnp.int32)
    pmel = jnp.asarray(
        g.standard_normal((b, tp * cfg.flow.token_mel_ratio,
                           cfg.flow.output_size)), jnp.float32)
    spk = jnp.asarray(g.standard_normal((b, cfg.flow.spk_embed_dim)), jnp.float32)

    out_d = co.synthesize_official(
        params, cfg, jax.random.PRNGKey(7), text, jnp.ones((b, tt), bool),
        ptok, jnp.ones((b, tp), bool), spk, pmel,
        max_new_tokens=8, min_new_tokens=8)
    audio = np.asarray(out_d["audio"])
    assert audio.shape == (b, 8 * cfg.flow.token_mel_ratio * cfg.hift.hop)
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() <= cfg.hift.audio_limit + 1e-6


def test_synthesize_streaming_official_conserves_samples(baked_root):
    """Chunked official-chain streaming: yielded chunks concatenate to an
    exact whole-token sample count, emission is multi-chunk, joins finite."""
    out, _, _ = baked_root
    params, cfg = loaders.load_official_tts(out)
    g = np.random.default_rng(0)
    b, tt, tp = 1, 6, 4
    text = jnp.asarray(g.integers(0, cfg.lm.text_vocab, (b, tt)), jnp.int32)
    ptok = jnp.asarray(g.integers(0, min(cfg.lm.speech_token_size,
                                         cfg.flow.vocab_size), (b, tp)), jnp.int32)
    pmel = jnp.asarray(
        g.standard_normal((b, tp * cfg.flow.token_mel_ratio,
                           cfg.flow.output_size)), jnp.float32)
    spk = jnp.asarray(g.standard_normal((b, cfg.flow.spk_embed_dim)), jnp.float32)

    chunks = list(co.synthesize_streaming_official(
        params, cfg, jax.random.PRNGKey(7), text, jnp.ones((b, tt), bool),
        ptok, jnp.ones((b, tp), bool), spk, pmel,
        chunk_tokens=4, mel_cache_frames=3, fade_samples=128,
        max_new_tokens=12, min_new_tokens=2))
    assert len(chunks) >= 2, "streaming must emit incrementally"
    wav = np.concatenate(chunks)
    assert np.isfinite(wav).all()
    spt = cfg.flow.token_mel_ratio * cfg.hift.hop     # samples per token
    assert len(wav) % spt == 0
    assert 2 <= len(wav) // spt <= 12
    # batch > 1 rejected
    with pytest.raises(ValueError):
        next(co.synthesize_streaming_official(
            params, cfg, jax.random.PRNGKey(8),
            jnp.tile(text, (2, 1)), jnp.ones((2, tt), bool),
            jnp.tile(ptok, (2, 1)), jnp.ones((2, tp), bool),
            jnp.tile(spk, (2, 1)), jnp.tile(pmel, (2, 1, 1))))


def test_llm_converter_from_emitted_state(baked_root):
    out, _, _ = baked_root
    params, cfg = loaders.load_converted(out / "tts_llm", cv.SpeechLMConfig)
    assert params["speech_embed"].shape == (cfg.speech_token_size + 3,
                                            cfg.backbone.hidden)
    assert isinstance(cfg.backbone, q2.Qwen2Config)


# ---------------------------------------------------- serving-engine wiring


ENGINE_TINY = co.OfficialTtsConfig(
    lm=TINY.lm,
    flow=fm.OfficialFlowConfig(
        vocab_size=64, input_size=32, output_size=80, spk_embed_dim=192,
        encoder=fm.UpsampleConformerConfig(size=32, heads=4, linear_units=64,
                                           blocks=1, up_blocks=1),
        estimator=fm.CausalDecoderConfig(in_channels=320, out_channels=80,
                                         channels=32, heads=2, head_dim=16,
                                         n_blocks=1, num_mid_blocks=1),
        n_timesteps=2),
    hift=hm.HiFTConfig(in_channels=80, base_channels=32, nb_harmonics=2,
                       f0_cond_channels=16),
)


@pytest.mark.slow


def test_engine_official_mode_synthesizes():
    """JaxCosyVoiceTts(official=…): the serving engine runs the official
    chain end-to-end (engine conditioning: ECAPA 192-d x-vector + 80-mel
    kaldi prompt mel + FSQ prompt tokens → LM → CFM → HiFT @24 kHz)."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.pipeline.jax_engines import (
        JaxCosyVoiceTts,
    )

    params = co.init_official_tts(jax.random.PRNGKey(0), ENGINE_TINY)
    tts = JaxCosyVoiceTts(dtype=jnp.float32, seconds_per_char=0.02,
                          official=(params, ENGINE_TINY))
    assert tts.weightless is False
    assert tts.sample_rate == 24_000

    wave = tts.synthesize("hello official weights")
    assert np.isfinite(wave).all() and len(wave) > 0

    # with a cloning reference (exercises the fused conditioning path)
    g = np.random.default_rng(0)
    ref = (0.2 * np.sin(np.arange(32_000) * 0.05)
           + 0.01 * g.standard_normal(32_000)).astype(np.float32)
    wave_ref = tts.synthesize("cloned voice", reference_audio_16k=ref)
    assert np.isfinite(wave_ref).all() and len(wave_ref) > 0

    # batched path returns per-request trimmed waveforms
    outs = tts.synthesize_batch([
        {"text": "one"}, {"text": "two", "reference_audio_16k": ref},
    ])
    assert len(outs) == 2 and all(np.isfinite(o).all() for o in outs)

    # streaming contract: official mode streams chunked audio
    chunks = list(tts.synthesize_streaming("stream me"))
    assert len(chunks) >= 1 and all(np.isfinite(c).all() for c in chunks)


def test_jax_engines_factory_picks_up_baked_triple(baked_root, monkeypatch):
    out, _, _ = baked_root
    monkeypatch.setenv("EST_MODELS_DIR", str(out))
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.pipeline.jax_engines import jax_engines

    eng = jax_engines(scale="toy")
    assert eng.tts.official is not None
    assert eng.tts.weightless is False
    assert eng.tts.official_cfg.flow.vocab_size == TINY.flow.vocab_size


def test_sft_exported_mtp_llm_serves_through_official_chain(baked_root, tmp_path):
    """The reference's deployment pattern — swap ONLY the fine-tuned LM on
    top of the pretrained flow/vocoder (Docker/Dockerfile.cosyvoice:49-52) —
    with an MTP-trained LM: train/run.py --export-dir writes the LM via
    save_converted (config carries mtp and params carry mtp_heads); the
    serving loader + engine then decode K tokens per backbone pass with NO
    extra configuration."""
    out, _, _ = baked_root
    lm_cfg = dataclasses.replace(TINY.lm, mtp=2)
    lm_params = cv.init_speech_lm(jax.random.PRNGKey(5), lm_cfg)
    assert len(lm_params["mtp_heads"]) == 1

    root = tmp_path / "models"
    loaders.save_converted(lm_params, lm_cfg, root / "tts_llm")
    # pretrained flow/hift stay as baked
    import shutil

    for sub in ("tts_flow", "tts_hift"):
        shutil.copytree(out / sub, root / sub)

    params, cfg = loaders.load_official_tts(root)
    assert cfg.lm.mtp == 2
    assert "mtp_heads" in params["lm"]

    from expressive_speech_translation_tpu.pipeline.jax_engines import (
        JaxCosyVoiceTts,
    )

    tts = JaxCosyVoiceTts(dtype=jnp.float32, seconds_per_char=0.02,
                          official=(params, cfg))
    assert tts.official_cfg.lm.mtp == 2     # not downgraded
    wave = tts.synthesize("mtp served speech")
    assert np.isfinite(wave).all() and len(wave) > 0


def test_official_mtp_config_without_heads_downgrades(baked_root):
    """A config claiming mtp>1 whose params lack the heads must not crash
    the server: the engine falls back to single-token decode."""
    out, _, _ = baked_root
    params, cfg = loaders.load_official_tts(out)
    bad_cfg = dataclasses.replace(
        cfg, lm=dataclasses.replace(cfg.lm, mtp=3))
    assert "mtp_heads" not in params["lm"]

    from expressive_speech_translation_tpu.pipeline.jax_engines import (
        JaxCosyVoiceTts,
    )

    tts = JaxCosyVoiceTts(dtype=jnp.float32, seconds_per_char=0.02,
                          official=(params, bad_cfg))
    assert tts.official_cfg.lm.mtp == 1
    wave = tts.synthesize("downgraded decode")
    assert np.isfinite(wave).all() and len(wave) > 0


def test_official_mtp_width_mismatch_reconciles_to_heads(baked_root, tmp_path):
    """A config whose mtp width disagrees with the head count the LM params
    actually carry (e.g. a new llm.pt copied into a dir whose config came
    from a different-width export) must serve at the params' own width, not
    IndexError on every request."""
    out, _, _ = baked_root
    lm_cfg = dataclasses.replace(TINY.lm, mtp=2)
    lm_params = cv.init_speech_lm(jax.random.PRNGKey(6), lm_cfg)
    assert len(lm_params["mtp_heads"]) == 1   # width 2

    root = tmp_path / "models"
    loaders.save_converted(lm_params, lm_cfg, root / "tts_llm")
    import shutil

    for sub in ("tts_flow", "tts_hift"):
        shutil.copytree(out / sub, root / sub)

    params, cfg = loaders.load_official_tts(root)
    wide_cfg = dataclasses.replace(
        cfg, lm=dataclasses.replace(cfg.lm, mtp=4))   # claims 3 heads

    from expressive_speech_translation_tpu.pipeline.jax_engines import (
        JaxCosyVoiceTts,
    )

    tts = JaxCosyVoiceTts(dtype=jnp.float32, seconds_per_char=0.02,
                          official=(params, wide_cfg))
    assert tts.official_cfg.lm.mtp == 2
    wave = tts.synthesize("width reconciled to the trained heads")
    assert np.isfinite(wave).all() and len(wave) > 0


def test_load_cosyvoice_flow_infers_config(tmp_path):
    """cfg=None path: structural dims are inferred from the state-dict key
    layout (regression: the mid-block and transformer-block counts parsed
    the wrong '.'-segment, crashing or silently halving the estimator)."""
    flow_params = fm.init_official_flow(jax.random.PRNGKey(2), TINY.flow)
    path = tmp_path / "flow.pt"
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in fm.to_flow_state_dict(flow_params, TINY.flow).items()},
               path)
    _, cfg = loaders.load_cosyvoice_flow(path, cfg=None)
    assert cfg.vocab_size == TINY.flow.vocab_size
    assert cfg.input_size == TINY.flow.input_size
    assert cfg.output_size == TINY.flow.output_size
    assert cfg.spk_embed_dim == TINY.flow.spk_embed_dim
    assert cfg.encoder.blocks == TINY.flow.encoder.blocks
    assert cfg.encoder.up_blocks == TINY.flow.encoder.up_blocks
    assert cfg.estimator.num_mid_blocks == TINY.flow.estimator.num_mid_blocks
    assert cfg.estimator.n_blocks == TINY.flow.estimator.n_blocks
    assert cfg.estimator.channels == TINY.flow.estimator.channels
