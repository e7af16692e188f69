"""CosyVoice2 llm.pt conversion (models/cosyvoice.from_cosyvoice_llm_state_dict).

Builds a state dict with the OFFICIAL Qwen2LM key layout (cosyvoice.llm.llm —
``llm.model.*`` HF Qwen2ForCausalLM + llm_embedding + speech_embedding +
llm_decoder; greek_sft.yaml llm: block) from a real tiny HF Qwen2, converts,
and checks the mapping and a runnable synthesis prefill.
"""

import numpy as np
import pytest
import torch

from expressive_speech_translation_tpu.models import cosyvoice as cv, qwen2 as q2

H, LAYERS, HEADS, KV, FFN = 64, 2, 4, 2, 128
SPEECH = 50


@pytest.fixture(scope="module")
def llm_state():
    from transformers import Qwen2Config as HFQwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(HFQwen2Config(
        vocab_size=300, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, num_key_value_heads=KV,
        intermediate_size=FFN, max_position_embeddings=256,
        rope_theta=1_000_000.0,
    )).eval()
    state = {f"llm.model.{k}": v for k, v in hf.state_dict().items()}
    state["llm_embedding.weight"] = torch.randn(2, H)
    state["speech_embedding.weight"] = torch.randn(SPEECH + 3, H)
    state["llm_decoder.weight"] = torch.randn(SPEECH + 3, H)
    state["llm_decoder.bias"] = torch.randn(SPEECH + 3)
    return state, hf


@pytest.fixture(scope="module")
def lm_cfg():
    return cv.SpeechLMConfig(
        backbone=q2.Qwen2Config(hidden=H, layers=LAYERS, heads=HEADS,
                                kv_heads=KV, ffn_dim=FFN, max_positions=256),
        text_vocab=300, speech_token_size=SPEECH)


def test_conversion_mapping(llm_state, lm_cfg):
    state, hf = llm_state
    params = cv.from_cosyvoice_llm_state_dict(state, lm_cfg)

    # text embeddings = the Qwen2 embed_tokens table
    np.testing.assert_allclose(
        np.asarray(params["text_embed"]),
        hf.state_dict()["model.embed_tokens.weight"].numpy(), atol=1e-6)
    # ordinary + eos speech rows straight from speech_embedding
    np.testing.assert_allclose(
        np.asarray(params["speech_embed"][: SPEECH + 1]),
        state["speech_embedding.weight"][: SPEECH + 1].numpy(), atol=1e-6)
    # sos/task control slots come from llm_embedding rows 0/1
    np.testing.assert_allclose(
        np.asarray(params["speech_embed"][lm_cfg.sos_index]),
        state["llm_embedding.weight"][0].numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["speech_embed"][lm_cfg.task_index]),
        state["llm_embedding.weight"][1].numpy(), atol=1e-6)
    # head = llm_decoder transposed (+ bias)
    np.testing.assert_allclose(
        np.asarray(params["head"]["kernel"]),
        state["llm_decoder.weight"].numpy().T, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["head"]["bias"]),
        state["llm_decoder.bias"].numpy(), atol=1e-6)


def test_converted_backbone_matches_hf_forward(llm_state, lm_cfg):
    """The stripped llm.model.* sub-dict must behave exactly like the HF
    backbone (reuses the qwen2 parity machinery on converted params)."""
    import jax.numpy as jnp

    state, hf = llm_state
    params = cv.from_cosyvoice_llm_state_dict(state, lm_cfg)
    g = np.random.default_rng(0)
    x = g.standard_normal((1, 7, H)).astype(np.float32)
    ours = q2.forward(params["backbone"], lm_cfg.backbone, jnp.asarray(x))
    with torch.no_grad():
        theirs = hf.model(inputs_embeds=torch.tensor(x),
                          attention_mask=torch.ones(1, 7, dtype=torch.long))
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.last_hidden_state.numpy(), atol=2e-4)


def test_converted_lm_synthesizes_tokens(llm_state, lm_cfg):
    import jax
    import jax.numpy as jnp

    state, _ = llm_state
    params = cv.from_cosyvoice_llm_state_dict(state, lm_cfg)
    text = jnp.asarray([[3, 4, 5, 6]], jnp.int32)
    tmask = jnp.ones((1, 4), bool)
    psp = jnp.asarray([[1, 2]], jnp.int32)
    psm = jnp.ones((1, 2), bool)
    toks, n = cv.generate_speech_tokens(
        params, lm_cfg, jax.random.PRNGKey(0), text, tmask, psp, psm,
        max_new_tokens=8)
    assert toks.shape[1] == 8
    assert (np.asarray(toks) < SPEECH + 3).all()


def test_load_cosyvoice_llm_roundtrip(llm_state, lm_cfg, tmp_path):
    state, _ = llm_state
    torch.save(state, tmp_path / "llm.pt")
    from expressive_speech_translation_tpu.models import loaders

    params, cfg = loaders.load_cosyvoice_llm(tmp_path, cfg=lm_cfg)
    assert cfg.speech_token_size == SPEECH
    direct = cv.from_cosyvoice_llm_state_dict(state, lm_cfg)
    np.testing.assert_allclose(np.asarray(params["speech_embed"]),
                               np.asarray(direct["speech_embed"]), atol=1e-6)
    # dim inference rejects non-0.5B checkpoints without an explicit cfg
    with pytest.raises(ValueError, match="not .*0.5B|not \\n?Qwen2-0.5B"):
        loaders.load_cosyvoice_llm(tmp_path)
