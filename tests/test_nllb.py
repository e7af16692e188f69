"""NLLB-JAX (M2M100) parity vs a random-weight torch HF model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.models import nllb as nj

torch = pytest.importorskip("torch")

TINY = dict(
    d_model=64, encoder_layers=2, decoder_layers=2, heads=4, ffn_dim=128,
    vocab_size=300, max_positions=64,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import M2M100Config, M2M100ForConditionalGeneration

    hf_cfg = M2M100Config(
        vocab_size=TINY["vocab_size"],
        d_model=TINY["d_model"],
        encoder_layers=TINY["encoder_layers"],
        decoder_layers=TINY["decoder_layers"],
        encoder_attention_heads=TINY["heads"],
        decoder_attention_heads=TINY["heads"],
        encoder_ffn_dim=TINY["ffn_dim"],
        decoder_ffn_dim=TINY["ffn_dim"],
        max_position_embeddings=TINY["max_positions"],
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        scale_embedding=True,
    )
    torch.manual_seed(0)
    model = M2M100ForConditionalGeneration(hf_cfg).eval()
    cfg = nj.NLLBConfig(**TINY)
    params = nj.from_hf_state_dict(model.state_dict(), cfg)
    return model, cfg, params


@pytest.fixture(scope="module")
def src(hf_pair):
    g = np.random.default_rng(0)
    toks = g.integers(3, 290, size=(2, 11)).astype(np.int64)
    toks[0, 8:] = 1  # pad tail of first sequence
    toks[:, -1] = 2  # eos... keep last real for second
    toks[0, 7] = 2
    return toks


def test_encoder_parity(hf_pair, src):
    model, cfg, params = hf_pair
    mask = (src != 1).astype(np.int64)
    with torch.no_grad():
        ref = model.model.encoder(
            torch.from_numpy(src), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(nj.encode(params, cfg, jnp.asarray(src)))
    # padded positions may differ (HF doesn't mask outputs); compare valid only
    np.testing.assert_allclose(got[1], ref[1], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got[0, :8], ref[0, :8], atol=2e-4, rtol=1e-3)


def test_teacher_forced_parity(hf_pair, src):
    model, cfg, params = hf_pair
    g = np.random.default_rng(1)
    dec = np.concatenate(
        [np.full((2, 1), 2), np.full((2, 1), 250), g.integers(3, 290, size=(2, 5))], axis=1
    )
    mask = (src != 1).astype(np.int64)
    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(src),
            attention_mask=torch.from_numpy(mask),
            decoder_input_ids=torch.from_numpy(dec),
        ).logits.numpy()
    enc = nj.encode(params, cfg, jnp.asarray(src))
    got = np.asarray(nj.decode_full(params, cfg, jnp.asarray(dec), enc, jnp.asarray(src)))
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_greedy_generate_matches_hf(hf_pair, src):
    model, cfg, params = hf_pair
    mask = (src != 1).astype(np.int64)
    forced_bos = 250
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.from_numpy(src),
            attention_mask=torch.from_numpy(mask),
            forced_bos_token_id=forced_bos,
            max_new_tokens=12, num_beams=1, do_sample=False,
        ).numpy()
    got = np.asarray(
        nj.generate(params, cfg, jnp.asarray(src), forced_bos, max_new_tokens=12)
    )
    for b in range(2):
        t = min(ref.shape[1], got.shape[1])
        # after EOS ours pads with pad_token; HF also pads with pad
        np.testing.assert_array_equal(got[b, :t], ref[b, :t])


@pytest.mark.parametrize("num_beams", [3, 5])
def test_beam_generate_matches_hf(hf_pair, src, num_beams):
    model, cfg, params = hf_pair
    mask = (src != 1).astype(np.int64)
    forced_bos = 250
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.from_numpy(src),
            attention_mask=torch.from_numpy(mask),
            forced_bos_token_id=forced_bos,
            max_new_tokens=10, num_beams=num_beams, do_sample=False,
            early_stopping=True, length_penalty=1.0,
        ).numpy()
    got = np.asarray(
        nj.generate(
            params, cfg, jnp.asarray(src), forced_bos,
            max_new_tokens=10, num_beams=num_beams,
        )
    )
    for b in range(2):
        t = min(ref.shape[1], got.shape[1])
        np.testing.assert_array_equal(got[b, :t], ref[b, :t])


def test_beam_min_new_tokens_matches_hf(hf_pair, src):
    """min_new_tokens under BEAM search must match HF: the EOS ban runs on
    log-softmaxed scores (HF's processor chain), not raw logits — a raw-logit
    ban renormalizes each beam differently and shifts cross-beam ranking."""
    model, cfg, params = hf_pair
    mask = (src != 1).astype(np.int64)
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.from_numpy(src),
            attention_mask=torch.from_numpy(mask),
            forced_bos_token_id=250,
            max_new_tokens=10, min_new_tokens=6, num_beams=4, do_sample=False,
            early_stopping=True, length_penalty=1.0,
        ).numpy()
    got = np.asarray(nj.generate(
        params, cfg, jnp.asarray(src), 250,
        max_new_tokens=10, min_new_tokens=6, num_beams=4))
    for b in range(src.shape[0]):
        t = min(ref.shape[1], got.shape[1])
        np.testing.assert_array_equal(got[b, :t], ref[b, :t])


def test_encode_rejects_overlong_source(hf_pair):
    """Sources past the sinusoid table must error like HF, not silently
    clamp the tail's position rows (the decoder-side guard's counterpart)."""
    _, cfg, params = hf_pair
    too_long = jnp.ones((1, cfg.max_positions + 2), jnp.int32) * 5
    with pytest.raises(ValueError, match="position table"):
        nj.encode(params, cfg, too_long)


def test_generate_jits(hf_pair, src):
    _, cfg, params = hf_pair
    fn = jax.jit(
        lambda p, s: nj.generate(p, cfg, s, 250, max_new_tokens=6, num_beams=3)
    )
    out = fn(params, jnp.asarray(src))
    assert out.shape[0] == 2
    assert out.dtype == jnp.int32


def test_min_new_tokens_matches_hf(hf_pair, src):
    """HF skips only the 1-token decoder prompt: the forced BOS counts as
    generated, so EOS must be allowed from sequence index min_new_tokens+1."""
    model, cfg, params = hf_pair
    mask = (src != 1).astype(np.int64)
    forced_bos = 250
    for m in (2, 4):
        with torch.no_grad():
            ref = model.generate(
                input_ids=torch.from_numpy(src),
                attention_mask=torch.from_numpy(mask),
                forced_bos_token_id=forced_bos,
                max_new_tokens=12, min_new_tokens=m,
                num_beams=1, do_sample=False,
            ).numpy()
        got = np.asarray(
            nj.generate(
                params, cfg, jnp.asarray(src), forced_bos,
                max_new_tokens=12, min_new_tokens=m,
            )
        )
        t = min(ref.shape[1], got.shape[1])
        np.testing.assert_array_equal(got[:, :t], ref[:, :t])


def test_max_new_tokens_zero_returns_prompt(hf_pair, src):
    _, cfg, params = hf_pair
    out = np.asarray(nj.generate(params, cfg, jnp.asarray(src), 250, max_new_tokens=0))
    np.testing.assert_array_equal(out, np.full((2, 1), cfg.decoder_start_token))
    with pytest.raises(ValueError):
        nj.generate(params, cfg, jnp.asarray(src), 250, max_new_tokens=-1)


def test_generate_rejects_horizon_past_position_table(hf_pair, src):
    _, cfg, params = hf_pair
    with pytest.raises(ValueError, match="position"):
        nj.generate(params, cfg, jnp.asarray(src), 250,
                    max_new_tokens=cfg.max_positions + 10)


def test_decode_full_masks_nontrailing_pad(hf_pair, src):
    """Left-padded decoder inputs: pad keys must not leak into real positions."""
    model, cfg, params = hf_pair
    g = np.random.default_rng(3)
    dec = np.concatenate(
        [np.full((2, 1), 2), np.full((2, 1), 250), g.integers(3, 290, size=(2, 5))],
        axis=1,
    )
    dec_left = np.concatenate([np.full((2, 2), 1), dec], axis=1)  # 2 pad cols first
    enc = nj.encode(params, cfg, jnp.asarray(src))
    base = np.asarray(nj.decode_full(params, cfg, jnp.asarray(dec), enc, jnp.asarray(src)))
    padded = np.asarray(
        nj.decode_full(params, cfg, jnp.asarray(dec_left), enc, jnp.asarray(src))
    )
    # Real positions shift right by 2 but keep identical logits (position ids
    # are pad-aware and pad keys are masked out of self-attention).
    np.testing.assert_allclose(padded[:, 2:], base, atol=2e-4, rtol=1e-3)
