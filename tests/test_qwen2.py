"""Qwen2 backbone parity vs random-weight torch HF Qwen2Model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.models import qwen2 as qj

torch = pytest.importorskip("torch")

TINY = dict(hidden=64, layers=2, heads=4, kv_heads=2, ffn_dim=128, max_positions=128)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import Qwen2Config as HFConfig, Qwen2Model

    hf_cfg = HFConfig(
        vocab_size=100,
        hidden_size=TINY["hidden"],
        num_hidden_layers=TINY["layers"],
        num_attention_heads=TINY["heads"],
        num_key_value_heads=TINY["kv_heads"],
        intermediate_size=TINY["ffn_dim"],
        max_position_embeddings=TINY["max_positions"],
        rope_theta=1_000_000.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = Qwen2Model(hf_cfg).eval()
    cfg = qj.Qwen2Config(**TINY)
    params = qj.from_hf_state_dict(model.state_dict(), cfg)
    return model, cfg, params


def test_forward_parity(hf_pair):
    model, cfg, params = hf_pair
    g = np.random.default_rng(0)
    x = g.standard_normal((2, 9, cfg.hidden)).astype(np.float32)
    with torch.no_grad():
        ref = model(inputs_embeds=torch.from_numpy(x)).last_hidden_state.numpy()
    got = np.asarray(qj.forward(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_prefill_then_steps_matches_forward(hf_pair):
    _, cfg, params = hf_pair
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((2, 12, cfg.hidden)).astype(np.float32))
    full = qj.forward(params, cfg, x)

    cache = qj.init_kv_cache(cfg, 2, 32)
    pre, cache = qj.prefill(params, cfg, x[:, :5], cache)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full[:, :5]), atol=2e-4, rtol=1e-3)
    outs = [np.asarray(pre)]
    for i in range(5, 12):
        h, cache = qj.decode_step(params, cfg, x[:, i:i + 1], jnp.asarray(i, jnp.int32), cache)
        outs.append(np.asarray(h))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), atol=5e-4, rtol=1e-3)


def test_padded_prefill_with_valid_from(hf_pair):
    """Left-aligned prompt of length 5 in batch row 0, length 3 in row 1:
    padded positions must not affect later steps when masked via length_mask."""
    _, cfg, params = hf_pair
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((1, 4, cfg.hidden)).astype(np.float32))
    # mask the last prompt slot out — equivalent to a 3-token prompt
    cache = qj.init_kv_cache(cfg, 1, 16)
    mask = jnp.asarray([[True, True, True, False]])
    pre_masked, cache_m = qj.prefill(params, cfg, x, cache, length_mask=mask)
    pre_short, _ = qj.prefill(params, cfg, x[:, :3], qj.init_kv_cache(cfg, 1, 16))
    np.testing.assert_allclose(
        np.asarray(pre_masked[:, :3]), np.asarray(pre_short), atol=1e-4, rtol=1e-3
    )


def test_jit_decode_loop(hf_pair):
    _, cfg, params = hf_pair
    g = np.random.default_rng(3)
    x0 = jnp.asarray(g.standard_normal((1, 1, cfg.hidden)).astype(np.float32))
    cache = qj.init_kv_cache(cfg, 1, 8)

    @jax.jit
    def run(params, x0, cache):
        def body(i, carry):
            x, cache = carry
            h, cache = qj.decode_step(params, cfg, x, i, cache)
            return h, cache
        return jax.lax.fori_loop(0, 8, body, (x0, cache))

    h, _ = run(params, x0, cache)
    assert h.shape == (1, 1, cfg.hidden)
    assert np.isfinite(np.asarray(h)).all()


def test_padded_batch_decode_matches_unpadded(hf_pair):
    """Right-padded prompt rows must decode EXACTLY like the same row run
    alone: the pad slots' garbage K/V are masked out of every step and the
    row's RoPE continues at its true position (last valid index + 1), not at
    the shared padded width."""
    _, cfg, params = hf_pair
    g = np.random.default_rng(4)
    p_cap, p_short, steps = 7, 4, 3
    xp = g.standard_normal((1, p_cap, cfg.hidden)).astype(np.float32)
    gen = g.standard_normal((1, steps, cfg.hidden)).astype(np.float32)

    # padded: prompt occupies [0, 4), slots [4, 7) garbage; writes at 7+i
    cache = qj.init_kv_cache(cfg, 1, p_cap + steps)
    mask = jnp.asarray([[True] * p_short + [False] * (p_cap - p_short)])
    _, cache = qj.prefill(params, cfg, jnp.asarray(xp), cache, length_mask=mask)
    last_idx = jnp.asarray([p_short - 1], jnp.int32)
    outs_padded = []
    for i in range(steps):
        h, cache = qj.decode_step(
            params, cfg, jnp.asarray(gen[:, i:i + 1]),
            jnp.asarray(p_cap + i, jnp.int32), cache,
            rope_pos=last_idx + 1 + i, prompt_len=last_idx + 1,
            prompt_capacity=p_cap)
        outs_padded.append(np.asarray(h))

    # unpadded reference: the same 4-token prompt with no pad slots
    cache2 = qj.init_kv_cache(cfg, 1, p_short + steps)
    _, cache2 = qj.prefill(params, cfg, jnp.asarray(xp[:, :p_short]), cache2)
    outs_ref = []
    for i in range(steps):
        h, cache2 = qj.decode_step(
            params, cfg, jnp.asarray(gen[:, i:i + 1]),
            jnp.asarray(p_short + i, jnp.int32), cache2)
        outs_ref.append(np.asarray(h))

    for a, b in zip(outs_padded, outs_ref):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)
