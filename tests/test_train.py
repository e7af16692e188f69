"""SFT training: loss decreases, 8-device dp sharding, checkpoint resume,
data pipeline semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.core.config import TrainConfig
from expressive_speech_translation_tpu.models import cosyvoice as cv
from expressive_speech_translation_tpu.models import qwen2 as q2
from expressive_speech_translation_tpu.parallel import host_cpu_mesh
from expressive_speech_translation_tpu.train import (
    DynamicFrameBatcher,
    SFTBatch,
    init_train_state,
    lm_loss,
    make_optimizer,
    make_train_step,
    shuffle_buffer,
    sort_buffer,
)
from expressive_speech_translation_tpu.train.data import filter_samples, pad_batch

TINY_LM = cv.SpeechLMConfig(
    backbone=q2.Qwen2Config(hidden=32, layers=2, heads=4, kv_heads=2, ffn_dim=64, max_positions=128),
    text_vocab=50, speech_token_size=20,
)


def _batch(accum=2, b=8, tt=4, ts=6, seed=0):
    g = np.random.default_rng(seed)
    return SFTBatch(
        text_tokens=jnp.asarray(g.integers(0, 50, (accum, b, tt)), jnp.int32),
        text_mask=jnp.ones((accum, b, tt), bool),
        speech_tokens=jnp.asarray(g.integers(0, 20, (accum, b, ts)), jnp.int32),
        speech_mask=jnp.ones((accum, b, ts), bool),
    )


def test_loss_decreases_when_overfitting():
    opt = make_optimizer(1e-2, grad_clip=5.0)
    state = init_train_state(jax.random.PRNGKey(0), TINY_LM, opt)
    step = make_train_step(TINY_LM, opt, accum_grad=2, compute_dtype=jnp.float32)
    batch = _batch()
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert np.isfinite(losses).all()


@pytest.mark.slow


def test_grad_norm_metric_matches_true_norm():
    import optax

    opt = make_optimizer(1e-3, grad_clip=5.0)
    state = init_train_state(jax.random.PRNGKey(0), TINY_LM, opt)
    step = make_train_step(TINY_LM, opt, accum_grad=2, compute_dtype=jnp.float32)
    b = _batch(accum=2)
    # compute mean grads by hand FIRST (the train step donates the state)
    grads = None
    for i in range(2):
        mb = SFTBatch(*[x[i] for x in b])
        g = jax.grad(lambda p: lm_loss(p, TINY_LM, mb, compute_dtype=jnp.float32)[0])(state.params)
        grads = g if grads is None else jax.tree_util.tree_map(jnp.add, grads, g)
    grads = jax.tree_util.tree_map(lambda x: x / 2, grads)
    true_norm = float(optax.global_norm(grads))

    _, metrics = step(state, b)
    assert abs(float(metrics["grad_norm"]) - true_norm) / true_norm < 1e-4


def test_dp_sharded_train_step_on_8_devices():
    mesh = host_cpu_mesh(8)
    opt = make_optimizer(1e-3)
    state = init_train_state(jax.random.PRNGKey(0), TINY_LM, opt)
    step = make_train_step(TINY_LM, opt, mesh, accum_grad=2, compute_dtype=jnp.float32)
    batch = _batch(accum=2, b=16)  # 16 = 2 rows per device
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # result equals the unsharded computation
    opt2 = make_optimizer(1e-3)
    state2 = init_train_state(jax.random.PRNGKey(0), TINY_LM, opt2)
    step2 = make_train_step(TINY_LM, opt2, accum_grad=2, compute_dtype=jnp.float32)
    state2, metrics2 = step2(state2, batch)
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics2["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(state.params)[0]
    l2 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)


def test_checkpoint_save_restore_resume(tmp_path):
    from expressive_speech_translation_tpu.train.checkpoint import CheckpointManager

    opt = make_optimizer(1e-3)
    state = init_train_state(jax.random.PRNGKey(0), TINY_LM, opt)
    step = make_train_step(TINY_LM, opt, accum_grad=1, compute_dtype=jnp.float32)
    b = _batch(accum=1)
    for _ in range(3):
        state, _ = step(state, b)
    mgr = CheckpointManager(tmp_path / "ckpt", save_interval_steps=1)
    assert mgr.save(state, metrics={"loss": 1.0})
    mgr.wait()

    template = init_train_state(jax.random.PRNGKey(1), TINY_LM, opt)
    restored = mgr.restore(template)
    assert restored is not None
    assert int(restored.step) == 3
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    l1 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1))

    # deterministic resume: one more step from restored == one more from live
    s_live, m_live = step(state, b)
    s_res, m_res = step(restored, b)
    np.testing.assert_allclose(float(m_live["loss"]), float(m_res["loss"]), rtol=1e-6)
    mgr.close()


def test_dynamic_frame_batcher_respects_cap():
    samples = [{"num_frames": n, "id": i} for i, n in enumerate([100, 120, 500, 900, 1500, 80, 90])]
    batcher = DynamicFrameBatcher(2000)
    batches = list(batcher(samples))
    assert sum(len(b) for b in batches) == 7
    for b in batches:
        longest = max(s["num_frames"] for s in b)
        assert longest * len(b) <= 2000


def test_shuffle_sort_filter_pipeline():
    samples = [{"num_frames": n, "text_tokens": list(range(n % 5))} for n in range(1, 300)]
    out = list(
        sort_buffer(shuffle_buffer(filter_samples(samples, max_frames=250), 50, seed=1), 64)
    )
    assert len(out) == 249  # 250..299 filtered (> max_frames) and 1 (< min 2)
    # sort buffer yields length-sorted runs of 64
    first_run = [s["num_frames"] for s in out[:64]]
    assert first_run == sorted(first_run)


def test_pad_batch_masks():
    group = [
        {"speech_tokens": np.array([1, 2, 3])},
        {"speech_tokens": np.array([4, 5])},
    ]
    arrays = pad_batch(group, ("speech_tokens",), buckets=(4, 8))
    assert arrays["speech_tokens"].shape == (2, 4)
    assert arrays["speech_tokens_mask"].sum() == 5
    assert arrays["speech_tokens"][1, 2] == 0


@pytest.mark.slow


def test_lm_loss_trains_mtp_heads():
    """With cfg.mtp > 1 the loss gets an mtp term and the MTP heads receive
    nonzero gradients (jointly trained with the main head)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from expressive_speech_translation_tpu.models import cosyvoice as cv
    from expressive_speech_translation_tpu.models import qwen2 as q2
    from expressive_speech_translation_tpu.train.sft import SFTBatch, lm_loss

    cfg = cv.SpeechLMConfig(
        backbone=q2.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                ffn_dim=64, max_positions=64),
        text_vocab=50, speech_token_size=20, mtp=3,
    )
    params = cv.init_speech_lm(jax.random.PRNGKey(0), cfg)
    g = np.random.default_rng(0)
    batch = SFTBatch(
        text_tokens=jnp.asarray(g.integers(0, 50, (2, 4)), jnp.int32),
        text_mask=jnp.ones((2, 4), bool),
        speech_tokens=jnp.asarray(g.integers(0, 20, (2, 6)), jnp.int32),
        speech_mask=jnp.ones((2, 6), bool),
    )
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: lm_loss(p, cfg, batch, compute_dtype=jnp.float32), has_aux=True
    )(params)
    assert np.isfinite(float(loss)) and "mtp_loss" in metrics
    assert float(metrics["loss"]) > float(metrics["loss"] - metrics["mtp_loss"])
    for head_grad in grads["mtp_heads"]:
        assert float(jnp.abs(head_grad["kernel"]).max()) > 0


def test_lm_loss_invariant_to_text_padding_bucket():
    """build_prompt_embeddings compacts valid entries to a contiguous prefix,
    so a row whose text underfills its padding bucket has its speech block at
    2 + n_valid_text, not 2 + Tt (regression: the loss sliced at the static
    offset, training every underfilled row on shifted logits). The loss for a
    row padded into a wide bucket must equal the same row at its exact
    length."""
    params = cv.init_speech_lm(jax.random.PRNGKey(1), TINY_LM)
    g = np.random.default_rng(1)
    n_t, ts = 3, 5
    text = g.integers(1, 50, (1, n_t))
    speech = jnp.asarray(g.integers(0, 20, (1, ts)), jnp.int32)
    smask = jnp.ones((1, ts), bool)

    def loss_at_bucket(tt):
        padded = np.zeros((1, tt), np.int64)
        padded[:, :n_t] = text
        mask = np.zeros((1, tt), bool)
        mask[:, :n_t] = True
        batch = SFTBatch(jnp.asarray(padded, jnp.int32), jnp.asarray(mask),
                         speech, smask)
        return lm_loss(params, TINY_LM, batch, compute_dtype=jnp.float32)

    exact, m_exact = loss_at_bucket(n_t)
    padded, m_padded = loss_at_bucket(n_t + 5)
    np.testing.assert_allclose(float(padded), float(exact), rtol=1e-5)
    np.testing.assert_allclose(float(m_padded["acc"]), float(m_exact["acc"]))


def test_lm_loss_mtp_invariant_to_text_padding_bucket():
    """Same invariance for the MTP auxiliary heads (they gather the same
    per-row speech block)."""
    cfg = cv.SpeechLMConfig(
        backbone=q2.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                ffn_dim=64, max_positions=64),
        text_vocab=50, speech_token_size=20, mtp=2,
    )
    params = cv.init_speech_lm(jax.random.PRNGKey(2), cfg)
    g = np.random.default_rng(2)
    n_t, ts = 2, 6
    text = g.integers(1, 50, (1, n_t))
    speech = jnp.asarray(g.integers(0, 20, (1, ts)), jnp.int32)

    def loss_at_bucket(tt):
        padded = np.zeros((1, tt), np.int64)
        padded[:, :n_t] = text
        mask = np.zeros((1, tt), bool)
        mask[:, :n_t] = True
        batch = SFTBatch(jnp.asarray(padded, jnp.int32), jnp.asarray(mask),
                         speech, jnp.ones((1, ts), bool))
        _, m = lm_loss(params, cfg, batch, compute_dtype=jnp.float32)
        return m

    m_exact = loss_at_bucket(n_t)
    m_padded = loss_at_bucket(n_t + 4)
    np.testing.assert_allclose(float(m_padded["mtp_loss"]),
                               float(m_exact["mtp_loss"]), rtol=1e-5)


def test_lm_loss_matches_unpadded_torch_mirror():
    """Golden parity for the SFT objective: lm_loss on a PADDED, bucketed,
    variable-length batch must equal a torch mirror that computes the CE on
    each row's exact unpadded [sos] text [task] speech sequence (HF
    Qwen2Model backbone with shared weights, dynamic lengths, no compaction
    anywhere) — the reference semantics the padding/compaction machinery
    exists to reproduce (train_greek.sh --model llm objective)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFConfig, Qwen2Model

    hf_cfg = HFConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        max_position_embeddings=128, rope_theta=1_000_000.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(3)
    model = Qwen2Model(hf_cfg).eval()
    params = cv.init_speech_lm(jax.random.PRNGKey(3), TINY_LM)
    params["backbone"] = q2.from_hf_state_dict(model.state_dict(), TINY_LM.backbone)

    text_e = torch.from_numpy(np.asarray(params["text_embed"], np.float32))
    speech_e = torch.from_numpy(np.asarray(params["speech_embed"], np.float32))
    head_k = torch.from_numpy(np.asarray(params["head"]["kernel"], np.float32))
    head_b = torch.from_numpy(np.asarray(params["head"]["bias"], np.float32))

    g = np.random.default_rng(3)
    rows = [(3, 4), (5, 2), (1, 6)]            # (n_text, n_speech) per row
    tt, ts = 6, 7                              # padding buckets
    texts = [g.integers(1, 50, n) for n, _ in rows]
    speeches = [g.integers(0, 20, n) for _, n in rows]

    # --- torch mirror: exact-length rows, global token-weighted mean CE ---
    nll_sum, n_tok = 0.0, 0
    for txt, sp in zip(texts, speeches):
        emb = torch.cat([
            speech_e[TINY_LM.sos_index][None],
            text_e[torch.from_numpy(txt)],
            speech_e[TINY_LM.task_index][None],
            speech_e[torch.from_numpy(sp)],
        ])[None]
        with torch.no_grad():
            hidden = model(inputs_embeds=emb).last_hidden_state[0]
        logits = hidden @ head_k + head_b
        start = 1 + len(txt)                    # task slot predicts speech_0
        tgt = torch.from_numpy(np.append(sp, TINY_LM.eos_speech))
        lp = torch.log_softmax(logits[start: start + len(tgt)], dim=-1)
        nll_sum += float(-lp.gather(1, tgt[:, None]).sum())
        n_tok += len(tgt)
    ref_loss = nll_sum / n_tok

    # --- jax side: one padded bucketed batch through lm_loss ---
    text_tok = np.zeros((len(rows), tt), np.int64)
    text_m = np.zeros((len(rows), tt), bool)
    sp_tok = np.zeros((len(rows), ts), np.int64)
    sp_m = np.zeros((len(rows), ts), bool)
    for i, (txt, sp) in enumerate(zip(texts, speeches)):
        text_tok[i, : len(txt)], text_m[i, : len(txt)] = txt, True
        sp_tok[i, : len(sp)], sp_m[i, : len(sp)] = sp, True
    batch = SFTBatch(jnp.asarray(text_tok, jnp.int32), jnp.asarray(text_m),
                     jnp.asarray(sp_tok, jnp.int32), jnp.asarray(sp_m))
    loss, _ = lm_loss(params, TINY_LM, batch, compute_dtype=jnp.float32)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=2e-5)


def test_bucket_length_never_truncates():
    """Above the top bucket, lengths double (regression: a 700-token sample
    admitted by filter_samples was silently clipped to 512 with an all-valid
    mask — corrupted EOS supervision)."""
    from expressive_speech_translation_tpu.train.data import bucket_length, pad_batch

    assert bucket_length(700, (32, 64, 128, 200, 256, 512)) == 1024
    out = pad_batch([{"speech_tokens": list(range(700))}], ("speech_tokens",),
                    buckets=(32, 64, 128, 200, 256, 512))
    assert out["speech_tokens"].shape == (1, 1024)
    assert out["speech_tokens_mask"].sum() == 700


def test_warmup_cosine_requires_total_steps():
    import pytest as _pytest

    from expressive_speech_translation_tpu.train.sft import make_optimizer

    with _pytest.raises(ValueError, match="total_steps"):
        make_optimizer(1e-4, scheduler="warmup_cosine", warmup_steps=100)
    make_optimizer(1e-4, scheduler="warmup_cosine", warmup_steps=100,
                   total_steps=1000)  # valid
