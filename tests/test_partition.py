"""Tensor-parallel partition rules: layout correctness and numerical
transparency on the virtual 8-device CPU mesh (SURVEY.md §2.19 — the reference
has no TP; these rules are the TPU-native scaling design pjit exercises)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from expressive_speech_translation_tpu.models import cosyvoice as cv
from expressive_speech_translation_tpu.models import qwen2 as q2
from expressive_speech_translation_tpu.parallel import MeshSpec, make_mesh
from expressive_speech_translation_tpu.parallel.mesh import DP_AXIS, TP_AXIS
from expressive_speech_translation_tpu.parallel.partition import sharding_tree
from expressive_speech_translation_tpu.train.sft import SFTBatch, lm_loss

LM = cv.SpeechLMConfig(
    backbone=q2.Qwen2Config(hidden=64, layers=2, heads=4, kv_heads=2,
                            ffn_dim=128, max_positions=128),
    text_vocab=96, speech_token_size=61,  # head dim 64 — divisible by tp=2
)


def _batch(b=4):
    g = np.random.default_rng(0)
    return SFTBatch(
        text_tokens=jnp.asarray(g.integers(0, 96, (b, 5)), jnp.int32),
        text_mask=jnp.ones((b, 5), bool),
        speech_tokens=jnp.asarray(g.integers(0, 61, (b, 7)), jnp.int32),
        speech_mask=jnp.ones((b, 7), bool),
    )


def test_tp_rules_apply_expected_layout():
    mesh = make_mesh(MeshSpec(dp=-1, tp=2))
    params = cv.init_speech_lm(jax.random.PRNGKey(0), LM)
    sh = sharding_tree(params, mesh, cv.speech_lm_partition_rules(TP_AXIS))
    layer = sh["backbone"]["layers"][0]
    assert layer["q"]["kernel"].spec == P(None, TP_AXIS)      # column-parallel
    assert layer["o"]["kernel"].spec == P(TP_AXIS, None)      # row-parallel
    assert layer["down"]["kernel"].spec == P(TP_AXIS, None)
    assert layer["input_ln"]["scale"].spec == P()             # replicated norm
    assert sh["head"]["kernel"].spec == P(None, TP_AXIS)      # vocab-parallel
    assert sh["speech_embed"].spec == P(None, TP_AXIS)


def test_tp_rules_divisibility_fallback():
    """A 53-way head under tp=2 must fall back to replication, not crash."""
    mesh = make_mesh(MeshSpec(dp=-1, tp=2))
    odd = cv.SpeechLMConfig(backbone=LM.backbone, text_vocab=96, speech_token_size=50)
    params = cv.init_speech_lm(jax.random.PRNGKey(0), odd)
    sh = sharding_tree(params, mesh, cv.speech_lm_partition_rules(TP_AXIS))
    assert sh["head"]["kernel"].spec == P()                   # 53 % 2 != 0
    assert sh["head"]["bias"].spec == P()
    assert sh["backbone"]["layers"][0]["q"]["kernel"].spec == P(None, TP_AXIS)


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_forward_matches_replicated(tp):
    """The sharded loss must equal the single-device loss: TP is a layout,
    not a numerics change."""
    params = cv.init_speech_lm(jax.random.PRNGKey(1), LM)
    batch = _batch()
    ref, _ = lm_loss(params, LM, batch, compute_dtype=jnp.float32)

    mesh = make_mesh(MeshSpec(dp=-1, tp=tp))
    rules = cv.speech_lm_partition_rules(TP_AXIS)
    p_sh = sharding_tree(params, mesh, rules)
    params_tp = jax.device_put(params, p_sh)
    data_sh = NamedSharding(mesh, P(DP_AXIS))
    batch_tp = jax.device_put(batch, SFTBatch(*([data_sh] * 4)))

    fn = jax.jit(
        lambda p, b: lm_loss(p, LM, b, compute_dtype=jnp.float32)[0],
        in_shardings=(p_sh, SFTBatch(*([data_sh] * 4))),
    )
    got = fn(params_tp, batch_tp)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-5, atol=2e-5)


def test_tts_engine_inference_under_tp_mesh():
    """JaxCosyVoiceTts(mesh=…): LM params land in the TP layout and synthesis
    runs across the mesh (XLA inserts the collectives)."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxCosyVoiceTts

    cfg = cv.CosyVoiceConfig(
        lm=cv.SpeechLMConfig(
            backbone=q2.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                    ffn_dim=64, max_positions=512),
            text_vocab=128, speech_token_size=61),
        flow=cv.FlowConfig(token_vocab=64, dim=32, layers=1, heads=4, n_steps=2),
        vocoder=cv.VocoderConfig(base_channels=32, upsample_rates=(8, 6, 10),
                                 upsample_kernels=(16, 12, 20)),
    )
    mesh = make_mesh(MeshSpec(dp=-1, tp=2))
    tts = JaxCosyVoiceTts(cfg, dtype=jnp.float32, seconds_per_char=0.02, mesh=mesh)
    qk = tts.params["lm"]["backbone"]["layers"][0]["q"]["kernel"]
    assert qk.sharding.spec == P(None, TP_AXIS)
    wave = tts.synthesize("tensor parallel hello")
    assert np.isfinite(wave).all() and len(wave) > 0


def test_tts_engine_mtp_under_tp_mesh():
    """Composition: MTP decode × TP-sharded serving. The MTP heads shard
    vocab-parallel like the main head and the K-token-per-pass program runs
    across the mesh."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxCosyVoiceTts

    cfg = cv.CosyVoiceConfig(
        lm=cv.SpeechLMConfig(
            backbone=q2.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                    ffn_dim=64, max_positions=512),
            text_vocab=128, speech_token_size=61),
        flow=cv.FlowConfig(token_vocab=64, dim=32, layers=1, heads=4, n_steps=2),
        vocoder=cv.VocoderConfig(base_channels=32, upsample_rates=(8, 6, 10),
                                 upsample_kernels=(16, 12, 20)),
    )
    mesh = make_mesh(MeshSpec(dp=-1, tp=2))
    tts = JaxCosyVoiceTts(cfg, dtype=jnp.float32, seconds_per_char=0.02,
                          mesh=mesh, mtp=2)
    assert tts.cfg.lm.mtp == 2
    hk = tts.params["lm"]["mtp_heads"][0]["kernel"]
    assert hk.sharding.spec == P(None, TP_AXIS)
    wave = tts.synthesize("tensor parallel mtp")
    assert np.isfinite(wave).all() and len(wave) > 0


def test_tp_rules_cover_quantized_params():
    """int8 layouts (kernel_q + per-channel scale) shard like their float
    counterparts, and the quantized LM runs under a TP mesh."""
    params = cv.quantize_speech_lm(cv.init_speech_lm(jax.random.PRNGKey(0), LM))
    mesh = make_mesh(MeshSpec(dp=-1, tp=2))
    rules = cv.speech_lm_partition_rules(TP_AXIS)
    sh = sharding_tree(params, mesh, rules)
    layer = sh["backbone"]["layers"][0]
    assert layer["q"]["kernel_q"].spec == P(None, TP_AXIS)
    assert layer["q"]["scale"].spec == P(None, TP_AXIS)
    assert layer["down"]["kernel_q"].spec == P(TP_AXIS, None)
    assert sh["head"]["kernel_q"].spec == P(None, TP_AXIS)
    # norm scales must NOT be caught by the dense-scale rule
    assert layer["input_ln"]["scale"].spec == P()

    from expressive_speech_translation_tpu.parallel.partition import logical_to_sharding
    placed = logical_to_sharding(params, mesh, rules)
    batch = _batch(b=2)
    toks, lengths = jax.jit(lambda p, k: cv.generate_speech_tokens(
        p, LM, k, batch.text_tokens[:2], batch.text_mask[:2],
        batch.speech_tokens[:2], batch.speech_mask[:2], max_new_tokens=8))(
        placed, jax.random.PRNGKey(1))
    assert np.asarray(toks).shape == (2, 8)


# ------------------------- whisper / NLLB TP serving (shared-block rules)


def test_whisper_nllb_tp_rules_layout():
    from expressive_speech_translation_tpu.models import nllb as nj, whisper as wj

    mesh = make_mesh(MeshSpec(dp=-1, tp=2))
    wcfg = wj.WhisperConfig(n_mels=80, d_model=64, encoder_layers=1,
                            decoder_layers=1, heads=4, ffn_dim=128,
                            vocab_size=96)
    wp = wj.init_whisper(jax.random.PRNGKey(0), wcfg)
    sh = sharding_tree(wp, mesh, wj.whisper_partition_rules(TP_AXIS))
    blk = sh["decoder"]["layers"][0]
    assert blk["self_attn"]["q"]["kernel"].spec == P(None, TP_AXIS)
    assert blk["cross_attn"]["o"]["kernel"].spec == P(TP_AXIS, None)
    assert blk["mlp"]["fc1"]["kernel"].spec == P(None, TP_AXIS)
    assert blk["mlp"]["fc2"]["kernel"].spec == P(TP_AXIS, None)
    assert sh["decoder"]["embed"].spec == P(None, TP_AXIS)    # hidden-sharded
    assert sh["encoder"]["conv1"]["kernel"].spec == P()       # stem replicated

    ncfg = nj.NLLBConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                         heads=4, ffn_dim=128, vocab_size=96)
    np_ = nj.init_nllb(jax.random.PRNGKey(1), ncfg)
    shn = sharding_tree(np_, mesh, nj.nllb_partition_rules(TP_AXIS))
    assert shn["embed"].spec == P(None, TP_AXIS)
    assert shn["decoder"]["layers"][0]["self_attn"]["v"]["kernel"].spec == P(None, TP_AXIS)


def test_asr_nmt_engines_tp_inference_matches_single():
    """JaxWhisperAsr / JaxNllbNmt under a tp mesh must produce identical
    transcripts/translations to the unsharded engines (TP is numerically
    transparent; XLA inserts the collectives)."""
    import jax.numpy as jnp

    from expressive_speech_translation_tpu.models import nllb as nj, whisper as wj
    from expressive_speech_translation_tpu.pipeline.jax_engines import (
        JaxNllbNmt, JaxWhisperAsr,
    )

    mesh = make_mesh(MeshSpec(dp=-1, tp=2))
    wcfg = wj.WhisperConfig(n_mels=80, d_model=64, encoder_layers=1,
                            decoder_layers=1, heads=4, ffn_dim=128,
                            vocab_size=51865)
    g = np.random.default_rng(2)
    audio = (0.2 * g.standard_normal(16000 * 2)).astype(np.float32)

    asr1 = JaxWhisperAsr(wcfg, dtype=jnp.float32, max_new_tokens=8,
                         context_buckets=(4,))
    asr2 = JaxWhisperAsr(wcfg, dtype=jnp.float32, max_new_tokens=8,
                         context_buckets=(4,), mesh=mesh)
    o1 = asr1.transcribe(audio, language="eng")
    o2 = asr2.transcribe(audio, language="eng")
    assert o1["text"] == o2["text"] and o1["words"] == o2["words"]

    ncfg = nj.NLLBConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                         heads=4, ffn_dim=128, vocab_size=384)
    nmt1 = JaxNllbNmt(ncfg, dtype=jnp.float32, max_new_tokens=8)
    nmt2 = JaxNllbNmt(ncfg, dtype=jnp.float32, max_new_tokens=8, mesh=mesh)
    t1 = nmt1.translate("bonjour tout le monde", "eng_Latn", "fra_Latn")
    t2 = nmt2.translate("bonjour tout le monde", "eng_Latn", "fra_Latn")
    assert t1 == t2


def test_engine_batches_shard_over_dp():
    """Batched serving dispatches split their batch rows over the mesh's dp
    axis (dp=4×tp=2 here) and must produce identical results to unsharded
    engines — data parallelism is numerically transparent (no cross-row
    reductions in inference)."""
    from expressive_speech_translation_tpu.models import nllb as nj, whisper as wj
    from expressive_speech_translation_tpu.pipeline.jax_engines import (
        JaxNllbNmt, JaxWhisperAsr, _dp_shard,
    )

    mesh = make_mesh(MeshSpec(dp=-1, tp=2))

    # helper semantics: divisible batch → dp-sharded dim 0; else untouched
    a8 = np.zeros((8, 4), np.float32)
    sharded = _dp_shard(mesh, a8)
    assert sharded.sharding.spec == P(DP_AXIS, None)
    a3 = np.zeros((3, 4), np.float32)
    assert _dp_shard(mesh, a3) is a3

    wcfg = wj.WhisperConfig(n_mels=80, d_model=64, encoder_layers=1,
                            decoder_layers=1, heads=4, ffn_dim=128,
                            vocab_size=51865)
    g = np.random.default_rng(3)
    reqs = [{"audio_16k": (0.2 * g.standard_normal(16000 * 2)).astype(np.float32),
             "language": "eng"} for _ in range(4)]
    asr1 = JaxWhisperAsr(wcfg, dtype=jnp.float32, max_new_tokens=8,
                         context_buckets=(4,))
    asr2 = JaxWhisperAsr(wcfg, dtype=jnp.float32, max_new_tokens=8,
                         context_buckets=(4,), mesh=mesh)
    o1 = asr1.transcribe_batch(reqs)
    o2 = asr2.transcribe_batch(reqs)
    assert [r["text"] for r in o1] == [r["text"] for r in o2]

    ncfg = nj.NLLBConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                         heads=4, ffn_dim=128, vocab_size=384)
    nreqs = [{"text": t, "source_lang": "eng_Latn", "target_lang": "fra_Latn"}
             for t in ("hello there", "how are you", "good morning", "see you")]
    nmt1 = JaxNllbNmt(ncfg, dtype=jnp.float32, max_new_tokens=8)
    nmt2 = JaxNllbNmt(ncfg, dtype=jnp.float32, max_new_tokens=8, mesh=mesh)
    assert nmt1.translate_batch(nreqs) == nmt2.translate_batch(nreqs)


@pytest.mark.slow


def test_tts_batch_shards_over_dp():
    """Batched TTS synthesis under the (dp, tp) mesh matches the unsharded
    engine sample-for-sample."""
    from expressive_speech_translation_tpu.pipeline.jax_engines import JaxCosyVoiceTts

    cfg = cv.CosyVoiceConfig(
        lm=cv.SpeechLMConfig(
            backbone=q2.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                    ffn_dim=64, max_positions=512),
            text_vocab=128, speech_token_size=61),
        flow=cv.FlowConfig(token_vocab=64, dim=32, layers=1, heads=4, n_steps=2),
        vocoder=cv.VocoderConfig(base_channels=32, upsample_rates=(8, 6, 10),
                                 upsample_kernels=(16, 12, 20)),
    )
    mesh = make_mesh(MeshSpec(dp=-1, tp=2))
    reqs = [{"text": t, "reference_audio_16k": None, "style_prompt": "",
             "language": "en"} for t in ("one", "two", "three", "four")]
    tts1 = JaxCosyVoiceTts(cfg, dtype=jnp.float32, seconds_per_char=0.02)
    tts2 = JaxCosyVoiceTts(cfg, dtype=jnp.float32, seconds_per_char=0.02,
                           mesh=mesh)
    out1 = tts1.synthesize_batch(reqs)
    out2 = tts2.synthesize_batch(reqs)
    assert len(out1) == len(out2) == 4
    for a, b in zip(out1, out2):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_vocode_sp_time_sharded_matches_single():
    """Sequence-parallel vocoder (models/cosyvoice.vocode_sp): the mel time
    axis shards over the mesh, XLA inserts conv halo exchanges, and the
    waveform matches single-device vocode — including a time length that is
    NOT divisible by the axis size (pad+trim path)."""
    mesh = make_mesh(MeshSpec(dp=-1, tp=1))  # 8-way time sharding
    cfg = cv.VocoderConfig(base_channels=32, upsample_rates=(8, 6, 10),
                           upsample_kernels=(16, 12, 20))
    from expressive_speech_translation_tpu.models.common import host_init

    params = host_init(cv.init_vocoder, 0, cfg)
    g = np.random.default_rng(1)
    for t in (64, 101):  # divisible and pad cases
        mel = jnp.asarray(g.standard_normal((1, t, cfg.n_mels)), jnp.float32)
        ref = cv.vocode(params, cfg, mel)
        out = cv.vocode_sp(params, cfg, mel, mesh, DP_AXIS)
        assert out.shape == ref.shape
        if t % 8:
            # pad path: the padded frames bleed into the trailing receptive
            # field (documented contract) — exact outside it
            out, ref = out[:, : -64 * cfg.hop], ref[:, : -64 * cfg.hop]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_tp_batched_cascade_concurrent_matches_unsharded():
    """The multi-chip PRODUCTION serving config — TP-mesh engines wrapped in
    the Batched* micro-batchers inside CascadedBackend — must survive
    concurrent requests and produce the same transcripts/audio as the
    unsharded, unwrapped cascade (round-2 regression class: a defect visible
    only when the wrappers and the backend compose)."""
    import threading

    from expressive_speech_translation_tpu.models import nllb as nj, whisper as wj
    from expressive_speech_translation_tpu.pipeline.cascaded import CascadedBackend
    from expressive_speech_translation_tpu.pipeline.engines import Engines
    from expressive_speech_translation_tpu.pipeline.jax_engines import (
        JaxCosyVoiceTts, JaxNllbNmt, JaxWhisperAsr,
    )
    from expressive_speech_translation_tpu.serve.batching import (
        BatchedAsr, BatchedNmt, BatchedTts,
    )

    wcfg = wj.WhisperConfig(n_mels=80, d_model=64, encoder_layers=1,
                            decoder_layers=1, heads=4, ffn_dim=128,
                            vocab_size=51865)
    ncfg = nj.NLLBConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                         heads=4, ffn_dim=128, vocab_size=384)
    tcfg = cv.CosyVoiceConfig(
        lm=cv.SpeechLMConfig(
            backbone=q2.Qwen2Config(hidden=32, layers=1, heads=4, kv_heads=2,
                                    ffn_dim=64, max_positions=512),
            text_vocab=128, speech_token_size=61),
        flow=cv.FlowConfig(token_vocab=64, dim=32, layers=1, heads=4, n_steps=2),
        vocoder=cv.VocoderConfig(base_channels=32, upsample_rates=(8, 6, 10),
                                 upsample_kernels=(16, 12, 20)),
    )
    mesh = make_mesh(MeshSpec(dp=-1, tp=2))

    def engines(m):
        return (
            JaxWhisperAsr(wcfg, dtype=jnp.float32, max_new_tokens=8,
                          context_buckets=(4,), mesh=m),
            JaxNllbNmt(ncfg, dtype=jnp.float32, max_new_tokens=8, mesh=m),
            JaxCosyVoiceTts(tcfg, dtype=jnp.float32, seconds_per_char=0.02,
                            mesh=m),
        )

    asr_r, nmt_r, tts_r = engines(None)
    ref_backend = CascadedBackend(Engines(asr=asr_r, nmt=nmt_r, tts=tts_r))
    asr_t, nmt_t, tts_t = engines(mesh)
    tp_backend = CascadedBackend(Engines(
        asr=BatchedAsr(asr_t, max_wait_ms=30.0),
        nmt=BatchedNmt(nmt_t, max_wait_ms=30.0),
        tts=BatchedTts(tts_t, max_wait_ms=30.0),
    ))
    # the weightless flag must see through wrapper + mesh placement alike
    assert tp_backend.engines.nmt.weightless is True

    g = np.random.default_rng(7)
    audio = (0.2 * g.standard_normal(16000 * 2)).astype(np.float32)
    ref = ref_backend.translate_speech(audio, "eng", "fra")

    results, errors = [None] * 4, []

    def worker(i):
        try:
            results[i] = tp_backend.translate_speech(audio, "eng", "fra")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, f"TP batched cascade failed: {errors[:1]}"
    for r in results:
        # ASR/NMT decode is greedy → transcripts must be exact under TP +
        # batching; the TTS waveform is stochastically sampled, so assert
        # structure (finite, non-empty, 16 kHz output contract) instead.
        assert r["transcripts"] == ref["transcripts"]
        wave = np.asarray(r["audio"])
        assert np.isfinite(wave).all() and wave.size > 0
        assert wave.shape[0] == 1
