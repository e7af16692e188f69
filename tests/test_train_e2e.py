"""End-to-end SFT on a tiny REAL-audio corpus (VERDICT r2 #4).

The reference's flagship training story: MCV clips → Kaldi dirs →
CosyVoice tokenization → dynamic-frame batches → 10-epoch LLM SFT with a
crash mid-save and a successful resume (training_log.txt tail →
training_log_resumed.txt). Rebuilt here at test scale with real wav files
on disk: the FSQ speech tokenizer tokenizes the actual audio (no hash
proxy), loss decreases over epochs, and a kill+resume round-trip continues
from the checkpoint deterministically.
"""

import io
import wave

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from expressive_speech_translation_tpu.core.config import TrainConfig
from expressive_speech_translation_tpu.models import cosyvoice as cv, qwen2 as q2
from expressive_speech_translation_tpu.train.executor import (
    Executor, batches_from_samples,
)
from expressive_speech_translation_tpu.train.run import (
    SpeechTokenizerFrontend, load_kaldi_dir,
)

TINY_LM = cv.SpeechLMConfig(
    backbone=q2.Qwen2Config(hidden=48, layers=2, heads=4, kv_heads=2,
                            ffn_dim=96, max_positions=512),
    text_vocab=264, speech_token_size=6561,
)

SENTENCES = [
    "kalimera sas",
    "ti kanete simera",
    "efharisto poli",
    "kalispera kosme",
]


def _write_wav(path, freq, seconds=0.4, sr=24_000):
    t = np.arange(int(sr * seconds)) / sr
    x = (0.4 * np.sin(2 * np.pi * freq * t)
         * (0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t) ** 2))
    pcm = (x * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def kaldi_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mcv_el")
    clips = root / "clips"
    clips.mkdir()
    with (root / "wav.scp").open("w") as scp, (root / "text").open("w") as txt:
        for i, sentence in enumerate(SENTENCES):
            wav = clips / f"utt{i}.wav"
            _write_wav(wav, 160 + 60 * i, seconds=0.4 + 0.15 * i)
            scp.write(f"spk001_utt{i} {wav}\n")
            txt.write(f"spk001_utt{i} {sentence}\n")
    return root


def test_real_audio_tokenization_not_proxy(kaldi_dir, caplog):
    """Every utterance tokenizes from its actual waveform — deterministic
    FSQ ids, distinct across different audio, stable across reloads."""
    import logging

    with caplog.at_level(logging.INFO):
        samples = load_kaldi_dir(kaldi_dir)
    assert len(samples) == len(SENTENCES)
    assert any("tokenized from real audio" in r.message for r in caplog.records)
    assert not any("fell back to proxy" in r.message for r in caplog.records)
    for s in samples:
        assert s["num_frames"] > 0
        assert all(0 <= t < 6561 for t in s["speech_tokens"])
    # different audio → different token streams
    assert samples[0]["speech_tokens"] != samples[1]["speech_tokens"]
    # reload → identical tokens (deterministic pipeline)
    again = load_kaldi_dir(kaldi_dir)
    assert [s["speech_tokens"] for s in again] == \
        [s["speech_tokens"] for s in samples]


def test_missing_wavs_fall_back_to_proxy(tmp_path, caplog):
    import logging

    (tmp_path / "wav.scp").write_text("u1 /data/el/clips/nope.mp3\n")
    (tmp_path / "text").write_text("u1 kalimera\n")
    with caplog.at_level(logging.WARNING):
        samples = load_kaldi_dir(tmp_path, tokenizer_frontend=None)
    assert len(samples) == 1 and samples[0]["num_frames"] > 0
    assert any("fell back to proxy" in r.message for r in caplog.records)


def test_sft_loss_decreases_then_resumes(kaldi_dir, tmp_path):
    """2-epoch overfit on the tiny real-audio corpus: loss drops; then the
    crash-resume story — a fresh Executor restores the checkpoint at the
    recorded step and continues training (training_log_resumed.txt parity)."""
    samples = load_kaldi_dir(kaldi_dir)
    tc = TrainConfig(learning_rate=3e-3, accum_grad=1, max_epochs=2,
                     log_interval=1, save_per_step=10_000,
                     max_frames_in_batch=40, shuffle_buffer=8, sort_buffer=4)

    ckpt_dir = tmp_path / "ckpt"
    ex = Executor(TINY_LM, tc, checkpoint_dir=str(ckpt_dir))
    state = ex.init_or_resume()
    assert int(state.step) == 0

    losses = []
    for epoch in range(2):
        for batch in batches_from_samples(iter(samples), tc, accum=1,
                                          seed=tc.seed + epoch):
            state, metrics = ex.train_step(state, batch)
            losses.append(float(metrics["loss"]))
    assert len(losses) >= 4
    assert losses[-1] < losses[0], f"no learning: {losses[0]} -> {losses[-1]}"

    ex.ckpt.save(state, metrics={"loss": losses[-1]}, force=True)
    ex.ckpt.wait()
    crash_step = int(state.step)

    # "crash": throw the live executor away; a new process resumes
    ex2 = Executor(TINY_LM, tc, checkpoint_dir=str(ckpt_dir))
    state2 = ex2.init_or_resume()
    assert int(state2.step) == crash_step
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # resumed training keeps making progress from the same curve
    post = []
    for batch in batches_from_samples(iter(samples), tc, accum=1, seed=99):
        state2, metrics = ex2.train_step(state2, batch)
        post.append(float(metrics["loss"]))
    assert int(state2.step) > crash_step
    assert min(post) <= losses[-1] * 1.5  # same curve, not re-initialized
    ex.ckpt.close()
    ex2.ckpt.close()


def test_executor_metric_sink_receives_structured_rows(kaldi_dir, tmp_path):
    """metric_sink (the TensorBoard-writer stand-in) receives per-interval
    train rows and CV rows as structured dicts; JSONOutput persists them."""
    import json

    from expressive_speech_translation_tpu.obs.kvlogger import JSONOutput

    samples = load_kaldi_dir(kaldi_dir)
    tc = TrainConfig(learning_rate=3e-3, accum_grad=1, max_epochs=1,
                     log_interval=1, save_per_step=10_000,
                     max_frames_in_batch=40, shuffle_buffer=8, sort_buffer=4)
    ex = Executor(TINY_LM, tc, checkpoint_dir=False)
    state = ex.init_or_resume()
    path = tmp_path / "metrics.jsonl"
    sink = JSONOutput(path)

    def epoch_batches(epoch):
        return batches_from_samples(iter(samples), tc, accum=1, seed=epoch)

    def cv_batches():
        return batches_from_samples(iter(samples[:2]), tc, accum=1, seed=0)

    ex.train(state, epoch_batches, cv_batches=cv_batches, max_epochs=1,
             metric_sink=sink.writekvs)
    rows = [json.loads(l) for l in path.read_text().splitlines()]
    phases = {r["phase"] for r in rows}
    assert "train" in phases and "cv" in phases
    tr = next(r for r in rows if r["phase"] == "train")
    assert {"epoch", "step", "loss", "acc", "grad_norm", "it_per_s"} <= set(tr)


def test_mtp_train_export_serve_roundtrip(kaldi_dir, tmp_path):
    """The full MTP production story (train.mtp=2): the SFT loss trains the
    extra head on real-audio batches, --export-dir's save_converted ships
    heads + width in the checkpoint, and the serving loader + engine decode
    2 tokens per backbone pass over pretrained flow/HiFT — the reference's
    swap-only-llm.pt deployment (Docker/Dockerfile.cosyvoice:49-52)."""
    import dataclasses

    from expressive_speech_translation_tpu.models import (
        cosyvoice_official as co,
        flow_matcha as fm,
        hift as hm,
        loaders,
    )
    from expressive_speech_translation_tpu.pipeline.jax_engines import (
        JaxCosyVoiceTts,
    )

    lm_cfg = dataclasses.replace(TINY_LM, mtp=2)
    samples = load_kaldi_dir(kaldi_dir)
    tc = TrainConfig(learning_rate=3e-3, accum_grad=1, max_epochs=1,
                     log_interval=1, save_per_step=10_000,
                     max_frames_in_batch=40, shuffle_buffer=8, sort_buffer=4,
                     mtp=2)
    ex = Executor(lm_cfg, tc, checkpoint_dir=False)
    state = ex.init_or_resume()
    assert "mtp_heads" in state.params

    head0 = np.asarray(state.params["mtp_heads"][0]["kernel"]).copy()
    for batch in batches_from_samples(iter(samples), tc, accum=1, seed=0):
        state, metrics = ex.train_step(state, batch)
    assert "mtp_loss" in metrics and np.isfinite(float(metrics["mtp_loss"]))
    moved = np.abs(np.asarray(state.params["mtp_heads"][0]["kernel"]) - head0)
    assert moved.max() > 0, "MTP head did not receive gradients"

    # export exactly like train/run.py --export-dir
    root = tmp_path / "export"
    loaders.save_converted(jax.device_get(state.params), lm_cfg,
                           root / "tts_llm")

    # pretrained (here: random) flow + HiFT complete the serving triple
    flow_cfg = fm.OfficialFlowConfig(
        vocab_size=lm_cfg.speech_token_size, input_size=32, output_size=80,
        spk_embed_dim=192,
        encoder=fm.UpsampleConformerConfig(size=32, heads=4, linear_units=64,
                                           blocks=1, up_blocks=1),
        estimator=fm.CausalDecoderConfig(in_channels=320, out_channels=80,
                                         channels=32, heads=2, head_dim=16,
                                         n_blocks=1, num_mid_blocks=1),
        n_timesteps=2)
    hift_cfg = hm.HiFTConfig(in_channels=80, base_channels=32, nb_harmonics=2,
                             f0_cond_channels=16)
    loaders.save_converted(
        fm.init_official_flow(jax.random.PRNGKey(1), flow_cfg), flow_cfg,
        root / "tts_flow")
    loaders.save_converted(
        hm.init_hift(jax.random.PRNGKey(2), hift_cfg), hift_cfg,
        root / "tts_hift")

    params, cfg = loaders.load_official_tts(root)
    assert cfg.lm.mtp == 2 and "mtp_heads" in params["lm"]

    tts = JaxCosyVoiceTts(dtype=jnp.float32, seconds_per_char=0.02,
                          official=(params, cfg))
    assert tts.official_cfg.lm.mtp == 2
    wave = tts.synthesize("kalimera mtp")
    assert np.isfinite(wave).all() and len(wave) > 0


def test_resume_continues_epoch_schedule_not_from_zero(kaldi_dir, tmp_path):
    """A crash-resume must finish the CONFIGURED budget, not replay every
    completed epoch: interrupted at epoch 1, the resumed Executor.train()
    runs only the remaining epoch-1 batches (and trains the same total step
    count as an uninterrupted run)."""
    samples = load_kaldi_dir(kaldi_dir)
    tc = TrainConfig(learning_rate=3e-3, accum_grad=1, max_epochs=2,
                     log_interval=100, save_per_step=10_000,
                     max_frames_in_batch=40, shuffle_buffer=8, sort_buffer=4)

    def epoch_batches(epoch):
        return batches_from_samples(iter(samples), tc, accum=1,
                                    seed=tc.seed + epoch)

    # uninterrupted reference run (no checkpointing)
    ex_ref = Executor(TINY_LM, tc, checkpoint_dir=False)
    ref_state = ex_ref.train(ex_ref.init_or_resume(), epoch_batches)
    total_steps = int(ref_state.step)
    per_epoch = sum(1 for _ in epoch_batches(0))
    assert total_steps >= 2 * per_epoch - 1  # sanity: two epochs ran

    # interrupted run: full epoch 0 via train(max_epochs=1) records the
    # schedule position; then 1 manual step INTO epoch 1 + checkpoint = crash
    ckpt_dir = tmp_path / "ckpt_sched"
    ex1 = Executor(TINY_LM, tc, checkpoint_dir=str(ckpt_dir))
    state = ex1.train(ex1.init_or_resume(), epoch_batches, max_epochs=1)
    ex1.ckpt.save_meta({"epoch": 1, "epoch_start_step": int(state.step)})
    first_e1 = next(iter(epoch_batches(1)))
    state, _ = ex1.train_step(state, first_e1)
    ex1.ckpt.save(state, force=True)
    ex1.ckpt.wait()
    crash_step = int(state.step)

    ex2 = Executor(TINY_LM, tc, checkpoint_dir=str(ckpt_dir))
    state2 = ex2.init_or_resume()
    assert int(state2.step) == crash_step
    final = ex2.train(state2, epoch_batches)
    # resumed run completes epoch 1 only: same total budget as uninterrupted
    assert int(final.step) == total_steps, (
        f"resume trained {int(final.step)} steps total; uninterrupted run "
        f"trained {total_steps}")
    ex1.ckpt.close()
    ex2.ckpt.close()
