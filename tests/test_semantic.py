"""Checkpoint-backed semantic eval scorers (evals/semantic.py).

VERDICT r2 #6: sonar_score / bert_score_f1 must be real when an encoder
checkpoint is mounted (same EST_MODELS_DIR discovery as serving) and NaN
only otherwise. Here a tiny NLLB is baked to a tmp models root and the full
config-5 analysis path is driven against it.
"""

import json

import numpy as np
import pytest

import jax

from expressive_speech_translation_tpu.evals.semantic import SemanticScorer
from expressive_speech_translation_tpu.models import nllb as nj
from expressive_speech_translation_tpu.models.loaders import save_converted

pytestmark = pytest.mark.quick

TINY_NLLB = nj.NLLBConfig(d_model=64, encoder_layers=2, decoder_layers=1,
                          heads=4, ffn_dim=128, vocab_size=384)


@pytest.fixture(scope="module")
def models_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("models")
    params = nj.init_nllb(jax.random.PRNGKey(0), TINY_NLLB)
    save_converted(params, TINY_NLLB, root / "nmt")
    return root


def test_unavailable_without_checkpoint(monkeypatch):
    monkeypatch.delenv("EST_MODELS_DIR", raising=False)
    s = SemanticScorer()
    assert not s.available()
    assert np.isnan(s.sonar_score("a", "b"))
    assert np.isnan(s.bert_score_f1("a", "b"))


def test_scores_with_mounted_checkpoint(models_root):
    s = SemanticScorer(models_dir=str(models_root))
    assert s.available()

    same = s.sonar_score("the quick brown fox", "the quick brown fox")
    diff = s.sonar_score("the quick brown fox", "zzz qqq completely other")
    assert same == pytest.approx(1.0, abs=1e-4)
    assert diff < same
    assert -1.0 <= diff <= 1.0

    f1_same = s.bert_score_f1("hello world", "hello world")
    f1_diff = s.bert_score_f1("hello world", "xyzzy plugh")
    assert f1_same == pytest.approx(1.0, abs=1e-4)
    assert f1_diff < f1_same


def test_partial_overlap_orders_sensibly(models_root):
    """BERTScore must rank closer candidates higher for a fixed reference."""
    s = SemanticScorer(models_dir=str(models_root))
    ref = "the cat sat on the mat"
    close = s.bert_score_f1("the cat sat on a mat", ref)
    far = s.bert_score_f1("quantum flux harmonics", ref)
    assert close > far


def test_analysis_pipeline_emits_semantic_columns(models_root, tmp_path,
                                                  monkeypatch):
    """config-5 batch eval: with a mounted encoder the linguistic columns are
    non-NaN; the row still carries them as NaN with no checkpoint."""
    import wave

    import expressive_speech_translation_tpu.evals.semantic as sem
    from expressive_speech_translation_tpu.evals.analyze import analyze_single_job

    def write_outputs(d, text):
        d.mkdir(exist_ok=True)
        t = np.arange(8000) / 16000
        pcm = (0.3 * np.sin(2 * np.pi * 200 * t) * 32767).astype("<i2")
        with wave.open(str(d / "job1.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        (d / "job1_transcripts.json").write_text(json.dumps({"target": text}))

    sys_dir, ref_dir = tmp_path / "sys", tmp_path / "ref"
    write_outputs(sys_dir, "bonjour le monde")
    write_outputs(ref_dir, "bonjour tout le monde")

    monkeypatch.setattr(sem, "_default_scorer",
                        SemanticScorer(models_dir=str(models_root)))
    row = analyze_single_job("job1", sys_dir, ref_dir)
    assert np.isfinite(row["sonar_score"])
    assert np.isfinite(row["bert_score_f1"])
    assert 0.0 < row["bert_score_f1"] <= 1.0

    monkeypatch.setattr(sem, "_default_scorer", SemanticScorer(models_dir=""))
    monkeypatch.delenv("EST_MODELS_DIR", raising=False)
    row2 = analyze_single_job("job1", sys_dir, ref_dir)
    assert np.isnan(row2["sonar_score"]) and np.isnan(row2["bert_score_f1"])


def test_ser_hf_path_used_when_mounted(monkeypatch):
    """SER label compatibility (analyze_outputs.py:125-138): a mounted HF
    audio-classification checkpoint drives the exact reference pipeline; the
    acoustic proxy only runs without one."""
    import expressive_speech_translation_tpu.evals.ser as ser

    calls = {}

    class FakePipe:
        def __call__(self, inputs):
            calls["sr"] = inputs["sampling_rate"]
            return [{"label": "hap", "score": 0.9}, {"label": "neu", "score": 0.1}]

    monkeypatch.setattr(ser, "_hf_pipeline", FakePipe())
    monkeypatch.setattr(ser, "_hf_tried", True)
    audio = 0.2 * np.sin(np.arange(16000) * 0.1).astype(np.float32)
    assert ser.classify_audio_emotion(audio, 16000) == "hap"
    assert calls["sr"] == 16000

    # no pipeline → proxy labels from the fixed quadrant set
    monkeypatch.setattr(ser, "_hf_pipeline", None)
    label = ser.classify_audio_emotion(audio, 16000)
    assert label in ser.LABELS + ("no_prediction",)
