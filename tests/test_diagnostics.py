"""Diagnostics suite + debug analyzer tests."""

import json

import numpy as np
import pytest

from expressive_speech_translation_tpu.pipeline.debug_analyzer import AudioDebugAnalyzer
from expressive_speech_translation_tpu.pipeline.diagnostics import (
    LANGUAGE_ANALYZERS,
    AudioDiagnostics,
    QualityMetrics,
    SpectralAnalyzer,
    TemporalAnalyzer,
    analyze_language,
)


def speechish(seconds=2.0, sr=16000, seed=0):
    g = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = 0.4 * np.sin(2 * np.pi * 190 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 2.7 * t) ** 2)
    x += 0.1 * np.sin(2 * np.pi * 950 * t) * (0.5 + 0.5 * np.cos(2 * np.pi * 1.9 * t) ** 2)
    return (x + 0.01 * g.standard_normal(len(t))).astype(np.float32)


def test_spectral_analyzer_keys_and_bands():
    out = SpectralAnalyzer().analyze(speechish())
    assert abs(sum(v for k, v in out.items() if k.startswith("band_")) - 1.0) < 0.05
    assert 100 < out["centroid_hz"] < 3000
    assert np.isfinite(out["spectral_entropy"])


def test_temporal_analyzer_segments():
    x = np.concatenate([speechish(0.8), np.zeros(8000, np.float32), speechish(0.8, seed=1)])
    out = TemporalAnalyzer().analyze(x)
    assert out["n_segments"] >= 2
    assert out["pause_count"] >= 1
    assert 0.3 < out["speech_ratio"] < 0.9


def test_quality_scores_in_range_and_ordering():
    qm = QualityMetrics()
    clean = speechish()
    noisy = clean + 0.3 * np.random.default_rng(2).standard_normal(len(clean)).astype(np.float32)
    s_clean = qm.score(clean)
    s_noisy = qm.score(noisy)
    for scores in (s_clean, s_noisy):
        assert set(scores) == {
            "robotic_score", "pronunciation_score", "clarity_score",
            "noise_score", "consistency_score", "balance_score",
        }
        assert all(1.0 <= v <= 5.0 for v in scores.values())
    assert s_clean["noise_score"] > s_noisy["noise_score"]


def test_artifact_analysis():
    qm = QualityMetrics()
    out = qm.analyze_neural_synthesis_artifacts(speechish())
    assert set(out) == {"metallic_resonance", "f0_discontinuity", "spectral_flux_outliers"}
    assert 0 <= out["metallic_resonance"] <= 1


def test_language_analyzers_present_and_bounded():
    assert set(LANGUAGE_ANALYZERS) == {"fra", "deu", "ita", "por", "spa"}
    x = speechish()
    for lang in LANGUAGE_ANALYZERS:
        out = analyze_language(x, lang)
        assert out, lang
        assert all(0.0 <= v <= 1.0 for v in out.values()), (lang, out)
    assert analyze_language(x, "xx") == {}


def test_full_diagnostics_report_and_save(tmp_path):
    diag = AudioDiagnostics(output_dir=tmp_path)
    translated = speechish()
    source = speechish(2.5, seed=3)
    report = diag.analyze_translation(translated, source, language="fra", save=True)
    assert "quality" in report and "comparison" in report
    assert report["comparison"]["duration_ratio"] == pytest.approx(2.0 / 2.5, abs=0.01)
    assert isinstance(report["narrative"], str) and "quality" in report["narrative"].lower()
    saved = list(tmp_path.rglob("diagnostics.json"))
    assert len(saved) == 1
    json.loads(saved[0].read_text())  # valid json
    # narrative-only entry point
    text = diag.diagnose_translation_quality(translated)
    assert "segment" in text


def test_debug_analyzer_spans_and_compare():
    an = AudioDebugAnalyzer()
    x = np.concatenate([np.zeros(8000, np.float32), speechish(1.0), np.zeros(4000, np.float32)])
    rep = an.analyze(x, "t")
    assert rep["n_chunks"] == 1
    assert 0.4 < rep["content_spans"][0]["start"] < 0.6
    assert rep["silence_ratio"] > 0.3
    cmp = an.compare(x, np.concatenate([x, np.zeros(16000, np.float32)]))
    assert cmp["duration_delta_s"] == pytest.approx(1.0, abs=0.05)
