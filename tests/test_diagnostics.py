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

pytestmark = pytest.mark.quick


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


# ----------------------------- distinct per-language phonetics (VERDICT #9)


class TestLanguagePhonetics:
    sr = 16000

    def _vowel(self, seconds=1.5, f0=120.0, formants=((700, 1.0), (1200, 0.7)),
               jitter=0.0, seed=0):
        """Source-filter vowel: glottal pulse train + formant resonators."""
        g = np.random.default_rng(seed)
        n = int(self.sr * seconds)
        t = np.arange(n) / self.sr
        phase = 2 * np.pi * f0 * t
        if jitter:
            phase += jitter * np.cumsum(g.standard_normal(n)) / self.sr * 2 * np.pi * f0
        src = np.zeros(n)
        for h in range(1, 30):
            src += np.sin(h * phase) / h
        out = np.zeros(n)
        for freq, amp in formants:
            # resonator: narrow bandpass via FFT masking
            spec = np.fft.rfft(src)
            fr = np.fft.rfftfreq(n, 1 / self.sr)
            mask = np.exp(-0.5 * ((fr - freq) / 120.0) ** 2)
            out += amp * np.fft.irfft(spec * mask, n)
        return (0.3 * out / (np.abs(out).max() + 1e-9)).astype(np.float32)

    def test_french_nasalization_separates_nasal_vs_oral(self):
        from expressive_speech_translation_tpu.pipeline.diagnostics.languages import (
            FrenchAnalyzer,
        )

        oral = self._vowel(formants=((700, 1.0), (1200, 0.8)))
        # nasal coupling: add murmur at 280 Hz, damp F2 (anti-formant)
        nasal = self._vowel(formants=((280, 1.0), (700, 0.5), (1200, 0.15)))
        fr = FrenchAnalyzer(self.sr)
        assert fr.nasal_murmur_ratio(nasal) > fr.nasal_murmur_ratio(oral) + 0.2

    def test_spanish_trill_separates_trilled_vs_plain(self):
        from expressive_speech_translation_tpu.pipeline.diagnostics.languages import (
            SpanishAnalyzer,
        )

        plain = self._vowel(seconds=1.0)
        t = np.arange(len(plain)) / self.sr
        trilled = (plain * (0.55 + 0.45 * np.sign(np.sin(2 * np.pi * 28.0 * t)))).astype(np.float32)
        es = SpanishAnalyzer(self.sr)
        assert es.trill_strength(trilled) > es.trill_strength(plain) + 0.2

    def test_german_vowel_length_contrast(self):
        from expressive_speech_translation_tpu.pipeline.diagnostics.languages import (
            GermanAnalyzer,
        )

        def sequence(durs):
            parts = []
            for i, d in enumerate(durs):
                parts.append(self._vowel(seconds=d, f0=110 + 10 * (i % 3)))
                parts.append(np.zeros(int(0.12 * self.sr), np.float32))
            return np.concatenate(parts)

        contrastive = sequence([0.08, 0.30, 0.08, 0.32, 0.09, 0.28, 0.08, 0.30])
        uniform = sequence([0.18] * 8)
        de = GermanAnalyzer(self.sr)
        assert de.vowel_length_contrast(contrastive) > de.vowel_length_contrast(uniform) + 0.15

    def test_analyzers_emit_language_specific_keys(self):
        from expressive_speech_translation_tpu.pipeline.diagnostics import (
            analyze_language,
        )

        x = self._vowel()
        assert "liaison_smoothness" in analyze_language(x, "fra")
        assert "final_devoicing" in analyze_language(x, "deu")
        assert "gemination" in analyze_language(x, "ita")
        assert "vowel_reduction" in analyze_language(x, "por")
        assert "trill_rate" in analyze_language(x, "spa")
        assert analyze_language(x, "xxx") == {}


class TestNeuralArtifacts:
    sr = 16000

    def test_metallic_resonance_flags_synthetic_comb(self):
        from expressive_speech_translation_tpu.pipeline.diagnostics.neural import (
            measure_metallic_resonance,
        )

        g = np.random.default_rng(3)
        n = self.sr * 2
        t = np.arange(n) / self.sr
        # metallic: stack of perfectly regular sharp partials
        metallic = sum(np.sin(2 * np.pi * (400 * k) * t) / k for k in range(1, 16))
        metallic = (0.3 * metallic / np.abs(metallic).max()).astype(np.float32)
        # natural-ish: filtered noise with slow envelope
        nat = g.standard_normal(n).astype(np.float32)
        nat = np.convolve(nat, np.ones(16) / 16, mode="same") * (
            0.5 + 0.5 * np.sin(2 * np.pi * 2.0 * t)).astype(np.float32)
        m1 = measure_metallic_resonance(metallic, self.sr)
        m2 = measure_metallic_resonance(nat.astype(np.float32), self.sr)
        assert m1["severity"] > m2["severity"] + 0.15
        assert m1["measurements"]["harmonic_regularity"] > 0.8
        assert m1["description"]

    def test_oversmoothing_detected_on_lowpassed_speech(self):
        from expressive_speech_translation_tpu.pipeline.diagnostics.neural import (
            analyze_neural_synthesis_artifacts,
        )

        g = np.random.default_rng(4)
        n = self.sr * 2
        t = np.arange(n) / self.sr
        mod = (0.4 + 0.6 * np.sin(2 * np.pi * 3.0 * t) ** 2)
        crisp = (g.standard_normal(n) * mod).astype(np.float32)
        smooth = np.convolve(crisp, np.ones(40) / 40, mode="same").astype(np.float32)
        r_crisp = analyze_neural_synthesis_artifacts(crisp, self.sr)
        r_smooth = analyze_neural_synthesis_artifacts(smooth, self.sr)
        assert (r_smooth["synthesis_artifacts"]["oversmoothing"]
                > r_crisp["synthesis_artifacts"]["oversmoothing"])

    def test_report_structure(self):
        from expressive_speech_translation_tpu.pipeline.diagnostics import (
            AudioDiagnostics,
        )

        g = np.random.default_rng(5)
        x = (0.2 * g.standard_normal(self.sr)).astype(np.float32)
        rep = AudioDiagnostics().analyze_translation(x, language="fra")
        assert "neural" in rep
        for k in ("voice_coherence", "synthesis_artifacts",
                  "naturalness_metrics", "detailed_descriptions"):
            assert k in rep["neural"]


class TestVisualization:
    def test_visualization_data_shapes(self):
        from expressive_speech_translation_tpu.pipeline.diagnostics.visualize import (
            visualization_data,
        )

        g = np.random.default_rng(7)
        src = (0.2 * g.standard_normal(16000)).astype(np.float32)
        tr = (0.2 * g.standard_normal(20000)).astype(np.float32)
        tr[4000:6000] = 0.0  # dropout → problem area
        data = visualization_data(src, tr)
        assert data["spectral_analysis"]["source_db"].shape[0] == 513
        assert len(data["prosody_visualization"]["pitch_translated"]) > 0
        assert len(data["waveform_comparison"]["problem_frames"]) > 0

    def test_render_report_png(self, tmp_path):
        from expressive_speech_translation_tpu.pipeline.diagnostics import (
            AudioDiagnostics,
        )

        g = np.random.default_rng(8)
        src = (0.2 * g.standard_normal(16000)).astype(np.float32)
        tr = (0.2 * g.standard_normal(16000)).astype(np.float32)
        diag = AudioDiagnostics(output_dir=tmp_path)
        diag.analyze_translation(tr, src, language="fra", save=True)
        pngs = list(tmp_path.rglob("diagnostics.png"))
        jsons = list(tmp_path.rglob("diagnostics.json"))
        assert len(pngs) == 1 and len(jsons) == 1
        assert pngs[0].stat().st_size > 20_000  # a real rendered figure


class TestLanguageDetail:
    """detail() nested reports: reference key-tree parity per language
    (language_analysis/{language}.py analyze() structures) + discriminative
    sub-scores."""

    sr = 16000

    def test_key_trees_match_reference(self):
        from expressive_speech_translation_tpu.pipeline.diagnostics import (
            detail_language,
        )

        x = speechish(2.5)
        trees = {
            # french.py:53-58
            "fra": {"nasalization", "liaison", "prosody", "vowel_quality"},
            # german.py analyze()
            "deu": {"vowel_analysis", "consonant_features", "word_stress",
                    "glottal_stops", "final_devoicing", "schwa_realization"},
            # italian.py analyze()
            "ita": {"gemination", "vowel_quality", "consonant_features",
                    "prosodic_features"},
            # portuguese.py analyze()
            "por": {"vowel_analysis", "consonant_features", "stress_patterns",
                    "intonation"},
            # spanish.py analyze()
            "spa": {"phoneme_analysis", "syllable_timing",
                    "intonation_patterns", "vowel_clarity", "stress_patterns"},
        }
        for lang, keys in trees.items():
            rep = detail_language(x, lang, self.sr)
            assert set(rep) == keys, (lang, set(rep))
        assert detail_language(x, "xx", self.sr) == {}

    def test_french_nested_subscores_and_descriptions(self):
        from expressive_speech_translation_tpu.pipeline.diagnostics import (
            detail_language,
        )

        rep = detail_language(speechish(2.5), "fra", self.sr)
        nasal = rep["nasalization"]
        assert set(nasal["nasal_resonance"]) == {"strength", "stability",
                                                 "peak_frequencies"}
        assert set(nasal["quality_assessment"]) == {"authenticity",
                                                    "consistency", "distinction"}
        assert isinstance(nasal["description"], str) and nasal["description"]
        assert isinstance(rep["liaison"]["detected"], bool)
        assert set(rep["prosody"]) == {"score", "rhythm_quality",
                                       "intonation_quality"}
        # every numeric leaf bounded [0,1] except peak freqs / counts / ms
        def walk(d):
            for k, v in d.items():
                if isinstance(v, dict):
                    walk(v)
                elif isinstance(v, float) and not k.endswith("_ms"):
                    assert 0.0 <= v <= 1.0, (k, v)
        walk(rep)

    def test_detail_included_in_full_report(self):
        rep = AudioDiagnostics().analyze_translation(speechish(2.0),
                                                     language="spa")
        assert "phoneme_analysis" in rep["language_detail"]
        # flat analyze() contract unchanged
        assert all(isinstance(v, float) for v in rep["language"].values())

    def test_intonation_quality_separates_contoured_vs_flat(self):
        from expressive_speech_translation_tpu.pipeline.diagnostics.languages import (
            FrenchAnalyzer,
        )

        t = np.arange(int(self.sr * 2.0)) / self.sr
        am = 0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t) ** 2
        flat = (0.4 * am * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
        # declining contour: 220 Hz -> 150 Hz over the utterance
        f0 = 220.0 - 70.0 * (t / t[-1])
        phase = 2 * np.pi * np.cumsum(f0) / self.sr
        contoured = (0.4 * am * np.sin(phase)).astype(np.float32)
        fr = FrenchAnalyzer(self.sr)
        assert (fr.intonation_quality(contoured)
                > fr.intonation_quality(flat) + 0.15)

    def test_gemination_closures_detected(self):
        from expressive_speech_translation_tpu.pipeline.diagnostics.languages import (
            ItalianAnalyzer,
        )

        # vowel - 120 ms closure - burst - vowel (geminate /tt/ profile)
        t = np.arange(int(self.sr * 0.4)) / self.sr
        vowel = (0.4 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
        closure = np.zeros(int(self.sr * 0.12), np.float32)
        g = np.random.default_rng(3)
        burst = (0.5 * g.standard_normal(int(self.sr * 0.02))).astype(np.float32)
        x = np.concatenate([vowel, closure, burst, vowel])
        it = ItalianAnalyzer(self.sr)
        closures = it.pre_burst_silences(x)
        assert closures["count"] >= 1
        assert 30.0 <= closures["mean_closure_ms"] <= 250.0
