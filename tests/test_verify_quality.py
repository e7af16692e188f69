"""BASELINE five-config quality-parity harness (evals/verify_quality.py).

VERDICT r4 #1: the harness must turn the converter/BLEU/ECAPA pieces into one
command whose gate arithmetic (BLEU ≤ 0.5, spk-sim ≤ 0.01 — BASELINE.md) is
provable hermetically: tiny injected engines run all five configs end-to-end,
a reference-outputs dir built from a matching run passes the gates, and a
perturbed one fails them.
"""

import json

import numpy as np
import pytest

from expressive_speech_translation_tpu.evals import verify_quality as vq
from expressive_speech_translation_tpu.media.wavio import read_wav, write_wav
from expressive_speech_translation_tpu.pipeline.engines import (
    Engines, FakeAsr, FakeNmt, FakeTts,
)

pytestmark = pytest.mark.quick


# ------------------------------------------------------------ gate arithmetic


def test_gate_value():
    assert vq.gate_value(0.0, 0.5) == "pass"
    assert vq.gate_value(0.5, 0.5) == "pass"      # gate is ≤, not <
    assert vq.gate_value(0.51, 0.5) == "fail"
    assert vq.gate_value(None, 0.5) == "n/a"


def test_bleu_metrics_gold_mode():
    gold = ["the cat sat on the mat today after lunch"]
    m = vq.bleu_metrics("the cat sat on the mat today after lunch",
                        {"target_text": "the cat sat on the mat today after lunch",
                         "gold_target": gold})
    assert m["bleu_mode"] == "gold"
    assert m["bleu_delta"] == 0.0
    # systems identical to each other but both differing from gold: delta 0
    m = vq.bleu_metrics("a cat sat on a mat",
                        {"target_text": "a cat sat on a mat", "gold_target": gold})
    assert m["bleu_delta"] == 0.0
    # systems differing from each other score different deltas vs gold
    m = vq.bleu_metrics("completely unrelated words here entirely",
                        {"target_text": gold[0], "gold_target": gold})
    assert m["bleu_delta"] > 0.5


def test_bleu_metrics_proxy_mode():
    m = vq.bleu_metrics("exact same output text here okay",
                        {"target_text": "exact same output text here okay"})
    assert m["bleu_mode"] == "vs_reference_output"
    assert m["bleu_delta"] == 0.0
    m2 = vq.bleu_metrics("different words entirely", {"target_text": "exact same output"})
    assert m2["bleu_delta"] > 0.5
    assert vq.bleu_metrics("x", None)["bleu_delta"] is None


def test_spk_metrics_unavailable_is_na_not_pass():
    scorer = vq.SpeakerScorer(None)
    m = vq.spk_metrics(scorer, np.zeros(16000), np.zeros(16000), np.zeros(16000))
    assert m["spk_sim_delta"] is None
    assert vq.config_gates(m)["spk_sim"] == "n/a"


def test_overall_verdict():
    ok = {"1": {"ran": True, "gates": {"bleu": "pass", "spk_sim": "pass"}}}
    assert vq.overall_verdict(ok, "quality-parity") == "pass"
    bad = {"1": {"ran": True, "gates": {"bleu": "fail", "spk_sim": "pass"}}}
    assert vq.overall_verdict(bad, "quality-parity") == "fail"
    # a fail is a fail even in structure-only mode
    assert vq.overall_verdict(bad, "structure-only") == "fail"
    na = {"1": {"ran": True, "gates": {"bleu": "n/a", "spk_sim": "n/a"}}}
    assert vq.overall_verdict(na, "quality-parity") == "no-applicable-gates"
    assert vq.overall_verdict(ok, "structure-only") == "structure-only"


# ------------------------------------------------------------- tiny test rig


def _embed(audio_16k: np.ndarray) -> np.ndarray:
    """Deterministic 'speaker embedding': coarse log-spectral envelope.
    Identical audio → identical embedding (sim 1); different tones differ."""
    x = np.asarray(audio_16k, np.float32).reshape(-1)[: 16000 * 4]
    spec = np.abs(np.fft.rfft(x, n=8192))
    bands = spec[: 4096].reshape(32, -1).mean(axis=1)
    return np.log1p(bands)


class LoadedAsr(FakeAsr):
    weightless = False  # simulates converted-checkpoint engines


class LoadedNmt(FakeNmt):
    weightless = False


class LoadedTts(FakeTts):
    weightless = False


class FakeVideoIO:
    """Video stand-in: 'videos' are WAV files; mux/lipsync write the dubbed
    audio; extract_audio reads it back — exercises the full serve/video.py
    SSE path without a media container."""

    def extract_audio(self, video_path):
        return read_wav(video_path)

    def mux(self, video_path, audio, sr, out_path):
        write_wav(out_path, np.asarray(audio, np.float32).reshape(-1), sr)

    def lipsync(self, video_path, audio, sr, out_path):
        write_wav(out_path, np.asarray(audio, np.float32).reshape(-1), sr)


def _tone(freq, seconds, sr=16_000, am=0.0):
    t = np.arange(int(sr * seconds)) / sr
    env = 1.0 + am * np.sin(2 * np.pi * 3.0 * t)
    return (0.3 * env * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture()
def rig(tmp_path):
    fixtures = {
        "harvard": str(tmp_path / "harvard.wav"),
        "short_audio": str(tmp_path / "short.wav"),
        "short_video": str(tmp_path / "video.mp4"),
    }
    write_wav(fixtures["harvard"], _tone(440, 3.0), 16_000)
    write_wav(fixtures["short_audio"], _tone(220, 2.0, am=0.5), 16_000)
    write_wav(fixtures["short_video"], _tone(330, 2.0, am=0.3), 16_000)
    return {
        "fixtures": fixtures,
        "engines": Engines(asr=LoadedAsr(), nmt=LoadedNmt(), tts=LoadedTts()),
        "scorer": vq.SpeakerScorer(_embed, source="test-embed"),
        "video_io": FakeVideoIO(),
        "tone_convert": lambda src, tgt: np.resize(tgt, src.shape),
    }


def _run(rig, tmp_path, name, reference_dir=None):
    return vq.run_verify_quality(
        out_dir=tmp_path / name,
        reference_dir=reference_dir,
        engines=rig["engines"],
        scorer=rig["scorer"],
        video_io=rig["video_io"],
        tone_convert=rig["tone_convert"],
        fixtures=rig["fixtures"],
        max_seconds=4.0,
    )


# --------------------------------------------------------------- end-to-end


def test_structure_only_without_reference(rig, tmp_path):
    report = _run(rig, tmp_path, "r1")
    assert report["mode"] == "structure-only"
    assert report["overall"] == "structure-only"
    assert set(report["configs"]) == {
        "1_asr_nmt", "2_s2st_clone", "3_openvoice", "4_video_lipsync",
        "5_mcv_greek_batch"}
    for key, c in report["configs"].items():
        assert c["ran"], f"{key}: {c.get('error')}"
        # no reference outputs → no BLEU gate applicable
        assert c["gates"]["bleu"] == "n/a"
    # report persisted
    assert json.loads((tmp_path / "r1" / "report.json").read_text())["mode"] \
        == "structure-only"


def _build_reference_from(report, run_dir, ref_dir, video_io=None):
    """Promote a run's own outputs into a reference-outputs dir through the
    PRODUCTION promotion path (what `--promote-reference` runs) — proving
    promote → re-run → gates-pass round-trips."""
    written = vq.promote_reference(report, ref_dir,
                                   video_io=video_io or FakeVideoIO())
    assert set(written) == {k for k, c in report["configs"].items()
                            if c.get("ran")}


def test_matching_reference_passes_gates(rig, tmp_path):
    first = _run(rig, tmp_path, "seed")
    ref_dir = tmp_path / "ref"
    _build_reference_from(first, tmp_path / "seed", ref_dir)

    report = _run(rig, tmp_path, "r2", reference_dir=str(ref_dir))
    assert report["mode"] == "quality-parity"   # loaded-weight engines + refs
    assert report["overall"] == "pass", json.dumps(report, indent=2)[:2000]
    for key in ("2_s2st_clone", "4_video_lipsync", "5_mcv_greek_batch"):
        m = report["configs"][key]["metrics"]
        assert m["bleu_delta"] == 0.0
        assert m["spk_sim_delta"] == 0.0
        assert report["configs"][key]["gates"] == {"bleu": "pass",
                                                   "spk_sim": "pass"}
    assert report["configs"]["3_openvoice"]["gates"]["spk_sim"] == "pass"


def test_diverging_reference_fails_bleu_gate(rig, tmp_path):
    first = _run(rig, tmp_path, "seed2")
    ref_dir = tmp_path / "ref2"
    _build_reference_from(first, tmp_path / "seed2", ref_dir)
    # corrupt config 2's reference translation → BLEU delta blows the gate
    (ref_dir / "config2.json").write_text(json.dumps({
        "target_text": "entirely different sentence with no overlap",
        "audio": "config2.wav"}))
    report = _run(rig, tmp_path, "r3", reference_dir=str(ref_dir))
    assert report["configs"]["2_s2st_clone"]["gates"]["bleu"] == "fail"
    assert report["overall"] == "fail"


def test_diverging_speaker_fails_spk_gate(rig, tmp_path):
    first = _run(rig, tmp_path, "seed3")
    ref_dir = tmp_path / "ref3"
    _build_reference_from(first, tmp_path / "seed3", ref_dir)
    # reference output audio from a very different 'speaker' (tone)
    write_wav(ref_dir / "config2.wav", _tone(1200, 2.0), 16_000)
    report = _run(rig, tmp_path, "r4", reference_dir=str(ref_dir))
    m = report["configs"]["2_s2st_clone"]["metrics"]
    assert m["spk_sim_delta"] > 0.01
    assert report["configs"]["2_s2st_clone"]["gates"]["spk_sim"] == "fail"
    assert report["overall"] == "fail"


def test_failed_config_reported_not_fatal(rig, tmp_path):
    rig["fixtures"]["harvard"] = str(tmp_path / "missing.wav")
    report = _run(rig, tmp_path, "r5")
    assert report["configs"]["1_asr_nmt"]["ran"] is False
    assert "error" in report["configs"]["1_asr_nmt"]
    # configs 2/5 don't need harvard and still ran
    assert report["configs"]["2_s2st_clone"]["ran"]
    # a crashed config downgrades a structure run to "incomplete" — a
    # structure check where the plumbing threw must not read as green
    # (and the CLI exits nonzero on it)
    assert report["overall"] == "incomplete"


def test_unknown_config_number_is_a_clean_error(rig, tmp_path):
    with pytest.raises(ValueError, match="unknown config number"):
        vq.run_verify_quality(out_dir=tmp_path / "bad", configs=(1, 6),
                              engines=rig["engines"], scorer=rig["scorer"],
                              fixtures=rig["fixtures"])


def test_models_dir_exported_for_whole_run(rig, tmp_path, monkeypatch):
    """--weights must behave exactly like EST_MODELS_DIR for every env-
    discovered seam (e.g. the face detector during config 4), so the env
    stays exported across the configs and is restored afterwards."""
    import os

    monkeypatch.delenv("EST_MODELS_DIR", raising=False)
    seen = {}

    def probe(ctx):
        seen["env"] = os.environ.get("EST_MODELS_DIR")
        return {"outputs": {}, "metrics": {}}

    monkeypatch.setitem(vq._RUNNERS, 1, probe)
    vq.run_verify_quality(out_dir=tmp_path / "env", configs=(1,),
                          models_dir=str(tmp_path / "models"),
                          engines=rig["engines"], scorer=rig["scorer"],
                          fixtures=rig["fixtures"])
    assert seen["env"] == str(tmp_path / "models")
    assert "EST_MODELS_DIR" not in os.environ   # restored


def test_cli_verify_quality_fake_engines(rig, tmp_path, capsys):
    """CLI wiring: fake engines, configs 1+5 (no video/tone deps), rc 0 and a
    structure-only labeled report."""
    from expressive_speech_translation_tpu import cli

    rc = cli.main([
        "verify-quality", "--out", str(tmp_path / "cli"),
        "--engines", "fake", "--configs", "1,5",
        "--harvard", rig["fixtures"]["harvard"],
        "--short-audio", rig["fixtures"]["short_audio"],
        "--max-seconds", "3",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["mode"] == "structure-only"
    assert report["weights"] == "fake"
    assert set(report["configs"]) == {"1_asr_nmt", "5_mcv_greek_batch"}
    assert all(c["ran"] for c in report["configs"].values())


def test_cli_promote_then_ab_compare(rig, tmp_path, capsys):
    """--promote-reference → --reference-outputs round-trip through the CLI:
    run A promotes its outputs, run B scores 0-delta against them (the
    one-command A/B workflow for comparing builds/configs)."""
    from expressive_speech_translation_tpu import cli

    common = ["--engines", "fake", "--configs", "1,5",
              "--harvard", rig["fixtures"]["harvard"],
              "--short-audio", rig["fixtures"]["short_audio"],
              "--max-seconds", "3"]
    ref = tmp_path / "ab_ref"
    rc = cli.main(["verify-quality", "--out", str(tmp_path / "a"),
                   "--promote-reference", str(ref), *common])
    assert rc == 0
    a = json.loads(capsys.readouterr().out)
    assert set(a["promoted"]) == {"1_asr_nmt", "5_mcv_greek_batch"}
    assert (ref / "config1.json").exists()
    assert (ref / "config5.wav").exists()

    rc = cli.main(["verify-quality", "--out", str(tmp_path / "b"),
                   "--reference-outputs", str(ref), *common])
    assert rc == 0
    b = json.loads(capsys.readouterr().out)
    # identical build → zero BLEU delta on both configs
    for key in ("1_asr_nmt", "5_mcv_greek_batch"):
        assert b["configs"][key]["metrics"]["bleu_delta"] == 0.0
        assert b["configs"][key]["gates"]["bleu"] == "pass"
