"""Learned-model seam for the visual eval battery (VERDICT r3 #5).

The reference runs real DeepFace/ArcFace/DFDC models
(Evaluation/analyze_outputs.py:177-426); the repo's classical proxies must be
replaced by mounted learned models through the same discovery pattern the
semantic scorers use (evals/semantic.py:39-62). These tests prove the
dispatch: injection, torchscript checkpoint discovery, and the CSV
source-labeling column.
"""
import json

import numpy as np
import pytest

from test_face import synthetic_clip

from expressive_speech_translation_tpu.evals import visual_metrics as vm
from expressive_speech_translation_tpu.evals import visual_models as vmod

pytestmark = pytest.mark.quick


@pytest.fixture(autouse=True)
def _fresh_registry():
    vmod._reset()
    yield
    vmod._reset()


def _clip_audio(n=24, fps=24.0, sr=16000):
    t = np.arange(int(sr * n / fps)) / sr
    return (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr


def test_default_sources_are_proxy(monkeypatch):
    monkeypatch.delenv("EST_MODELS_DIR", raising=False)
    assert vmod.registry().sources() == {
        "identity": "proxy", "emotion": "proxy", "deepfake": "proxy"}
    frames = synthetic_clip(n=24)
    audio, sr = _clip_audio()
    out = vm.video_metrics(frames, 24.0, audio, sr, source_frames=frames)
    assert out["visual_battery_sources"] == (
        "identity=proxy;emotion=proxy;deepfake=proxy")


def test_injected_learned_models_drive_the_battery():
    reg = vmod.registry()
    calls = {"identity": 0, "emotion": 0, "deepfake": 0}

    def fake_embed(crop):
        calls["identity"] += 1
        assert crop.ndim == 3 and crop.shape[-1] == 3  # [S, S, 3] face crop
        return np.ones(8, np.float32)

    def fake_emotion(frames):
        calls["emotion"] += 1
        assert frames.ndim == 4
        return "learned_happy"

    def fake_deepfake(frames):
        calls["deepfake"] += 1
        return 0.77

    reg.provide("arcface", fake_embed)
    reg.provide("visual_emotion", fake_emotion)
    reg.provide("deepfake", fake_deepfake)

    frames = synthetic_clip(n=24)
    audio, sr = _clip_audio()
    out = vm.video_metrics(frames, 24.0, audio, sr, source_frames=frames)
    assert out["visual_emotion"] == "learned_happy"
    assert out["deepfake_score"] == 0.77
    # identical embeddings → zero cosine distance from the injected embedder
    assert out["visual_identity_distance"] == 0.0
    assert all(calls[k] > 0 for k in calls)
    assert out["visual_battery_sources"] == (
        "identity=learned;emotion=learned;deepfake=learned")


def test_torchscript_checkpoint_discovery(tmp_path, monkeypatch):
    """A real mounted checkpoint: torch.jit archives under
    EST_MODELS_DIR/{arcface,deepfake} load and take over the battery."""
    torch = pytest.importorskip("torch")

    class Embedder(torch.nn.Module):
        def forward(self, x):          # [1, 3, S, S] NCHW crop → [1, 12]
            assert x.shape[1] == 3     # the documented ArcFace contract
            flat = x.mean(dim=(2, 3))  # [1, 3]
            return flat.repeat(1, 4)

    class FakeDetector(torch.nn.Module):
        def forward(self, x):          # [1, T, H, W, 3] clip → [1, 1] logit
            return x.mean().reshape(1, 1) * 0.0 + 2.0  # sigmoid(2) ≈ 0.8808

    for name, mod in (("arcface", Embedder()), ("deepfake", FakeDetector())):
        d = tmp_path / name
        d.mkdir()
        torch.jit.script(mod).save(str(d / "model.pt"))
        (d / "config.json").write_text(json.dumps({"format": "torchscript"}))

    monkeypatch.setenv("EST_MODELS_DIR", str(tmp_path))
    vmod._reset()
    reg = vmod.registry()
    assert reg.sources() == {
        "identity": "learned", "emotion": "proxy", "deepfake": "learned"}

    frames = synthetic_clip(n=16)
    assert vm.deepfake_artifact_score(frames) == pytest.approx(0.8808, abs=1e-3)
    # same clip → identical crops → identical embeddings → distance 0
    assert vm.visual_identity_distance(frames, frames) == pytest.approx(0.0, abs=1e-6)


def test_learned_model_runtime_failure_degrades_to_proxy():
    """A mounted model that crashes at metric time must not take down the
    battery — each member falls back to its classical proxy."""
    vmod._reset()
    reg = vmod.registry()

    def boom(_x):
        raise RuntimeError("shape mismatch")

    reg.provide("arcface", boom)
    reg.provide("deepfake", boom)
    reg.provide("visual_emotion", boom)
    frames = synthetic_clip(n=16)
    d = vm.visual_identity_distance(frames, frames)
    assert np.isfinite(d)                    # proxy result, not an exception
    s = vm.deepfake_artifact_score(frames)
    assert np.isnan(s) or 0.0 <= s <= 1.0
    assert isinstance(vm.classify_visual_emotion(frames), str)
    vmod._reset()


def test_unknown_format_degrades_to_proxy(tmp_path, monkeypatch):
    d = tmp_path / "deepfake"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({"format": "onnx-nope"}))
    monkeypatch.setenv("EST_MODELS_DIR", str(tmp_path))
    vmod._reset()
    assert vmod.registry().sources()["deepfake"] == "proxy"


def test_analysis_csv_carries_source_labels(tmp_path):
    """analysis_results.csv column parity + NaN-vs-proxy labeling
    (analyze_outputs.py:517-599: the battery's provenance must be visible in
    the output table)."""
    from test_batch_eval import tone

    from expressive_speech_translation_tpu.evals.analyze import analyze_outputs
    from expressive_speech_translation_tpu.media import native
    from expressive_speech_translation_tpu.media.wavio import write_wav

    sys_dir = tmp_path / "mcf"
    sys_dir.mkdir()
    jid = "vjob"
    frames = synthetic_clip(n=24)
    audio = tone(220, seconds=1.0)
    write_wav(sys_dir / f"{jid}.wav", audio, 16000)
    native.encode_video(sys_dir / f"{jid}.mp4", frames, fps=24.0,
                        audio=audio, audio_rate=16000)
    (sys_dir / f"{jid}_transcripts.json").write_text(json.dumps({"target": "x"}))

    out_csv = tmp_path / "r.csv"
    rows = analyze_outputs([{"job_id": jid}], sys_dir, out_csv=out_csv)
    assert rows[0]["visual_battery_sources"] == (
        "identity=proxy;emotion=proxy;deepfake=proxy")
    header = out_csv.read_text().splitlines()[0]
    assert "visual_battery_sources" in header
