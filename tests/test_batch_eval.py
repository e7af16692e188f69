"""Batch runner + evaluation metric tests."""

import json

import numpy as np
import pytest

from expressive_speech_translation_tpu.batch import create_manifest, read_manifest, run_batch_job
from expressive_speech_translation_tpu.batch.manifest import manifest_row
from expressive_speech_translation_tpu.evals import (
    analyze_outputs,
    av_sync_correlation,
    chrf,
    corpus_bleu,
    f0_statistics,
    harmonics_to_noise_ratio,
    rms_intensity,
    sentence_bleu,
    token_f1,
    track_f0,
)
from expressive_speech_translation_tpu.media.wavio import write_wav

pytestmark = pytest.mark.quick


def tone(freq=220.0, seconds=2.0, sr=16000, am=3.0):
    t = np.arange(int(sr * seconds)) / sr
    x = 0.4 * np.sin(2 * np.pi * freq * t) * (0.55 + 0.45 * np.sin(2 * np.pi * am * t) ** 2)
    return (x + 0.005 * np.random.default_rng(0).standard_normal(len(t))).astype(np.float32)


# ----------------------------------------------------------------- manifest


def test_manifest_roundtrip(tmp_path):
    d1, d2 = tmp_path / "voxceleb", tmp_path / "ted"
    d1.mkdir(); d2.mkdir()
    for i in range(5):
        write_wav(d1 / f"a{i}.wav", tone(200 + i), 16000)
    for i in range(3):
        write_wav(d2 / f"b{i}.wav", tone(300 + i), 16000)
    rows = create_manifest({"voxceleb": d1, "ted": d2}, tmp_path / "m.csv", per_dataset=4)
    assert len(rows) == 4 + 3
    loaded = read_manifest(tmp_path / "m.csv")
    assert len(loaded) == 7
    assert all(len(r["job_id"]) == 32 for r in loaded)
    # SLURM 1-based indexing
    assert manifest_row(tmp_path / "m.csv", 1) == loaded[0]


def test_run_batch_job_outputs_and_error_file(tmp_path):
    wav = tmp_path / "in.wav"
    write_wav(wav, tone(), 16000)
    out = tmp_path / "out"
    res = run_batch_job(wav, out, job_id="job1", target_lang="fra")
    assert res["status"] == "ok"
    assert (out / "job1.wav").exists()
    transcripts = json.loads((out / "job1_transcripts.json").read_text())
    assert transcripts["target"].startswith("[fra_Latn]")

    # failure → .error file, no raise (run_batch_job.py:82-85 parity)
    res2 = run_batch_job(tmp_path / "missing.wav", out, job_id="job2")
    assert res2["status"] == "error"
    assert (out / "job2.error").exists()


def test_runner_cli_with_manifest(tmp_path, capsys):
    from expressive_speech_translation_tpu.batch.runner import main

    wav = tmp_path / "x.wav"
    write_wav(wav, tone(), 16000)
    rows = create_manifest({"d": tmp_path}, tmp_path / "m.csv", per_dataset=1)
    rc = main([str(tmp_path / "out"), "--manifest", str(tmp_path / "m.csv"), "--row", "1",
               "--lang", "deu"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["status"] == "ok"


# ------------------------------------------------------------------- metrics


def test_bleu_known_values():
    assert corpus_bleu(["the cat sat on the mat"], [["the cat sat on the mat"]]) == pytest.approx(100.0)
    partial = sentence_bleu("the cat sat on a mat", ["the cat sat on the mat"])
    assert 20 < partial < 80
    assert sentence_bleu("zebra xylophone", ["the cat sat"]) < 1.0


def test_chrf_and_f1():
    assert chrf("abcdef", "abcdef") == pytest.approx(100.0)
    assert chrf("abcdef", "uvwxyz") == 0.0
    assert token_f1("a b c", "a b d") == pytest.approx(2 / 3, abs=1e-6)


def test_f0_tracker_finds_pitch():
    stats = f0_statistics(tone(220.0), 16000)
    assert abs(stats["f0_mean"] - 220.0) < 8.0
    assert stats["voiced_ratio"] > 0.5
    silence = np.zeros(16000, np.float32)
    assert f0_statistics(silence)["voiced_ratio"] == 0.0


def test_hnr_orders_clean_vs_noisy():
    clean = tone(180.0)
    noisy = clean + 0.2 * np.random.default_rng(1).standard_normal(len(clean)).astype(np.float32)
    assert harmonics_to_noise_ratio(clean) > harmonics_to_noise_ratio(noisy)


def test_rms_intensity():
    loud = rms_intensity(tone() * 2)["rms_mean_db"]
    quiet = rms_intensity(tone() * 0.1)["rms_mean_db"]
    assert loud > quiet + 20


def test_av_sync_correlation_detects_alignment():
    sr = 16000
    audio = tone(200.0, 4.0, am=1.0)
    rate = 8.33  # mouth activity at 25fps / frame_skip 3
    n = int(4.0 * rate)
    t = np.arange(n) / rate
    aligned = (np.sin(2 * np.pi * 1.0 * t) ** 2).astype(np.float32)
    c_good = av_sync_correlation(audio, sr, aligned, rate)
    c_bad = av_sync_correlation(audio, sr, aligned[::-1] * 0 + np.random.default_rng(2).standard_normal(n).astype(np.float32), rate)
    assert c_good > 0.5
    assert c_good > c_bad


def test_analyze_outputs_csv(tmp_path):
    sys_dir = tmp_path / "mcf"
    ref_dir = tmp_path / "ref"
    sys_dir.mkdir(); ref_dir.mkdir()
    manifest = []
    for i, (freq, text) in enumerate([(200, "bonjour le monde"), (260, "salut tout le monde")]):
        jid = f"job{i}"
        manifest.append({"job_id": jid, "dataset": "d", "path": "x"})
        write_wav(sys_dir / f"{jid}.wav", tone(freq), 16000)
        (sys_dir / f"{jid}_transcripts.json").write_text(json.dumps({"target": text}))
        write_wav(ref_dir / f"{jid}.wav", tone(freq + 5), 16000)
        (ref_dir / f"{jid}_transcripts.json").write_text(json.dumps({"target": "bonjour le monde"}))
    # one missing job
    manifest.append({"job_id": "gone", "dataset": "d", "path": "x"})

    rows = analyze_outputs(manifest, sys_dir, ref_dir, out_csv=tmp_path / "res.csv")
    assert len(rows) == 3
    assert rows[0]["status"] == "ok"
    assert rows[0]["bleu_vs_ref"] == pytest.approx(100.0)
    assert rows[1]["bleu_vs_ref"] < 100.0
    assert "speaker_sim_vs_ref" in rows[0]
    assert rows[2]["status"] == "missing"
    csv_text = (tmp_path / "res.csv").read_text()
    assert "job0" in csv_text and "f0_mean" in csv_text


# --------------------------------------------- full reference column battery


def test_ser_classifier_separates_stimuli():
    """The SER proxy must order synthetic stimuli sensibly (VERDICT r1 #8)."""
    from expressive_speech_translation_tpu.evals.ser import (
        classify_audio_emotion, emotion_features,
    )

    sr = 16000
    t = np.arange(sr * 2) / sr
    # high pitch, loud, strongly modulated → high arousal, high valence
    vib = 1.0 + 0.4 * np.sin(2 * np.pi * 3.0 * t)
    happy = (0.5 * np.sin(2 * np.pi * 280.0 * vib * t)).astype(np.float32)
    # low pitch, quiet, monotone → low arousal
    sad = (0.05 * np.sin(2 * np.pi * 110.0 * t)).astype(np.float32)
    f_happy = emotion_features(happy, sr)
    f_sad = emotion_features(sad, sr)
    assert f_happy["arousal"] > f_sad["arousal"]
    assert classify_audio_emotion(sad, sr) in ("sad", "neutral")
    assert classify_audio_emotion(np.zeros(sr, np.float32), sr) == "no_prediction"


def test_visual_metrics_battery_on_synthetic_clip():
    from test_face import synthetic_clip

    from expressive_speech_translation_tpu.evals import visual_metrics as vm

    frames = synthetic_clip(n=60)
    sr = 16000
    t = np.arange(int(sr * 60 / 24.0)) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

    out = vm.video_metrics(frames, 24.0, audio, sr, source_frames=frames)
    # full reference column set present
    for col in ("visual_emotion", "lip_audio_correlation", "deepfake_score",
                "head_pose_yaw_std", "head_pose_pitch_std",
                "au12_mean", "au25_mean", "visual_identity_distance"):
        assert col in out
    # same clip as source → identity distance ~ 0
    assert out["visual_identity_distance"] < 0.05
    assert out["visual_emotion"] != "no_face_detected"
    assert -1.0 <= out["lip_audio_correlation"] <= 1.0


def test_visual_identity_distance_orders_identities():
    from test_face import synthetic_clip

    from expressive_speech_translation_tpu.evals.visual_metrics import (
        visual_identity_distance,
    )

    a = synthetic_clip(n=16)
    b = synthetic_clip(n=16)
    # different "identity": darken the face region strongly
    c = (synthetic_clip(n=16) * np.array([0.4, 0.9, 0.6])).astype(np.uint8)
    same = visual_identity_distance(a, b)
    diff = visual_identity_distance(a, c)
    assert same < diff


def test_analyze_outputs_full_column_set(tmp_path):
    """analyze emits the reference battery incl. video columns (VERDICT #8)."""
    from test_face import synthetic_clip

    from expressive_speech_translation_tpu.media import native

    sys_dir = tmp_path / "mcf"
    sys_dir.mkdir()
    jid = "vjob"
    frames = synthetic_clip(n=24)
    audio = tone(220, seconds=1.0)
    write_wav(sys_dir / f"{jid}.wav", audio, 16000)
    native.encode_video(sys_dir / f"{jid}.mp4", frames, fps=24.0,
                        audio=audio, audio_rate=16000)
    (sys_dir / f"{jid}_transcripts.json").write_text(json.dumps({"target": "hello"}))

    rows = analyze_outputs([{"job_id": jid}], sys_dir, out_csv=tmp_path / "r.csv")
    row = rows[0]
    for col in ("f0_mean", "hnr_db", "audio_emotion", "sonar_score",
                "bert_score_f1", "visual_emotion", "lip_audio_correlation",
                "deepfake_score", "head_pose_yaw_std", "av_sync_confidence"):
        assert col in row, col
    assert row["audio_emotion"] in ("neutral", "happy", "sad", "angry")

    # pluggable semantic scorer fills the NaN column
    rows2 = analyze_outputs(
        [{"job_id": jid}], sys_dir, out_csv=tmp_path / "r2.csv",
        extra_metrics={"sonar_score": lambda **kw: 0.77})
    assert rows2[0]["sonar_score"] == 0.77
