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
