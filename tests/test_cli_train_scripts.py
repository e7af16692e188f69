"""CLI pipelines + training scripts (prepare_mcv / plot / run --tiny)."""

import json
import re

import numpy as np
import pytest

from expressive_speech_translation_tpu.media.wavio import read_wav, write_wav


@pytest.fixture()
def wav_file(tmp_path):
    t = np.arange(16000 * 2) / 16000
    x = (0.4 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t) ** 2)
         + 0.01 * np.random.default_rng(0).standard_normal(len(t))).astype(np.float32)
    p = tmp_path / "in.wav"
    write_wav(p, x, 16000)
    return p


def test_cli_translate_fake(tmp_path, wav_file, capsys):
    from expressive_speech_translation_tpu.cli import main

    out = tmp_path / "out.wav"
    rc = main(["translate", str(wav_file), str(out), "--target-lang", "fra",
               "--engines", "fake"])
    assert rc == 0
    body = json.loads(capsys.readouterr().out)
    assert body["transcripts"]["target"].startswith("[fra_Latn]")
    audio, sr = read_wav(out)
    assert sr == 16000 and len(audio) > 1000


def test_cli_verify_watermark(tmp_path, wav_file, capsys):
    from expressive_speech_translation_tpu.cli import main
    from expressive_speech_translation_tpu.pipeline.watermark import WaterMark, make_payload

    # unwatermarked → rc 1
    assert main(["verify-watermark", str(wav_file)]) == 1
    assert json.loads(capsys.readouterr().out)["watermarked"] is False
    WaterMark.add_watermark(wav_file, make_payload("req42"))
    assert main(["verify-watermark", str(wav_file)]) == 0
    body = json.loads(capsys.readouterr().out)
    assert body["valid"] and body["payload"]["req_id"] == "req42"


def test_cli_ab_test(tmp_path, wav_file, capsys):
    from expressive_speech_translation_tpu.cli import main

    out_dir = tmp_path / "ab"
    rc = main(["ab-test", str(wav_file), str(out_dir)])
    assert rc == 0
    body = json.loads(capsys.readouterr().out)
    variants = {r["variant"] for r in body["results"]}
    assert {"fra", "deu", "default"} <= variants
    assert all((out_dir / f"test_{i}_{r['variant']}.wav").exists()
               for i, r in enumerate(body["results"]))


def test_prepare_mcv(tmp_path):
    from expressive_speech_translation_tpu.train.prepare_mcv import prepare_mcv

    tsv = tmp_path / "validated.tsv"
    tsv.write_text(
        "client_id\tpath\tsentence\n"
        "a\tclip1.mp3\tγειά σου κόσμε\n"
        "b\tclip2.mp3\tκαλημέρα\n"
        "c\t\tmissing path\n",
        encoding="utf-8",
    )
    rows = prepare_mcv(tsv, tmp_path / "data", clips_root="/data/el/clips", speaker="spk001")
    assert len(rows) == 2
    scp = (tmp_path / "data" / "wav.scp").read_text(encoding="utf-8")
    assert "spk001_clip1 /data/el/clips/clip1.mp3" in scp
    text = (tmp_path / "data" / "text").read_text(encoding="utf-8")
    assert "γειά σου κόσμε" in text
    u2s = (tmp_path / "data" / "utt2spk").read_text(encoding="utf-8")
    assert all(line.endswith("spk001") for line in u2s.strip().splitlines())


def test_plot_training_parses_executor_logs(tmp_path):
    from expressive_speech_translation_tpu.train.plot import parse_logs, write_outputs

    log = tmp_path / "train.log"
    log.write_text(
        "2026-01-01 INFO TRAIN Batch 0/100 loss 3.500000 acc 0.200000 grad_norm 1.0 (1.8 it/s)\n"
        "2026-01-01 INFO TRAIN Batch 0/200 loss 3.100000 acc 0.240000 grad_norm 1.0 (1.8 it/s)\n"
        "2026-01-01 INFO Epoch 0 Step 250 CV info loss 3.978000 acc 0.224000\n"
        "2026-01-01 INFO TRAIN Batch 1/300 loss 2.500000 acc 0.300000 grad_norm 1.0 (1.8 it/s)\n"
    )
    train, cv = parse_logs([log])
    assert len(train) == 3 and len(cv) == 1
    assert cv[0] == (0, 250, 3.978, 0.224)
    out = write_outputs(train, cv, tmp_path / "curves.png")
    assert out.endswith(".png") or out.endswith(".csv")
    assert (tmp_path / "curves.png").exists() or (tmp_path / "curves.csv").exists()


@pytest.mark.slow


def test_train_run_tiny_end_to_end(tmp_path, caplog):
    """The full training CLI on a tiny model: logs TRAIN/CV lines, checkpoints,
    and RESUMES (the reference's crash-resume story, SURVEY.md §5.4)."""
    from expressive_speech_translation_tpu.train.prepare_mcv import prepare_mcv
    from expressive_speech_translation_tpu.train.run import main

    tsv = tmp_path / "v.tsv"
    lines = ["client_id\tpath\tsentence"]
    for i in range(24):
        lines.append(f"c{i}\tclip{i}.mp3\tthis is sentence number {i} for training")
    tsv.write_text("\n".join(lines), encoding="utf-8")
    prepare_mcv(tsv, tmp_path / "data")

    ckpt = tmp_path / "ckpts"
    import logging

    with caplog.at_level(logging.INFO):
        rc = main(["--data-dir", str(tmp_path / "data"), "--checkpoint-dir", str(ckpt),
                   "--max-epochs", "1", "--tiny"])
    assert rc == 0
    text = caplog.text
    assert re.search(r"TRAIN Batch \d+/\d+ loss", text) or "CV info" in text
    assert "CV info" in text
    assert any(ckpt.iterdir())

    # resume: second run restores from the checkpoint (step > 0 at start),
    # and --export-dir writes a serving-format tts_llm checkpoint
    caplog.clear()
    export = tmp_path / "export"
    with caplog.at_level(logging.INFO):
        rc = main(["--data-dir", str(tmp_path / "data"), "--checkpoint-dir", str(ckpt),
                   "--max-epochs", "1", "--tiny", "--export-dir", str(export)])
    assert rc == 0
    m = re.search(r"starting at step (\d+)", caplog.text)
    assert m and int(m.group(1)) > 0, caplog.text

    # the export loads back through the same native-checkpoint loader the
    # server uses for EST_MODELS_DIR/tts_llm
    from expressive_speech_translation_tpu.models import cosyvoice as cv
    from expressive_speech_translation_tpu.models.loaders import load_converted

    params, lm_cfg = load_converted(export / "tts_llm", cv.SpeechLMConfig)
    assert lm_cfg.backbone.hidden == 64  # the --tiny config round-tripped
    import jax

    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(params))


def test_cli_embed(tmp_path, wav_file, capsys):
    from expressive_speech_translation_tpu.cli import main

    out = tmp_path / "emb.npy"
    assert main(["embed", str(wav_file), str(out)]) == 0
    emb = np.load(out)
    assert emb.ndim == 1 and emb.shape[0] > 10
    assert np.isfinite(emb).all()
