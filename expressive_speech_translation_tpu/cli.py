"""Standalone CLI pipelines.

Parity with the reference's CLI surface (SURVEY.md §2.18):

  est-translate      Backend/speech_translation_pipeline.py (226 LoC argparse
                     CLI: ASR → NMT → TTS → voice conversion) and
                     translate_audio.py drivers
  est-s2st           Backend/translate_speech.py (direct SeamlessM4T-v2 S2ST,
                     beam 5, bandpass, tanh limiting)
  est-simple-tts     Backend/simple_translate_tts.py / gtts_pipeline_fixed.py
                     (text-only translate + TTS, no cloning)
  est-verify-watermark   Backend/verify_watermark.py:12-50
  est-ab-test        services/audio_testing.py AudioTester.run_ab_test (§4)

All are argparse subcommands of ``python -m expressive_speech_translation_tpu.cli``.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)


def _load_audio(path: str):
    from .media.wavio import read_wav

    p = Path(path)
    if p.suffix.lower() == ".wav":
        return read_wav(p)
    from .media import decode_audio_bytes

    return decode_audio_bytes(p.read_bytes(), p.suffix.lower())


def _prepare_16k(audio, sr):
    from .pipeline.audio_processor import AudioProcessor

    return AudioProcessor().process_audio(audio, orig_sr=sr)


def cmd_translate(args) -> int:
    """ASR → NMT → TTS (+ optional tone conversion) — speech_translation_pipeline.py."""
    from .media.wavio import write_wav
    from .pipeline.cascaded import CascadedBackend
    from .pipeline.engines import fake_engines

    audio, sr = _load_audio(args.input)
    x = _prepare_16k(audio, sr)
    if args.engines == "jax":
        from .pipeline.jax_engines import jax_engines

        engines = jax_engines()
    else:
        engines = fake_engines()
    backend = CascadedBackend(engines)
    backend.initialize()
    result = backend.translate_speech(x, args.source_lang, args.target_lang)
    write_wav(args.output, result["audio"][0], 16_000)
    print(json.dumps({
        "output": args.output,
        "transcripts": result["transcripts"],
        "stage_xrt": {k: round(v["xrt"], 4) for k, v in result["stage_summary"].items()},
    }, ensure_ascii=False))
    return 0


def cmd_s2st(args) -> int:
    """Direct S2ST (translate_speech.py parity: beam 5, bandpass, tanh)."""
    from .media.wavio import write_wav
    from .pipeline.alternate_backends import SeamlessBackend

    audio, sr = _load_audio(args.input)
    x = _prepare_16k(audio, sr)
    # baked seamless-m4t-v2 weights (est bake --seamless) via --weights /
    # EST_MODELS_DIR; weightless toy instance otherwise
    backend = SeamlessBackend.from_models_dir(
        getattr(args, "weights", None), num_beams=args.num_beams)
    backend.initialize()
    result = backend.translate_speech(x, args.source_lang, args.target_lang)
    write_wav(args.output, result["audio"][0], 16_000)
    print(json.dumps({"output": args.output, "transcripts": result["transcripts"]},
                     ensure_ascii=False))
    return 0


def cmd_simple_tts(args) -> int:
    """Text → translate → TTS, no cloning (simple_translate_tts.py parity)."""
    from .media.wavio import write_wav
    from .pipeline.engines import FakeNmt, FakeTts

    if args.engines == "jax":
        from .pipeline.jax_engines import JaxCosyVoiceTts, JaxNllbNmt

        nmt, tts = JaxNllbNmt(), JaxCosyVoiceTts()
    else:
        nmt, tts = FakeNmt(), FakeTts()
    from .pipeline.languages import NLLB_LANGUAGES

    translated = nmt.translate(
        args.text, NLLB_LANGUAGES.get(args.source_lang, args.source_lang),
        NLLB_LANGUAGES.get(args.target_lang, args.target_lang),
    )
    wave = tts.synthesize(translated, language=args.target_lang)
    sr = getattr(tts, "sample_rate", 24_000)
    write_wav(args.output, np.asarray(wave, np.float32), sr)
    print(json.dumps({"output": args.output, "translated": translated}, ensure_ascii=False))
    return 0


def cmd_verify_watermark(args) -> int:
    """Backend/verify_watermark.py:12-50 parity."""
    from .pipeline.watermark import WaterMark

    try:
        payload = WaterMark.extract_watermark(args.input)
    except (FileNotFoundError, OSError) as e:
        print(json.dumps({"watermarked": False, "error": str(e)}))
        return 1
    if payload is None:
        print(json.dumps({"watermarked": False}))
        return 1
    print(json.dumps({"watermarked": True, "payload": payload,
                      "valid": WaterMark.verify(args.input)}, ensure_ascii=False))
    return 0


def cmd_ab_test(args) -> int:
    """A/B sweep over per-language enhancement params (audio_testing.py:11-98)."""
    from .media.wavio import write_wav
    from .pipeline.audio_processor import LANGUAGE_PARAMS, AudioProcessor

    audio, sr = _load_audio(args.input)
    ap = AudioProcessor()
    x = ap.process_audio(audio, orig_sr=sr)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    results = []
    for i, (lang, params) in enumerate(sorted(LANGUAGE_PARAMS.items())):
        enhanced = ap.apply_spectral_enhancement(x, lang)
        path = out_dir / f"test_{i}_{lang}.wav"   # test_results/test_i_lang.wav parity
        write_wav(path, enhanced, 16_000)
        results.append({"variant": lang, "path": str(path),
                        "params": {"compression_ratio": params.compression_ratio}})
    print(json.dumps({"results": results}, ensure_ascii=False))
    return 0


def cmd_doctor(args) -> int:
    """Environment self-check (parity: Backend/verify_token.py token/model
    checks, Backend/check_files.py, Docker/setup_openvoice.py's six
    check_*/test_* functions — rebuilt as one offline diagnostic)."""
    checks = {}

    def check(name, fn):
        try:
            checks[name] = {"ok": True, "detail": fn()}
        except Exception as e:  # noqa: BLE001 — report, don't crash
            checks[name] = {"ok": False, "detail": f"{type(e).__name__}: {e}"}

    def _devices():
        import jax

        return [str(d) for d in jax.devices()]

    def _compile():
        import jax, jax.numpy as jnp

        return float(jax.jit(lambda x: (x * 2).sum())(jnp.ones(8)))

    def _pallas():
        from .ops.pallas_mel import whisper_log_mel_pallas
        import numpy as np

        # interpret mode: validates the kernel without waiting on a TPU
        # compile (jit_compile above already proves the device path)
        out = whisper_log_mel_pallas(np.zeros(16000, np.float32), interpret=True)
        return f"log-mel {tuple(out.shape)} (interpreted)"

    def _native():
        from .media import native

        if not native.available():
            raise RuntimeError("libest_media.so missing and auto-build failed")
        return "libav shim loaded"

    def _weights():
        from .models.loaders import load_state_dict

        if not args.weights:
            return "no --weights dir given (running in random-weight mode)"
        state = load_state_dict(args.weights)
        return f"{len(state)} tensors at {args.weights}"

    def _tts_triple():
        """Baked CosyVoice triple (tts_llm/tts_flow/tts_hift): the official
        synthesis chain is available iff all three converted (bake_models
        --tts on a dir holding llm.pt/flow.pt/hift.pt)."""
        from pathlib import Path

        root = args.weights or os.environ.get("EST_MODELS_DIR")
        if not root:
            return "no weights root (EST_MODELS_DIR unset)"
        present = [s for s in ("tts_llm", "tts_flow", "tts_hift")
                   if (Path(root) / s / "config.json").exists()]
        if len(present) == 3:
            from .models.loaders import load_official_tts

            params, cfg = load_official_tts(root)
            n = sum(1 for _ in __import__("jax").tree_util.tree_leaves(params))
            return f"official TTS triple loads ({n} tensors)"
        return f"baked: {present or 'none'} — official chain needs all three"

    def _secondary_models():
        """Baked secondary model families (bake_models --musetalk/--diff2lip/
        --openvoice/--ecapa/--seamless): which load real weights vs fall back
        to random (the reference loads all of these —
        api_inference_logic.py:42-73, openvoice_api.py:39-114,
        voice_similarity_analyser.py:26-33, translate_speech.py:79-154)."""
        from pathlib import Path

        root = args.weights or os.environ.get("EST_MODELS_DIR")
        if not root:
            return "no weights root (EST_MODELS_DIR unset)"
        subs = ("musetalk", "musetalk_whisper", "diff2lip", "openvoice",
                "ecapa", "seamless")
        present = [s for s in subs if (Path(root) / s / "config.json").exists()]
        missing = [s for s in subs if s not in present]
        return f"baked: {present or 'none'}; random-weight fallback: {missing or 'none'}"

    check("jax_devices", _devices)
    check("jit_compile", _compile)
    check("pallas_kernel", _pallas)
    check("native_media_shim", _native)
    check("weights", _weights)
    check("tts_triple", _tts_triple)
    check("secondary_models", _secondary_models)
    ok = all(c["ok"] for c in checks.values())
    print(json.dumps({"ok": ok, "checks": checks}, ensure_ascii=False, indent=2))
    return 0 if ok else 1


def cmd_embed(args) -> int:
    """ECAPA speaker embedding → .npy (Docker/create_embedding.py role: the
    reference extracts a campplus embedding for cloning prompts)."""
    import jax
    import numpy as np

    from .media.wavio import read_wav
    from .models import ecapa

    audio, sr = read_wav(args.input)
    audio = np.asarray(audio, np.float32).reshape(-1)
    if sr != 16_000:
        from .ops.host_dsp import resample_np

        audio = resample_np(audio, sr, 16_000)
    # weights plumbing mirrors `est translate`: --weights / EST_MODELS_DIR
    # with an `ecapa/` subtree; a random-weight embedding carries no speaker
    # identity, so the fallback is LOUD, never silent
    root = getattr(args, "weights", None) or os.environ.get("EST_MODELS_DIR")
    weightless = True
    cfg = ecapa.EcapaConfig()
    params = None
    if root:
        from .models.loaders import load_converted

        edir = Path(root) / "ecapa"
        if (edir / "config.json").exists():
            params, cfg = load_converted(edir, ecapa.EcapaConfig)
            weightless = False
    if params is None:
        print("WARNING: no ECAPA checkpoint (--weights/EST_MODELS_DIR with "
              "an ecapa/ subtree) — embedding uses RANDOM weights and "
              "carries no speaker identity", file=sys.stderr)
        params = ecapa.init_ecapa(jax.random.PRNGKey(4), cfg)
    emb = np.asarray(ecapa.embed_audio(params, cfg, audio[None]))[0]
    np.save(args.output, emb)
    print(json.dumps({"output": args.output, "dim": int(emb.shape[-1]),
                      "weightless": weightless}))
    return 0


def cmd_verify_quality(args) -> int:
    """BASELINE five-config quality-parity harness (evals/verify_quality.py):
    per-config BLEU delta + ECAPA speaker-similarity delta vs stored torch-
    reference outputs, gated at ≤0.5 BLEU / ≤0.01 spk-sim (BASELINE.md), or a
    labeled structure-only report when run weightless."""
    from .evals.verify_quality import run_verify_quality

    configs = tuple(int(c) for c in args.configs.split(",")) if args.configs \
        else (1, 2, 3, 4, 5)
    fixtures = {}
    if args.harvard:
        fixtures["harvard"] = args.harvard
    if args.short_audio:
        fixtures["short_audio"] = args.short_audio
    if args.video:
        fixtures["short_video"] = args.video
    report = run_verify_quality(
        out_dir=args.out,
        models_dir=args.weights or os.environ.get("EST_MODELS_DIR"),
        reference_dir=args.reference_outputs,
        configs=configs,
        engines_mode=args.engines,
        fixtures=fixtures or None,
        max_seconds=args.max_seconds,
    )
    if args.promote_reference:
        from .evals.verify_quality import promote_reference

        report["promoted"] = promote_reference(report, args.promote_reference)
    print(json.dumps(report, ensure_ascii=False, indent=2))
    return 0 if report["overall"] in ("pass", "structure-only") else 1


def cmd_bake(args) -> int:
    """Convert HF checkpoints to native orbax trees (deploy/Dockerfile.models)."""
    from .models.loaders import bake_models

    bake_models(args.out, asr=args.asr, nmt=args.nmt, tts=args.tts,
                musetalk=args.musetalk, musetalk_whisper=args.musetalk_whisper,
                diff2lip=args.diff2lip, openvoice=args.openvoice,
                ecapa=args.ecapa, seamless=args.seamless)
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="est", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("translate", help="cascaded S2ST (ASR→NMT→TTS)")
    p.add_argument("input"); p.add_argument("output")
    p.add_argument("--source-lang", default="eng")
    p.add_argument("--target-lang", required=True)
    p.add_argument("--engines", choices=("fake", "jax"), default="jax")
    p.set_defaults(fn=cmd_translate)

    p = sub.add_parser("s2st", help="direct S2ST (Seamless-style)")
    p.add_argument("input"); p.add_argument("output")
    p.add_argument("--source-lang", default="eng")
    p.add_argument("--target-lang", required=True)
    p.add_argument("--num-beams", type=int, default=5)
    p.add_argument("--weights", help="models root with a seamless/ subtree "
                   "(defaults to EST_MODELS_DIR)")
    p.set_defaults(fn=cmd_s2st)

    p = sub.add_parser("simple-tts", help="text → translate → TTS (no cloning)")
    p.add_argument("text"); p.add_argument("output")
    p.add_argument("--source-lang", default="eng")
    p.add_argument("--target-lang", required=True)
    p.add_argument("--engines", choices=("fake", "jax"), default="jax")
    p.set_defaults(fn=cmd_simple_tts)

    p = sub.add_parser("verify-watermark", help="check provenance payload")
    p.add_argument("input")
    p.set_defaults(fn=cmd_verify_watermark)

    p = sub.add_parser("ab-test", help="sweep language enhancement params")
    p.add_argument("input"); p.add_argument("output_dir")
    p.set_defaults(fn=cmd_ab_test)

    p = sub.add_parser("doctor", help="environment self-check")
    p.add_argument("--weights", help="model checkpoint dir to validate")
    p.set_defaults(fn=cmd_doctor)

    p = sub.add_parser(
        "embed", help="speaker embedding from audio (create_embedding.py role)")
    p.add_argument("input"); p.add_argument("output", help=".npy path")
    p.add_argument("--weights", help="models root with an ecapa/ subtree "
                   "(defaults to EST_MODELS_DIR)")
    p.set_defaults(fn=cmd_embed)

    p = sub.add_parser(
        "verify-quality",
        help="BASELINE five-config BLEU/spk-sim parity harness")
    p.add_argument("--out", required=True, help="report + outputs directory")
    p.add_argument("--weights", help="models root (defaults to EST_MODELS_DIR)")
    p.add_argument("--reference-outputs",
                   help="dir of stored torch-reference outputs "
                        "(configN.json [+ wav]; see docs/VERIFY_QUALITY.md)")
    p.add_argument("--configs", help="comma list, e.g. 1,2,5 (default all)")
    p.add_argument("--engines", choices=("fake", "jax"), default="jax")
    p.add_argument("--harvard", help="override the harvard.wav fixture")
    p.add_argument("--short-audio", help="override input_audio_short.wav")
    p.add_argument("--video", help="override input_video_short.mov")
    p.add_argument("--max-seconds", type=float,
                   help="cap each fixture's audio length")
    p.add_argument("--promote-reference", metavar="DIR",
                   help="after the run, promote its outputs into DIR as a "
                        "reference-outputs set (one-command A/B: run config "
                        "A with this, config B with --reference-outputs DIR)")
    p.set_defaults(fn=cmd_verify_quality)

    p = sub.add_parser(
        "bake", help="convert HF checkpoints to native trees (models/loaders)")
    p.add_argument("--asr"); p.add_argument("--nmt"); p.add_argument("--tts")
    p.add_argument("--musetalk"); p.add_argument("--musetalk-whisper")
    p.add_argument("--diff2lip"); p.add_argument("--openvoice")
    p.add_argument("--ecapa"); p.add_argument("--seamless")
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_bake)
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from .core.platform import pin_platform_from_env

    pin_platform_from_env()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
