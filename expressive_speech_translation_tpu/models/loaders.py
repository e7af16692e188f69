"""Local checkpoint loading: torch/safetensors state dicts → our param trees.

The reference repo ships no weights (stripped — .MISSING_LARGE_BLOBS); its
Dockerfiles download them at image build (Dockerfile.cosyvoice:37-52) and its
code has multi-fallback pickled-checkpoint loaders (diff2lip/guided_diffusion/
dist_util.py:52-111, Backend/diff2lip_loader.py:12-40). Equivalent here:

- :func:`load_state_dict` — safetensors (preferred) or torch .bin/.pt from a
  local directory or file, with sharded-index support; never needs network.
- per-model helpers that compose load + convert (models/*.from_hf_state_dict)
  and fail with actionable messages when files are absent.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional

log = logging.getLogger(__name__)


class WeightsNotFoundError(FileNotFoundError):
    pass


def _load_safetensors(path: Path) -> Dict[str, Any]:
    import torch
    from safetensors.torch import load_file

    return load_file(str(path))


def _load_torch(path: Path) -> Dict[str, Any]:
    """Robust pickled-checkpoint load (diff2lip_loader.py parity: try strict,
    fall back to weights_only=False for legacy pickles)."""
    import torch

    try:
        state = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception:  # noqa: BLE001 — legacy pickle fallback
        log.warning("weights_only load failed for %s; retrying legacy pickle", path)
        state = torch.load(str(path), map_location="cpu", weights_only=False)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return state


def load_state_dict(path: str | Path) -> Dict[str, Any]:
    """Load a state dict from a file or an HF-style model directory."""
    p = Path(path)
    if p.is_file():
        return _load_safetensors(p) if p.suffix == ".safetensors" else _load_torch(p)
    if not p.is_dir():
        raise WeightsNotFoundError(
            f"{p} does not exist — place the model checkpoint there "
            "(no network downloads in this environment)"
        )
    index = p / "model.safetensors.index.json"
    if index.exists():
        shards = sorted({v for v in json.loads(index.read_text())["weight_map"].values()})
        state: Dict[str, Any] = {}
        for shard in shards:
            state.update(_load_safetensors(p / shard))
        return state
    for candidate in ("model.safetensors", "pytorch_model.bin", "model.pt", "llm.pt",
                      "diffusion_pytorch_model.safetensors",
                      "diffusion_pytorch_model.bin", "unet.pth"):
        if (p / candidate).exists():
            return load_state_dict(p / candidate)
    raise WeightsNotFoundError(
        f"no checkpoint found under {p} (looked for model.safetensors[.index.json], "
        "pytorch_model.bin, model.pt, llm.pt, diffusion_pytorch_model.*, unet.pth)"
    )


def load_whisper(path: str | Path, cfg=None):
    """Local HF Whisper dir → (params, cfg). Reads config.json for dims."""
    from . import whisper as wj

    p = Path(path)
    if cfg is None and (p / "config.json").exists():
        hf = json.loads((p / "config.json").read_text())
        if hf["vocab_size"] == 51_864:
            # English-only (.en) checkpoints use a different special-token
            # layout (sot 50257, eot 50256, no language block) that the
            # multilingual prompt builder does not speak — refuse loudly
            # instead of decoding garbage through clamped token gathers
            # (tiny test configs with small vocabs stay loadable: their
            # special ids come from config.json below)
            raise WeightsNotFoundError(
                f"whisper checkpoint at {p} has the English-only (.en) "
                "vocab layout (51864): unsupported — use a multilingual "
                "checkpoint")
        # large-v3 (vocab 51866) adds one language token (<|yue|>), shifting
        # every special id AFTER the language block by +1 — translate becomes
        # 50359 (the v2 transcribe slot!), so keeping the v2 defaults would
        # silently translate instead of transcribe and read the no-speech
        # gate at <|startofprev|>. Shift the whole post-language-block layout.
        v3 = hf["vocab_size"] == 51_866
        shift = 1 if v3 else 0
        cfg = wj.WhisperConfig(
            n_mels=hf.get("num_mel_bins", 80),
            d_model=hf["d_model"],
            encoder_layers=hf["encoder_layers"],
            decoder_layers=hf["decoder_layers"],
            heads=hf["encoder_attention_heads"],
            ffn_dim=hf["encoder_ffn_dim"],
            vocab_size=hf["vocab_size"],
            max_source_positions=hf.get("max_source_positions", 1500),
            max_target_positions=hf.get("max_target_positions", 448),
            # special ids from the checkpoint when present (future-proof
            # against layout changes; defaults are the multilingual layout)
            bos_token=hf.get("decoder_start_token_id", 50258),
            eos_token=hf.get("eos_token_id", 50257),
            n_langs=100 if v3 else 99,
            task_translate=50_358 + shift,
            task_transcribe=50_359 + shift,
            sop_token=50_361 + shift,
            no_speech_token=50_362 + shift,
            no_timestamps=50_363 + shift,
        )
    cfg = cfg or wj.WhisperConfig.medium()
    return wj.from_hf_state_dict(load_state_dict(p), cfg), cfg


def load_nllb(path: str | Path, cfg=None):
    from . import nllb as nj

    p = Path(path)
    if cfg is None and (p / "config.json").exists():
        hf = json.loads((p / "config.json").read_text())
        cfg = nj.NLLBConfig(
            d_model=hf["d_model"],
            encoder_layers=hf["encoder_layers"],
            decoder_layers=hf["decoder_layers"],
            heads=hf["encoder_attention_heads"],
            ffn_dim=hf["encoder_ffn_dim"],
            vocab_size=hf["vocab_size"],
            max_positions=hf.get("max_position_embeddings", 1024),
        )
    cfg = cfg or nj.NLLBConfig.distilled_600m()
    return nj.from_hf_state_dict(load_state_dict(p), cfg), cfg


def save_converted(params, cfg, out_dir: str | Path) -> None:
    """Persist a converted param tree + its config as a native checkpoint
    (orbax tree + config.json) — the model-baking step the reference performs
    by downloading into images (Dockerfile.cosyvoice:37-52)."""
    import dataclasses

    import orbax.checkpoint as ocp

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save((out / "params").resolve(), params, force=True)
    (out / "config.json").write_text(json.dumps(dataclasses.asdict(cfg), indent=2))


def _cfg_from_dict(cfg_cls, raw: Dict[str, Any]):
    """Rebuild a (possibly nested) frozen-dataclass config from asdict()
    output; lists deserialize back to the tuples the dataclasses declare."""
    import dataclasses
    import typing

    try:  # resolve PEP-563 string annotations to real classes
        hints = typing.get_type_hints(cfg_cls)
    except Exception:  # noqa: BLE001
        hints = {}
    kwargs = {}
    for f in dataclasses.fields(cfg_cls):
        if f.name not in raw:
            continue
        v = raw[f.name]
        ftype = hints.get(f.name, f.type)
        if dataclasses.is_dataclass(ftype) and isinstance(v, dict):
            v = _cfg_from_dict(ftype, v)
        elif isinstance(v, list):
            v = tuple(tuple(e) if isinstance(e, list) else e for e in v)
        kwargs[f.name] = v
    return cfg_cls(**kwargs)


def load_converted(out_dir: str | Path, cfg_cls):
    """Load a tree saved by :func:`save_converted` → (params, cfg)."""
    import orbax.checkpoint as ocp

    out = Path(out_dir)
    if not (out / "config.json").exists():
        raise WeightsNotFoundError(f"no converted checkpoint at {out}")
    raw = json.loads((out / "config.json").read_text())
    cfg = _cfg_from_dict(cfg_cls, raw)
    params = ocp.PyTreeCheckpointer().restore((out / "params").resolve())
    return params, cfg


def bake_models(out_root: str | Path, *, asr: Optional[str] = None,
                nmt: Optional[str] = None, tts: Optional[str] = None,
                musetalk: Optional[str] = None,
                musetalk_whisper: Optional[str] = None,
                diff2lip: Optional[str] = None,
                openvoice: Optional[str] = None,
                ecapa: Optional[str] = None,
                seamless: Optional[str] = None,
                tts_llm_cfg=None, tts_flow_cfg=None, tts_hift_cfg=None) -> None:
    """Convert HF checkpoints into native trees under ``out_root``
    ({out}/asr, {out}/nmt, {out}/tts*, {out}/musetalk[, _whisper],
    {out}/diff2lip) — the Dockerfile.models build step."""
    out = Path(out_root)
    if musetalk:
        params, cfg = load_musetalk(musetalk)
        save_converted(params, cfg, out / "musetalk")
        log.info("baked MuseTalk %s -> %s", musetalk, out / "musetalk")
    if musetalk_whisper:
        # the conditioning encoder (whisper-tiny for the published UNet) —
        # separate from the ASR bake, whose scale is Whisper-medium
        params, cfg = load_whisper(musetalk_whisper)
        save_converted(params, cfg, out / "musetalk_whisper")
        log.info("baked MuseTalk whisper %s -> %s", musetalk_whisper,
                 out / "musetalk_whisper")
    if diff2lip:
        params, cfg = load_diff2lip(diff2lip)
        save_converted(params, cfg, out / "diff2lip")
        log.info("baked diff2lip %s -> %s", diff2lip, out / "diff2lip")
    if openvoice:
        params, cfg = load_openvoice(openvoice)
        save_converted(params, cfg, out / "openvoice")
        log.info("baked OpenVoice %s -> %s", openvoice, out / "openvoice")
    if ecapa:
        params, cfg = load_ecapa(ecapa)
        save_converted(params, cfg, out / "ecapa")
        log.info("baked ECAPA %s -> %s", ecapa, out / "ecapa")
    if seamless:
        params, cfg = load_seamless(seamless)
        save_converted(params, cfg, out / "seamless")
        aux = load_seamless_aux(seamless)
        if aux:
            (out / "seamless" / "generation_maps.json").write_text(
                json.dumps(aux, ensure_ascii=False))
        tok = Path(seamless)
        tok = (tok if tok.is_dir() else tok.parent) / "tokenizer.json"
        if tok.exists():  # SeamlessBackend.from_models_dir picks this up
            import shutil

            shutil.copyfile(tok, out / "seamless" / "tokenizer.json")
        log.info("baked Seamless %s -> %s (aux maps: %s)", seamless,
                 out / "seamless", sorted(aux) or "none")
    if asr:
        params, cfg = load_whisper(asr)
        save_converted(params, cfg, out / "asr")
        log.info("baked ASR %s -> %s", asr, out / "asr")
    if nmt:
        params, cfg = load_nllb(nmt)
        save_converted(params, cfg, out / "nmt")
        log.info("baked NMT %s -> %s", nmt, out / "nmt")
    if tts:
        # CosyVoice ships as three torch trees (llm.pt / flow.pt / hift.pt —
        # the deployment layout Dockerfile.cosyvoice:37-52 bakes). All three
        # convert natively: llm via cosyvoice.from_cosyvoice_llm_state_dict,
        # flow via flow_matcha.from_flow_state_dict, hift via
        # hift.from_hift_state_dict.
        p = Path(tts)
        baked = []
        if p.is_file() or (p / "llm.pt").exists() or (p / "model.pt").exists():
            params, cfg = load_cosyvoice_llm(tts, cfg=tts_llm_cfg)
            save_converted(params, cfg, out / "tts_llm")
            baked.append("llm")
        if p.is_dir() and (p / "flow.pt").exists():
            params, cfg = load_cosyvoice_flow(p / "flow.pt", cfg=tts_flow_cfg)
            save_converted(params, cfg, out / "tts_flow")
            baked.append("flow")
        if p.is_dir() and (p / "hift.pt").exists():
            params, cfg = load_cosyvoice_hift(p / "hift.pt", cfg=tts_hift_cfg)
            save_converted(params, cfg, out / "tts_hift")
            baked.append("hift")
        if not baked:
            raise WeightsNotFoundError(
                f"no CosyVoice checkpoints under {p} (looked for llm.pt/"
                "model.pt, flow.pt, hift.pt)")
        log.info("baked TTS submodels %s from %s -> %s", baked, tts, out)


def load_cosyvoice_llm(path: str | Path, cfg=None):
    """Official CosyVoice2 ``llm.pt`` (or a dir containing it) → (SpeechLM
    params, SpeechLMConfig). Dims are inferred from the tensors; non-0.5B
    backbones need an explicit cfg (head counts are not recoverable from
    shapes alone)."""
    from . import cosyvoice as cv, qwen2 as q2

    p = Path(path)
    if p.is_dir():
        for candidate in ("llm.pt", "model.pt"):
            if (p / candidate).exists():
                p = p / candidate
                break
    state = load_state_dict(p)
    if cfg is None:
        hidden = state["llm_decoder.weight"].shape[1]
        speech_rows = state["speech_embedding.weight"].shape[0]
        n_layers = 1 + max(
            int(k.split(".")[4]) for k in state
            if k.startswith("llm.model.model.layers."))
        base = q2.Qwen2Config.qwen2_05b()
        if hidden != base.hidden or n_layers != base.layers:
            raise ValueError(
                f"checkpoint dims (hidden {hidden}, layers {n_layers}) are not "
                "Qwen2-0.5B — pass an explicit SpeechLMConfig")
        text_vocab = None
        for key in ("llm.model.model.embed_tokens.weight",):
            if key in state:
                text_vocab = state[key].shape[0]
        cfg = cv.SpeechLMConfig(backbone=base,
                                text_vocab=text_vocab or 151_936,
                                speech_token_size=speech_rows - 3)
    return cv.from_cosyvoice_llm_state_dict(state, cfg), cfg


def load_cosyvoice_flow(path: str | Path, cfg=None):
    """Official CosyVoice2 ``flow.pt`` (CausalMaskedDiffWithXvec) →
    (params, OfficialFlowConfig). Embedding/width dims are inferred from the
    tensors; head counts follow the official cosyvoice2.yaml (8 heads, not
    recoverable from shapes alone)."""
    import dataclasses

    from . import flow_matcha as fm

    state = load_state_dict(path)
    if cfg is None:
        vocab, input_size = state["input_embedding.weight"].shape
        n_mels, spk_dim = state["spk_embed_affine_layer.weight"].shape
        n_blocks = 1 + max(int(k.split(".")[2]) for k in state
                           if k.startswith("encoder.encoders."))
        n_up = 1 + max(int(k.split(".")[2]) for k in state
                       if k.startswith("encoder.up_encoders."))
        # keys: decoder.estimator.mid_blocks.{i}.{0|1.{j}}.… — the block
        # index is segment 3 and the transformer-block index segment 5
        n_mid = 1 + max(int(k.split(".")[3]) for k in state
                        if k.startswith("decoder.estimator.mid_blocks."))
        n_tb = 1 + max(int(k.split(".")[5]) for k in state
                       if k.startswith("decoder.estimator.mid_blocks.0.1."))
        base = fm.OfficialFlowConfig()
        cfg = dataclasses.replace(
            base,
            vocab_size=int(vocab), input_size=int(input_size),
            output_size=int(n_mels), spk_embed_dim=int(spk_dim),
            encoder=dataclasses.replace(
                base.encoder, size=int(input_size), blocks=int(n_blocks),
                up_blocks=int(n_up),
                # pos_bias_u is stored [heads, head_dim] — exact head count
                heads=int(state["encoder.encoders.0.self_attn.pos_bias_u"].shape[0]),
                linear_units=int(state["encoder.encoders.0.feed_forward.w_1.weight"].shape[0])),
            estimator=dataclasses.replace(
                base.estimator,
                in_channels=int(state["decoder.estimator.time_mlp.linear_1.weight"].shape[1]),
                out_channels=int(n_mels),
                channels=int(state["decoder.estimator.final_proj.weight"].shape[1]),
                num_mid_blocks=int(n_mid), n_blocks=int(n_tb)),
        )
    return fm.from_flow_state_dict(state, cfg), cfg


def load_cosyvoice_hift(path: str | Path, cfg=None):
    """Official CosyVoice2 ``hift.pt`` (HiFTGenerator) → (params, HiFTConfig)."""
    from . import hift as hm

    state = load_state_dict(path)
    cfg = cfg or hm.HiFTConfig()
    return hm.from_hift_state_dict(state, cfg), cfg


def load_official_tts(models_root: str | Path):
    """Baked tts_llm/tts_flow/tts_hift dirs → ({"lm","flow","hift"} params,
    OfficialTtsConfig). Raises WeightsNotFoundError unless all three exist —
    the official synthesis chain needs the full triple."""
    from . import cosyvoice as cv, cosyvoice_official as co, flow_matcha as fm
    from . import hift as hm

    root = Path(models_root)
    lm_params, lm_cfg = load_converted(root / "tts_llm", cv.SpeechLMConfig)
    flow_params, flow_cfg = load_converted(root / "tts_flow", fm.OfficialFlowConfig)
    hift_params, hift_cfg = load_converted(root / "tts_hift", hm.HiFTConfig)
    cfg = co.OfficialTtsConfig(lm=lm_cfg, flow=flow_cfg, hift=hift_cfg)
    return {"lm": lm_params, "flow": flow_params, "hift": hift_params}, cfg


def load_musetalk(path: str | Path, cfg=None):
    """MuseTalk release layout → ({"vae","unet"} params, MuseTalkConfig).

    Accepts the layout the reference container assembles
    (Docker/api_inference_logic.py:42-73 via utils.load_all_model —
    models/sd-vae-ft-mse/ diffusers AutoencoderKL + models/musetalk/
    {musetalk.json, pytorch_model.bin}); also a flat dir with vae/ + unet
    weights. Config dims are read from the two JSONs when present."""
    from . import musetalk as mtm

    root = Path(path)
    vae_dir = next((d for d in (root / "sd-vae-ft-mse", root / "vae", root)
                    if (d / "config.json").exists()
                    and any((d / f).exists() for f in (
                        "diffusion_pytorch_model.safetensors",
                        "diffusion_pytorch_model.bin", "model.safetensors",
                        "pytorch_model.bin"))), None)
    unet_file = next((f for f in (root / "musetalk" / "pytorch_model.bin",
                                  root / "musetalk" / "unet.pth",
                                  root / "unet.pth",
                                  root / "pytorch_model.bin") if f.exists()), None)
    if vae_dir is None or unet_file is None:
        raise WeightsNotFoundError(
            f"MuseTalk checkpoints not found under {root} — expected "
            "sd-vae-ft-mse/ (diffusers AutoencoderKL) and musetalk/"
            "pytorch_model.bin (+ musetalk.json)")

    if cfg is None:
        vae_hf = json.loads((vae_dir / "config.json").read_text())
        kwargs: Dict[str, Any] = dict(
            vae_channels=tuple(vae_hf.get("block_out_channels", (128, 256, 512, 512))),
            vae_layers=vae_hf.get("layers_per_block", 2),
            latent_channels=vae_hf.get("latent_channels", 4),
            image_size=256,
            norm_groups=vae_hf.get("norm_num_groups", 32),
        )
        unet_json = next((f for f in (unet_file.parent / "musetalk.json",
                                      root / "musetalk.json") if f.exists()), None)
        if unet_json is not None:
            u = json.loads(unet_json.read_text())
            kwargs.update(
                unet_channels=tuple(u.get("block_out_channels", (320, 640, 1280, 1280))),
                unet_layers=u.get("layers_per_block", 2),
                audio_dim=u.get("cross_attention_dim", 384),
                heads=u.get("attention_head_dim", 8),
            )
        cfg = mtm.MuseTalkConfig(**kwargs)
    params = mtm.from_hf_state_dict(
        load_state_dict(vae_dir), load_state_dict(unet_file), cfg)
    return params, cfg


def load_diff2lip(path: str | Path, cfg=None):
    """diff2lip TFG checkpoint (the pickled e2e model the reference loads via
    Backend/diff2lip_loader.py:12-40 multi-fallback) → (params,
    Diff2LipConfig). Accepts a file or a dir containing one."""
    from . import gd_unet
    from ..pipeline.diff2lip import Diff2LipConfig

    p = Path(path)
    if p.is_dir():
        for candidate in ("checkpoint.pt", "model.pt", "e2e.pt", "data.pkl"):
            if (p / candidate).exists():
                p = p / candidate
                break
    cfg = cfg or Diff2LipConfig()
    state = load_state_dict(p)
    return gd_unet.from_tfg_state_dict(state, cfg.unet), cfg


def load_openvoice(path: str | Path, cfg=None):
    """OpenVoice v2 converter dir (checkpoints_v2/converter: config.json +
    checkpoint.pth — openvoice_api.py:39-69 validates gin_channels=256 from
    exactly this config) → (params, OpenVoiceConfig)."""
    from . import openvoice as ov

    p = Path(path)
    ckpt = p if p.is_file() else next(
        (f for f in (p / "checkpoint.pth", p / "converter.pth", p / "model.pth")
         if f.exists()), None)
    if ckpt is None:
        raise WeightsNotFoundError(
            f"no OpenVoice converter checkpoint under {p} "
            "(looked for checkpoint.pth/converter.pth/model.pth)")
    cfg_file = (p if p.is_dir() else p.parent) / "config.json"
    if cfg is None and cfg_file.exists():
        spec = json.loads(cfg_file.read_text())
        m, d = spec.get("model", {}), spec.get("data", {})
        cfg = ov.OpenVoiceConfig(
            sample_rate=d.get("sampling_rate", 22_050),
            n_fft=d.get("filter_length", 1024),
            hop=d.get("hop_length", 256),
            n_spec=d.get("filter_length", 1024) // 2 + 1,
            inter_channels=m.get("inter_channels", 192),
            hidden=m.get("hidden_channels", 192),
            se_dim=m.get("gin_channels", 256),
            zero_g=m.get("zero_g", True),
            resblock_kernels=tuple(m.get("resblock_kernel_sizes", (3, 7, 11))),
            resblock_dilations=tuple(tuple(x) for x in m.get(
                "resblock_dilation_sizes", ((1, 3, 5),) * 3)),
            upsample_rates=tuple(m.get("upsample_rates", (8, 8, 2, 2))),
            upsample_kernels=tuple(m.get("upsample_kernel_sizes", (16, 16, 4, 4))),
            upsample_initial=m.get("upsample_initial_channel", 512),
        )
    cfg = cfg or ov.OpenVoiceConfig()
    return ov.from_openvoice_state_dict(load_state_dict(ckpt), cfg), cfg


def load_ecapa(path: str | Path, cfg=None):
    """SpeechBrain spkrec-ecapa-voxceleb embedding_model.ckpt (or a dir
    containing it — voice_similarity_analyser.py:26-33's source) →
    (params, EcapaConfig)."""
    from . import ecapa as ec

    p = Path(path)
    if p.is_dir():
        for candidate in ("embedding_model.ckpt", "embedding_model.pt",
                          "model.ckpt"):
            if (p / candidate).exists():
                p = p / candidate
                break
    state = load_state_dict(p)
    cfg = cfg or ec.EcapaConfig()
    return ec.from_speechbrain_state_dict(state, cfg), cfg


def load_seamless(path: str | Path, cfg=None):
    """Local HF ``facebook/seamless-m4t-v2-large`` dir (or a ForSpeechToSpeech
    checkpoint file) → (params, SeamlessConfig). The behavioral spec is
    /root/reference/Backend/translate_speech.py:79-154; parity in
    tests/test_seamless_convert.py."""
    from . import seamless as sm

    p = Path(path)
    if cfg is None and p.is_dir() and (p / "config.json").exists():
        hf = json.loads((p / "config.json").read_text())
        cfg = sm.SeamlessConfig(
            hidden=hf["hidden_size"],
            vocab_size=hf["vocab_size"],
            speech_layers=hf["speech_encoder_layers"],
            speech_heads=hf["speech_encoder_attention_heads"],
            speech_ffn=hf["speech_encoder_intermediate_size"],
            depthwise_kernel=hf.get("conv_depthwise_kernel_size", 31),
            left_max_pos=hf.get("left_max_position_embeddings", 64),
            right_max_pos=hf.get("right_max_position_embeddings", 8),
            chunk_size=hf.get("speech_encoder_chunk_size"),
            left_chunk_num=hf.get("speech_encoder_left_chunk_num", 128),
            adaptor_kernel=hf.get("adaptor_kernel_size", 8),
            adaptor_stride=hf.get("adaptor_stride", 8),
            adapter_layers=hf.get("num_adapter_layers", 1),
            decoder_layers=hf["decoder_layers"],
            decoder_heads=hf["decoder_attention_heads"],
            decoder_ffn=hf["decoder_ffn_dim"],
            max_positions=hf.get("max_position_embeddings", 4096),
            pad_token=hf.get("pad_token_id", 0),
            bos_token=hf.get("bos_token_id", 2),
            eos_token=hf.get("eos_token_id", 3),
            decoder_start_token=hf.get("decoder_start_token_id", 3),
            t2u_vocab=hf["t2u_vocab_size"],
            t2u_encoder_layers=hf["t2u_encoder_layers"],
            t2u_decoder_layers=hf["t2u_decoder_layers"],
            t2u_ffn=hf["t2u_decoder_ffn_dim"],
            t2u_heads=hf["t2u_decoder_attention_heads"],
            char_vocab=hf["char_vocab_size"],
            t2u_pad=hf.get("t2u_pad_token_id", 1),
            t2u_eos=hf.get("t2u_eos_token_id", 2),
            var_embed_dim=hf.get("t2u_variance_predictor_embed_dim", 1024),
            var_hidden_dim=hf.get("t2u_variance_predictor_hidden_dim", 256),
            var_kernel=hf.get("t2u_variance_predictor_kernel_size", 3),
            unit_vocab_vocoder=hf["unit_hifi_gan_vocab_size"],
            unit_embed_dim=hf.get("unit_embed_dim", 1280),
            lang_embed_dim=hf.get("lang_embed_dim", 256),
            spkr_embed_dim=hf.get("spkr_embed_dim", 256),
            num_langs=hf.get("vocoder_num_langs", 36),
            num_spkrs=hf.get("vocoder_num_spkrs", 200),
            vocoder_offset=hf.get("vocoder_offset", 4),
            upsample_rates=tuple(hf.get("upsample_rates", (5, 4, 4, 2, 2))),
            upsample_kernels=tuple(hf.get("upsample_kernel_sizes", (11, 8, 8, 4, 4))),
            upsample_initial_channel=hf.get("upsample_initial_channel", 512),
            resblock_kernels=tuple(hf.get("resblock_kernel_sizes", (3, 7, 11))),
            resblock_dilations=tuple(tuple(d) for d in hf.get(
                "resblock_dilation_sizes", ((1, 3, 5),) * 3)),
            leaky_slope=hf.get("leaky_relu_slope", 0.1),
            sample_rate_out=hf.get("sampling_rate", 16_000),
        )
    cfg = cfg or sm.SeamlessConfig.v2_large()
    return sm.from_hf_state_dict(load_state_dict(p), cfg), cfg


def load_seamless_aux(path: str | Path) -> Dict[str, Any]:
    """Generation-config sidecar maps the S2ST glue needs: target-language
    token maps and the subword/char maps for t2u alignment
    (ForSpeechToSpeech.generate reads the same keys). Empty dict when the
    file is absent — callers fall back to byte maps."""
    p = Path(path)
    f = (p if p.is_dir() else p.parent) / "generation_config.json"
    if not f.exists():
        return {}
    raw = json.loads(f.read_text())
    return {k: raw[k] for k in (
        "text_decoder_lang_to_code_id", "t2u_lang_code_to_id",
        "vocoder_lang_code_to_id", "id_to_text", "char_to_id") if k in raw}


def load_qwen2_backbone(path: str | Path, cfg=None):
    from . import qwen2 as q2

    p = Path(path)
    if cfg is None and (p / "config.json").exists():
        hf = json.loads((p / "config.json").read_text())
        cfg = q2.Qwen2Config(
            hidden=hf["hidden_size"],
            layers=hf["num_hidden_layers"],
            heads=hf["num_attention_heads"],
            kv_heads=hf["num_key_value_heads"],
            ffn_dim=hf["intermediate_size"],
            rope_theta=hf.get("rope_theta", 1_000_000.0),
            max_positions=hf.get("max_position_embeddings", 4096),
        )
    cfg = cfg or q2.Qwen2Config.qwen2_05b()
    return q2.from_hf_state_dict(load_state_dict(p), cfg), cfg


def main(argv=None) -> int:
    """Model-baking CLI (deploy/Dockerfile.models):
    python -m ...models.loaders --asr DIR --nmt DIR --tts DIR --out /models"""
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--asr", help="HF Whisper checkpoint dir")
    ap.add_argument("--nmt", help="HF NLLB checkpoint dir")
    ap.add_argument("--tts", help="CosyVoice checkpoint dir")
    ap.add_argument("--musetalk", help="MuseTalk release dir (sd-vae-ft-mse/ + musetalk/)")
    ap.add_argument("--musetalk-whisper", help="HF whisper-tiny dir (MuseTalk conditioner)")
    ap.add_argument("--diff2lip", help="diff2lip TFG checkpoint (file or dir)")
    ap.add_argument("--openvoice", help="OpenVoice v2 converter dir")
    ap.add_argument("--ecapa", help="speechbrain ECAPA checkpoint (file or dir)")
    ap.add_argument("--seamless", help="HF seamless-m4t-v2-large dir")
    ap.add_argument("--out", required=True, help="output root for native trees")
    args = ap.parse_args(argv)
    bake_models(args.out, asr=args.asr, nmt=args.nmt, tts=args.tts,
                musetalk=args.musetalk, musetalk_whisper=args.musetalk_whisper,
                diff2lip=args.diff2lip, openvoice=args.openvoice,
                ecapa=args.ecapa, seamless=args.seamless)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
