"""Full-frame MuseTalk lip-sync: detection → crop → re-render → blend.

The reference's MuseTalk container drives DWPose face bboxes + FaceParsing
over the input video, VAE/UNet re-renders 256×256 crops in batches of 8, and
blends jaw-mode back into the frames (Docker/api_inference_logic.py:42-73,
89-97, 104-170). This module is the host-side orchestration around
``models/musetalk.py`` device compute, with the DWPose role filled by the
clip-level face detector in ``pipeline/face.py`` — so lip-sync runs on
arbitrary video without a caller-supplied bbox.

``musetalk_lipsync_fn`` adapts the pipeline to ``media.native.NativeVideoIO``'s
``lipsync_fn(frames, fps, audio, sr) → frames`` seam, which is what the
MuseTalk service and the video route consume.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.errors import MediaError
from ..models import musetalk as mtm
from .face import per_frame_face_boxes

log = logging.getLogger(__name__)


# ------------------------------------------------------------ host compositing
#
# Blending runs per frame over potentially thousands of frames; doing it as
# per-frame jitted device calls (upload frame → blend → download) made the
# composite dominate wall-clock after the batched UNet work. The same
# models/musetalk.blend_face math runs here in numpy with the alpha mask
# cached per box geometry.

_ALPHA_CACHE: dict = {}


def _blend_alpha(h: int, w: int, feather: int = 16, jaw_only: bool = True) -> np.ndarray:
    key = (h, w, feather, jaw_only)
    alpha = _ALPHA_CACHE.get(key)
    if alpha is None:
        yy = np.arange(h)[:, None].astype(np.float32)
        xx = np.arange(w)[None, :].astype(np.float32)
        edge = np.minimum(np.minimum(yy + 1, h - yy),
                          np.minimum(xx + 1, w - xx)) / max(feather, 1)
        alpha = np.clip(edge, 0.0, 1.0)
        if jaw_only:
            jaw = np.clip((yy - h * 0.45) / (h * 0.1), 0.0, 1.0)
            alpha = alpha * jaw
        alpha = alpha[..., None]
        if len(_ALPHA_CACHE) > 256:   # per-frame boxes vary slightly
            _ALPHA_CACHE.clear()
        _ALPHA_CACHE[key] = alpha
    return alpha


def _resize_bilinear_np(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """[S, S, C] float → [h, w, C] bilinear (host-side jax.image.resize
    'linear' equivalent for the composite path)."""
    s0, s1 = img.shape[:2]
    ys = (np.arange(h) + 0.5) * s0 / h - 0.5
    xs = (np.arange(w) + 0.5) * s1 / w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, s0 - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, s1 - 1)
    y1 = np.clip(y0 + 1, 0, s0 - 1)
    x1 = np.clip(x0 + 1, 0, s1 - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def blend_face_np(frame_u8: np.ndarray, face: np.ndarray, bbox) -> np.ndarray:
    """Composite a re-rendered [-1,1] crop into a uint8 frame at ``bbox``
    (models/musetalk.blend_face jaw-mode math, host-side)."""
    y0, x0, y1, x1 = bbox
    h, w = y1 - y0, x1 - x0
    alpha = _blend_alpha(h, w)
    face_resized = _resize_bilinear_np(np.asarray(face, np.float32), h, w)
    out = frame_u8.copy()
    region = out[y0:y1, x0:x1].astype(np.float32) / 127.5 - 1.0
    blended = region * (1 - alpha) + face_resized * alpha
    out[y0:y1, x0:x1] = np.clip((blended + 1.0) * 127.5, 0, 255).astype(np.uint8)
    return out


def clamp_box(box, h: int, w: int, *, min_size: int = 8):
    """Clamp a (possibly smoothed/flow-refined or learned-detector) box to
    the frame with a minimum size — negative or out-of-frame coordinates
    would wrap numpy slices into empty/wrong-region crops."""
    y0, x0, y1, x1 = (int(round(v)) for v in box)
    y0 = max(0, min(y0, h - min_size))
    x0 = max(0, min(x0, w - min_size))
    y1 = max(y0 + min_size, min(y1, h))
    x1 = max(x0 + min_size, min(x1, w))
    return (y0, x0, y1, x1)


def _mel_audio_features(audio_16k: np.ndarray, audio_dim: int) -> jnp.ndarray:
    """Fallback audio-feature extractor when NO whisper encoder is available:
    log-mel frames tiled to ``audio_dim`` at 50 features/s. The reference
    (and this pipeline's default when weights/an encoder are present —
    :func:`whisper_feature_fn`) feeds whisper encoder states at 50 Hz
    (api_inference_logic.py:99-102)."""
    from ..ops.mel import mel_filterbank
    from ..ops.stft import spectrogram

    power = spectrogram(jnp.asarray(np.asarray(audio_16k, np.float32)),
                        400, 320, center=True, power=2.0)  # 16k/320 = 50 Hz
    fb = jnp.asarray(mel_filterbank(16_000, 400, 80))
    feats = jnp.log10(jnp.maximum(power @ fb, 1e-10))  # [T, 80]
    reps = -(-audio_dim // feats.shape[-1])
    return jnp.tile(feats, (1, reps))[:, :audio_dim]


def whisper_feature_fn(params, cfg, *, dtype=jnp.bfloat16) -> Callable[[np.ndarray], jnp.ndarray]:
    """50 Hz Whisper ENCODER states as the UNet audio condition — the
    reference's semantics (api_inference_logic.py:63-72, :99-102: a resident
    WhisperModel encodes the dub audio; windows of encoder features per video
    frame). ``params``/``cfg`` are a models/whisper tree (whisper-tiny for the
    published MuseTalk UNet: cross_attention_dim 384 == tiny d_model).

    Audio is encoded in whisper's native 30 s windows and the feature stream
    truncated to ceil(duration·50) — one encoder state per 20 ms, exactly the
    rate whisper_chunks_for_video assumes."""
    from ..models import whisper as wj
    from ..models.common import cast_floats
    from ..ops import whisper_log_mel

    params = cast_floats(params, dtype)
    encode = jax.jit(lambda mel: wj.encode(params, cfg, mel))

    def fn(audio_16k: np.ndarray) -> jnp.ndarray:
        audio = np.asarray(audio_16k, np.float32).reshape(-1)
        n_feat = max(int(np.ceil(len(audio) / 16_000.0 * 50.0)), 1)
        chunk = 30 * 16_000
        outs = []
        for start in range(0, max(len(audio), 1), chunk):
            seg = audio[start:start + chunk]
            mel = whisper_log_mel(jnp.asarray(seg)[None],
                                  chunk_samples=chunk).astype(dtype)
            outs.append(encode(mel)[0])          # [1500, d_model]
        feats = jnp.concatenate(outs, axis=0)
        return feats[:n_feat]

    return fn


class MuseTalkPipeline:
    def __init__(
        self,
        params=None,
        cfg: mtm.MuseTalkConfig = None,
        *,
        audio_feature_fn: Optional[Callable[[np.ndarray], jnp.ndarray]] = None,
        whisper=None,          # (whisper_params, WhisperConfig) — the default condition
        batch_size: int = 8,   # api_inference_logic.py:130
        dtype=jnp.bfloat16,
    ):
        self.cfg = cfg or mtm.MuseTalkConfig()
        if params is None:
            log.warning("MuseTalkPipeline: random weights (no checkpoint supplied)")
            from ..models.common import host_init

            # host CPU init + one device_put: eager per-tensor init of the
            # SD-scale VAE+UNet pays a relay round-trip per tensor otherwise
            params = host_init(mtm.init_musetalk, 7, self.cfg)
        from ..models.common import cast_floats

        self.params = cast_floats(params, dtype)
        self.dtype = dtype
        if audio_feature_fn is None and whisper is not None:
            w_params, w_cfg = whisper
            if w_cfg.d_model != self.cfg.audio_dim:
                log.warning(
                    "MuseTalkPipeline: whisper d_model %d != UNet audio_dim %d "
                    "— falling back to tiled log-mel features (the published "
                    "MuseTalk UNet conditions on whisper-TINY states)",
                    w_cfg.d_model, self.cfg.audio_dim)
            else:
                audio_feature_fn = whisper_feature_fn(w_params, w_cfg, dtype=dtype)
        self.audio_feature_fn = audio_feature_fn or (
            lambda a: _mel_audio_features(a, self.cfg.audio_dim))
        self.batch_size = batch_size

    def render(
        self,
        frames: np.ndarray,       # [N, H, W, 3] uint8
        fps: float,
        audio_16k: np.ndarray,
    ) -> np.ndarray:
        """Lip-sync full frames to the audio; returns uint8 frames."""
        n = frames.shape[0]
        if n == 0:
            raise MediaError("no video frames to lip-sync",
                             user_message="The video contains no frames")
        s = self.cfg.image_size
        h, w = frames.shape[1:3]
        # PER-FRAME boxes (face.per_frame_face_boxes: learned detector when
        # mounted, else windowed tracking + flow refinement): a single
        # clip-level box paints the synthesized jaw onto background the
        # moment the speaker moves or the shot cuts
        boxes = [clamp_box(b, h, w) for b in per_frame_face_boxes(frames, fps)]

        crops = jnp.stack([
            jax.image.resize(
                jnp.asarray(frames[i, b[0]:b[2], b[1]:b[3]], jnp.float32) / 127.5 - 1.0,
                (s, s, 3), "linear")
            for i, b in enumerate(boxes)
        ]).astype(self.dtype)

        feats = self.audio_feature_fn(np.asarray(audio_16k, np.float32))
        windows = mtm.whisper_chunks_for_video(
            feats, n_frames=n, fps=fps, ctx=self.cfg.audio_ctx).astype(self.dtype)

        rendered = np.asarray(mtm.lipsync_frames(
            self.params, self.cfg, crops, windows,
            batch_size=self.batch_size).astype(jnp.float32))

        out = frames.copy()
        for i, b in enumerate(boxes):
            out[i] = blend_face_np(out[i], rendered[i], b)
        return out


def musetalk_lipsync_fn(
    params=None, cfg: mtm.MuseTalkConfig = None, **kwargs,
) -> Callable[[np.ndarray, float, np.ndarray, int], np.ndarray]:
    """Adapter for ``NativeVideoIO(lipsync_fn=...)`` — resamples the dub audio
    to 16 kHz and renders."""
    pipe = MuseTalkPipeline(params, cfg, **kwargs)

    def fn(frames: np.ndarray, fps: float, audio: np.ndarray, sr: int) -> np.ndarray:
        wave = np.asarray(audio, np.float32).reshape(-1)
        if sr != 16_000:
            from .. import ops

            wave = np.asarray(ops.resample(jnp.asarray(wave), sr, 16_000))
        return pipe.render(np.asarray(frames), fps, wave)

    return fn


def default_lipsync_fn() -> Callable[[np.ndarray, float, np.ndarray, int], np.ndarray]:
    """Lip-sync fn with baked-weight discovery: MuseTalk VAE/UNet/PE from
    ``EST_MODELS_DIR/musetalk`` and a width-matched whisper encoder from
    ``musetalk_whisper``/``asr`` for the 50 Hz audio condition
    (api_inference_logic.py:42-73, :99-102). Random weights + tiled log-mel
    otherwise — same discovery the MuseTalk container entrypoint uses."""
    import os
    from pathlib import Path

    params = mt_cfg = whisper = None
    root = os.environ.get("EST_MODELS_DIR")
    if root:
        from ..models import whisper as wjm
        from ..models.loaders import load_converted

        if (Path(root) / "musetalk" / "config.json").exists():
            params, mt_cfg = load_converted(Path(root) / "musetalk",
                                            mtm.MuseTalkConfig)
        audio_dim = (mt_cfg or mtm.MuseTalkConfig()).audio_dim
        for sub in ("musetalk_whisper", "asr"):
            if (Path(root) / sub / "config.json").exists():
                w_params, w_cfg = load_converted(Path(root) / sub,
                                                 wjm.WhisperConfig)
                if w_cfg.d_model == audio_dim:
                    whisper = (w_params, w_cfg)
                    break
    return musetalk_lipsync_fn(params, mt_cfg, whisper=whisper)
