"""diff2lip: diffusion-based lip-sync (the reference's legacy path, pre-MuseTalk).

Parity with Backend/diff2lip/generate.py (414 LoC) + guided_diffusion:
mel-window cropping aligned to video fps (:36-43), face-box smoothing over a
5-frame window (:92-149; the S3FD role is filled by the clip-level skin×motion
face detector in pipeline/face.py, with a centre-crop fallback; a per-frame
detector can still be plugged in), DDPM/DDIM sampling over a timestep-conditioned UNet
(:159-199), and ``--sample_mode cross`` for cross-identity dubbing
(tests/test_diff2lip.py:31).

The UNet reuses the MuseTalk conv/attn blocks with added timestep conditioning
(guided_diffusion-style temb → per-channel scale/shift).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import musetalk as mtm
from ..models.common import Params, dense, init_dense, init_mlp, mlp
from ..models.diffusion import DiffusionConfig, GaussianDiffusion, space_timesteps, timestep_embedding
from ..ops.mel import kaldi_fbank

log = logging.getLogger(__name__)


# ------------------------------------------------------------- mel windowing


def mel_windows_for_frames(
    audio_16k: np.ndarray, n_frames: int, fps: float,
    *, window_frames: int = 16, n_mels: int = 80,
) -> np.ndarray:
    """Per-video-frame mel crops (generate.py:36-43 crop_audio_window parity):
    for frame i, a [window_frames, n_mels] mel slice centred at its timestamp."""
    feats = np.asarray(kaldi_fbank(
        jnp.asarray(np.asarray(audio_16k, np.float32).reshape(-1)[None]),
        sr=16_000, frame_length_ms=25.0, frame_shift_ms=10.0, n_mels=n_mels,
    ))[0]  # [T_mel, n_mels] at 100 Hz
    t_mel = feats.shape[0]
    centers = (np.arange(n_frames) / fps * 100.0).astype(np.int64)
    starts = np.clip(centers - window_frames // 2, 0, max(t_mel - window_frames, 0))
    idx = np.clip(starts[:, None] + np.arange(window_frames)[None, :], 0, t_mel - 1)
    return feats[idx]  # [n_frames, window_frames, n_mels]


# ------------------------------------------------------------ face detection


def smooth_boxes(boxes: List[Tuple[int, int, int, int]], window: int = 5) -> List[Tuple[int, int, int, int]]:
    """diff2lip get_smoothened_boxes (generate.py:92-95, T=5): FORWARD
    window with in-place feedback — boxes[i] is overwritten before later
    (tail) windows read it, exactly like the reference loop. The MuseTalk
    service's CENTERED smoother lives in pipeline/face.py (smooth_bbox
    parity); the two reference smoothers have different semantics."""
    arr = np.asarray(boxes, np.float32)
    n = len(arr)
    for i in range(n):
        win = arr[n - window:] if i + window > n else arr[i: i + window]
        arr[i] = win.mean(axis=0)
    return [tuple(int(round(v)) for v in row) for row in arr]


def center_face_detector(frame: np.ndarray) -> Tuple[int, int, int, int]:
    """Centred-square fallback (middle 60% of the frame) for when the real
    clip-level detector (pipeline/face.py) finds no face."""
    h, w = frame.shape[:2]
    size = int(min(h, w) * 0.6)
    y0 = (h - size) // 2
    x0 = (w - size) // 2
    return (y0, x0, y0 + size, x0 + size)


# ---------------------------------------------------------------------- UNet


@dataclasses.dataclass(frozen=True)
class Diff2LipConfig:
    image_size: int = 128
    channels: Tuple[int, ...] = (32, 64, 128)
    heads: int = 4
    mel_window: int = 16
    n_mels: int = 80
    temb_dim: int = 128
    diffusion_steps: int = 1000
    sampling_steps: str = "ddim25"   # respaced sampling (generate.py timestep_respacing)
    schedule: str = "linear"


def init_diff2lip_unet(key, cfg: Diff2LipConfig) -> Params:
    ks = iter(jax.random.split(key, 96))
    chans = cfg.channels
    p: Dict[str, Any] = {
        # input: noisy target (3) ⊕ masked target (3) ⊕ identity reference (3)
        "conv_in": mtm._init_conv2d(next(ks), 3, 9, chans[0]),
        "temb": init_mlp(next(ks), cfg.temb_dim, cfg.temb_dim),
        "mel_proj": init_dense(next(ks), cfg.mel_window * cfg.n_mels, cfg.temb_dim),
        "downs": [], "ups": [],
    }
    for i, ch in enumerate(chans):
        prev = chans[max(i - 1, 0)]
        p["downs"].append({
            "res": mtm._init_resblock(next(ks), prev if i else chans[0], ch),
            "temb_proj": init_dense(next(ks), cfg.temb_dim, 2 * ch),
            "down": mtm._init_conv2d(next(ks), 3, ch, ch) if i < len(chans) - 1 else None,
        })
    p["mid"] = mtm._init_resblock(next(ks), chans[-1], chans[-1])
    p["mid_temb"] = init_dense(next(ks), cfg.temb_dim, 2 * chans[-1])
    for i, ch in enumerate(reversed(chans)):
        nxt = list(reversed(chans))[min(i + 1, len(chans) - 1)]
        p["ups"].append({
            "res": mtm._init_resblock(next(ks), 2 * ch, nxt),
            "temb_proj": init_dense(next(ks), cfg.temb_dim, 2 * nxt),
        })
    p["gn_out"] = mtm._init_gn(chans[0])
    p["conv_out"] = mtm._init_conv2d(next(ks), 3, chans[0], 3)
    return p


def _film(x, temb_proj, temb):
    """Per-channel scale/shift from the timestep embedding (guided-diffusion
    style FiLM conditioning)."""
    scale, shift = jnp.split(dense(temb_proj, temb)[:, None, None, :], 2, axis=-1)
    return x * (1 + scale) + shift


def unet_apply(params: Params, cfg: Diff2LipConfig, x_t, t, *, cond_frames, mel) -> jnp.ndarray:
    """x_t [B,H,W,3]; cond_frames [B,H,W,6] (masked ⊕ identity);
    mel [B, mel_window, n_mels] → eps prediction [B,H,W,3]."""
    b = x_t.shape[0]
    temb = mlp(params["temb"], timestep_embedding(t, cfg.temb_dim))
    temb = temb + dense(params["mel_proj"], mel.reshape(b, -1))

    x = mtm._conv2d(params["conv_in"], jnp.concatenate([x_t, cond_frames], axis=-1))
    skips = []
    for down in params["downs"]:
        x = _film(mtm._resblock(down["res"], x), down["temb_proj"], temb)
        skips.append(x)
        if down["down"] is not None:
            x = mtm._conv2d(down["down"], x, stride=2)
    x = _film(mtm._resblock(params["mid"], x), params["mid_temb"], temb)
    for up in params["ups"]:
        skip = skips.pop()
        if x.shape[1] != skip.shape[1]:
            x = mtm._upsample2x(x)
        x = _film(mtm._resblock(up["res"], jnp.concatenate([x, skip], axis=-1)),
                  up["temb_proj"], temb)
    return mtm._conv2d(params["conv_out"], jax.nn.silu(mtm._group_norm(params["gn_out"], x)))


# ------------------------------------------------------------------ pipeline


class Diff2LipPipeline:
    def __init__(
        self,
        cfg: Diff2LipConfig = Diff2LipConfig(),
        params: Optional[Params] = None,
        *,
        detector: Optional[Callable[[np.ndarray], Tuple[int, int, int, int]]] = None,
        use_ddim: bool = True,
    ):
        """``detector``: optional per-frame face detector. When None (the
        default) the clip-level detector (pipeline/face.py — skin×motion face
        localization, the reference's S3FD role, diff2lip/face_detection/)
        finds one stable box for the shot, falling back to a centre crop when
        no face is found."""
        self.cfg = cfg
        if params is None:
            log.warning("Diff2LipPipeline: random weights (no checkpoint supplied)")
            params = init_diff2lip_unet(jax.random.PRNGKey(11), cfg)
        self.params = params
        self.detector = detector
        self.use_ddim = use_ddim
        self.diffusion = GaussianDiffusion(
            DiffusionConfig(steps=cfg.diffusion_steps, schedule=cfg.schedule),
            use_timesteps=space_timesteps(cfg.diffusion_steps, cfg.sampling_steps),
        )

        def model_fn(x_t, t, *, cond_frames, mel):
            return unet_apply(self.params, self.cfg, x_t, t, cond_frames=cond_frames, mel=mel)

        sampler = self.diffusion.ddim_sample_loop if use_ddim else self.diffusion.p_sample_loop
        self._sample = jax.jit(
            lambda key, cond, mel: sampler(
                model_fn, (cond.shape[0], cfg.image_size, cfg.image_size, 3), key,
                cond_frames=cond, mel=mel,
            )
        )

    def generate(
        self,
        frames: np.ndarray,            # [N, H, W, 3] uint8
        audio_16k: np.ndarray,
        fps: float,
        *,
        identity_frames: Optional[np.ndarray] = None,   # cross-identity source
        key=None,
        batch_size: int = 8,
    ) -> np.ndarray:
        """Re-render mouth regions with the diffusion model; returns uint8
        frames. ``identity_frames`` enables ``--sample_mode cross``
        (cross-identity dubbing) — defaults to self-identity ('reconstruction')."""
        key = key if key is not None else jax.random.PRNGKey(0)
        n, h, w, _ = frames.shape
        s = self.cfg.image_size
        identity = identity_frames if identity_frames is not None else frames

        if self.detector is not None:
            boxes = smooth_boxes([self.detector(f) for f in frames])
        else:
            from .face import frames_face_detector

            boxes = [frames_face_detector(frames)] * n  # stable per-shot box
        mels = mel_windows_for_frames(audio_16k, n, fps, window_frames=self.cfg.mel_window,
                                      n_mels=self.cfg.n_mels)

        out = frames.copy()
        for start in range(0, n, batch_size):
            idx = range(start, min(start + batch_size, n))
            crops, id_crops = [], []
            for i in idx:
                y0, x0, y1, x1 = boxes[i]
                crop = jax.image.resize(
                    jnp.asarray(frames[i, y0:y1, x0:x1], jnp.float32) / 127.5 - 1.0,
                    (s, s, 3), "linear")
                icrop = jax.image.resize(
                    jnp.asarray(identity[i, y0:y1, x0:x1], jnp.float32) / 127.5 - 1.0,
                    (s, s, 3), "linear")
                crops.append(crop)
                id_crops.append(icrop)
            crops_a = jnp.stack(crops)
            masked = crops_a.at[:, s // 2:, :, :].set(0.0)   # mask the jaw
            cond = jnp.concatenate([masked, jnp.stack(id_crops)], axis=-1)
            mel = jnp.asarray(mels[list(idx)], jnp.float32)
            key, k = jax.random.split(key)
            rendered = self._sample(k, cond, mel)
            for j, i in enumerate(idx):
                y0, x0, y1, x1 = boxes[i]
                frame = jnp.asarray(out[i], jnp.float32) / 127.5 - 1.0
                blended = mtm.blend_face(frame, rendered[j], (y0, x0, y1, x1))
                out[i] = np.asarray(jnp.clip((blended + 1.0) * 127.5, 0, 255), np.uint8)
        return out
