"""diff2lip: diffusion-based lip-sync (the reference's legacy path, pre-MuseTalk).

Parity with Backend/diff2lip/generate.py (414 LoC) + guided_diffusion:
mel-window cropping aligned to video fps (:36-43 — 80 Hz mel, 16-step
windows), face-box smoothing over a 5-frame window (:92-149; the S3FD role is
filled by the clip-level skin×motion face detector in pipeline/face.py, with a
centre-crop fallback; a per-frame detector can still be plugged in), DDPM/DDIM
sampling (:159-199) over the guided-diffusion TFG UNet
(``models/gd_unet.py`` — the checkpoint-exact multi-resolution attention UNet,
unet.py:400-1070), masked-region conditioning per tfg_process_batch
(tfg_data_util.py:53-62: the bottom ``face_hide_percentage`` of the crop is
hidden and re-synthesised; the visible region is pasted back after sampling,
generate.py:272-273), and ``--sample_mode cross`` for cross-identity dubbing
(tests/test_diff2lip.py:31).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import musetalk as mtm
from ..models.common import Params
from ..models.diffusion import DiffusionConfig, GaussianDiffusion, space_timesteps
from ..models.gd_unet import GDUNetConfig, gd_unet_apply, init_gd_unet
from ..ops.mel import kaldi_fbank

log = logging.getLogger(__name__)


# ------------------------------------------------------------- mel windowing


def mel_windows_for_frames(
    audio_16k: np.ndarray, n_frames: int, fps: float,
    *, window_frames: int = 16, n_mels: int = 80,
) -> np.ndarray:
    """Per-video-frame mel crops (generate.py crop_audio_window parity:
    start = 80·t — 80 Hz mel, 16-step syncnet windows): for frame i, a
    [window_frames, n_mels] mel slice starting at its timestamp."""
    feats = np.asarray(kaldi_fbank(
        jnp.asarray(np.asarray(audio_16k, np.float32).reshape(-1)[None]),
        sr=16_000, frame_length_ms=25.0, frame_shift_ms=12.5, n_mels=n_mels,
    ))[0]  # [T_mel, n_mels] at 80 Hz
    t_mel = feats.shape[0]
    starts = (np.arange(n_frames) / fps * 80.0).astype(np.int64)
    starts = np.clip(starts, 0, max(t_mel - window_frames, 0))
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


# --------------------------------------------------------------------- config


@dataclasses.dataclass(frozen=True)
class Diff2LipConfig:
    """Published Diff2Lip e2e checkpoint geometry by default
    (generate.py defaults + script_util.py: image 128, 128 base channels,
    mult (1,1,2,3,4), attention at ds 8/16, 4 heads, scale-shift norm,
    use_ref + audio-as-style)."""

    image_size: int = 128
    model_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 1, 2, 3, 4)
    attention_ds: Tuple[int, ...] = (8, 16)
    heads: int = 4
    norm_groups: int = 32
    mel_window: int = 16
    n_mels: int = 80
    audio_model_channels: int = 32
    audio_channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    audio_init_spatial: int = 64
    face_hide_percentage: float = 0.5     # generate.py:372
    diffusion_steps: int = 1000
    sampling_steps: str = "ddim25"   # respaced sampling (timestep_respacing)
    schedule: str = "linear"

    @property
    def unet(self) -> GDUNetConfig:
        return GDUNetConfig(
            image_size=self.image_size, in_channels=9, out_channels=3,
            model_channels=self.model_channels, channel_mult=self.channel_mult,
            attention_ds=self.attention_ds, num_heads=self.heads,
            norm_groups=self.norm_groups,
            audio_dim=self.n_mels, audio_frames=self.mel_window,
            audio_model_channels=self.audio_model_channels,
            audio_channel_mult=self.audio_channel_mult,
            audio_init_spatial=self.audio_init_spatial,
        )


def init_diff2lip_unet(key, cfg: Diff2LipConfig) -> Params:
    return init_gd_unet(key, cfg.unet)


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
            from ..models.common import host_init

            # host CPU init + one device_put — eager per-tensor init over an
            # axon relay pays a round-trip per tensor on this SD-scale tree
            params = host_init(init_diff2lip_unet, 11, cfg)
        self.params = params
        self.detector = detector
        self.use_ddim = use_ddim
        self.diffusion = GaussianDiffusion(
            DiffusionConfig(steps=cfg.diffusion_steps, schedule=cfg.schedule),
            use_timesteps=space_timesteps(cfg.diffusion_steps, cfg.sampling_steps),
        )

        s = cfg.image_size
        mask = np.zeros((s, s, 1), np.float32)
        mask[int(s * (1.0 - cfg.face_hide_percentage)):] = 1.0   # hidden mouth region
        self._mask = jnp.asarray(mask)

        def model_fn(x_t, t, *, cond_img, ref_img, mel):
            return gd_unet_apply(self.params, self.cfg.unet, x_t, t,
                                 cond_img=cond_img, mask=self._mask,
                                 ref_img=ref_img, mel=mel)

        sampler = self.diffusion.ddim_sample_loop if use_ddim else self.diffusion.p_sample_loop

        def run(key, crops, ref, mel):
            noise = jax.random.normal(key, crops.shape, crops.dtype)
            # cond = visible region of the target + noise in the hidden region
            cond = crops * (1.0 - self._mask) + self._mask * noise
            key, sub = jax.random.split(key)
            sample = sampler(
                model_fn, (crops.shape[0], s, s, 3), sub,
                cond_img=cond, ref_img=ref, mel=mel,
            )
            # only the hidden region is generated (generate.py:272-273)
            return sample * self._mask + (1.0 - self._mask) * crops

        self._sample = jax.jit(run)

    @classmethod
    def from_models_dir(cls, root: Optional[str] = None, **kw) -> "Diff2LipPipeline":
        """Construct with baked TFG weights from ``{root|EST_MODELS_DIR}/
        diff2lip`` (written by ``est bake --diff2lip``) when present, else
        random weights — the runtime consumer of the bake step."""
        import os
        from pathlib import Path

        root = root or os.environ.get("EST_MODELS_DIR")
        if root:
            d = Path(root) / "diff2lip"
            if (d / "config.json").exists():
                from ..models.loaders import load_converted

                params, cfg = load_converted(d, Diff2LipConfig)
                log.info("Diff2LipPipeline: baked weights from %s", d)
                return cls(cfg, params, **kw)
        return cls(**kw)

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
            mel = jnp.asarray(mels[list(idx)], jnp.float32)
            key, k = jax.random.split(key)
            rendered = self._sample(k, crops_a, jnp.stack(id_crops), mel)
            for j, i in enumerate(idx):
                y0, x0, y1, x1 = boxes[i]
                frame = jnp.asarray(out[i], jnp.float32) / 127.5 - 1.0
                blended = mtm.blend_face(frame, rendered[j], (y0, x0, y1, x1))
                out[i] = np.asarray(jnp.clip((blended + 1.0) * 127.5, 0, 255), np.uint8)
        return out
