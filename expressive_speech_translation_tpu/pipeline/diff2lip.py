"""diff2lip: diffusion-based lip-sync (the reference's legacy path, pre-MuseTalk).

Parity with Backend/diff2lip/generate.py (414 LoC) + guided_diffusion:
wav2lip-family mel conditioning (audio/audio.py melspectrogram — the feature
family the published checkpoints were trained on), mel-window cropping
aligned to video fps (:36-43 — 80 Hz mel, 16-step windows), face-box
smoothing over a 5-frame window (:92-149; the S3FD role is filled by
pipeline/face.py's PER-FRAME boxes — learned detector when mounted, windowed
tracking + flow refinement otherwise, centre-crop fallback), DDPM/DDIM
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

from ..models.common import Params
from ..models.diffusion import DiffusionConfig, GaussianDiffusion, space_timesteps
from ..models.gd_unet import GDUNetConfig, gd_unet_apply, init_gd_unet

log = logging.getLogger(__name__)


# ------------------------------------------------------------- mel windowing


def wav2lip_mel(audio_16k: np.ndarray, *, n_mels: int = 80) -> np.ndarray:
    """The EXACT mel family the published diff2lip/wav2lip checkpoints were
    trained on (audio/audio.py:45-51 melspectrogram + hparams.py:23-63):
    preemphasis 0.97 → |STFT| (n_fft 800, hop 200 → 80 Hz, 50 ms hann,
    centered) → slaney mel 55-7600 Hz → 20·log10(max(1e-5, ·)) − 20 →
    symmetric normalisation to [−4, 4]. A generic fbank (povey frames, HTK
    mel from 20 Hz, unnormalised natural log) is off-distribution for the
    converted audio encoder — the UNet then mis-tracks the audio despite
    weight-exact conversion. Returns [T_mel, n_mels] float32 at 80 Hz."""
    from ..ops.mel import mel_filterbank
    from ..ops.stft import stft

    x = np.asarray(audio_16k, np.float32).reshape(-1)
    if len(x) < 2:
        x = np.zeros(2, np.float32)
    pre = np.concatenate([x[:1], x[1:] - 0.97 * x[:-1]])  # lfilter([1,-k],[1])
    real, imag = stft(jnp.asarray(pre), 800, 200, center=True)
    mag = np.asarray(jnp.sqrt(real**2 + imag**2))          # [T, 401]
    fb = mel_filterbank(16_000, 800, n_mels, fmin=55.0, fmax=7600.0,
                        htk=False, norm="slaney")           # [401, n_mels]
    mel = mag @ fb
    s_db = 20.0 * np.log10(np.maximum(1e-5, mel)) - 20.0   # ref_level_db
    # symmetric_mels normalisation: [-4, 4] against min_level_db = -100
    return np.clip(8.0 * ((s_db + 100.0) / 100.0) - 4.0, -4.0, 4.0).astype(np.float32)


def mel_windows_for_frames(
    audio_16k: np.ndarray, n_frames: int, fps: float,
    *, window_frames: int = 16, n_mels: int = 80,
) -> np.ndarray:
    """Per-video-frame mel crops (generate.py crop_audio_window parity:
    start = 80·t — 80 Hz mel, 16-step syncnet windows): for frame i, a
    [window_frames, n_mels] mel slice starting at its timestamp."""
    feats = wav2lip_mel(audio_16k, n_mels=n_mels)  # [T_mel, n_mels] at 80 Hz
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
        """``detector``: optional per-frame face detector returning
        Optional[(y0, x0, y1, x1)] — misses inherit the previous detection
        (the reference's coord_placeholder reuse). When None (the default)
        ``face.per_frame_face_boxes`` supplies per-frame boxes (learned
        detector when mounted; else windowed tracking + flow refinement —
        the reference's S3FD role, diff2lip/face_detection/), with a centre
        crop when no face is found anywhere."""
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
            # split FIRST: consuming `key` in normal() and then splitting the
            # same key draws the conditioning noise and the sampler's init
            # noise from correlated streams (documented-unsafe key reuse)
            k_cond, k_sample = jax.random.split(key)
            noise = jax.random.normal(k_cond, crops.shape, crops.dtype)
            # cond = visible region of the target + noise in the hidden region
            cond = crops * (1.0 - self._mask) + self._mask * noise
            sample = sampler(
                model_fn, (crops.shape[0], s, s, 3), k_sample,
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
        from ..core.errors import MediaError
        from .musetalk_pipeline import blend_face_np, clamp_box

        key = key if key is not None else jax.random.PRNGKey(0)
        if len(frames) == 0:
            raise MediaError("no video frames to lip-sync",
                             user_message="The video contains no frames")
        n, h, w, _ = frames.shape
        s = self.cfg.image_size

        def _boxes_for(seq: np.ndarray) -> List[Tuple[int, int, int, int]]:
            hh, ww = seq.shape[1:3]
            if self.detector is not None:
                raw, last = [], None
                for f in seq:
                    b = self.detector(f)
                    if b is not None:       # Optional contract: misses carry
                        last = b            # the previous detection forward
                    raw.append(last)
                if last is None:
                    raw = [center_face_detector(seq[0])] * len(seq)
                else:
                    first = next(b for b in raw if b is not None)
                    raw = [b if b is not None else first for b in raw]
                raw = smooth_boxes(raw)
            else:
                from .face import per_frame_face_boxes

                # per-frame tracking (learned detector when mounted, else
                # windowed tracking + flow refinement): one clip-level box
                # paints the jaw onto background once the head moves
                raw = per_frame_face_boxes(seq, fps)
            return [clamp_box(b, hh, ww) for b in raw]

        boxes = _boxes_for(frames)
        if identity_frames is not None:
            # cross-identity: the identity clip has its OWN face geometry and
            # may be shorter than the target — detect on it and wrap its index
            identity = identity_frames
            id_boxes = _boxes_for(identity)
        else:
            identity, id_boxes = frames, boxes
        n_id = len(identity)
        mels = mel_windows_for_frames(audio_16k, n, fps, window_frames=self.cfg.mel_window,
                                      n_mels=self.cfg.n_mels)

        out = frames.copy()
        for start in range(0, n, batch_size):
            idx = list(range(start, min(start + batch_size, n)))
            crops, id_crops = [], []
            for i in idx:
                y0, x0, y1, x1 = boxes[i]
                crop = jax.image.resize(
                    jnp.asarray(frames[i, y0:y1, x0:x1], jnp.float32) / 127.5 - 1.0,
                    (s, s, 3), "linear")
                j = i % n_id
                iy0, ix0, iy1, ix1 = id_boxes[j]
                icrop = jax.image.resize(
                    jnp.asarray(identity[j, iy0:iy1, ix0:ix1], jnp.float32) / 127.5 - 1.0,
                    (s, s, 3), "linear")
                crops.append(crop)
                id_crops.append(icrop)
            # pad the tail to the full batch width (shape-specialized jit: a
            # remainder shape would recompile the whole DDIM loop) and slice
            pad = batch_size - len(idx)
            if pad and n > batch_size:
                crops.extend([crops[-1]] * pad)
                id_crops.extend([id_crops[-1]] * pad)
            crops_a = jnp.stack(crops)
            mel = np.asarray(mels[idx], np.float32)
            if pad and n > batch_size:
                mel = np.concatenate([mel, np.repeat(mel[-1:], pad, axis=0)])
            key, k = jax.random.split(key)
            rendered = np.asarray(
                self._sample(k, crops_a, jnp.stack(id_crops),
                             jnp.asarray(mel)).astype(jnp.float32))
            for j, i in enumerate(idx):
                out[i] = blend_face_np(out[i], rendered[j], boxes[i])
        return out
