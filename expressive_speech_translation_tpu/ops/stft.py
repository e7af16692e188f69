"""STFT / iSTFT as MXU-friendly framed matmuls.

Design notes (TPU-first, not a torch port):

- Framing is a gather into ``[frames, n_fft]`` — static shapes derived from the
  (padded) signal length, so XLA compiles one program per bucket.
- The DFT is computed as two real matmuls against cos/sin bases
  (``[frames, n_fft] @ [n_fft, n_bins]``) instead of an FFT: for speech-sized
  ``n_fft`` (400–2048) this maps straight onto the 128×128 MXU, fuses with the
  window multiply, and avoids XLA:TPU's less-optimised complex FFT path. The
  matmul form is also what the fused Pallas log-mel kernel uses (ops/pallas_mel.py).
- Everything accepts/returns real arrays; complex numbers appear only as a
  trailing (re, im) pair or separate arrays, which keeps bf16-ability and Pallas
  compatibility.

Behavioural parity targets: torch.stft(center=True, pad_mode='reflect') for the
denoise path (audio_processor.py:333) and whisper's log-mel frontend.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .windows import hann


@functools.lru_cache(maxsize=32)
def _dft_bases(n_fft: int, dtype_name: str = "float32") -> Tuple[np.ndarray, np.ndarray]:
    """Real-input DFT bases: cos/sin matrices of shape [n_fft, n_bins]."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = -2.0 * np.pi * n * k / n_fft
    dtype = np.dtype(dtype_name)
    return np.cos(angle).astype(dtype), np.sin(angle).astype(dtype)


def num_frames(n_samples: int, n_fft: int, hop: int, *, center: bool = True) -> int:
    if center:
        return 1 + n_samples // hop
    return 1 + max(0, (n_samples - n_fft)) // hop


def frame_signal(
    x: jnp.ndarray, n_fft: int, hop: int, *, center: bool = True
) -> jnp.ndarray:
    """[..., T] → [..., frames, n_fft] with reflect padding when centered."""
    if center:
        pad = n_fft // 2
        pad_cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_cfg, mode="reflect")
        frames = 1 + (x.shape[-1] - n_fft) // hop
    else:
        frames = 1 + (x.shape[-1] - n_fft) // hop
    idx = (np.arange(frames)[:, None] * hop + np.arange(n_fft)[None, :])
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    *,
    window: Optional[np.ndarray] = None,
    center: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real STFT → (real, imag), each [..., frames, n_bins].

    Equivalent to torch.stft(..., return_complex=True) with a hann window and
    reflect center padding (the reference denoiser's configuration).
    """
    if window is None:
        window = hann(n_fft)
    framed = frame_signal(x, n_fft, hop, center=center) * jnp.asarray(window)
    cos_b, sin_b = _dft_bases(n_fft)
    real = framed @ jnp.asarray(cos_b)
    imag = framed @ jnp.asarray(sin_b)
    return real, imag


def spectrogram(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    *,
    window: Optional[np.ndarray] = None,
    center: bool = True,
    power: float = 2.0,
) -> jnp.ndarray:
    """Magnitude (power=1) or power (power=2) spectrogram, [..., frames, n_bins]."""
    real, imag = stft(x, n_fft, hop, window=window, center=center)
    mag2 = real * real + imag * imag
    if power == 2.0:
        return mag2
    if power == 1.0:
        return jnp.sqrt(jnp.maximum(mag2, 1e-20))
    return jnp.power(jnp.maximum(mag2, 1e-20), power / 2.0)


def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    n_fft: int,
    hop: int,
    *,
    window: Optional[np.ndarray] = None,
    center: bool = True,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT with windowed overlap-add and COLA normalisation.

    Inputs are [..., frames, n_bins]; output is [..., T].
    """
    if window is None:
        window = hann(n_fft)
    win = jnp.asarray(window)
    cos_b, sin_b = _dft_bases(n_fft)
    n_bins = n_fft // 2 + 1

    # Inverse real DFT as a matmul: irfft(X)[n] = (1/N) Σ_k w_k (Re cos + Im sin)
    # with w_k = 2 for interior bins, 1 for DC/Nyquist.
    weights = np.full((n_bins,), 2.0, dtype=np.float32)
    weights[0] = 1.0
    if n_fft % 2 == 0:
        weights[-1] = 1.0
    inv_cos = (cos_b * weights[None, :]).T / n_fft  # [n_bins, n_fft]
    inv_sin = (sin_b * weights[None, :]).T / n_fft

    frames_time = real @ jnp.asarray(inv_cos) + imag @ jnp.asarray(inv_sin)
    frames_time = frames_time * win  # synthesis window

    n_frames = frames_time.shape[-2]
    out_len = n_fft + hop * (n_frames - 1)
    batch_shape = frames_time.shape[:-2]

    if n_fft % hop == 0:
        # Fast overlap-add: with n_fft = k·hop, frame f's j-th hop-chunk lands at
        # offset (f + j)·hop — so OLA is k shifted, contiguous adds (no scatter,
        # which XLA:TPU serialises).
        k = n_fft // hop
        chunks = frames_time.reshape(*batch_shape, n_frames, k, hop)
        out = jnp.zeros((*batch_shape, out_len), frames_time.dtype)
        for j in range(k):
            seg = chunks[..., :, j, :].reshape(*batch_shape, n_frames * hop)
            out = jax.lax.dynamic_update_slice_in_dim(
                out,
                jax.lax.dynamic_slice_in_dim(out, j * hop, n_frames * hop, -1) + seg,
                j * hop,
                -1,
            )
    else:
        # General overlap-add via scatter-add (slow on TPU; avoided by all
        # built-in configs, which use hop | n_fft).
        positions = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]).reshape(-1)
        flat = frames_time.reshape(*batch_shape, -1)
        out = jnp.zeros((*batch_shape, out_len), flat.dtype)
        out = out.at[..., positions].add(flat)

    # COLA envelope (window² overlap) for normalisation.
    env = np.zeros(out_len, dtype=np.float32)
    w2 = np.asarray(window, dtype=np.float32) ** 2
    for i in range(n_frames):
        env[i * hop: i * hop + n_fft] += w2
    env = np.maximum(env, 1e-11)
    out = out / jnp.asarray(env)

    if center:
        pad = n_fft // 2
        out = out[..., pad: out_len - pad]
    if length is not None:
        out = out[..., :length]
        deficit = length - out.shape[-1]
        if deficit > 0:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, deficit)])
    return out
