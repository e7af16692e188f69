"""Fused Pallas log-mel frontend kernel.

Computes Whisper's log-mel spectrogram — frame, window, DFT, power, mel
projection, log10 — in one fused kernel, so the framed [3000, 400] matrix never
round-trips through HBM. This is the hot audio-frontend op the reference runs
through librosa/torch STFT on GPU (SURVEY.md §2.5 "prime Pallas-kernel
candidates").

Framing trick: with n_fft = 400 = 2.5 × hop(160), frame *i* is exactly the
concatenation of hop-chunks c_i, c_{i+1} and the first half of c_{i+2}. Rather
than gathering frames (dynamic) or concatenating offset slices (Mosaic can't
lower offset-row concat), the kernel receives THREE row-shifted views of the
chunk array through ordinary BlockSpec pipelining and computes

    frames @ W  ==  a @ W[0:160] + b @ W[160:320] + c @ W[320:480]

where the window-folded DFT bases W are zero-padded from 400 to 480 rows so the
unused second half of chunk c falls on zero weights. Three MXU matmuls per
basis, one more for the mel projection, log10 on the VPU — all in VMEM, with
Pallas double-buffering the tile streams automatically.

The global dynamic-range floor (max − 8 dB) needs the whole spectrogram, so it
stays outside the kernel (XLA fuses it with the transpose).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mel import WHISPER_HOP, WHISPER_N_FFT, WHISPER_SAMPLES, WHISPER_SR, mel_filterbank
from .stft import _dft_bases
from .windows import hann

FRAMES_PER_TILE = 200          # 3000 frames = 15 tiles
_CHUNK = WHISPER_HOP           # 160
_N_BINS = WHISPER_N_FFT // 2 + 1  # 201


@functools.lru_cache(maxsize=4)
def _constants(n_mels: int):
    window = hann(WHISPER_N_FFT).astype(np.float32)
    cos_b, sin_b = _dft_bases(WHISPER_N_FFT)
    wcos = (window[:, None] * cos_b).astype(np.float32)   # [400, 201]
    wsin = (window[:, None] * sin_b).astype(np.float32)
    # Zero-pad 400 → 480 rows: chunk c contributes rows 320:480, of which
    # 400:480 must be inert.
    pad = ((0, 3 * _CHUNK - WHISPER_N_FFT), (0, 0))
    wcos = np.pad(wcos, pad)
    wsin = np.pad(wsin, pad)
    fb = mel_filterbank(WHISPER_SR, WHISPER_N_FFT, n_mels)  # [201, n_mels]
    return wcos, wsin, fb


def _kernel(a_ref, b_ref, c_ref, wcos_ref, wsin_ref, fb_ref, out_ref):
    # HIGHEST precision: power spectra span ~8 decades and feed a log10, so
    # bf16-pass matmul error is audible in the normalized features.
    hp = jax.lax.Precision.HIGHEST

    def split_dot(m_ref):
        return (
            jnp.dot(a_ref[:], m_ref[0:160, :], preferred_element_type=jnp.float32, precision=hp)
            + jnp.dot(b_ref[:], m_ref[160:320, :], preferred_element_type=jnp.float32, precision=hp)
            + jnp.dot(c_ref[:], m_ref[320:480, :], preferred_element_type=jnp.float32, precision=hp)
        )

    real = split_dot(wcos_ref)
    imag = split_dot(wsin_ref)
    power = real * real + imag * imag
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32, precision=hp)
    out_ref[:] = jnp.log10(jnp.maximum(mel, 1e-10))


def whisper_log_mel_pallas(
    audio: jnp.ndarray, *, n_mels: int = 80, interpret: bool | None = None,
    chunk_samples: int = WHISPER_SAMPLES,
) -> jnp.ndarray:
    """Drop-in fused equivalent of :func:`ops.mel.whisper_log_mel` for a single
    [T] waveform. Returns [n_mels, chunk_samples/160] ([n_mels, 3000] at the
    default 30 s window).

    ``chunk_samples``: context window in samples — bucketed serving restricts
    whisper's 30 s window to the utterance's length bucket (10/20/30 s), which
    cuts encoder compute and per-decode-step cross-K/V reads proportionally.
    Must keep the frame count a multiple of the kernel tile (2 s granularity).
    """
    assert audio.ndim == 1, "pallas frontend takes a single [T] waveform"
    if interpret is None:
        # Mosaic kernels only compile for TPU; interpret elsewhere (CPU tests)
        interpret = jax.default_backend() != "tpu"
    # Pad/trim to the context chunk and apply whisper's reflect padding.
    deficit = chunk_samples - audio.shape[-1]
    if deficit < 0:
        audio = audio[:chunk_samples]
    elif deficit > 0:
        audio = jnp.pad(audio, (0, deficit))
    pad = WHISPER_N_FFT // 2
    audio = jnp.pad(audio, (pad, pad), mode="reflect")

    n_frames = chunk_samples // WHISPER_HOP  # 3000 at 30 s (whisper drops the last)
    if n_frames % FRAMES_PER_TILE:
        raise ValueError(
            f"chunk_samples must give a multiple of {FRAMES_PER_TILE} frames "
            f"(got {n_frames}); use an even number of seconds")
    n_tiles = n_frames // FRAMES_PER_TILE
    n_chunks = n_frames + 2
    need = n_chunks * _CHUNK
    audio = jnp.pad(audio, (0, max(0, need - audio.shape[0])))[:need]
    chunks = audio.reshape(n_chunks, _CHUNK)
    a = chunks[0:n_frames]
    b = chunks[1:n_frames + 1]
    c = chunks[2:n_frames + 2]

    wcos, wsin, fb = _constants(n_mels)
    tile_spec = pl.BlockSpec(
        (FRAMES_PER_TILE, _CHUNK), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    log_mel = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            tile_spec,  # a chunks
            tile_spec,  # b chunks
            tile_spec,  # c chunks
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wcos
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wsin
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fb
        ],
        out_specs=pl.BlockSpec(
            (FRAMES_PER_TILE, n_mels), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_frames, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_frames * (3 * _CHUNK) * (2 * _N_BINS) + 2 * n_frames * _N_BINS * n_mels,
            bytes_accessed=3 * n_frames * _CHUNK * 4 + n_frames * n_mels * 4,
            transcendentals=n_frames * n_mels,
        ),
        interpret=interpret,
    )(a, b, c, jnp.asarray(wcos), jnp.asarray(wsin), jnp.asarray(fb))

    # Whisper's global dynamic-range floor + affine normalisation.
    peak = jnp.max(log_mel)
    log_mel = jnp.maximum(log_mel, peak - 8.0)
    log_mel = (log_mel + 4.0) / 4.0
    return log_mel.T
