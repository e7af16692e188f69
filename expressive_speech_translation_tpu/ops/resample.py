"""Kaiser-windowed sinc resampling as a strided conv (MXU-friendly).

Reproduces the reference's highest-quality resample path —
``torchaudio.functional.resample(lowpass_filter_width=128, rolloff≈0.9476,
beta≈14.7697)`` (services/audio_processor.py:297-304) — as a polyphase FIR:
the per-phase kernels are precomputed on host (ops/windows.kaiser_sinc_filter)
and applied with one ``lax.conv_general_dilated`` whose stride is the reduced
input rate, i.e. a dense [new_g, 1, K] conv — exactly the shape XLA tiles well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .windows import kaiser_sinc_filter


@functools.lru_cache(maxsize=32)
def _resample_plan(orig_freq: int, new_freq: int, lowpass_filter_width: int,
                   rolloff: float, beta: float | None):
    kernels, width = kaiser_sinc_filter(
        orig_freq, new_freq,
        lowpass_filter_width=lowpass_filter_width, rolloff=rolloff, beta=beta,
    )
    gcd = int(np.gcd(orig_freq, new_freq))
    return kernels, width, orig_freq // gcd, new_freq // gcd


def resample(
    x: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    *,
    lowpass_filter_width: int = 128,
    rolloff: float = 0.9475937167399596,
    beta: float | None = 14.769656459379492,
) -> jnp.ndarray:
    """Resample [..., T] from orig_freq to new_freq. Output length is
    ``ceil(T * new / orig)`` (torchaudio semantics)."""
    if orig_freq == new_freq:
        return x
    kernels, width, orig_g, new_g = _resample_plan(
        orig_freq, new_freq, lowpass_filter_width, rolloff, beta
    )
    t_in = x.shape[-1]
    batch_shape = x.shape[:-1]
    num_blocks = -(-t_in // orig_g)  # ceil
    target_len = -(-t_in * new_g // orig_g)

    xb = x.reshape(-1, 1, t_in)  # [N, C=1, T]
    # Same padding scheme as torchaudio: `width` zeros left, width + orig_g right.
    xb = jnp.pad(xb, ((0, 0), (0, 0), (width, width + orig_g)))

    w = jnp.asarray(kernels)[:, None, :]  # [new_g(out-ch), 1(in-ch), K]
    y = jax.lax.conv_general_dilated(
        xb, w,
        window_strides=(orig_g,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [N, new_g, blocks]
    y = y[..., :num_blocks]
    # Interleave phases: output sample (b*new_g + p) = y[:, p, b]
    y = jnp.swapaxes(y, -1, -2).reshape(-1, num_blocks * new_g)[..., :target_len]
    return y.reshape(*batch_shape, target_len)
