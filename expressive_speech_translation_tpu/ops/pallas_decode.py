"""Fused norm→matvec kernels for autoregressive decode steps.

Slope-corrected profiling of the whisper-medium B=1 decode step (v5e, bf16)
shows XLA's matvecs already stream weights at 85-98% of HBM bandwidth
(matmuls 692 GB/s, tied head 801, cross-attn 646) — but the *composed* step
runs 1.80 ms against a ~1.33 ms parts-sum. Hypothesis tested here: fuse each
norm→matmul(→act→matmul)→residual chain into ONE kernel whose grid streams
the weight chunks back-to-back while norm/activation/accumulation ride along
in VMEM, so nothing sits between consecutive weight DMAs.

MEASURED VERDICT (v5e, whisper-medium shapes, bf16, B=1, slope-timed over
24-layer stacks): the fused kernels LOSE to XLA's unfused chains —
ln+mlp+res 648 GB/s fused vs 739 XLA (0.621 vs 0.545 ms/iter), ln+qkv 528
vs 630 GB/s — in both the v1 (per-operand DMAs) and this v2 (weights packed
into one column-block DMA via :func:`pack_mlp`, biases VMEM-resident)
layouts. XLA's isolated ln+mlp stacks also show NO inter-op bubble, so the
composed decode step's ~0.47 ms deficit lives in the attention/cache/head
glue, not in these chains — fusing them cannot recover it. The decode paths
therefore stay on XLA (models/whisper.py decode_step etc.); these kernels
are retained, tested (tests/test_pallas_decode.py), as the measured record
and as the streaming-matvec pattern for future Mosaic experiments.

Two kernels cover every decode-path chain in the repo's model families
(whisper/NLLB `layer_norm` + gelu MLPs, qwen2 `rms_norm` + gated-silu MLPs —
models/whisper.py decode_step, models/nllb.py decode_step,
models/qwen2.py decode_step):

- ``fused_ln_matvec``:  y = norm(x) @ W + b            (qkv projections)
- ``fused_ln_mlp``:     y = [x +] act(norm(x)@W1+b1) @ W2 + b2
  with optional gate:   y = [x +] (silu(x̂@Wg) * (x̂@Wu)) @ W2

Both chunk the weights' wide axis over the grid; the Pallas pipeline
double-buffers the chunks so the MXU sees a continuous weight stream. The
norm is computed once (first grid step) into a VMEM scratch; the output
accumulates in an f32 scratch and is written on the last step.

Norm statistics are computed in f32 (the XLA path computes them in the io
dtype); parity vs the unfused ops is ~1e-3 rel in bf16, exact-math in f32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK_CANDIDATES = (1024, 768, 512, 384, 256, 128)


def _pick_chunk(width: int, cap: int = 1024) -> int:
    for c in _CHUNK_CANDIDATES:
        if c <= cap and width % c == 0:
            return c
    raise ValueError(f"weight width {width} is not a multiple of 128")


def _normed(x_ref, scale_ref, bias_ref, norm: str, eps: float, out_dtype):
    """norm(x) computed in f32, returned in the matmul operand dtype."""
    x = x_ref[:].astype(jnp.float32)
    if norm == "layer":
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    elif norm == "rms":
        y = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        y = y * scale_ref[:].astype(jnp.float32)
    elif norm == "none":
        y = x
    else:
        raise ValueError(norm)
    return y.astype(out_dtype)


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational approximation (max abs err 1.5e-7).

    Mosaic has no erf/erfc lowering, so exact gelu is built on this; the
    error is far below bf16 activation resolution and ~1e-7 in f32.
    """
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _act(u, activation: str):
    if activation == "gelu":
        return 0.5 * u * (1.0 + _erf(u * (2.0 ** -0.5)))
    if activation == "silu":
        return jax.nn.silu(u)
    if activation == "relu":
        return jnp.maximum(u, 0.0)
    if activation == "none":
        return u
    raise ValueError(activation)


# ------------------------------------------------------------- ln → matvec


def _ln_matvec_kernel(norm, eps, n_chunks, x_ref, scale_ref, bias_ref,
                      w_ref, b_ref, out_ref, xhat):
    i = pl.program_id(0)
    c = w_ref.shape[1]

    @pl.when(i == 0)
    def _():
        xhat[:] = _normed(x_ref, scale_ref, bias_ref, norm, eps, x_ref.dtype)

    out_ref[:] = (
        jax.lax.dot(xhat[:], w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:, pl.ds(i * c, c)].astype(jnp.float32)
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("norm", "eps", "chunk", "interpret"))
def fused_ln_matvec(
    x: jnp.ndarray,                    # [B, D]
    scale: jnp.ndarray,                # [D] (or [1] dummy when norm="none")
    bias: jnp.ndarray,                 # [D] (layer norm only; dummy otherwise)
    w: jnp.ndarray,                    # [D, N]
    b: jnp.ndarray,                    # [N]
    *,
    norm: str = "layer",
    eps: float = 1e-5,
    chunk: int = 0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """norm(x) @ w + b in one fused pass, weights streamed in N-chunks."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, d = x.shape
    n = w.shape[1]
    c = chunk or _pick_chunk(n)
    kernel = functools.partial(_ln_matvec_kernel, norm, eps, n // c)
    return pl.pallas_call(
        kernel,
        grid=(n // c,),
        in_specs=[
            pl.BlockSpec((bsz, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, c), lambda i: (0, i)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),   # bias fully resident
        ],
        out_specs=pl.BlockSpec((bsz, c), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((bsz, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bsz, d), x.dtype)],
        interpret=interpret,
    )(x, scale.reshape(1, -1), bias.reshape(1, -1), w, b.reshape(1, -1))


# ---------------------------------------------------------------- ln → mlp


def pack_mlp(w1: jnp.ndarray, w2: jnp.ndarray,
             w_gate: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Stack [w1; w2ᵀ(; w_gate)] → [2D|3D, F] so each grid step of
    fused_ln_mlp is ONE contiguous column-block DMA instead of 2-3 separate
    (plus per-step 2 KB bias) fetches — the v1 kernel's DMA fragmentation
    cost ~15% of stream bandwidth. Call once at weight-prep time."""
    parts = [w1, w2.T]
    if w_gate is not None:
        parts.append(w_gate)
    return jnp.concatenate(parts, axis=0)


def _ln_mlp_kernel(norm, eps, activation, residual, gated, d, n_chunks,
                   x_ref, scale_ref, bias_ref, w_ref, b1_ref, b2_ref,
                   out_ref, xhat, acc):
    i = pl.program_id(0)
    c = w_ref.shape[1]

    @pl.when(i == 0)
    def _():
        xhat[:] = _normed(x_ref, scale_ref, bias_ref, norm, eps, x_ref.dtype)
        acc[:] = jnp.zeros_like(acc)

    u = (jax.lax.dot(xhat[:], w_ref[:d], preferred_element_type=jnp.float32)
         + b1_ref[:, pl.ds(i * c, c)].astype(jnp.float32))
    if gated:
        g = jax.lax.dot(xhat[:], w_ref[2 * d:],
                        preferred_element_type=jnp.float32)
        u = _act(g, activation) * u
    else:
        u = _act(u, activation)
    # second matmul against the transposed-packed chunk: u [B,c] · w2ᵀ [D,c]
    acc[:] += jax.lax.dot_general(
        u.astype(x_ref.dtype), w_ref[d:2 * d],
        ((( 1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(i == n_chunks - 1)
    def _():
        y = acc[:] + b2_ref[:].astype(jnp.float32)
        if residual:
            y = y + x_ref[:].astype(jnp.float32)
        out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "norm", "eps", "activation", "residual", "gated", "chunk", "interpret"))
def fused_ln_mlp(
    x: jnp.ndarray,                    # [B, D]
    scale: jnp.ndarray,                # [D]
    bias: jnp.ndarray,                 # [D] (dummy for rms/none)
    w_packed: jnp.ndarray,             # pack_mlp(w1, w2[, w_gate]) [2D|3D, F]
    b1: jnp.ndarray,                   # [F]
    b2: jnp.ndarray,                   # [D]
    *,
    gated: bool = False,
    norm: str = "layer",
    eps: float = 1e-5,
    activation: str = "gelu",
    residual: bool = True,
    chunk: int = 0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """[x +] act(norm(x) @ w1 + b1) @ w2 + b2 — one kernel, one weight pass.

    ``w_packed`` comes from :func:`pack_mlp`. With ``gated=True`` (pack_mlp
    given w_gate): [x +] (act(x̂@w_gate) * (x̂@w1 + b1)) @ w2 + b2 — qwen2's
    silu-gated mlp (pass activation="silu", norm="rms").
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, d = x.shape
    f = w_packed.shape[1]
    rows = w_packed.shape[0]
    assert rows == (3 * d if gated else 2 * d), (rows, d, gated)
    # VMEM: 2 (double-buffer) × chunk × rows × itemsize + biases + scratch
    cap = 512 if (gated or x.dtype.itemsize >= 4) else 1024
    c = chunk or _pick_chunk(f, cap)
    kernel = functools.partial(_ln_mlp_kernel, norm, eps, activation,
                               residual, gated, d, f // c)
    return pl.pallas_call(
        kernel,
        grid=(f // c,),
        in_specs=[
            pl.BlockSpec((bsz, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((rows, c), lambda i: (0, i)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),   # b1 fully resident
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bsz, d), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((bsz, d), x.dtype),
                        pltpu.VMEM((bsz, d), jnp.float32)],
        interpret=interpret,
    )(x, scale.reshape(1, -1), bias.reshape(1, -1), w_packed,
      b1.reshape(1, -1), b2.reshape(1, -1))
