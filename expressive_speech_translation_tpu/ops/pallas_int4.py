"""Packed-int4 weight-only matmul: the measured record for the sub-int8 idea.

Autoregressive decode on one chip is weight-streaming-bound (see
ops/pallas_decode.py: XLA's bf16 matvec chains run at the HBM roofline, and
models/common.quantize_dense ships the int8 half-traffic path). The next rung
down is 4-bit weights — half of int8's bytes again. This module holds the
TPU-native attempt and its measured verdict.

Why int4 can't ride the int8 path: ``jnp.int4`` is a real JAX/XLA:TPU dtype,
but on the remote-relay runtime this repo targets, any S4 array crossing the
jit argument boundary aborts in the relay's shard-arg relayout (RecursionError
in device_put of layout ``T(64,128)(8,1)``) — int4 therefore has to travel
inside a carrier dtype. The packing here stores TWO signed 4-bit values per
int8 byte, split-K halves (rows [0, K/2) in the low nibble, [K/2, K) in the
high nibble) so unpacking never interleaves sublanes:

    y = x[:, :K/2] @ unpack_lo(P) + x[:, K/2:] @ unpack_hi(P)

MEASURED VERDICT (v5e, 8-layer 2048x8192 decode chain, B=8, fori_loop inside
one jit, fresh-arg single-shot timing, 2026-08-20):

  - bf16 XLA chain:            0.336 ms/iter  (798 GB/s — at the roofline)
  - int8 XLA (quantize_dense): 0.300 ms/iter  (1.12x; 1.45-1.7x on the real
                                decode shapes per BENCH_r03/ROADMAP)
  - int4 UNPACK IN XLA:        0.95x vs int8 — XLA materializes the unpacked
                                bf16 tensor in HBM; the nibble arithmetic does
                                not fuse into the dot, so traffic is not halved.
  - int4 Pallas (this kernel): 0.40 ms/iter, 165-167 GB/s effective packed
                                stream (block_n 512/1024) — LOSES to int8.
  - streaming floor of the same pallas_call structure (dot on the packed
    bytes, no unpack at all): 0.088-0.35 ms/iter, <=760 GB/s on half the
    bytes — i.e. even a ZERO-cost unpack would barely tie bf16. Per-layer
    pallas_call at matvec sizes (8.4 MB packed per call, 16-step grid) pays
    pipeline spin-up that XLA's fused chains don't.

CONCLUSION: sub-int8 weight streaming needs the whole decode layer stack in
ONE kernel so the packed stream is continuous across layers (the
"mega-kernel" route ops/pallas_decode.py's postmortem also points at) — a
per-matmul kernel cannot win. The serving quantization ladder therefore stays
bf16/int8 (models/common.py); this module is kept, tested in interpret mode
(tests/test_pallas_int4.py), as the measured record and as the packing format
+ unpack idiom for a future mega-kernel attempt.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def pack_int4(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """w [K, N] float → (packed [K//2, N] int8, scale [1, N] f32).

    Symmetric per-output-channel 4-bit quantization (range [-7, 7], matching
    quantize_dense's [-127, 127] int8 convention one rung down). Low nibble =
    row k, high nibble = row k + K//2.
    """
    k, _ = w.shape
    if k % 2:
        raise ValueError(f"pack_int4 needs an even K, got {k}")
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-8) / 7.0
    q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int8)
    lo, hi = q[: k // 2], q[k // 2 :]
    return ((hi << 4) | (lo & 0x0F)).astype(jnp.int8), scale.astype(jnp.float32)


def unpack_int4(packed: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Inverse of pack_int4 → dequantized [K, N] weights (reference path;
    this materialization is exactly what the kernel below avoids)."""
    p = packed.astype(jnp.int32)
    lo4 = p & 15
    lo = lo4 - ((lo4 & 8) << 1)          # sign-extend the low nibble
    hi = p >> 4                           # arithmetic shift: sign-correct
    return (jnp.concatenate([lo, hi], axis=0) * scale).astype(dtype)


def _kernel(x_lo_ref, x_hi_ref, p_ref, s_ref, o_ref):
    # int8 shifts fail Mosaic compilation on this runtime (tpu_compile_helper
    # exit 1) — unpack through int32, which lowers cleanly.
    p = p_ref[:].astype(jnp.int32)
    hi = (p >> 4).astype(jnp.bfloat16)
    lo4 = p & 15
    lo = (lo4 - ((lo4 & 8) << 1)).astype(jnp.bfloat16)
    acc = jnp.dot(x_lo_ref[:], lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_hi_ref[:], hi, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def matmul_int4(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    block_n: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [B, K] @ dequant(packed, scale) [K, N] → [B, N] in x.dtype.

    Grid over N; each step streams one packed [K/2, block_n] int8 tile into
    VMEM, unpacks it in registers, and runs the two half-K dots on the MXU.
    """
    b, k = x.shape
    kh, n = packed.shape
    if kh * 2 != k:
        raise ValueError(f"x K={k} does not match packed K/2={kh}")
    if n % block_n:
        block_n = 128
    x_lo, x_hi = x[:, : k // 2], x[:, k // 2 :]
    return pl.pallas_call(
        _kernel,
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((b, kh), lambda j: (0, 0)),
            pl.BlockSpec((b, kh), lambda j: (0, 0)),
            pl.BlockSpec((kh, block_n), lambda j: (0, j)),
            pl.BlockSpec((1, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, n), x.dtype),
        interpret=interpret,
    )(x_lo, x_hi, packed, scale)
