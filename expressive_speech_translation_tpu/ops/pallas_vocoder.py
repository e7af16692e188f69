"""Fused vocoder resblock stage — blocked channel-time Pallas kernel.

The HiFi-GAN tail (narrow channels C ≤ 128, very long time axis) is ~10×
off roofline under XLA's conv lowering: each of the 18 convs in a stage
re-streams the activation from HBM, and NHC layout puts the 64-wide channel
axis on the 128-lane dimension (half-empty tiles). This kernel runs one
whole upsample stage's resblock battery — mean over kernel-size branches of
sequential dilated units ``h += c2(lrelu(c1(lrelu(h), d)))`` — with:

- **channel-time layout**: activations live as [C, T] tiles, channels on
  sublanes, time on lanes, so every matmul is [C_out, C_in] @ [C_in, T_tile]
  with the long axis on the MXU's N dimension;
- **one HBM round-trip**: each time tile is DMA'd into VMEM once, all 18
  convs + activations + residuals + the branch mean run from VMEM, one tile
  is written back — vs 36+ HBM round-trips in the unfused graph;
- dilated convs as lane-rolls of the VMEM-resident tile (shifted views cost
  a VPU copy, not a DMA — the failure mode of the round-2 attempt);
- halo tiles: each block reads ``tile + 2·halo`` where halo is the stage's
  total receptive-field half-width, so edge garbage from the rolls never
  reaches the written center.

Numerics match models/cosyvoice.vocode's stage loop exactly (same op order;
matmuls accumulate in f32).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stage_halo(kernels: Sequence[int], dilations: Sequence[Sequence[int]]) -> int:
    """Total receptive-field half-width of one stage's worst branch."""
    worst = 0
    for k, dils in zip(kernels, dilations):
        c = (k - 1) // 2
        worst = max(worst, sum(c * d + c for d in dils))
    return worst


def _stage_kernel(kernels, dilations, halo, tile, c_ch, t_valid, *refs):
    """refs = [x_hbm, (c1k, c1b, c2k, c2b) × units…, out, x_vmem, sem]."""
    x_hbm = refs[0]
    n_w = 4 * sum(len(d) for d in dilations)
    wrefs = refs[1: 1 + n_w]
    out_ref = refs[1 + n_w]
    x_vmem = refs[2 + n_w]
    sem = refs[3 + n_w]

    b = pl.program_id(0)
    i = pl.program_id(1)
    width = tile + 2 * halo
    # x is pre-padded by halo on both sides: tile i's window starts at i*tile
    pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * tile, width)], x_vmem, sem
    ).start()
    pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * tile, width)], x_vmem, sem
    ).wait()

    io_dtype = x_vmem.dtype
    # activations stay f32 in VMEM: Mosaic's lane rotate only supports
    # 32-bit data; matmul operands cast to the io dtype (bf16 in serving)
    # so the MXU still runs at bf16 rate with f32 accumulation
    x = x_vmem[:].astype(jnp.float32)
    # XLA's conv zero-pads every conv's INPUT beyond the sequence; replicate
    # by masking out-of-sequence window positions before each conv (edge
    # tiles only carry such positions — interior halos hold true neighbors)
    t_global = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
                + i * tile - halo)
    valid = (t_global >= 0) & (t_global < t_valid)

    def lrelu(v):
        return jnp.where(v > 0, v, 0.1 * v)

    def conv(h, kref, bref, k, d):
        h = jnp.where(valid, h, 0)
        c = (k - 1) // 2
        acc = jnp.zeros(h.shape, jnp.float32)
        for j in range(k):
            off = (j - c) * d
            # y[t] = Σ_j W_j^T h[t + off]  — lane-roll of the VMEM tile
            # (pltpu.roll wants shift ≥ 0; circular, so take it mod width)
            h_s = pltpu.roll(h, (-off) % h.shape[1], axis=1) if off else h
            w_t = kref[j].astype(io_dtype).T          # [C_out, C_in]
            acc = acc + jax.lax.dot(
                w_t, h_s.astype(io_dtype), preferred_element_type=jnp.float32)
        return acc + bref[:].astype(jnp.float32)

    wi = 0
    branch_sum = None
    for k, dils in zip(kernels, dilations):
        h = x
        for d in dils:
            c1k, c1b, c2k, c2b = wrefs[wi: wi + 4]
            wi += 4
            y = conv(lrelu(h), c1k, c1b, k, d)
            y = conv(lrelu(y), c2k, c2b, k, 1)
            h = h + y
        branch_sum = h if branch_sum is None else branch_sum + h
    result = branch_sum / len(kernels)
    out_ref[:] = result[:, halo: halo + tile].astype(io_dtype)[None]


@functools.partial(jax.jit, static_argnames=("kernels", "dilations", "tile",
                                             "interpret"))
def fused_resblock_stage(
    x: jnp.ndarray,                       # [B, T, C] (NHC, the vocode layout)
    weights: Tuple[jnp.ndarray, ...],     # (c1k, c1b, c2k, c2b) × units, flat
    *,
    kernels: Tuple[int, ...],
    dilations: Tuple[Tuple[int, ...], ...],
    tile: int = 4096,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One vocoder stage's full resblock battery in one fused pass.

    ``weights`` is the flattened per-branch/per-unit conv params in vocode's
    iteration order: for each kernel-size branch, for each dilation unit,
    (c1.kernel [k,C,C], c1.bias [C,1], c2.kernel [k,C,C], c2.bias [C,1]) —
    biases column-shaped so they broadcast over the lane (time) axis.
    """
    if interpret is None:
        # Mosaic kernels only compile for TPU; interpret elsewhere (CPU tests)
        interpret = jax.default_backend() != "tpu"
    b, t, c = x.shape
    # VMEM stack budget: the kernel keeps ~a dozen [C, tile+2·halo] f32
    # temporaries live; scale the tile down as channels grow and as the io
    # dtype widens (f32 io skips the bf16 operand copies but doubles the
    # dot operands' footprint). Measured on v5e against the 16 MB scoped
    # limit: bf16 C=64 fits at 4096, C=128 needs ≤1536 (2048 hit 16.21 MB);
    # f32 C=128 at 1536 hit 23.24 MB, fits at 768.
    if c > 64:
        tile = min(tile, 1536)
    if x.dtype.itemsize >= 4:
        tile = min(tile, 2048 if c <= 64 else 768)
    # round the halo so the DMA window width (tile + 2·halo) stays a
    # multiple of the 128-lane tile — unaligned HBM slice widths fail to
    # lower (tpu.memref_slice)
    halo = -(-stage_halo(kernels, dilations) // 64) * 64
    tile = min(tile, max(128, ((t + 127) // 128) * 128))
    n_tiles = -(-t // tile)
    t_round = n_tiles * tile
    xt = jnp.swapaxes(x, 1, 2)                        # [B, C, T]
    xt = jnp.pad(xt, ((0, 0), (0, 0), (halo, t_round - t + halo)))

    width = tile + 2 * halo
    kernel = functools.partial(_stage_kernel, kernels, dilations, halo, tile,
                               c, t)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        out_specs=pl.BlockSpec((1, c, tile), lambda bb, ii: (bb, 0, ii)),
        out_shape=jax.ShapeDtypeStruct((b, c, t_round), x.dtype),
        scratch_shapes=[pltpu.VMEM((c, width), x.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(xt, *weights)
    return jnp.swapaxes(out, 1, 2)[:, :t]


def stage_weights_flat(stage_params, kernels, dilations):
    """models/cosyvoice vocode ``params["res"][stage]`` → the flat weights
    tuple fused_resblock_stage expects."""
    flat = []
    for block, (k, dils) in zip(stage_params, zip(kernels, dilations)):
        for unit, _d in zip(block, dils):
            flat += [unit["c1"]["kernel"], unit["c1"]["bias"].reshape(-1, 1),
                     unit["c2"]["kernel"], unit["c2"]["bias"].reshape(-1, 1)]
    return tuple(flat)
