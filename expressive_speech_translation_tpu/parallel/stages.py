"""Stage-placement parallelism — the pipeline-parallel analog for a cascade.

SURVEY.md §2.19: the reference has no pipeline parallelism; its cascade
stages hop between GPU *containers* over HTTP (cosyvoice_api.py one request
per GPU pass). The TPU-native analog is *placement*, not an executor: give
each cascade stage's params a disjoint device group of one slice and the
stages pipeline across concurrent requests for free — while request A
vocodes on the TTS group, request B translates on the NMT group and C
encodes on the ASR group. No scheduler is needed because

  * the serving layer is already threaded (WSGI workers + the serving
    micro-batchers in serve/batching.py), and device execution releases
    the GIL;
  * stage boundaries are host-side tokenizer glue (text between ASR→NMT
    and NMT→TTS), so there is never a device-to-device tensor to move;
  * each stage's programs are jit-compiled against its own mesh, so XLA
    never sees a cross-group dependency.

Group sizing follows the measured stage costs (ROADMAP: TTS xRT ≈ 0.030 vs
ASR 0.012 / NMT 0.010): stages split the slice evenly and the remainder
goes to the LAST stage, so the default ("asr", "nmt", "tts") order hands
spare chips to TTS. Within a stage the group is a (dp, tp) mesh — tp>1
applies the Megatron-style partition rules inside the group, dp>1 lets the
stage's micro-batcher shard batch rows (jax_engines._dp_shard).

Wiring: ``jax_engines(stage_parallel=True)`` or per-engine
``stage_meshes=stage_meshes(...)``; serving opts in with
``EST_ENGINES__STAGE_PARALLEL=1`` (core.config.EngineConfig).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence, Tuple

import jax

from .mesh import Mesh, MeshSpec, make_mesh

log = logging.getLogger(__name__)

STAGES: Tuple[str, ...] = ("asr", "nmt", "tts")


def stage_meshes(
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    tp: int = 1,
    stages: Sequence[str] = STAGES,
) -> Dict[str, Mesh]:
    """Partition ``devices`` into one (dp, tp) mesh per cascade stage.

    With at least ``len(stages) * tp`` devices the groups are disjoint
    (true stage parallelism); the remainder tp-groups go to the last stage.
    With fewer devices, stages share tp-groups round-robin — placement
    degrades gracefully down to everything on one chip, so the same config
    runs on a dev box and a pod slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not stages:
        raise ValueError("stages must be non-empty")
    if tp < 1 or tp > n:
        raise ValueError(f"tp={tp} does not fit {n} devices")
    n_groups = n // tp
    groups = [devices[i * tp:(i + 1) * tp] for i in range(n_groups)]
    if n % tp:
        log.warning(
            "stage_meshes: %d device(s) unused (%d not a multiple of tp=%d)",
            n % tp, n, tp)

    out: Dict[str, Mesh] = {}
    if n_groups >= len(stages):
        per, extra = divmod(n_groups, len(stages))
        sizes = [per] * len(stages)
        sizes[-1] += extra  # heaviest stage (tts in the default order)
        idx = 0
        for stage, size in zip(stages, sizes):
            devs = [d for g in groups[idx:idx + size] for d in g]
            idx += size
            out[stage] = make_mesh(MeshSpec(dp=size, tp=tp), devices=devs)
    else:
        for i, stage in enumerate(stages):
            out[stage] = make_mesh(
                MeshSpec(dp=1, tp=tp), devices=groups[i % n_groups])
    return out


def placement_report(meshes: Dict[str, Mesh]) -> str:
    """One line per stage: device ids and (dp, tp) shape — for logs/dryrun."""
    lines = []
    for stage, mesh in meshes.items():
        ids = sorted(d.id for d in mesh.devices.flat)
        lines.append(f"{stage}: devices {ids} mesh {dict(mesh.shape)}")
    return "; ".join(lines)
