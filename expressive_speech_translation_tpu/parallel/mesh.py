"""Device mesh construction and sharding helpers.

The reference's distributed story is MPI bootstrap + NCCL/gloo process groups +
HTTP hops between pipeline stages (SURVEY.md §5.8). Here a single JAX program owns
every device: ``jax.distributed.initialize()`` for multi-host bootstrap, one
``jax.sharding.Mesh`` whose axes ride ICI (intra-slice) / DCN (multi-slice), and XLA
collectives inserted by pjit from sharding annotations.

Axes convention (used by every model's partition rules):
    ``dp`` — data/batch parallel (outermost; maps onto DCN across slices)
    ``tp`` — tensor parallel (innermost; always intra-slice over ICI)
"""

from __future__ import annotations

import dataclasses
import logging
import math
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)

DP_AXIS = "dp"
TP_AXIS = "tp"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh request. -1 on one axis means 'all remaining devices'."""

    dp: int = -1
    tp: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        dp, tp = self.dp, self.tp
        if tp == -1 and dp == -1:
            raise ValueError("at most one mesh axis may be -1")
        if tp == -1:
            tp = n_devices // max(dp, 1)
        if dp == -1:
            dp = n_devices // max(tp, 1)
        if dp * tp != n_devices:
            raise ValueError(
                f"mesh {dp}x{tp} does not cover {n_devices} devices"
            )
        return dp, tp


def make_mesh(
    spec: MeshSpec | None = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D (dp, tp) mesh over the given devices.

    Device order matters for ICI locality: ``jax.devices()`` enumerates in
    physical-torus order, and keeping tp innermost keeps tensor-parallel
    collectives on directly-connected neighbours.
    """
    spec = spec or MeshSpec()
    devices = list(devices if devices is not None else jax.devices())
    dp, tp = spec.resolve(len(devices))
    grid = np.asarray(devices).reshape(dp, tp)
    return Mesh(grid, (DP_AXIS, TP_AXIS))


def best_effort_mesh(tp: int = 1) -> Mesh:
    """Mesh over all visible devices with the requested tp (clamped to fit)."""
    n = len(jax.devices())
    tp = math.gcd(tp, n) if tp > 1 else 1
    return make_mesh(MeshSpec(dp=-1, tp=tp))


def host_cpu_mesh(n_devices: int) -> Mesh:
    """N-device CPU mesh for hermetic multi-chip tests.

    Requires ``XLA_FLAGS=--xla_force_host_platform_device_count=N`` (set in
    tests/conftest.py) so a single host exposes N XLA CPU devices.
    """
    try:
        cpus = list(jax.devices("cpu"))
    except RuntimeError:
        cpus = [d for d in jax.devices() if d.platform == "cpu"]
    if len(cpus) < n_devices:
        raise RuntimeError(
            f"need {n_devices} cpu devices, have {len(cpus)}; set "
            "XLA_FLAGS=--xla_force_host_platform_device_count"
        )
    return make_mesh(MeshSpec(dp=-1, tp=1), devices=cpus[:n_devices])


def maybe_initialize_distributed(mesh_cfg=None) -> None:
    """Multi-host bootstrap (replaces the reference's MPI rank/port exchange,
    diff2lip/guided_diffusion/dist_util.py:20-42). No-op single-host.

    Wiring comes from ``MeshConfig`` (``EST_MESH__COORDINATOR`` /
    ``NUM_PROCESSES`` / ``PROCESS_ID`` — deploy/docker-compose.tpu-pod.yml)
    or, as a fallback, the standard ``JAX_COORDINATOR_ADDRESS`` env that
    ``jax.distributed.initialize()`` reads on its own."""
    if mesh_cfg is not None and getattr(mesh_cfg, "coordinator", ""):
        jax.distributed.initialize(
            coordinator_address=mesh_cfg.coordinator,
            num_processes=mesh_cfg.num_processes or None,
            process_id=(mesh_cfg.process_id
                        if mesh_cfg.process_id >= 0 else None),
        )
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    else:
        return
    log.info(
        "jax.distributed initialized: process %d/%d",
        jax.process_index(), jax.process_count(),
    )


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Batch-sharded along dp on dim 0; replicated elsewhere."""
    return NamedSharding(mesh, P(DP_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh, rules=None):
    """Place a param pytree on the mesh.

    With ``rules`` (a :class:`~.partition.PartitionRules`), tensor-parallel
    sharding is applied by param-path pattern; otherwise params are replicated
    (pure DP — correct for the reference's 0.5B-scale models).
    """
    if rules is None:
        sharding = replicated(mesh)
        return jax.device_put(params, sharding)
    from .partition import logical_to_sharding

    return logical_to_sharding(params, mesh, rules)
