"""Param-path → PartitionSpec rules for tensor parallelism.

Models in this framework are plain pytrees of arrays keyed by ``/``-joined path
strings inside nested dicts. Partition rules map regex patterns over those paths
to :class:`jax.sharding.PartitionSpec`s; the first matching rule wins, and
anything unmatched is replicated. This is the pjit analog of Megatron-style
column/row-parallel layer placement, declared declaratively instead of baked
into layer classes.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class PartitionRules:
    """Ordered (pattern, spec) pairs. Patterns are ``re.search`` regexes against
    the slash-joined param path, e.g. ``attn/(q|k|v)/kernel``."""

    rules: Tuple[Tuple[str, P], ...]

    def spec_for(self, path: str, shape: Sequence[int], mesh: Mesh | None = None) -> P:
        """First matching rule whose spec fits ``shape``; falls back to
        replication when a sharded dim isn't divisible by its mesh axis
        (e.g. a 53-way vocab head under tp=2 — better replicated than a
        crash; XLA requires even shards)."""
        for pattern, spec in self.rules:
            if re.search(pattern, path):
                if len(spec) <= len(shape) and _divisible(spec, shape, mesh):
                    return spec
        return P()


def _divisible(spec: P, shape: Sequence[int], mesh: Mesh | None) -> bool:
    if mesh is None:
        return True
    for dim, axes in zip(shape, spec):
        if axes is None:
            continue
        for ax in (axes if isinstance(axes, tuple) else (axes,)):
            n = mesh.shape.get(ax, 1)
            if n and dim % n != 0:
                return False
    return True


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for keypath, leaf in flat:
        parts = []
        for k in keypath:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        out.append(("/".join(parts), leaf))
    return out, treedef


def logical_to_sharding(params, mesh: Mesh, rules: PartitionRules):
    """Device-put every leaf according to the first matching rule."""
    flat, treedef = _flatten_with_paths(params)
    placed = [
        jax.device_put(leaf, NamedSharding(mesh, rules.spec_for(path, getattr(leaf, "shape", ()), mesh)))
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, placed)


def sharding_tree(params, mesh: Mesh, rules: PartitionRules):
    """Same resolution as :func:`logical_to_sharding` but returns the shardings
    (for use as pjit in_shardings/out_shardings) instead of placing data."""
    flat, treedef = _flatten_with_paths(params)
    specs = [
        NamedSharding(mesh, rules.spec_for(path, getattr(leaf, "shape", ()), mesh))
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)
