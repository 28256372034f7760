"""Device-mesh helpers for multi-chip scaling.

The reference stack is strictly single-GPU with no collectives
(reference: SURVEY.md §2.3) — multi-chip here is a TPU-native *extension*:
`jax.sharding.Mesh` over ICI with XLA-inserted collectives, never hand-rolled
NCCL-style calls. Axes:

- ``dp``: data parallel over independent utterances (batch).
- ``tp``: tensor parallel over attention KV heads and MLP intermediate dim.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int | None = None, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. Defaults to all devices on the tp axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
