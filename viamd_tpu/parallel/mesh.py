"""Mesh construction + sharding helpers.

The framework's canonical mesh axes (SURVEY.md §2.4/§5.7):
- "frames": the dominant data-parallel axis — trajectory frames are
  independent; per-frame analysis shards over ICI with only the
  histogram/volume accumulator reductions crossing chips (XLA emits the
  psum when a reduction spans the sharded axis).
- "atoms": reserved intra-frame axis for ≥1M-atom systems (tensor-parallel
  analog); pair kernels shard their row tiles over it.

The reference's equivalents: frame-range pool tasks (main.cpp:981-985) and
grain-1024 atom-range tasks (viamd.cpp:1712).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def mesh_devices(n: Optional[int] = None) -> list:
    devs = jax.devices()
    if n is not None:
        if len(devs) < n:
            raise ValueError(f"need {n} devices, have {len(devs)}")
        devs = devs[:n]
    return devs


def frames_mesh(
    n_devices: Optional[int] = None, atoms: int = 1
) -> Mesh:
    """1D (or 2D frames×atoms) device mesh over ICI."""
    devs = mesh_devices(n_devices)
    n = len(devs)
    if atoms > 1:
        if n % atoms:
            raise ValueError(f"{n} devices not divisible by atoms={atoms}")
        arr = np.array(devs).reshape(n // atoms, atoms)
        return Mesh(arr, ("frames", "atoms"))
    return Mesh(np.array(devs), ("frames",))


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "frames"):
    """Place arrays with their leading axis sharded over `axis_name`."""
    sh = NamedSharding(mesh, PartitionSpec(axis_name))
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicated(mesh: Mesh, *arrays):
    sh = NamedSharding(mesh, PartitionSpec())
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
