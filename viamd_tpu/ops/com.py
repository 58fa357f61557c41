"""Center of mass / centroid, PBC-aware (jittable, vmappable).

Rebuild of mdlib's md_util com family (md_util_com_compute/_vec4, used at
/root/reference/src/components/shapespace/shapespace.cpp:425 and for the
recenter path src/viamd.cpp:2162-2313).

The periodic COM uses the circular-mean construction: each fractional
coordinate is mapped to an angle on the unit circle, the weighted mean of
(cos, sin) is taken, and atan2 maps back — giving a COM that is invariant
to which periodic image each atom sits on. This matches the PBC-aware COM
the reference computes per structure before deperiodization. Aperiodic
cells fall back to the plain weighted mean (selected with jnp.where so one
compiled graph serves both).
"""

from __future__ import annotations

import jax.numpy as jnp

from viamd_tpu.ops.pbc import _pbc_mask, cellmul

_TWO_PI = 6.283185307179586


def com(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> jnp.ndarray:
    """Weighted center of mass with PBC (circular mean).

    x: (n, 3); weights: (n,) — zero-weight atoms are excluded, so dense
    selection masks (weights = mass * mask) feed straight in without gathers.
    Returns (3,).
    """
    w = weights.astype(x.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-30)
    # aperiodic mean
    mean = jnp.sum(x * w[:, None], axis=0) / wsum
    # periodic circular mean in fractional space
    f = cellmul(x, inv_basis)
    theta = f * _TWO_PI
    c = jnp.sum(jnp.cos(theta) * w[:, None], axis=0) / wsum
    s = jnp.sum(jnp.sin(theta) * w[:, None], axis=0) / wsum
    frac = jnp.arctan2(-s, -c) / _TWO_PI + 0.5  # in [0, 1)
    periodic = cellmul(frac, basis)
    m = _pbc_mask(basis)
    return periodic * m + mean * (1.0 - m)


def centroid(
    x: jnp.ndarray, mask: jnp.ndarray, basis: jnp.ndarray, inv_basis: jnp.ndarray
) -> jnp.ndarray:
    """Unweighted PBC-aware centroid over a 0/1 mask."""
    return com(x, mask, basis, inv_basis)


def com_segments(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> jnp.ndarray:
    """Per-segment PBC-aware COM (e.g. per residue / per structure).

    segment_ids: (n,) int32 in [0, num_segments). Returns (num_segments, 3).
    Uses segment_sum — on TPU this lowers to one-hot matmuls that ride the
    MXU, the scatter-free formulation SURVEY.md §7 calls for.
    """
    import jax

    w = weights.astype(x.dtype)
    wsum = jax.ops.segment_sum(w, segment_ids, num_segments)
    wsum = jnp.maximum(wsum, 1e-30)[:, None]
    mean = jax.ops.segment_sum(x * w[:, None], segment_ids, num_segments) / wsum
    f = cellmul(x, inv_basis)
    theta = f * _TWO_PI
    c = jax.ops.segment_sum(jnp.cos(theta) * w[:, None], segment_ids, num_segments) / wsum
    s = jax.ops.segment_sum(jnp.sin(theta) * w[:, None], segment_ids, num_segments) / wsum
    frac = jnp.arctan2(-s, -c) / _TWO_PI + 0.5
    periodic = cellmul(frac, basis)
    m = _pbc_mask(basis)
    return periodic * m + mean * (1.0 - m)
