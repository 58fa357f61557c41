"""Geometric observables: distances, angles, dihedrals (batched, PBC-aware).

Rebuild of the geometry procedures behind the VIAMD script builtins
distance/distance_min/distance_max/distance_pair/angle/dihedral
(reference capability: md_script.h procedure table, SURVEY.md §2.3; script
keyword list ext/ImGuiColorTextEdit/TextEditor.cpp:3318-3331).

All functions are jittable and shaped for vmap over frames: coordinate
gathers happen via static int32 index arrays computed host-side from
selections (the "static gather index lists" strategy of SURVEY.md §7).
"""

from __future__ import annotations

import jax.numpy as jnp

from viamd_tpu.ops.pbc import min_image


def distance(
    x: jnp.ndarray,
    idx_a: jnp.ndarray,
    idx_b: jnp.ndarray,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> jnp.ndarray:
    """Min-image distances between paired index lists: (k,)."""
    d = min_image(x[idx_a] - x[idx_b], basis, inv_basis)
    return jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))


def angle(
    x: jnp.ndarray,
    idx_a: jnp.ndarray,
    idx_b: jnp.ndarray,
    idx_c: jnp.ndarray,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> jnp.ndarray:
    """Angle a-b-c in radians (vertex b): (k,)."""
    v1 = min_image(x[idx_a] - x[idx_b], basis, inv_basis)
    v2 = min_image(x[idx_c] - x[idx_b], basis, inv_basis)
    num = jnp.sum(v1 * v2, axis=-1)
    den = jnp.sqrt(
        jnp.maximum(jnp.sum(v1 * v1, -1) * jnp.sum(v2 * v2, -1), 1e-30)
    )
    return jnp.arccos(jnp.clip(num / den, -1.0, 1.0))


def dihedral(
    x: jnp.ndarray,
    idx_a: jnp.ndarray,
    idx_b: jnp.ndarray,
    idx_c: jnp.ndarray,
    idx_d: jnp.ndarray,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> jnp.ndarray:
    """Signed dihedral a-b-c-d in radians (-π, π]: (k,).

    atan2 formulation (numerically stable near 0/π, same convention as the
    backbone φ/ψ angles the Ramachandran component consumes).
    """
    b1 = min_image(x[idx_b] - x[idx_a], basis, inv_basis)
    b2 = min_image(x[idx_c] - x[idx_b], basis, inv_basis)
    b3 = min_image(x[idx_d] - x[idx_c], basis, inv_basis)
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    b2n = b2 / jnp.sqrt(jnp.maximum(jnp.sum(b2 * b2, -1, keepdims=True), 1e-30))
    m1 = jnp.cross(n1, b2n)
    yy = jnp.sum(m1 * n2, axis=-1)
    xx = jnp.sum(n1 * n2, axis=-1)
    return jnp.arctan2(yy, xx)


def distance_min_max(
    x: jnp.ndarray,
    mask_a: jnp.ndarray,
    mask_b: jnp.ndarray,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(min, max) min-image distance between two masked atom sets.

    mask_a/mask_b: (n,) 0/1 float masks. Dense all-pairs formulation with
    masked +inf/-inf padding — VPU-friendly, no dynamic shapes. For very
    large selections the tiled Pallas path in ops.rdf is used instead.
    """
    d = x[:, None, :] - x[None, :, :]
    d = min_image(d, basis, inv_basis)
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))
    pair_ok = (mask_a[:, None] * mask_b[None, :]) > 0
    big = jnp.asarray(jnp.inf, dist.dtype)
    dmin = jnp.min(jnp.where(pair_ok, dist, big))
    dmax = jnp.max(jnp.where(pair_ok, dist, -big))
    return dmin, dmax


def com_distance(
    x: jnp.ndarray,
    w_a: jnp.ndarray,
    w_b: jnp.ndarray,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> jnp.ndarray:
    """Min-image distance between the COMs of two weighted sets."""
    from viamd_tpu.ops.com import com

    ca = com(x, w_a, basis, inv_basis)
    cb = com(x, w_b, basis, inv_basis)
    d = min_image(ca - cb, basis, inv_basis)
    return jnp.sqrt(jnp.maximum(jnp.sum(d * d), 0.0))
