"""Periodic-boundary-condition primitives (jittable, vmappable).

TPU-native rebuild of mdlib's PBC kernel family in md_util.h
(reference capability surface: md_util_pbc / md_util_deperiodize_vec4 /
min-image, used by interpolation at /root/reference/src/viamd.cpp:1846-1895
and by COM at src/components/shapespace/shapespace.cpp:425).

Every function takes coordinates in Å plus a (3,3) row-vector cell basis and
its inverse, works for orthorhombic and triclinic cells, and is shaped for
the VPU: (n,3) float32 arrays, no data-dependent control flow. A basis of
zeros means "no PBC" and all functions degrade to identity/Euclidean math
(guarded with jnp.where, not Python branches, so one jitted graph serves
both periodic and aperiodic frames).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cellmul(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) row-vectors times a (...,3,3) basis, expanded elementwise.

    NOT a jnp.matmul: (n,3)@(3,3) contractions are pathological on the TPU
    backend (measured: minutes to compile, ~25 ms to run at n=100k — a
    padded-MXU dispatch for 9 multiplies), and the default matmul precision
    is bf16, which would quantize coordinates to ~8 bits. The explicit
    broadcast form is exact f32, fuses into neighboring elementwise ops,
    and costs 9 FMAs per row on the VPU.
    """
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [
            vx * m[..., 0, 0] + vy * m[..., 1, 0] + vz * m[..., 2, 0],
            vx * m[..., 0, 1] + vy * m[..., 1, 1] + vz * m[..., 2, 1],
            vx * m[..., 0, 2] + vy * m[..., 1, 2] + vz * m[..., 2, 2],
        ],
        axis=-1,
    )


def inv_basis_of(basis: jnp.ndarray) -> jnp.ndarray:
    """Jittable pseudo-inverse of a (possibly zero = aperiodic) cell basis.

    Returns zeros for a zero basis so downstream min-image math degrades to
    Euclidean identity. Works batched over leading axes.
    """
    det = jnp.linalg.det(basis)
    ok = (jnp.abs(det) > 1e-12)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=basis.dtype), basis.shape)
    inv = jnp.linalg.inv(jnp.where(ok, basis, eye))
    return jnp.where(ok, inv, jnp.zeros_like(basis))


def min_image(d: jnp.ndarray, basis: jnp.ndarray, inv_basis: jnp.ndarray) -> jnp.ndarray:
    """Minimum-image displacement vectors.

    d: (..., 3) raw displacements. Returns wrapped displacements.
    For a zero basis (no PBC) this is the identity.

    Triclinic note: the single-round trick (f -= round(f)) is exact for cells
    whose skew is below half the box (the common MD case, and the same
    assumption mdlib's SIMD path makes).
    """
    f = cellmul(d, inv_basis)  # fractional displacement
    f = f - jnp.round(f)
    return cellmul(f, basis) + d * (1.0 - _pbc_mask(basis))


def min_image_exact(
    d: jnp.ndarray, basis: jnp.ndarray, inv_basis: jnp.ndarray
) -> jnp.ndarray:
    """Exact minimum-image displacement for arbitrary (skewed) cells.

    The fast `min_image` single-round is exact for orthorhombic cells but can
    pick a non-minimal image for strongly skewed triclinic cells; this
    variant searches the 3³ lattice neighborhood of the rounded image (27
    candidates) and returns the true minimum-norm displacement. Use in
    triclinic-accuracy-critical paths; ~5× the arithmetic of `min_image`.
    """
    base = min_image(d, basis, inv_basis)
    import itertools

    best = base
    best_n = jnp.sum(base * base, axis=-1, keepdims=True)
    for s in itertools.product((-1.0, 0.0, 1.0), repeat=3):
        if s == (0.0, 0.0, 0.0):
            continue
        shift = cellmul(jnp.asarray(s, d.dtype), basis)
        cand = base + shift
        n = jnp.sum(cand * cand, axis=-1, keepdims=True)
        take = n < best_n
        best = jnp.where(take, cand, best)
        best_n = jnp.minimum(n, best_n)
    return best


def _pbc_mask(basis: jnp.ndarray) -> jnp.ndarray:
    """1.0 if the cell is periodic (any nonzero basis entry) else 0.0."""
    return (jnp.sum(jnp.abs(basis)) > 0).astype(basis.dtype)


def wrap(x: jnp.ndarray, basis: jnp.ndarray, inv_basis: jnp.ndarray) -> jnp.ndarray:
    """Wrap positions into the primary cell [0, 1) in fractional space."""
    f = cellmul(x, inv_basis)
    f = f - jnp.floor(f)
    return cellmul(f, basis) + x * (1.0 - _pbc_mask(basis))


def deperiodize(
    x: jnp.ndarray, ref: jnp.ndarray, basis: jnp.ndarray, inv_basis: jnp.ndarray
) -> jnp.ndarray:
    """Shift each position by whole lattice vectors to lie nearest `ref`.

    ref broadcasts against x ((3,) or (...,3)). This is the md_util
    deperiodize operation used to make molecules whole around their COM
    before covariance/shape analysis (shapespace.cpp:425-429).
    """
    return ref + min_image(x - ref, basis, inv_basis)


def unwrap_frames(
    coords: jnp.ndarray, basis: jnp.ndarray, inv_basis: jnp.ndarray
) -> jnp.ndarray:
    """Remove wrap jumps along the frame axis of (F, n, 3) trajectories.

    Frame f is shifted so each atom stays on the same periodic image as in
    frame f-1 (mdlib md_util unwrap capability). Implemented as a cumulative
    sum of per-step minimum-image increments — a scan-free formulation that
    XLA maps to an efficient prefix sum.
    """
    deltas = coords[1:] - coords[:-1]
    wrapped = min_image(deltas.reshape(-1, 3), basis, inv_basis).reshape(deltas.shape)
    out0 = coords[:1]
    return jnp.concatenate([out0, out0 + jnp.cumsum(wrapped, axis=0)], axis=0)


def pair_displacements(
    xa: jnp.ndarray, xb: jnp.ndarray, basis: jnp.ndarray, inv_basis: jnp.ndarray
) -> jnp.ndarray:
    """All-pairs min-image displacement tensor (na, nb, 3)."""
    d = xa[:, None, :] - xb[None, :, :]
    return min_image(d, basis, inv_basis)


def pair_distances(
    xa: jnp.ndarray, xb: jnp.ndarray, basis: jnp.ndarray, inv_basis: jnp.ndarray
) -> jnp.ndarray:
    """All-pairs min-image distances (na, nb).

    Computed via the fractional-space wrap then a dot, shaped so XLA keeps
    the (na, nb) tile resident; for large n use ops.rdf's tiled Pallas path.
    """
    d = pair_displacements(xa, xb, basis, inv_basis)
    return jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))


def recenter_frame(
    x: jnp.ndarray,
    sel_weights: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> jnp.ndarray:
    """Recenter a frame on a selection (recenter_* capability,
    /root/reference/src/viamd.cpp:2162-2313): translate so the selection's
    PBC-aware COM sits at the box center, then wrap whole molecules
    (segments) — atoms of one segment stay together across the boundary."""
    from viamd_tpu.ops.com import com, com_segments

    c = com(x, sel_weights, basis, inv_basis)
    center = 0.5 * (basis[0] + basis[1] + basis[2])
    m = _pbc_mask(basis)
    shifted = x + (center - c) * m
    # deperiodize every molecule about its own (wrapped) COM: puts each
    # segment inside the cell while keeping it whole
    seg_com = com_segments(
        shifted, jnp.ones(x.shape[0], x.dtype), segment_ids, num_segments,
        basis, inv_basis,
    )
    ref = seg_com[segment_ids]
    return ref + min_image(shifted - ref, basis, inv_basis)
