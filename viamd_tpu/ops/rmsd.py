"""Kabsch alignment + RMSD.

Rebuild of the `rmsd(...)` script builtin and the internal-reference-frame
alignment that SDF accumulation depends on (reference capability:
md_script.h rmsd procedure + vis.sdf.matrices world→reference transforms,
/root/reference/src/components/density_volume/density_volume.cpp:180-204).

Alignment uses the Kabsch algorithm on weighted, centered point sets. The
3×3 SVD runs batched under vmap; sign correction keeps rotations proper.
Reference coordinates are static per structure (frame 0 / topology coords),
which makes the resulting reference frames deterministic and temporally
stable — unlike raw PCA axes, whose eigenvector signs can flip frame to
frame.
"""

from __future__ import annotations

import jax.numpy as jnp

from viamd_tpu.ops.com import com
from viamd_tpu.ops.pbc import min_image


def kabsch_rotation(
    p: jnp.ndarray, q: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """Proper rotation R (3,3) minimizing Σ w‖R p − q‖²  (p, q centered)."""
    wv = w.astype(p.dtype)
    # explicit 9-component reduction (tiny-MN matmuls are pathological on
    # the TPU backend)
    H = jnp.stack(
        [
            jnp.stack([jnp.sum(wv * p[:, i] * q[:, j]) for j in range(3)])
            for i in range(3)
        ]
    )
    # closed-form proper rotation via the analytic 3×3 eigendecomposition
    # of HᵀH (no iterative SVD: jnp.linalg.svd's Jacobi loop dominated the
    # vmapped 64-structure align). H = U S Vᵀ ⇒ HᵀH = V S² Vᵀ; build U's
    # leading columns from H·v_k/s_k, complete both frames right-handed —
    # this IS the det-positive Kabsch branch, stable down to rank-2 H
    # (planar structures, e.g. water molecules).
    from viamd_tpu.ops.covariance import eigh3x3

    lam, V = eigh3x3(H.T @ H)  # descending; V columns = v_k
    s = jnp.sqrt(jnp.maximum(lam, 0.0))
    eps = jnp.asarray(1e-12, p.dtype)
    v0, v1 = V[:, 0], V[:, 1]
    ex = jnp.array([1.0, 0.0, 0.0], p.dtype)
    ey = jnp.array([0.0, 1.0, 0.0], p.dtype)

    def unit_or(u, alt):
        # normalize, falling back to `alt` when u degenerates — rank-
        # deficient H (collinear/2-atom structures) must still yield a
        # PROPER rotation (the SVD path's behavior); without the fallback
        # u collapses to zero and R is singular
        n = jnp.linalg.norm(u)
        safe = u / jnp.maximum(n, eps)
        return jnp.where(n > 1e-6, safe, alt)

    u0 = unit_or(H @ v0 / jnp.maximum(s[0], eps), ex)
    # any vector ⟂ u0 serves as the degenerate-direction fallback
    a = jnp.where(jnp.abs(u0[0]) < 0.9, ex, ey)
    alt1 = jnp.cross(u0, a)
    alt1 = alt1 / jnp.maximum(jnp.linalg.norm(alt1), eps)
    u1r = H @ v1 / jnp.maximum(s[1], eps)
    u1r = u1r - jnp.sum(u1r * u0) * u0
    u1 = unit_or(u1r, alt1)
    u2 = jnp.cross(u0, u1)
    v2 = jnp.cross(v0, v1)
    # R = Σ_k v_k u_kᵀ  (maximizes tr(R H), det(R) = +1 by construction)
    return (
        jnp.outer(v0, u0) + jnp.outer(v1, u1) + jnp.outer(v2, u2)
    )


def align_frame(
    x: jnp.ndarray,
    w: jnp.ndarray,
    ref_centered: jnp.ndarray,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (R, center): world→reference transform for a weighted set.

    x: (k,3) current coords of the structure's atoms; ref_centered: (k,3)
    reference coords already centered on their COM. The structure is made
    whole (deperiodized about its PBC-aware COM) before alignment.
    Apply as: x_ref = R @ (deperiodize(x) − center).
    """
    c = com(x, w, basis, inv_basis)
    p = min_image(x - c, basis, inv_basis)  # whole structure about its COM
    R = kabsch_rotation(p, ref_centered, w)
    return R, c


def rmsd(
    p: jnp.ndarray, q: jnp.ndarray, w: jnp.ndarray, align: bool = True
) -> jnp.ndarray:
    """Weighted RMSD between point sets (optionally after optimal alignment)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-30)
    wcol = w.astype(p.dtype)[:, None]
    pc = p - jnp.sum(p * wcol, 0) / wsum
    qc = q - jnp.sum(q * wcol, 0) / wsum
    if align:
        R = kabsch_rotation(pc, qc, w)
        pc = pc @ R.T
    d = pc - qc
    return jnp.sqrt(jnp.sum(jnp.sum(d * d, -1) * w) / wsum)
