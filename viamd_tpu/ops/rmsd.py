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
    U, _, Vt = jnp.linalg.svd(H, full_matrices=False)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], p.dtype)).at[2, 2].set(d)
    return Vt.T @ D @ U.T


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
