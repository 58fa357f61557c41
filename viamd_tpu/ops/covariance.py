"""3×3 covariance / gyration analysis: analytic eigen, shape weights, PCA.

Rebuild of mdlib's mat3_covariance_matrix_vec4 + mat3_eigen
(used at /root/reference/src/main.cpp:1100-1103 for optimal-view PCA) and
md_util_shape_weights (src/components/shapespace/shapespace.cpp:429).

The eigensolver is the closed-form trigonometric method for symmetric 3×3
matrices — branch-free, batched, float32-safe — so thousands of per-structure
eigendecompositions per frame run as pure VPU arithmetic instead of an
iterative LAPACK-style loop. Eigenvalues are returned descending
(λ0 ≥ λ1 ≥ λ2), matching mat3_eigen's ordering contract that the shape-space
barycentric weights depend on.
"""

from __future__ import annotations

import jax.numpy as jnp

from viamd_tpu.ops.com import com
from viamd_tpu.ops.pbc import min_image


def covariance_matrix(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    center: jnp.ndarray,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> jnp.ndarray:
    """Weighted 3×3 covariance of min-image displacements about `center`."""
    w = weights.astype(x.dtype)
    d = min_image(x - center, basis, inv_basis)
    wsum = jnp.maximum(jnp.sum(w), 1e-30)
    # explicit 6-component reduction: a (3,n)@(n,3) matmul is pathological
    # on the TPU backend (tiny-MN MXU dispatch, ~25 ms at n=1M)
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    cxx = jnp.sum(w * dx * dx)
    cyy = jnp.sum(w * dy * dy)
    czz = jnp.sum(w * dz * dz)
    cxy = jnp.sum(w * dx * dy)
    cxz = jnp.sum(w * dx * dz)
    cyz = jnp.sum(w * dy * dz)
    return (
        jnp.stack(
            [
                jnp.stack([cxx, cxy, cxz]),
                jnp.stack([cxy, cyy, cyz]),
                jnp.stack([cxz, cyz, czz]),
            ]
        )
        / wsum
    )


def eigh3x3(A: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Analytic eigendecomposition of symmetric 3×3 matrices.

    A: (..., 3, 3) symmetric. Returns (eigvals (...,3) DESCENDING,
    eigvecs (...,3,3) with eigvecs[..., :, k] the k-th eigenvector).

    Method: trigonometric solution of the characteristic cubic
    (Smith's algorithm), then eigenvectors via cross products of (A - λI)
    rows with degenerate-case fallbacks — fully branch-free.
    """
    dtype = A.dtype
    q = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None] / 3.0
    B = A - q * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = jnp.linalg.det(B)
    # denominator guard must stay in normal-f32 range: subnormals (≈1e-30)
    # flush to zero on some backends → 0/0 NaN for scalar matrices
    r = detB / jnp.maximum(2.0 * p**3, 1e-30)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    q0 = q[..., 0, 0]
    l0 = q0 + 2.0 * p * jnp.cos(phi)
    l2 = q0 + 2.0 * p * jnp.cos(phi + 2.0943951023931953)  # + 2π/3
    l1 = 3.0 * q0 - l0 - l2
    vals = jnp.stack([l0, l1, l2], axis=-1)  # descending by construction

    # eigenvectors: v_k ∝ cross of two rows of (A - λ_k I)
    def eigvec(lam):
        M = A - lam[..., None, None] * jnp.eye(3, dtype=dtype)
        r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, -1, keepdims=True)
        n02 = jnp.sum(c02 * c02, -1, keepdims=True)
        n12 = jnp.sum(c12 * c12, -1, keepdims=True)
        # pick the largest cross product (most numerically stable)
        best = jnp.where(
            n01 >= jnp.maximum(n02, n12),
            c01,
            jnp.where(n02 >= n12, c02, c12),
        )
        nrm = jnp.sqrt(jnp.maximum(jnp.sum(best * best, -1, keepdims=True), 1e-30))
        v = best / nrm
        # fully degenerate (spherical) fallback: unit x
        degen = (nrm < 1e-12).astype(dtype)
        ex = jnp.zeros_like(v).at[..., 0].set(1.0)
        return v * (1.0 - degen) + ex * degen

    v0 = eigvec(l0)
    v2 = eigvec(l2)
    # orthogonalize: v2 ⟂ v0; v1 completes the right-handed frame
    v2 = v2 - jnp.sum(v2 * v0, -1, keepdims=True) * v0
    n2 = jnp.sqrt(jnp.maximum(jnp.sum(v2 * v2, -1, keepdims=True), 1e-30))
    is_bad = (n2 < 1e-12).astype(dtype)
    # if v2 collapsed onto v0 (degenerate λ0≈λ2 ⇒ sphere), pick any ⟂ axis
    alt = jnp.cross(v0, jnp.zeros_like(v0).at[..., 2].set(1.0))
    altn = jnp.sqrt(jnp.maximum(jnp.sum(alt * alt, -1, keepdims=True), 1e-30))
    alt2 = jnp.cross(v0, jnp.zeros_like(v0).at[..., 1].set(1.0))
    alt2n = jnp.sqrt(jnp.maximum(jnp.sum(alt2 * alt2, -1, keepdims=True), 1e-30))
    alt = jnp.where(altn > 0.1, alt / altn, alt2 / alt2n)
    v2 = v2 / jnp.where(n2 < 1e-12, 1.0, n2) * (1.0 - is_bad) + alt * is_bad
    v1 = jnp.cross(v2, v0)
    vecs = jnp.stack([v0, v1, v2], axis=-1)  # columns = eigenvectors
    return vals, vecs


def shape_weights(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> jnp.ndarray:
    """(linear, planar, isotropic) barycentric shape weights of a weighted set.

    Capability mirror of md_util_shape_weights (shapespace.cpp:429):
    from the descending eigenvalues λ0 ≥ λ1 ≥ λ2 of the gyration tensor,
      linear   = (λ0 − λ1) / λ0
      planar   = (λ1 − λ2) / λ0
      isotropic=  λ2       / λ0
    which sum to 1 (barycentric coordinates of the shape-space triangle).
    """
    c = com(x, weights, basis, inv_basis)
    C = covariance_matrix(x, weights, c, basis, inv_basis)
    vals, _ = eigh3x3(C)
    l0 = jnp.maximum(vals[..., 0], 1e-30)
    lin = (vals[..., 0] - vals[..., 1]) / l0
    pla = (vals[..., 1] - vals[..., 2]) / l0
    iso = vals[..., 2] / l0
    return jnp.stack([lin, pla, iso], axis=-1)


def principal_axes(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(com, eigvals desc, eigvecs cols) of the weighted gyration tensor.

    The building block for internal-reference-frame (SDF) alignment and the
    optimal-view camera fit (main.cpp:1100-1103).
    """
    c = com(x, weights, basis, inv_basis)
    C = covariance_matrix(x, weights, c, basis, inv_basis)
    vals, vecs = eigh3x3(C)
    return c, vals, vecs


def gyration_radius(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> jnp.ndarray:
    c = com(x, weights, basis, inv_basis)
    C = covariance_matrix(x, weights, c, basis, inv_basis)
    return jnp.sqrt(jnp.maximum(jnp.trace(C), 0.0))
