"""Protein backbone analysis: φ/ψ dihedrals + secondary-structure inference.

Rebuild of md_util_backbone_angles_compute +
md_util_backbone_secondary_structure_infer (reference capability: the
trajectory-precompute pool task at /root/reference/src/viamd.cpp:487-525
computes per-frame backbone angles and secondary structure for the whole
trajectory; the Ramachandran component consumes the angles,
src/components/ramachandran/ramachandran.cpp:1277).

Inputs are the static backbone index arrays from core.system.Backbone;
everything is jittable and vmapped over frames. Secondary structure is
returned as per-residue (coil, helix, sheet) weights in [0,1] — the soft
classification the cartoon/ribbon renderer blends, computed from φ/ψ
ellipse membership, plus the majority-vote temporal denoiser that mirrors
secondary_structure_render_denoise (src/viamd.cpp:346-414).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from viamd_tpu.ops.geometry import dihedral


def backbone_angles(
    x: jnp.ndarray,  # (n, 3)
    atom_n: jnp.ndarray,  # (nbb,) int32
    atom_ca: jnp.ndarray,
    atom_c: jnp.ndarray,
    valid_prev: jnp.ndarray,  # (nbb,) bool: has i-1 in same chain range
    valid_next: jnp.ndarray,  # (nbb,) bool
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(φ, ψ) in radians per backbone residue; invalid ends → 0.

    φ_i = dihedral(C_{i-1}, N_i, CA_i, C_i)
    ψ_i = dihedral(N_i, CA_i, C_i, N_{i+1})
    """
    c_prev = jnp.roll(atom_c, 1)
    n_next = jnp.roll(atom_n, -1)
    phi = dihedral(x, c_prev, atom_n, atom_ca, atom_c, basis, inv_basis)
    psi = dihedral(x, atom_n, atom_ca, atom_c, n_next, basis, inv_basis)
    phi = jnp.where(valid_prev, phi, 0.0)
    psi = jnp.where(valid_next, psi, 0.0)
    return phi, psi


def make_backbone_validity(ranges, nbb: int):
    """Host-side: (valid_prev, valid_next) bool arrays from Backbone.ranges."""
    import numpy as np

    vp = np.zeros(nbb, bool)
    vn = np.zeros(nbb, bool)
    for beg, end in np.asarray(ranges):
        vp[beg + 1 : end] = True
        vn[beg : end - 1] = True
    return vp, vn


# (φ0, ψ0, rφ, rψ) ellipse zones in degrees.
_HELIX_ZONE = (-80.0, -40.0, 50.0, 50.0)  # α-helix basin
_SHEET_ZONE = (-110.0, 130.0, 70.0, 60.0)  # β-sheet basin (ψ wraps ±180)


def _zone_weight(phi_deg, psi_deg, zone):
    p0, s0, rp, rs = zone
    dphi = phi_deg - p0
    dpsi = (psi_deg - s0 + 180.0) % 360.0 - 180.0  # wrap to (-180, 180]
    r2 = (dphi / rp) ** 2 + (dpsi / rs) ** 2
    return jnp.clip(1.0 - r2, 0.0, 1.0)


def secondary_structure(
    phi: jnp.ndarray, psi: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """(nbb, 3) soft (coil, helix, sheet) weights from φ/ψ (radians)."""
    rad2deg = 57.29577951308232
    phi_d = phi * rad2deg
    psi_d = psi * rad2deg
    h = _zone_weight(phi_d, psi_d, _HELIX_ZONE)
    s = _zone_weight(phi_d, psi_d, _SHEET_ZONE)
    h = jnp.where(valid, h, 0.0)
    s = jnp.where(valid, s, 0.0)
    c = jnp.clip(1.0 - h - s, 0.0, 1.0)
    tot = jnp.maximum(c + h + s, 1e-30)
    return jnp.stack([c / tot, h / tot, s / tot], axis=-1)


def ss_denoise_temporal(ss_frames: jnp.ndarray, window: int = 5) -> jnp.ndarray:
    """Majority-vote (box-filter) temporal smoothing over the frame axis.

    ss_frames: (F, nbb, 3). Mirrors secondary_structure_render_denoise
    (src/viamd.cpp:346-414): flickering single-frame classifications are
    suppressed by averaging class weights over a centered window.
    """
    F = ss_frames.shape[0]
    r = window // 2
    pad = jnp.pad(ss_frames, ((r, r), (0, 0), (0, 0)), mode="edge")
    csum = jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(pad[:1]), pad], axis=0), axis=0
    )
    out = (csum[window:] - csum[:-window]) / window
    return out[:F]


def backbone_angles_frames(
    coords: jnp.ndarray,  # (F, n, 3)
    atom_n, atom_ca, atom_c,
    valid_prev, valid_next,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
):
    """vmapped (φ, ψ) over a frame batch → ((F, nbb), (F, nbb))."""
    if basis.ndim == 2:
        basis = jnp.broadcast_to(basis, (coords.shape[0], 3, 3))
        inv_basis = jnp.broadcast_to(inv_basis, (coords.shape[0], 3, 3))
    return jax.vmap(
        lambda x, b, ib: backbone_angles(
            x, atom_n, atom_ca, atom_c, valid_prev, valid_next, b, ib
        )
    )(coords, basis, inv_basis)
