"""Ramachandran component: φ/ψ backbone-angle densities per residue class.

Rebuild of src/components/ramachandran/ramachandran.cpp (reference: per-frame
φ/ψ scatter into a 512² accumulation texture per residue class
(general/glycine/proline/pre-proline), separable gaussian blur
(boxes_for_gauss 3-box approximation, :333-368), upsampled display maps,
plus reference iso-density contours from embedded tables).

TPU formulation: angles for ALL frames batch through the jitted backbone
kernel (the trajectory-precompute task of viamd.cpp:487-525); density
accumulation is a 2D histogram via the scatter-free sorted segment-sum,
blurred with the separable gaussian of ops.density. The canonical
(favored / allowed) region maps ship as the same Top8000-derived tables
the reference embeds (rama_ref_densities.npz ← density_*.inl), with the
reference's iso thresholds for classification; trajectory-derived
contours (iso_levels) remain available for data-driven plots.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from viamd_tpu.app.events import EventType

ACC_RES = 128  # accumulation resolution (reference: 512² at display 1024²)
CLASSES = ("general", "glycine", "proline", "preproline")

# canonical iso thresholds (ramachandran.cpp:1071-1076): density ≥ favored
# ⇒ favored; ≥ allowed ⇒ allowed; else outlier. General uses the 99.95%
# contour, the other classes 99.80%; favored is the 98% contour for all.
REF_ISO_ALLOWED = (0.0005, 0.002, 0.002, 0.002)
REF_ISO_FAVORED = (0.02, 0.02, 0.02, 0.02)
_REF_KEYS = ("gen", "gly", "pro", "pre")
_ref_tables = None


def reference_density(res_class: str = "general") -> np.ndarray:
    """Canonical (180, 180) Top8000-derived reference density for a residue
    class — the embedded tables of density_gen.inl et al. (data extracted
    by tools/gen_rama_tables.py; consumed at ramachandran.cpp:1215-1262).
    Row = φ bin, column = ψ bin, both spanning [-180°, 180°)."""
    global _ref_tables
    if _ref_tables is None:
        import importlib.resources as res

        with res.files("viamd_tpu.components").joinpath(
            "rama_ref_densities.npz"
        ).open("rb") as f:
            data = np.load(f)
            _ref_tables = {k: data[k] for k in _REF_KEYS}
    return _ref_tables[_REF_KEYS[CLASSES.index(res_class)]]


def sample_reference_density(
    phi, psi, res_class: str = "general", degrees: bool = False
) -> np.ndarray:
    """Bilinear sample of the canonical density at (φ, ψ) (periodic)."""
    table = reference_density(res_class)
    phi = np.asarray(phi, np.float64)
    psi = np.asarray(psi, np.float64)
    if not degrees:
        phi, psi = np.degrees(phi), np.degrees(psi)
    dim = table.shape[0]
    # table layout: row (v) = φ, column (u) = ψ
    u = (psi + 180.0) / 360.0 * dim - 0.5
    v = (phi + 180.0) / 360.0 * dim - 0.5
    u0 = np.floor(u).astype(np.int64)
    v0 = np.floor(v).astype(np.int64)
    fu, fv = u - u0, v - v0
    out = np.zeros(np.broadcast(phi, psi).shape, np.float64)
    for dv, wv in ((0, 1.0 - fv), (1, fv)):
        for du, wu in ((0, 1.0 - fu), (1, fu)):
            out += wv * wu * table[(v0 + dv) % dim, (u0 + du) % dim]
    return out


def classify_reference(
    phi, psi, res_class: str = "general", degrees: bool = False
) -> np.ndarray:
    """0 = outlier, 1 = allowed, 2 = favored vs the canonical contours."""
    k = CLASSES.index(res_class)
    d = sample_reference_density(phi, psi, res_class, degrees=degrees)
    return (
        (d >= REF_ISO_ALLOWED[k]).astype(np.int8)
        + (d >= REF_ISO_FAVORED[k]).astype(np.int8)
    )


class RamachandranComponent:
    name = "ramachandran"

    def __init__(self, session):
        self.session = session
        self._angles: Optional[tuple] = None  # (phi (F,nbb), psi (F,nbb))
        self._class_of: Optional[np.ndarray] = None  # (nbb,) class index
        session.events.subscribe(EventType.TRAJECTORY_INIT, self._invalidate)
        session.events.subscribe(EventType.SYSTEM_INIT, self._invalidate)

    def _invalidate(self, _ev=None):
        self._angles = None
        self._class_of = None

    # -- residue classes -----------------------------------------------------
    def _classify(self):
        sys = self.session.system
        bb = sys.backbone
        cls = np.zeros(bb.count, np.int32)
        names = [sys.res_names[sys.res_name_id[r]].upper() for r in bb.res_idx]
        for k, nm in enumerate(names):
            if nm == "GLY":
                cls[k] = 1
            elif nm == "PRO":
                cls[k] = 2
            elif k + 1 < len(names) and names[k + 1] == "PRO":
                cls[k] = 3
        self._class_of = cls

    # -- angles over the whole trajectory ------------------------------------
    def compute_angles(self, frame_range=None) -> tuple[np.ndarray, np.ndarray]:
        """(φ, ψ) in radians, shape (F, nbb) — the backbone precompute."""
        session = self.session
        sys = session.system
        if sys is None or sys.backbone is None:
            raise ValueError("no protein backbone in the loaded system")
        import jax.numpy as jnp

        from viamd_tpu.ops import backbone as bb_ops
        from viamd_tpu.ops.pbc import inv_basis_of

        bb = sys.backbone
        vp, vn = bb_ops.make_backbone_validity(bb.ranges, bb.count)
        traj = session.trajectory
        if traj is None:
            coords = sys.coords()[None]
            cells = np.asarray(sys.cell.basis)[None]
        else:
            idx = (
                list(frame_range)
                if frame_range is not None
                else list(range(traj.num_frames))
            )
            tasks = getattr(session, "tasks", None)
            if tasks is not None and len(idx) > 64:
                # pool-parallel frame I/O: the trajectory-precompute range
                # task of viamd.cpp:487-525 partitioned across workers
                # (task_system.cpp:75). Reader slots are per-call, so chunked
                # load_frames calls are safe concurrently.
                h = tasks.enqueue_range(
                    "Rama: load frames",
                    lambda b, e, t: traj.load_frames(idx[b:e]),
                    total=len(idx), grain=max(64, len(idx) // 8),
                )
                parts = h.wait()
                coords = np.concatenate([p[0] for p in parts], axis=0)
                cells = np.concatenate([p[1] for p in parts], axis=0)
            else:
                coords, cells = traj.load_frames(idx)
        phi, psi = bb_ops.backbone_angles_frames(
            jnp.asarray(coords),
            jnp.asarray(bb.atom_n), jnp.asarray(bb.atom_ca),
            jnp.asarray(bb.atom_c),
            jnp.asarray(vp), jnp.asarray(vn),
            jnp.asarray(cells[0]),
            inv_basis_of(jnp.asarray(cells[0])),
        )
        self._angles = (np.asarray(phi), np.asarray(psi))
        if self._class_of is None:
            self._classify()
        return self._angles

    def angles(self):
        if self._angles is None:
            self.compute_angles()
        return self._angles

    # -- density maps --------------------------------------------------------
    def density(
        self, res_class: str = "general", blur_sigma: float = 1.5
    ) -> np.ndarray:
        """(ACC_RES, ACC_RES) φ/ψ density for a residue class — the
        rama_rep_compute_density scatter + gaussian blur (:1277,:368)."""
        phi, psi = self.angles()
        cls = CLASSES.index(res_class)
        sel = self._class_of == cls
        # valid angles only (unset ends are exactly 0,0)
        p = phi[:, sel].reshape(-1)
        s = psi[:, sel].reshape(-1)
        ok = (p != 0.0) | (s != 0.0)
        p, s = p[ok], s[ok]
        if p.size == 0:
            return np.zeros((ACC_RES, ACC_RES), np.float32)
        ix = np.clip(
            ((p + np.pi) / (2 * np.pi) * ACC_RES).astype(np.int64), 0, ACC_RES - 1
        )
        iy = np.clip(
            ((s + np.pi) / (2 * np.pi) * ACC_RES).astype(np.int64), 0, ACC_RES - 1
        )
        grid = np.bincount(
            iy * ACC_RES + ix, minlength=ACC_RES * ACC_RES
        ).reshape(ACC_RES, ACC_RES).astype(np.float32)
        if blur_sigma > 0:
            import jax.numpy as jnp

            from viamd_tpu.ops.density import gaussian_blur_3d

            grid = np.asarray(gaussian_blur_3d(jnp.asarray(grid), blur_sigma))
        tot = grid.sum()
        return grid / tot if tot > 0 else grid

    def iso_levels(
        self, density: np.ndarray, fractions=(0.85, 0.5, 0.15)
    ) -> list[float]:
        """Density levels enclosing the given probability mass (the
        iso-contour lines of the reference plots)."""
        flat = np.sort(density.reshape(-1))[::-1]
        csum = np.cumsum(flat)
        total = csum[-1] if csum.size else 0.0
        out = []
        for f in fractions:
            k = np.searchsorted(csum, f * total)
            out.append(float(flat[min(k, flat.size - 1)]))
        return out


    def classification(self, frame: int = 0) -> np.ndarray:
        """Per-backbone-residue canonical classification at `frame`:
        0 = outlier, 1 = allowed, 2 = favored, -1 = undefined angles.
        Uses each residue's own class table (general/gly/pro/pre-pro) —
        the coloring the reference derives from its embedded densities."""
        phi, psi = self.angles()
        if self._class_of is None:
            self._classify()
        phi, psi = phi[frame], psi[frame]
        out = np.full(phi.shape, -1, np.int8)
        defined = (phi != 0.0) | (psi != 0.0)
        for k, name in enumerate(CLASSES):
            sel = (self._class_of == k) & defined
            if sel.any():
                out[sel] = classify_reference(phi[sel], psi[sel], name)
        return out

    def select_in_plot(
        self, phi_range, psi_range, frame: int | None = None,
        degrees: bool = True,
    ):
        """The plot's interactive selection (reference: click/drag in the
        Ramachandran window selects the residues whose (φ, ψ) fall in the
        box, ramachandran.cpp). Returns (residue_indices, atom_bitfield)
        for backbone residues inside [phi_lo, phi_hi] × [psi_lo, psi_hi]
        at `frame` (None → all frames, a residue matches if ANY frame
        does). Ranges in degrees by default; wrap-around ranges (lo > hi)
        are honored."""
        from viamd_tpu.core.bitfield import Bitfield

        phi, psi = self.angles()
        if frame is not None:
            phi, psi = phi[frame : frame + 1], psi[frame : frame + 1]
        if degrees:
            phi = np.degrees(phi)
            psi = np.degrees(psi)

        def in_range(a, lo, hi):
            return (a >= lo) & (a <= hi) if lo <= hi else (a >= lo) | (a <= hi)

        ok = (
            in_range(phi, *phi_range)
            & in_range(psi, *psi_range)
            & np.isfinite(phi)
            & np.isfinite(psi)
        ).any(axis=0)
        sys = self.session.system
        bb = sys.backbone
        res = np.asarray(bb.res_idx)[ok]
        sel = np.isin(np.asarray(sys.atom_res_idx), res)
        return res, Bitfield.from_bools(sel)
