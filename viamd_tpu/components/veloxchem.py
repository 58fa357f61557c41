"""VeloxChem component: QM orbital / density grids + rendering.

Rebuild of src/components/veloxchem/veloxchem.cpp (reference: parses
VeloxChem HDF5 (:1312), evaluates MO/NTO/electron-density grids through
md_gto's CPU/GL/Vulkan paths (:1044-1108), renders them as volumes, and
answers EvalElectronicStructure events). The Vulkan backend's role is
played by the TPU itself: grids come from ops.gto (MXU-contracted
primitive matrices) and render through the volume ray-marcher.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from viamd_tpu.io.vlx import BOHR_PER_ANGSTROM, QMData

# Spectrum unit constants (reference veloxchem.cpp:43-52)
HARTREE_TO_EV = 27.2114079527
EV_TO_HARTREE = 1.0 / HARTREE_TO_EV
HARTREE_TO_KJ_PER_MOL = 2625.4996394799
OSCILLATOR_STRENGTH_TO_EPSILON = 1054.9516366171872
ROTATORY_STRENGTH_TO_DELTA_EPSILON = 0.01386075702557538652
AU_TO_GM = 40479.02797814119
_NM_AU = 45.56331418628337
_CM_INV_PER_AU = 219479.86946633097


def convert_value_from_au(value, unit: str):
    """x-axis unit conversion from Hartree (veloxchem.cpp:2631-2645):
    unit ∈ {"au", "ev", "nm", "cm-1"}. nm is an involution (45.563…/x)."""
    v = np.asarray(value, np.float64)
    u = unit.lower()
    if u in ("ev",):
        return v * HARTREE_TO_EV
    if u in ("nm",):
        return _NM_AU / v
    if u in ("cm-1", "cm⁻¹", "cm_inverse", "wavenumber"):
        return v * _CM_INV_PER_AU
    if u in ("au", "hartree"):
        return v
    raise ValueError(f"unknown x unit {unit!r}")


def convert_value_to_au(value, unit: str):
    """Inverse of convert_value_from_au (veloxchem.cpp:2647-2661)."""
    v = np.asarray(value, np.float64)
    u = unit.lower()
    if u in ("ev",):
        return v * EV_TO_HARTREE
    if u in ("nm",):
        return _NM_AU / v
    if u in ("cm-1", "cm⁻¹", "cm_inverse", "wavenumber"):
        return v / _CM_INV_PER_AU
    if u in ("au", "hartree"):
        return v
    raise ValueError(f"unknown x unit {unit!r}")


def _lorentzian_base(x, px, py, fwhm):
    """Non-normalized Lorentzian peak sum (veloxchem.cpp:2700-2710)."""
    g = fwhm * 0.5
    d = x[:, None] - px[None, :]
    return ((py[None, :] * g) / (d * d + g * g)).sum(axis=1)


def _gaussian_base(x, px, py, fwhm):
    sg = fwhm * 0.21233045007200476068  # sigma_from_fwhm
    d = x[:, None] - px[None, :]
    return (py[None, :] * np.exp(-0.5 * (d / sg) ** 2)).sum(axis=1)


class VeloxchemComponent:
    name = "veloxchem"

    def __init__(self, session):
        self.session = session
        self.qm: Optional[QMData] = None
        self._rep_info = None  # representation_info cache (per QMData)
        self._rep_info_qm = None

    def load(self, path_or_data) -> QMData:
        """Attach QM data (the ViamdLoadData .h5 supplemental path)."""
        if isinstance(path_or_data, QMData):
            self.qm = path_or_data
        else:
            from viamd_tpu.io.vlx import load_vlx_h5

            self.qm = load_vlx_h5(path_or_data)
        # explicit cache invalidation (the identity-keyed rep cache must
        # never serve a stale QMData)
        self._rep_info, self._rep_info_qm = None, None
        return self.qm

    def _grid_geometry(self, dims: int, padding_bohr: float = 6.0):
        qm = self.qm
        lo = qm.atom_coords.min(axis=0) - padding_bohr
        hi = qm.atom_coords.max(axis=0) + padding_bohr
        vox = (hi - lo) / dims
        return lo.astype(np.float32), vox.astype(np.float32)

    # volume-resolution presets: samples per Å (Low/Mid/High,
    # veloxchem.cpp:127-133)
    RESOLUTION_SAMPLES_PER_ANG = {"low": 4.0, "mid": 8.0, "high": 16.0}

    def obb_geometry(
        self, samples_per_ang: float = 8.0, use_obb: bool = True,
        padding_bohr: float = 6.0,
    ):
        """Export grid geometry, optionally fit to the molecule's
        principal axes (the Use-OBB option, veloxchem.cpp:838-842
        mat3_PCA + calculate_bounds w/ 6 Bohr padding:185, dims =
        clamp(align8(extent·samples), 8, 512):225-229).

        Returns (orientation (3,3) columns = grid axes, origin_grid (3,)
        Bohr in the GRID frame, voxel (3,) Bohr, dims (3,) ints)."""
        qm = self.qm
        if qm is None:
            raise ValueError("no QM data loaded")
        xyz = np.asarray(qm.atom_coords, np.float64)
        if use_obb and len(xyz) > 2:
            c = xyz - xyz.mean(axis=0)
            cov = c.T @ c / len(xyz)
            w, V = np.linalg.eigh(cov)
            R = V[:, ::-1]  # principal axis first (descending variance)
            if np.linalg.det(R) < 0:
                R[:, 2] = -R[:, 2]  # right-handed (mat3_orthonormalize)
        else:
            R = np.eye(3)
        proj = xyz @ R  # coordinates in the grid frame (Rᵀ x, row form)
        lo = proj.min(axis=0) - padding_bohr
        hi = proj.max(axis=0) + padding_bohr
        ext = hi - lo
        spb = samples_per_ang * 0.52917721  # samples per Bohr
        dims = np.clip(
            ((ext * spb).astype(int) + 7) // 8 * 8, 8, 512
        ).astype(int)
        voxel = ext / dims
        return R, lo, voxel, dims

    def export_volume(
        self,
        path: str,
        source: str = "mo",
        fmt: str = "cube",
        mo: int | None = None,
        state: int = 0,
        nto_lambda: int = 0,
        nto_component: str = "particle",
        resolution: str | float = "mid",
        use_obb: bool = True,
        use_magnitude: bool = False,
    ):
        """The VeloxChem Export window (veloxchem.cpp:5361-5650): evaluate
        an electronic-structure source on an (optionally OBB-fitted) grid
        and write it as Gaussian `cube` or `mhd` (raw + MetaImage header +
        xyz atoms).

        `source`: "mo" (default HOMO; |ψ| with use_magnitude) | "nto"
        (hole/particle lambda channel) | "transition_density" |
        "attachment" | "detachment" | "electron_density".
        `resolution`: "low"/"mid"/"high" (4/8/16 samples per Å) or a
        number. Returns the written path(s)."""
        import jax.numpy as jnp

        from viamd_tpu.ops.gto import (
            density_grid, eval_gto_grid, transition_density_grid,
        )

        qm = self.qm
        if qm is None:
            raise ValueError("no QM data loaded")
        spa = (self.RESOLUTION_SAMPLES_PER_ANG[resolution]
               if isinstance(resolution, str) else float(resolution))
        R, lo, voxel, dims = self.obb_geometry(spa, use_obb)
        dims_t = tuple(int(d) for d in dims)
        Rj = jnp.asarray(R, jnp.float32) if use_obb else None
        oj = jnp.asarray(lo, jnp.float32)
        vj = jnp.asarray(voxel, jnp.float32)
        if source == "mo":
            mo_idx = qm.n_occupied - 1 if mo is None else int(mo)
            centers, exps, cf, lmn = qm.primitives_for_orbital(mo_idx)
            g = eval_gto_grid(
                jnp.asarray(centers), jnp.asarray(exps), jnp.asarray(cf),
                jnp.asarray(lmn), oj, vj, dims_t, orientation=Rj,
            )
        elif source == "nto":
            lam, holes, parts = self.ntos(state)
            vecs = parts if nto_component == "particle" else holes
            centers, exps, C, lmn = qm.primitives_for_vectors(
                vecs[:, nto_lambda : nto_lambda + 1]
            )
            g = eval_gto_grid(
                jnp.asarray(centers), jnp.asarray(exps),
                jnp.asarray(C[:, 0]), jnp.asarray(lmn), oj, vj, dims_t,
                orientation=Rj,
            )
        elif source == "transition_density":
            exc = self._excited()
            Co, Cv = self._split_occ_virt()
            centers, exps, Cop, lmn = qm.primitives_for_vectors(Co)
            _, _, Cvp, _ = qm.primitives_for_vectors(Cv)
            g = transition_density_grid(
                jnp.asarray(centers), jnp.asarray(exps), jnp.asarray(Cop),
                jnp.asarray(Cvp), exc.transition_dms[state],
                jnp.asarray(lmn), oj, vj, dims_t, orientation=Rj,
            )
        elif source in ("attachment", "detachment"):
            lam, holes, parts = self.ntos(state)
            vecs = parts if source == "attachment" else holes
            centers, exps, C, lmn = qm.primitives_for_vectors(vecs)
            g = density_grid(
                jnp.asarray(centers), jnp.asarray(exps), jnp.asarray(C),
                jnp.asarray(lmn), oj, vj, dims_t,
                occupations=np.asarray(lam, np.float32),
                orientation=Rj,
            )
        elif source == "electron_density":
            centers, exps, C, lmn = qm.primitives_all()
            if qm.mo_occupations is not None:
                occ = np.asarray(qm.mo_occupations, np.float32)
            else:
                # C spans all nmo columns — occupy only the first
                # n_occupied (ΣZ//2 fallback), not every virtual.
                n_occ = min(qm.n_occupied, C.shape[1])
                C = C[:, :n_occ]
                occ = np.full(n_occ, 2.0, np.float32)
            g = density_grid(
                jnp.asarray(centers), jnp.asarray(exps), jnp.asarray(C),
                jnp.asarray(lmn), oj, vj, dims_t, occupations=occ,
                orientation=Rj,
            )
        else:
            raise ValueError(f"unknown export source {source!r}")
        g = np.asarray(g)
        if use_magnitude:
            g = np.abs(g)  # md_gto op |ψ| (gto_op_from_use_magnitude)
        # world-space geometry (Å) for the writers
        B2A = 1.0 / BOHR_PER_ANGSTROM
        origin_world = (R @ lo) * B2A
        axes = (R * voxel[None, :]).T * B2A  # row i = voxel vector of axis i
        z = np.asarray(qm.atom_numbers)
        axyz = np.asarray(qm.atom_coords, np.float64) * B2A
        from viamd_tpu.app import export as ex

        if fmt == "cube":
            ex.export_cube(
                path, g, origin_world, voxel * B2A, atoms_z=z,
                atoms_xyz=axyz, axes=axes,
            )
            return [path]
        if fmt in ("mhd", "raw"):
            return ex.export_mhd(
                path, g, origin_world, voxel * B2A, orientation=R,
                atoms_z=z, atoms_xyz=axyz,
            )
        raise ValueError(f"unknown export format {fmt!r}")

    def orbital_grid(self, mo: int, dims: int = 64) -> tuple:
        """ψ_mo on a voxel grid → (grid (D,D,D), origin Bohr, voxel Bohr)."""
        if self.qm is None:
            raise ValueError("no QM data loaded")
        import jax.numpy as jnp

        from viamd_tpu.ops.gto import eval_gto_grid

        centers, exps, coeffs, lmn = self.qm.primitives_for_orbital(mo)
        origin, vox = self._grid_geometry(dims)
        grid = eval_gto_grid(
            jnp.asarray(centers), jnp.asarray(exps), jnp.asarray(coeffs),
            jnp.asarray(lmn), jnp.asarray(origin), jnp.asarray(vox),
            (dims, dims, dims),
        )
        return np.asarray(grid), origin, vox

    def density_grid(
        self, dims: int = 64, n_occupied: Optional[int] = None,
        spin: str = "total",
    ):
        """Electron density over occupied orbitals.

        `spin` (veloxchem.cpp:1855-1885 ElectronicStructureSpin):
        "total" = α+β (restricted checkpoints store both spins in the
        occupations already), "alpha"/"beta" = one spin set (restricted →
        half the stored occupations), "difference" = α−β spin density
        (identically 0 for restricted)."""
        if self.qm is None:
            raise ValueError("no QM data loaded")
        qm = self.qm

        def one(spin_set: str, occ_scale: float = 1.0):
            import jax.numpy as jnp

            from viamd_tpu.ops.gto import density_grid

            centers, exps, C, lmn = qm.primitives_all(spin_set)
            occ = qm.mo_occupations
            if spin_set == "beta" and qm.beta_occupations is not None:
                occ = qm.beta_occupations
            if n_occupied is not None:
                C = C[:, :n_occupied]
            if occ is not None:
                occ = np.asarray(occ[: C.shape[1]], np.float32) * occ_scale
            else:
                # no stored occupations: occupy only the first n_occupied
                # columns (ΣZ//2 fallback) at 2·scale — C spans ALL nmo
                # columns here, and a blanket fill would put electrons in
                # every virtual orbital.
                n_occ = min(qm.n_occupied, C.shape[1])
                C = C[:, :n_occ]
                occ = np.full(n_occ, 2.0 * occ_scale, np.float32)
            origin, vox = self._grid_geometry(dims)
            g = density_grid(
                jnp.asarray(centers), jnp.asarray(exps), jnp.asarray(C),
                jnp.asarray(lmn), jnp.asarray(origin), jnp.asarray(vox),
                (dims, dims, dims), occupations=occ,
            )
            return np.asarray(g), origin, vox

        unrestricted = qm.beta_coeffs is not None
        if spin == "total":
            ga, origin, vox = one("alpha")
            if unrestricted:
                gb, _, _ = one("beta")
                ga = ga + gb
            return ga, origin, vox
        if spin == "alpha":
            return one("alpha", occ_scale=1.0 if unrestricted else 0.5)
        if spin == "beta":
            return one("beta", occ_scale=1.0 if unrestricted else 0.5)
        if spin == "difference":
            sa = 1.0 if unrestricted else 0.5
            ga, origin, vox = one("alpha", occ_scale=sa)
            gb, _, _ = one("beta", occ_scale=sa)
            return ga - gb, origin, vox
        raise ValueError(f"unknown spin {spin!r}")

    def orbital_scene_volume(
        self, mo: int | None = None, dims: int = 48, iso: float = 0.05,
    ) -> dict:
        """An orbital volume ready for in-scene compositing —
        `Session.render(volume=vlx.orbital_scene_volume(...))` renders the
        ± isosurfaces over the molecule with the scene-depth-clamped
        march, the reference's ElectronicStructure representations on
        RenderTransparent (veloxchem.cpp:617-700). The model matrix places
        the Bohr grid in the session's Å world."""
        if self.qm is None:
            raise ValueError("no QM data loaded")
        mo_idx = self.qm.n_occupied - 1 if mo is None else int(mo)
        grid, origin, vox = self.orbital_grid(mo_idx, dims)
        span = float(np.abs(grid).max()) or 1.0
        B2A = 1.0 / BOHR_PER_ANGSTROM
        model = np.eye(4, dtype=np.float32)
        model[:3, :3] = np.diag(np.asarray(vox) * dims * B2A)
        model[:3, 3] = np.asarray(origin) * B2A
        return {
            "grid": grid,
            "model": model,
            "iso_values": (iso * span, -iso * span),
            "iso_colors": ((0.9, 0.3, 0.2, 0.6), (0.2, 0.4, 0.95, 0.6)),
        }

    def render_orbital(
        self, mo: int, dims: int = 64, width: int = 512, height: int = 512,
        iso: float = 0.05,
    ):
        """Positive/negative isosurfaces of ψ_mo (the orbital window)."""
        from viamd_tpu.render import camera as cam_mod
        from viamd_tpu.render import colormap as cmap_mod
        from viamd_tpu.render import volume as vol_mod

        grid, origin, vox = self.orbital_grid(mo, dims)
        extent_ang = (
            np.asarray(vox) * dims / 2 / BOHR_PER_ANGSTROM
        )
        span = float(np.abs(grid).max()) or 1.0
        model = np.eye(4, dtype=np.float32)
        model[:3, :3] = np.diag(np.asarray(vox) * dims)
        model[:3, 3] = origin
        cam = cam_mod.compute_optimal_view(origin, origin + np.asarray(vox) * dims)
        tf = cmap_mod.transfer_function("cool", 128, alpha_scale=0.0)
        settings = vol_mod.VolumeRenderSettings(
            width=width, height=height,
            enable_dvr=False, enable_iso=True,
            value_range=(-span, span),
            iso_values=(iso * span, -iso * span),
            iso_colors=((0.9, 0.3, 0.2, 0.85), (0.2, 0.4, 0.95, 0.85)),
        )
        img, depth = vol_mod.render_volume(
            grid, tf, model, cam.view_matrix(),
            cam.proj_matrix(width, height), settings,
        )
        return np.asarray(img), np.asarray(depth)

    # ---- density topology (md_topo: critical points + graph, rendered
    # in-scene by the reference on RenderTransparent,
    # veloxchem.cpp:624-700) ----

    # type colors of veloxchem.cpp:656-668 (u32 ABGR → rgb): maximum,
    # split saddle (2 neg Hessian eigenvalues = our 'bond'), minimum,
    # join saddle (1 neg = our 'ring')
    TOPO_COLORS = {
        "max": (0.851, 0.357, 0.357),
        "bond": (0.361, 0.682, 0.373),
        "min": (0.298, 0.604, 0.831),
        "ring": (0.290, 0.631, 0.725),
    }

    def topology(
        self,
        dims: int = 48,
        n_occupied: Optional[int] = None,
        min_value: float = 1e-3,
        threshold_frac: float = 0.5,
    ):
        """Critical points + bond graph of the electron density
        (md_topo_* over the GTO grid, veloxchem.cpp:572-623). Returns
        (points, edges): CriticalPoint list (positions in Bohr, the QM
        frame) and index pairs into it."""
        from viamd_tpu.ops.topo import bond_graph, critical_points

        grid, origin, vox = self.density_grid(dims, n_occupied)
        pts = critical_points(grid, origin, vox, min_value=min_value)
        edges = bond_graph(
            pts, grid, origin, vox, threshold_frac=threshold_frac
        )
        return pts, edges

    def add_topology_overlay(
        self, queue, points, edges, sphere_radius: float = 0.3
    ):
        """Queue the topology graph into an OverlayQueue: critical-point
        spheres colored by type + black edge lines (the immediate-mode
        pass of veloxchem.cpp:630-698). Pick ids = point indices."""
        for a, b in edges:
            queue.add_line(
                points[a].position, points[b].position,
                color=(0.0, 0.0, 0.0, 1.0),
            )
        for i, p in enumerate(points):
            col = self.TOPO_COLORS.get(p.kind, (0.48, 0.48, 0.48))
            queue.add_sphere(
                p.position, sphere_radius, tuple(col) + (1.0,), pick_id=i
            )
        return queue

    def render_topology(
        self,
        dims: int = 48,
        width: int = 512,
        height: int = 512,
        camera=None,
        points=None,
        edges=None,
        sphere_radius: float = 0.3,
        **topo_kw,
    ):
        """Render the density-topology graph → (rgba, depth, pick).
        Shares the QM (Bohr) frame and default camera of render_orbital,
        so outputs depth-composite with orbital/density volume renders.
        Pass precomputed (points, edges) to skip the density pass."""
        from viamd_tpu.render import camera as cam_mod
        from viamd_tpu.render.overlay import OverlayQueue

        if points is None or edges is None:
            points, edges = self.topology(dims, **topo_kw)
        origin, vox = self._grid_geometry(dims)
        if camera is None:
            camera = cam_mod.compute_optimal_view(
                origin, origin + np.asarray(vox) * dims
            )
        q = OverlayQueue()
        self.add_topology_overlay(q, points, edges, sphere_radius)
        img, depth, pick = q.render(
            camera.view_matrix(), camera.proj_matrix(width, height),
            width, height,
            capacity=max(128, 8 * max(len(points), 1)),
        )
        return np.asarray(img), np.asarray(depth), np.asarray(pick)

    # ---- excited states (rsp data: response spectra + transition
    # analysis + NTO windows, veloxchem.cpp) ----

    def _excited(self):
        if self.qm is None or self.qm.excited is None:
            raise ValueError("no excited-state (rsp) data loaded")
        return self.qm.excited

    def _split_occ_virt(self):
        qm = self.qm
        no = qm.n_occupied
        return qm.mo_coeffs[:, :no], qm.mo_coeffs[:, no:]

    def ntos(self, state: int):
        """Natural transition orbitals of one excited state.

        SVD of the occ×virt transition amplitude matrix: T = U Σ Vᵀ →
        hole_k = C_occ·u_k, particle_k = C_virt·v_k with weight λ_k = σ_k²
        (Σλ = ‖T‖²). Returns (weights (R,), holes (nbasis, R),
        particles (nbasis, R)) sorted by descending weight."""
        exc = self._excited()
        if exc.transition_dms is None:
            raise ValueError("rsp data has no transition density matrices")
        T = np.asarray(exc.transition_dms[state], np.float64)
        Co, Cv = self._split_occ_virt()
        if T.ndim == 1 and T.size == Co.shape[1] * Cv.shape[1]:
            # raw CI/response eigenvector straight from the checkpoint
            # (rsp/eigenvectors is (S, nocc*nvirt)) — reshape to the
            # occ×virt amplitude matrix
            T = T.reshape(Co.shape[1], Cv.shape[1])
        if T.shape != (Co.shape[1], Cv.shape[1]):
            raise ValueError(
                f"transition matrix {T.shape} vs occ/virt "
                f"({Co.shape[1]}, {Cv.shape[1]})"
            )
        U, sig, Vt = np.linalg.svd(T, full_matrices=False)
        holes = (Co @ U).astype(np.float32)
        parts = (Cv @ Vt.T).astype(np.float32)
        return (sig**2).astype(np.float64), holes, parts

    def nto_grid(self, state: int, pair: int = 0, dims: int = 64):
        """(hole_grid, particle_grid, origin, voxel) of one NTO pair."""
        import jax.numpy as jnp

        from viamd_tpu.ops.gto import eval_gto_grid

        _, holes, parts = self.ntos(state)
        origin, vox = self._grid_geometry(dims)
        out = []
        for vec in (holes[:, pair], parts[:, pair]):
            centers, exps, c, lmn = self.qm.primitives_for_vectors(vec)
            g = eval_gto_grid(
                jnp.asarray(centers), jnp.asarray(exps),
                jnp.asarray(c[:, 0]), jnp.asarray(lmn),
                jnp.asarray(origin), jnp.asarray(vox), (dims, dims, dims),
            )
            out.append(np.asarray(g))
        return out[0], out[1], origin, vox

    def transition_density_grid(self, state: int, dims: int = 64):
        """ρ_T(r) = Σ_ia T_ia ψ_i ψ_a → (grid, origin, voxel)."""
        import jax.numpy as jnp

        from viamd_tpu.ops.gto import transition_density_grid

        exc = self._excited()
        if exc.transition_dms is None:
            raise ValueError("rsp data has no transition density matrices")
        Co, Cv = self._split_occ_virt()
        centers, exps, Cop, lmn = self.qm.primitives_for_vectors(Co)
        _, _, Cvp, _ = self.qm.primitives_for_vectors(Cv)
        origin, vox = self._grid_geometry(dims)
        g = transition_density_grid(
            jnp.asarray(centers), jnp.asarray(exps), jnp.asarray(Cop),
            jnp.asarray(Cvp), exc.transition_dms[state], jnp.asarray(lmn),
            jnp.asarray(origin), jnp.asarray(vox), (dims, dims, dims),
        )
        return np.asarray(g), origin, vox

    def attachment_detachment_grids(self, state: int, dims: int = 64):
        """Attachment (particle) and detachment (hole) densities from the
        NTO decomposition: Σ_k λ_k ψ²  → (detach, attach, origin, voxel)."""
        import jax.numpy as jnp

        from viamd_tpu.ops.gto import density_grid

        lam, holes, parts = self.ntos(state)
        origin, vox = self._grid_geometry(dims)
        out = []
        for vecs in (holes, parts):
            centers, exps, C, lmn = self.qm.primitives_for_vectors(vecs)
            g = density_grid(
                jnp.asarray(centers), jnp.asarray(exps), jnp.asarray(C),
                jnp.asarray(lmn), jnp.asarray(origin), jnp.asarray(vox),
                (dims, dims, dims), occupations=lam.astype(np.float32),
            )
            out.append(np.asarray(g))
        return out[0], out[1], origin, vox

    def transition_analysis(self, state: int, top: int = 8):
        """Dominant orbital excitations of one state (the transition
        analysis window): list of dicts {from, to, amplitude, weight}
        sorted by |amplitude|, plus the state's energy/strengths."""
        exc = self._excited()
        if exc.transition_dms is None:
            raise ValueError("rsp data has no transition density matrices")
        T = np.asarray(exc.transition_dms[state])
        no = self.qm.n_occupied
        norm2 = float((T**2).sum()) or 1.0
        flat = np.argsort(-np.abs(T).ravel())[:top]
        rows = [
            {
                "from": int(i // T.shape[1]),  # occupied MO index
                "to": int(no + i % T.shape[1]),  # virtual MO index
                "amplitude": float(T.ravel()[i]),
                "weight": float(T.ravel()[i] ** 2 / norm2),
            }
            for i in flat
        ]
        out = {
            "energy_ev": float(exc.energies_ev[state]),
            "oscillator_strength": float(exc.oscillator_strengths[state]),
            "excitations": rows,
        }
        if exc.rotatory_strengths is not None:
            out["rotatory_strength"] = float(exc.rotatory_strengths[state])
        return out

    def absorption_spectrum(
        self, x_ev: np.ndarray | None = None, broadening_ev: float = 0.3,
        shape: str = "lorentzian",
    ):
        """Broadened one-photon absorption spectrum from oscillator
        strengths (the response spectra window) → (x_ev, intensity)."""
        exc = self._excited()
        return _broaden(
            exc.energies_ev, exc.oscillator_strengths, x_ev, broadening_ev,
            shape,
        )

    def ecd_spectrum(
        self, x_ev: np.ndarray | None = None, broadening_ev: float = 0.3,
        shape: str = "lorentzian",
    ):
        """Electronic circular dichroism from rotatory strengths →
        (x_ev, Δε arbitrary units)."""
        exc = self._excited()
        if exc.rotatory_strengths is None:
            raise ValueError("rsp data has no rotatory strengths")
        return _broaden(
            exc.energies_ev, exc.rotatory_strengths, x_ev, broadening_ev,
            shape,
        )

    # ---- NTO charge-transfer analysis (the reference's atom-group
    # transition matrix + Sankey transition diagram,
    # veloxchem.cpp:5805-5870 compute_transition_matrix,
    # :6888-6898 density→group attribution, :1988-2090 vg_sankey_diagram,
    # :2244-2268 SVG export) ---------------------------------------------

    def attachment_detachment_ao(self, state: int):
        """Attachment/detachment density matrices in the AO basis
        (md_vlx_rsp_transition_density_matrix_extract ATTACHMENT/
        DETACHMENT, veloxchem.cpp:6851-6852): D_det = H Λ Hᵀ,
        D_att = P Λ Pᵀ from the AO-basis NTO hole/particle vectors."""
        lam, holes, parts = self.ntos(state)
        lam = np.asarray(lam, np.float64)
        H = np.asarray(holes, np.float64)
        P = np.asarray(parts, np.float64)
        return (H * lam) @ H.T, (P * lam) @ P.T

    def charge_transfer(
        self, state: int, groups, dims: int = 64,
        method: str = "mulliken",
    ) -> dict:
        """Per-group hole/particle charges of one excited state and the
        donor→acceptor transition matrix.

        `groups`: (na,) int group index per atom (the reference's painted
        atom_group_idx) or a list of atom-index arrays.

        `method="mulliken"` (the reference's enabled path,
        veloxchem.cpp:6835-6881): q_g = Σ_{μ∈g} Σ_ν D[μ,ν]·S[μ,ν] from
        the attachment/detachment AO density matrices and the overlap
        matrix (checkpoint-provided or analytic), exactly preserving
        tr(D·S), tiny negative noise clamped at 0.
        `method="grid"` (the md_gto segmentation path, :6888-6898):
        integrate the attachment/detachment GRIDS per atom by additively-
        weighted-Voronoi segmentation (vdW radii).

        matrix[i, j] = charge fraction flowing donor j → acceptor i
        (diagonal = retained fraction min(hole%, part%))."""
        qm = self.qm
        na = len(qm.atom_numbers)
        gidx = np.zeros(na, np.int32)
        if isinstance(groups, (list, tuple)):
            for g, idx in enumerate(groups):
                gidx[np.asarray(idx, np.int64)] = g
            n_groups = len(groups)
        else:
            gidx = np.asarray(groups, np.int32)
            n_groups = int(gidx.max()) + 1
        if method == "mulliken":
            D_det, D_att = self.attachment_detachment_ao(state)
            S = qm.overlap_matrix()
            a2a = qm.ao_to_atom_idx()
            per_atom = [
                np.bincount(a2a, weights=(D * S).sum(axis=1), minlength=na)
                for D in (D_det, D_att)
            ]
        elif method == "grid":
            import jax.numpy as jnp

            from viamd_tpu.core.elements import vdw_radius
            from viamd_tpu.ops.gto import attribute_grid_to_atoms

            det, att, origin, vox = self.attachment_detachment_grids(
                state, dims
            )
            radii = (
                vdw_radius(np.asarray(qm.atom_numbers)) * BOHR_PER_ANGSTROM
            )
            xyz = jnp.asarray(qm.atom_coords, jnp.float32)
            per_atom = [
                np.asarray(attribute_grid_to_atoms(
                    jnp.asarray(g), jnp.asarray(origin, jnp.float32),
                    jnp.asarray(vox, jnp.float32), xyz,
                    jnp.asarray(radii, jnp.float32),
                ))
                for g in (det, att)
            ]
        else:
            raise ValueError(f"unknown charge_transfer method {method!r}")
        # Mulliken populations of attach/detach densities are non-negative
        # in exact arithmetic; clamp numeric noise (veloxchem.cpp:6873-6880)
        per_atom = [np.maximum(q, 0.0) for q in per_atom]
        hole_g = np.bincount(gidx, weights=per_atom[0], minlength=n_groups)
        part_g = np.bincount(gidx, weights=per_atom[1], minlength=n_groups)
        return {
            "hole_charges": hole_g,
            "part_charges": part_g,
            "matrix": compute_transition_matrix(hole_g, part_g),
            "hole_per_atom": per_atom[0],
            "part_per_atom": per_atom[1],
        }

    def transition_diagram_svg(
        self, state: int, groups, labels=None, colors=None,
        dims: int = 64, size=(640, 480), path: str | None = None,
    ) -> str:
        """Sankey transition diagram of one excited state as an SVG string
        (the reference's Export Transition Diagram, veloxchem.cpp:2244):
        hole-charge bars at the bottom, particle bars at the top, flow
        bands sized by the transition matrix. Writes to `path` if given."""
        ct = self.charge_transfer(state, groups, dims)
        svg = sankey_svg(
            ct["matrix"], ct["hole_charges"], ct["part_charges"],
            labels=labels, colors=colors, size=size,
        )
        if path is not None:
            with open(path, "w") as f:
                f.write(svg)
        return svg

    # ---- reference-exact spectra (electronic spectroscopy section,
    # veloxchem.cpp:3868-4310: x-unit conversion, molar-absorptivity /
    # Δε / TPA-GM scaling, Lorentzian|Gaussian broadening) --------------

    def _peaks_au(self):
        exc = self._excited()
        return np.asarray(exc.energies_ev, np.float64) * EV_TO_HARTREE

    def _spectrum_x(self, px_au, fwhm_au, x, x_unit, n=512):
        """Default sample positions: peak span ± 10 FWHM, in x_unit."""
        if x is not None:
            return (np.asarray(x, np.float64),
                    convert_value_to_au(x, x_unit))
        lo = max(float(px_au.min()) - 10 * fwhm_au, 1e-6)
        hi = float(px_au.max()) + 10 * fwhm_au
        x_au = np.linspace(lo, hi, n)
        return convert_value_from_au(x_au, x_unit), x_au

    def absorption_spectrum_eps(
        self, x=None, x_unit: str = "ev", fwhm_ev: float = 0.123,
        shape: str = "lorentzian",
    ):
        """Molar absorptivity ε(ω) in L mol⁻¹ cm⁻¹ (the reference's
        Absorption plot, veloxchem.cpp:3930-3999): broadening runs in a.u.
        with peaks f_k/ω_k, then ε = ω · y · 1054.95… . For CPP runs the
        checkpoint's pre-sampled σ(ω) is returned directly."""
        qm = self.qm
        if qm is not None and qm.rsp_samples is not None and \
                qm.rsp_samples.sigma is not None:
            s = qm.rsp_samples
            return (convert_value_from_au(s.frequencies_au, x_unit),
                    np.asarray(s.sigma, np.float64))
        exc = self._excited()
        px = self._peaks_au()
        py = np.asarray(exc.oscillator_strengths, np.float64) / px
        fwhm = fwhm_ev * EV_TO_HARTREE
        xs, x_au = self._spectrum_x(px, fwhm, x, x_unit)
        if shape == "lorentzian":
            y = _lorentzian_base(x_au, px, py, fwhm) / np.pi
        elif shape == "gaussian":
            sg = fwhm * 0.21233045007200476068
            y = _gaussian_base(x_au, px, py, fwhm) / (sg * np.sqrt(2 * np.pi))
        else:
            raise ValueError(f"unknown line shape {shape!r}")
        return xs, x_au * y * OSCILLATOR_STRENGTH_TO_EPSILON

    def ecd_spectrum_eps(
        self, x=None, x_unit: str = "ev", fwhm_ev: float = 0.123,
        shape: str = "lorentzian",
    ):
        """Δε(ω) in L mol⁻¹ cm⁻¹ from rotatory strengths in 10⁻⁴⁰ cgs
        (the ECD plot, veloxchem.cpp:4056-4110); CPP runs return the
        sampled Δε directly."""
        qm = self.qm
        if qm is not None and qm.rsp_samples is not None and \
                qm.rsp_samples.delta_epsilons is not None:
            s = qm.rsp_samples
            return (convert_value_from_au(s.frequencies_au, x_unit),
                    np.asarray(s.delta_epsilons, np.float64))
        exc = self._excited()
        if exc.rotatory_strengths is None:
            raise ValueError("rsp data has no rotatory strengths")
        px = self._peaks_au()
        py = np.asarray(exc.rotatory_strengths, np.float64)
        fwhm = fwhm_ev * EV_TO_HARTREE
        xs, x_au = self._spectrum_x(px, fwhm, x, x_unit)
        if shape == "lorentzian":
            y = _lorentzian_base(x_au, px, py, fwhm)
        elif shape == "gaussian":
            sg = fwhm * 0.21233045007200476068
            y = _gaussian_base(x_au, px, py, fwhm) * np.pi / (
                sg * np.sqrt(2 * np.pi)
            )
        else:
            raise ValueError(f"unknown line shape {shape!r}")
        return xs, x_au * y * ROTATORY_STRENGTH_TO_DELTA_EPSILON

    def ord_spectrum(self, x_unit: str = "ev"):
        """Optical rotatory dispersion — CPP runs only (the sampled
        md_vlx_rsp_optical_rotations, veloxchem.cpp:3889)."""
        qm = self.qm
        if qm is None or qm.rsp_samples is None or \
                qm.rsp_samples.optical_rotations is None:
            raise ValueError("no sampled optical rotations (CPP rsp only)")
        s = qm.rsp_samples
        return (convert_value_from_au(s.frequencies_au, x_unit),
                np.asarray(s.optical_rotations, np.float64))

    def tpa_spectrum(
        self, x=None, x_unit: str = "ev", fwhm_ev: float = 0.123,
        circular: bool = False,
    ):
        """Two-photon absorption cross-section in GM. TPA runs return the
        checkpoint's sampled cross-sections; TPA_TRANSITION runs broaden
        the per-state linear/circular transition strengths with the
        reference's scaling AU_TO_GM · ω² · (ω² · lorentzian_base)
        (veloxchem.cpp:4242-4310 + lorentzian_tpa:2731 — the ω² appears in
        BOTH the getter factor and lorentzian_tpa; replicated as-is)."""
        qm = self.qm
        if qm is not None and qm.rsp_samples is not None and \
                qm.rsp_samples.tpa_cross_sections is not None:
            s = qm.rsp_samples
            return (convert_value_from_au(s.frequencies_au, x_unit),
                    np.asarray(s.tpa_cross_sections, np.float64))
        if qm is None or (qm.tpa_trans_linear is None and
                          qm.tpa_trans_circular is None):
            raise ValueError("no TPA data in the checkpoint")
        py = qm.tpa_trans_circular if circular else qm.tpa_trans_linear
        if py is None:
            raise ValueError("requested TPA polarization not present")
        # TPA_TRANSITION peak positions come from the checkpoint's rsp
        # frequencies (x_freq_au in the reference getter, veloxchem.cpp:3999),
        # NOT the excited-state energies — tpa_transition checkpoints need
        # no rsp/eigenvalues section at all.
        if qm.rsp_samples is not None and \
                qm.rsp_samples.frequencies_au is not None:
            px = np.asarray(qm.rsp_samples.frequencies_au, np.float64)
        else:
            px = self._peaks_au()
        py = np.asarray(py, np.float64)
        if len(px) != len(py):
            raise ValueError(
                f"TPA checkpoint inconsistent: {len(px)} rsp frequencies vs "
                f"{len(py)} transition strengths"
            )
        fwhm = fwhm_ev * EV_TO_HARTREE
        xs, x_au = self._spectrum_x(px, fwhm, x, x_unit)
        base = _lorentzian_base(x_au, px, py, fwhm)
        return xs, AU_TO_GM * x_au**2 * (x_au**2 * base)

    # ---- vibrational spectroscopy (veloxchem.cpp:4409-4700) ------------

    def _vib(self):
        if self.qm is None or self.qm.vib is None:
            raise ValueError("no vibrational data in the checkpoint")
        return self.qm.vib

    def ir_spectrum(
        self, x=None, fwhm_cm: float = 20.0, shape: str = "lorentzian",
        freq_scaling: float = 1.0,
    ):
        """Broadened IR spectrum (cm⁻¹, km/mol): harmonic frequencies ×
        the basis-set scaling factor, broadened with lorentzian_vib =
        base/π or gaussian_vib = base·√2/(σ√π) (veloxchem.cpp:2727-2733,
        2771-2776, window :4411-4530)."""
        vib = self._vib()
        if vib.ir_intensities is None:
            raise ValueError("no IR intensities in the checkpoint")
        px = np.asarray(vib.frequencies, np.float64) * freq_scaling
        py = np.asarray(vib.ir_intensities, np.float64)
        return self._vib_broaden(px, py, x, fwhm_cm, shape)

    def raman_spectrum(
        self, external_freq_index: int = 0, x=None, fwhm_cm: float = 20.0,
        shape: str = "lorentzian", freq_scaling: float = 1.0,
    ):
        """Broadened Raman activity spectrum at one external frequency
        (resonance Raman; veloxchem.cpp:4590-4620)."""
        vib = self._vib()
        if vib.raman_activities is None:
            raise ValueError("no Raman activities in the checkpoint")
        px = np.asarray(vib.frequencies, np.float64) * freq_scaling
        py = np.asarray(vib.raman_activities, np.float64)[
            external_freq_index
        ]
        return self._vib_broaden(px, py, x, fwhm_cm, shape)

    @staticmethod
    def _vib_broaden(px, py, x, fwhm, shape):
        if x is None:
            lo = max(float(px.min()) - 5 * fwhm, 0.0)
            x = np.linspace(lo, float(px.max()) + 5 * fwhm, 1024)
        x = np.asarray(x, np.float64)
        if shape == "lorentzian":
            return x, _lorentzian_base(x, px, py, fwhm) / np.pi
        if shape == "gaussian":
            sg = fwhm * 0.21233045007200476068
            return x, _gaussian_base(x, px, py, fwhm) * np.sqrt(2.0) / (
                sg * np.sqrt(np.pi)
            )
        raise ValueError(f"unknown line shape {shape!r}")

    def normal_mode_displacement(
        self, mode: int, t: float = 0.0, amplitude: float = 1.0
    ) -> np.ndarray:
        """Animated normal-mode geometry (Bohr): coords + mode ·
        (amplitude · 0.25 · sin(t)) — the reference's vibration
        visualization perturbs atom positions exactly so, advancing
        t += dt · freq_scale · 8 per frame (veloxchem.cpp:4713-4755)."""
        vib = self._vib()
        if vib.normal_modes is None:
            raise ValueError("no normal modes in the checkpoint")
        base = np.asarray(self.qm.atom_coords, np.float64)
        d = np.asarray(vib.normal_modes[mode], np.float64)
        return base + d * (amplitude * 0.25 * np.sin(t))

    def _override_coords(self, coords_bohr: np.ndarray):
        """Install QM coordinates (Bohr) as the session's coordinate
        override — the reference writes directly into sys.atom.x/y/z and
        broadcasts SystemStateChanged (veloxchem.cpp:3250-3258,
        4745-4755). Requires the QM atom list to cover the system."""
        sys_ = self.session.system
        if sys_ is None or len(coords_bohr) != sys_.natoms:
            raise ValueError(
                f"QM atom count {len(coords_bohr)} does not match the "
                f"loaded system ({0 if sys_ is None else sys_.natoms})"
            )
        self.session.coord_override = (
            np.asarray(coords_bohr, np.float64) / BOHR_PER_ANGSTROM
        ).astype(np.float32)
        from viamd_tpu.app.events import EventType

        self.session.events.broadcast(
            EventType.SYSTEM_STATE_CHANGED, self.session
        )

    def apply_optimization_step(self, step: int):
        """Show one geometry-optimization step in the session (the Step
        slider, veloxchem.cpp:3250-3258)."""
        self._override_coords(self.optimization_coordinates(step))

    def apply_normal_mode(self, mode: int, t: float, amplitude: float = 1.0):
        """Animate one vibrational mode in the session (advance t by
        dt·freq_scale·8 per tick, veloxchem.cpp:4713-4755)."""
        self._override_coords(
            self.normal_mode_displacement(mode, t, amplitude)
        )

    def clear_coordinate_override(self):
        """Reset to trajectory coordinates (the reference's reset-once on
        deselect, veloxchem.cpp:4770-4780)."""
        self.session.coord_override = None
        from viamd_tpu.app.events import EventType

        self.session.events.broadcast(
            EventType.SYSTEM_STATE_CHANGED, self.session
        )

    # ---- summary window (veloxchem.cpp:3090-3270) -----------------------

    def scf_convergence(self) -> dict:
        """SCF history: per-iteration energies/gradient norms plus the
        |E−E_final| offsets the reference plots on the log axis
        (veloxchem.cpp:3120-3170)."""
        qm = self.qm
        if qm is None or qm.scf_history is None:
            raise ValueError("no SCF history in the checkpoint")
        e = np.asarray(qm.scf_history.energies, np.float64)
        g = np.asarray(qm.scf_history.gradient_norms, np.float64)
        return {
            "energies": e,
            "gradient_norms": g,
            "energy_offsets": np.abs(e - e[-1]),
            "total_energy": float(e[-1]),
            "final_gradient_norm": float(g[-1]),
            "nuclear_repulsion": qm.nuclear_repulsion,
        }

    def optimization_profile(self) -> dict:
        """Relative-energy profile in kJ/mol over optimization steps; IRC
        runs reference the transition-state step instead of the minimum
        (veloxchem.cpp:3173-3258)."""
        qm = self.qm
        if qm is None or qm.opt is None:
            raise ValueError("no optimization data in the checkpoint")
        opt = qm.opt
        e = np.asarray(opt.energies, np.float64)
        if opt.opt_type == "irc" and opt.irc_ts_index is not None and \
                opt.irc_ts_index < len(e):
            ref = e[opt.irc_ts_index]
        else:
            ref = e.min()
        return {
            "steps": np.arange(1, len(e) + 1),
            "energies_kj_rel": (e - ref) * HARTREE_TO_KJ_PER_MOL,
            "opt_type": opt.opt_type,
            "ts_index": opt.irc_ts_index,
        }

    def optimization_coordinates(self, step: int) -> np.ndarray:
        """Geometry of one optimization step (Bohr) — drives the Step
        slider's set_atom_coordinates (veloxchem.cpp:3250-3258)."""
        qm = self.qm
        if qm is None or qm.opt is None or qm.opt.coordinates is None:
            raise ValueError("no optimization coordinates in the checkpoint")
        step = int(np.clip(step, 0, qm.opt.n_steps - 1))
        return np.asarray(qm.opt.coordinates[step], np.float64)

    def summary(self) -> dict:
        """Summary-window facts: level of calculation + system information
        (veloxchem.cpp:3098-3118). Alpha/beta electron counts derive from
        ΣZ − charge and the spin multiplicity when not stored."""
        qm = self.qm
        if qm is None:
            raise ValueError("no QM data loaded")
        charge = qm.molecular_charge if qm.molecular_charge is not None \
            else 0.0
        mult = qm.spin_multiplicity if qm.spin_multiplicity is not None \
            else 1
        n_e = int(round(float(np.sum(qm.atom_numbers)) - charge))
        n_alpha = qm.n_alpha_electrons
        n_beta = qm.n_beta_electrons
        if n_alpha is None or n_beta is None:
            n_alpha = (n_e + mult - 1) // 2
            n_beta = n_e - n_alpha
        out = {
            "method": qm.dft_label,
            "basis_set": qm.basis_label,
            "num_atoms": int(len(qm.atom_numbers)),
            "num_alpha_electrons": int(n_alpha),
            "num_beta_electrons": int(n_beta),
            "molecular_charge": float(charge),
            "spin_multiplicity": int(mult),
            "scf_type": qm.scf_type,
            "rsp_type": qm.rsp_type,
            "nuclear_repulsion": qm.nuclear_repulsion,
        }
        if qm.c6_value is not None:
            out["c6_value"] = float(qm.c6_value)
        return out

    def representation_info(self) -> "RepresentationInfo":
        """Catalog of the QM representations available for the loaded
        dataset — the reference's RepresentationInfo fill
        (/root/reference/src/viamd.h:511-524, populated in
        veloxchem.cpp:860-1003): MO list with homo/lumo labels, per-state
        NTO lambda lists (cutoff 1e-3, max 16), ground-state +
        electric/magnetic transition dipole moments (origin = center of
        charge, veloxchem.cpp:1368-1380), and per-atom property labels."""
        qm = self.qm
        if qm is None:
            raise ValueError("no QM data loaded")
        if self._rep_info is not None and self._rep_info_qm is qm:
            return self._rep_info  # per-frame dipole reps hit this
        alpha = None
        if qm.mo_energies is not None or qm.mo_occupations is not None:
            nmo = qm.n_orbitals
            homo = qm.n_occupied - 1
            lumo = min(homo + 1, nmo - 1)
            labels = []
            for i in range(nmo):
                tag = (" (homo)" if i == homo
                       else " (lumo)" if i == lumo else "")
                labels.append(f"{i + 1}{tag}")
            alpha = MolecularOrbitalInfo(
                homo_idx=homo,
                lumo_idx=lumo,
                labels=labels,
                occupations=(
                    np.asarray(qm.mo_occupations, np.float64)
                    if qm.mo_occupations is not None else None
                ),
                energies=(
                    np.asarray(qm.mo_energies, np.float64)
                    if qm.mo_energies is not None else None
                ),
            )
        beta = None
        if qm.beta_coeffs is not None:
            occb = qm.beta_occupations
            homo_b = (int(np.sum(np.asarray(occb) > 0)) - 1
                      if occb is not None else qm.n_occupied - 1)
            nmo_b = qm.beta_coeffs.shape[1]
            lumo_b = min(homo_b + 1, nmo_b - 1)
            beta = MolecularOrbitalInfo(
                homo_idx=homo_b,
                lumo_idx=lumo_b,
                labels=[
                    f"{i + 1}{' (homo)' if i == homo_b else ''}"
                    f"{' (lumo)' if i == lumo_b else ''}"
                    for i in range(nmo_b)
                ],
                occupations=(np.asarray(occb, np.float64)
                             if occb is not None else None),
                energies=(np.asarray(qm.beta_energies, np.float64)
                          if qm.beta_energies is not None else None),
            )
        nto = None
        if qm.excited is not None and qm.excited.transition_dms is not None:
            states, lambdas = [], []
            for s in range(qm.excited.n_states):
                lam, _, _ = self.ntos(s)
                lam = lam[:16]
                lam = lam[lam >= 1e-3]  # LAMBDA_CUTOFF
                states.append(f"{s + 1}")
                lambdas.append(
                    ([f"λ[{j + 1}] ({v:.3f})" for j, v in enumerate(lam)],
                     lam)
                )
            nto = NTOInfo(labels=states, lambdas=lambdas)
        dipoles = []
        z = np.asarray(qm.atom_numbers, np.float64)
        xyz = np.asarray(qm.atom_coords, np.float64)
        n_e = float(z.sum())
        if qm.scf_dipole is not None:
            mu = np.asarray(qm.scf_dipole, np.float64)
            nucl = (xyz * z[:, None]).sum(axis=0)
            coc = (nucl - mu) / max(n_e, 1.0)  # veloxchem.cpp:1368-1380
            dipoles.append(DipoleMoment(
                key="ground_state_dipole",
                label="Ground State Dipole Moment",
                vec=mu, origin=coc * 0.529177210903,  # Bohr → Å
            ))
        if qm.excited is not None:
            for name, arr in (
                ("electric_transition_dipole", qm.excited.electric_tdms),
                ("magnetic_transition_dipole", qm.excited.magnetic_tdms),
            ):
                if arr is not None:
                    for s in range(len(arr)):
                        dipoles.append(DipoleMoment(
                            key=f"{name}_{s + 1}",
                            label=f"{name.replace('_', ' ').title()} "
                                  f"S{s + 1}",
                            vec=np.asarray(arr[s], np.float64),
                            origin=np.zeros(3),
                        ))
        atom_props = []
        if qm.atom_properties:
            for label, vals in qm.atom_properties.items():
                v = np.asarray(vals, np.float64)
                atom_props.append(AtomPropertyInfo(
                    key=label, label=label,
                    value_min=float(v.min()), value_max=float(v.max()),
                    values=v,
                ))
        density_props = []
        if qm.mo_coeffs is not None:
            density_props.append("electron_density")
            if nto is not None:
                density_props += ["transition_density",
                                  "attachment_density", "detachment_density"]
        info = RepresentationInfo(
            alpha=alpha, beta=beta, nto=nto, dipole_moments=dipoles,
            atom_properties=atom_props, density_properties=density_props,
        )
        self._rep_info, self._rep_info_qm = info, qm
        return info



@dataclass
class MolecularOrbitalInfo:
    """viamd.h:487-494 MolecularOrbital."""

    homo_idx: int
    lumo_idx: int
    labels: list
    occupations: np.ndarray | None = None
    energies: np.ndarray | None = None


@dataclass
class NTOInfo:
    """viamd.h:475-485 NaturalTransitionOrbital(+Lambda): per excited
    state, the (labels, values) of its dominant NTO lambdas."""

    labels: list = field(default_factory=list)
    lambdas: list = field(default_factory=list)


@dataclass
class DipoleMoment:
    """viamd.h:467-473 DipoleMoment (vec in a.u., origin in Å)."""

    key: str
    label: str
    vec: np.ndarray = field(default_factory=lambda: np.zeros(3))
    origin: np.ndarray = field(default_factory=lambda: np.zeros(3))
    unit: str = "a.u."


@dataclass
class AtomPropertyInfo:
    """viamd.h:496-503 AtomProperty (+ the values themselves, since the
    rebuild has no separate Eval event round-trip)."""

    key: str
    label: str
    value_min: float = 0.0
    value_max: float = 0.0
    values: np.ndarray | None = None


@dataclass
class RepresentationInfo:
    """viamd.h:511-524 RepresentationInfo."""

    alpha: MolecularOrbitalInfo | None = None
    beta: MolecularOrbitalInfo | None = None
    nto: NTOInfo | None = None
    dipole_moments: list = field(default_factory=list)
    atom_properties: list = field(default_factory=list)
    density_properties: list = field(default_factory=list)


def compute_transition_matrix(
    hole_charges: np.ndarray, part_charges: np.ndarray
) -> np.ndarray:
    """Donor→acceptor charge-flow matrix from per-group hole/particle
    charges — the reference algorithm verbatim (veloxchem.cpp:5805-5870):
    normalize each side (clamping numeric noise at 0), diagonal = retained
    fraction min(hole%, part%), each donor's deficit distributes to
    acceptors proportional to their surplus. matrix[acceptor, donor]."""
    h = np.maximum(np.asarray(hole_charges, np.float64), 0.0)
    p = np.maximum(np.asarray(part_charges, np.float64), 0.0)
    G = len(h)
    out = np.zeros((G, G), np.float64)
    hs, ps = h.sum(), p.sum()
    if hs <= 0.0 or ps <= 0.0:
        return out
    gs = h / hs
    es = p / ps
    np.fill_diagonal(out, np.minimum(gs, es))
    diff = es - gs
    donors = gs > es
    acceptors = ~donors
    total_acc = np.maximum(diff[acceptors], 0.0).sum()
    if total_acc <= 0.0:
        return out
    for d in np.nonzero(donors)[0]:
        deficit = max(0.0, -diff[d])
        for a in np.nonzero(acceptors)[0]:
            out[a, d] = deficit * max(0.0, diff[a]) / total_acc
    return out


def sankey_svg(
    matrix: np.ndarray,
    hole_charges: np.ndarray,
    part_charges: np.ndarray,
    labels=None,
    colors=None,
    size=(640, 480),
) -> str:
    """Sankey diagram SVG (the vg_sankey_diagram layout,
    veloxchem.cpp:1988-2090): white canvas, centered plot area, bottom
    bars sized by hole percentage / top bars by particle percentage with
    5%-width gaps, cubic flow bands carrying matrix[acceptor, donor] of
    the charge, labels with percentages."""
    W, H = size
    G = len(hole_charges)
    labels = labels or [f"Group {i}" for i in range(G)]
    if colors is None:
        palette = ["#4c78a8", "#f58518", "#54a24b", "#e45756",
                   "#72b7b2", "#b279a2", "#eeca3b", "#9d755d"]
        colors = [palette[i % len(palette)] for i in range(G)]
    h = np.maximum(np.asarray(hole_charges, np.float64), 0.0)
    p = np.maximum(np.asarray(part_charges, np.float64), 0.0)
    hp = h / max(h.sum(), 1e-6)
    pp = p / max(p.sum(), 1e-6)
    # plot area: 80% centered; bar height 5%; gaps 5% of plot width
    px0, px1 = 0.1 * W, 0.9 * W
    py0, py1 = 0.1 * H, 0.9 * H
    bar_h = 0.05 * (py1 - py0)
    n_bars = int((hp > 0).sum())
    gap = 0.05 * (px1 - px0)
    avail = (px1 - px0) - gap * max(n_bars - 1, 0)
    starts = np.zeros(G)  # bottom (hole) bar left edges
    cur = px0
    for i in range(G):
        starts[i] = cur
        cur += avail * hp[i]
        if hp[i] != 0.0:
            cur += gap
    ends = np.zeros(G)  # top (particle) bar left edges
    cur = px0
    for i in range(G):
        ends[i] = cur
        cur += avail * pp[i]
        # NOTE: gap keyed on hp (not pp) and avail derived from the hole
        # bar count on BOTH sides is the reference's exact layout
        # (veloxchem.cpp:2042-2051) — kept verbatim for parity.
        if hp[i] != 0.0:
            cur += gap
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
        f'viewBox="0 0 {W} {H}">',
        f'<rect x="0" y="0" width="{W}" height="{H}" fill="white"/>',
    ]
    y_bot = py1 - bar_h  # hole bars along the bottom edge
    y_top = py0  # particle bars along the top edge
    # flow bands first (under the bars): donor j → acceptor i
    sub_start = starts.copy()
    sub_end = ends.copy()
    for i in range(G):  # acceptor (top)
        for j in range(G):  # donor (bottom)
            frac = float(matrix[i, j])
            if frac <= 1e-9:
                continue
            wflow = avail * frac
            xs = sub_start[j]
            xe = sub_end[i]
            sub_start[j] += wflow
            sub_end[i] += wflow
            ym = (y_top + bar_h + y_bot) / 2
            out.append(
                f'<path d="M {xs:.2f} {y_bot:.2f} '
                f'C {xs:.2f} {ym:.2f} {xe:.2f} {ym:.2f} '
                f'{xe:.2f} {y_top + bar_h:.2f} '
                f'h {wflow:.2f} '
                f'C {xe + wflow:.2f} {ym:.2f} {xs + wflow:.2f} {ym:.2f} '
                f'{xs + wflow:.2f} {y_bot:.2f} Z" '
                f'fill="{colors[j]}" fill-opacity="0.45"/>'
            )
    for i in range(G):
        if hp[i] > 0:
            out.append(
                f'<rect x="{starts[i]:.2f}" y="{y_bot:.2f}" '
                f'width="{avail * hp[i]:.2f}" height="{bar_h:.2f}" '
                f'fill="{colors[i]}"/>'
            )
            out.append(
                f'<text x="{starts[i] + avail * hp[i] / 2:.2f}" '
                f'y="{y_bot + bar_h + 14:.2f}" font-size="11" '
                f'text-anchor="middle">{labels[i]} '
                f'{100 * hp[i]:.1f}%</text>'
            )
        if pp[i] > 0:
            out.append(
                f'<rect x="{ends[i]:.2f}" y="{y_top:.2f}" '
                f'width="{avail * pp[i]:.2f}" height="{bar_h:.2f}" '
                f'fill="{colors[i]}"/>'
            )
            out.append(
                f'<text x="{ends[i] + avail * pp[i] / 2:.2f}" '
                f'y="{y_top - 5:.2f}" font-size="11" '
                f'text-anchor="middle">{labels[i]} '
                f'{100 * pp[i]:.1f}%</text>'
            )
    out.append("</svg>")
    return "\n".join(out)


def _broaden(centers_ev, strengths, x_ev, width_ev, shape):
    c = np.asarray(centers_ev, np.float64)
    s = np.asarray(strengths, np.float64)
    if x_ev is None:
        lo = max(c.min() - 5 * width_ev, 0.0)
        x_ev = np.linspace(lo, c.max() + 5 * width_ev, 512)
    x = np.asarray(x_ev, np.float64)
    d = x[:, None] - c[None, :]
    if shape == "lorentzian":
        g = (width_ev / (2 * np.pi)) / (d**2 + (width_ev / 2) ** 2)
    elif shape == "gaussian":
        sg = width_ev / 2.3548200450309493  # FWHM → σ
        g = np.exp(-0.5 * (d / sg) ** 2) / (sg * np.sqrt(2 * np.pi))
    else:
        raise ValueError(f"unknown line shape '{shape}'")
    return x, g @ s
