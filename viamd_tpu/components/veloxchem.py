"""VeloxChem component: QM orbital / density grids + rendering.

Rebuild of src/components/veloxchem/veloxchem.cpp (reference: parses
VeloxChem HDF5 (:1312), evaluates MO/NTO/electron-density grids through
md_gto's CPU/GL/Vulkan paths (:1044-1108), renders them as volumes, and
answers EvalElectronicStructure events). The Vulkan backend's role is
played by the TPU itself: grids come from ops.gto (MXU-contracted
primitive matrices) and render through the volume ray-marcher.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from viamd_tpu.io.vlx import BOHR_PER_ANGSTROM, QMData


class VeloxchemComponent:
    name = "veloxchem"

    def __init__(self, session):
        self.session = session
        self.qm: Optional[QMData] = None

    def load(self, path_or_data) -> QMData:
        """Attach QM data (the ViamdLoadData .h5 supplemental path)."""
        if isinstance(path_or_data, QMData):
            self.qm = path_or_data
        else:
            from viamd_tpu.io.vlx import load_vlx_h5

            self.qm = load_vlx_h5(path_or_data)
        return self.qm

    def _grid_geometry(self, dims: int, padding_bohr: float = 6.0):
        qm = self.qm
        lo = qm.atom_coords.min(axis=0) - padding_bohr
        hi = qm.atom_coords.max(axis=0) + padding_bohr
        vox = (hi - lo) / dims
        return lo.astype(np.float32), vox.astype(np.float32)

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

    def density_grid(self, dims: int = 64, n_occupied: Optional[int] = None):
        """Electron density over occupied orbitals."""
        if self.qm is None:
            raise ValueError("no QM data loaded")
        import jax.numpy as jnp

        from viamd_tpu.ops.gto import density_grid

        centers, exps, C, lmn = self.qm.primitives_all()
        if n_occupied is not None:
            C = C[:, :n_occupied]
        occ = (
            self.qm.mo_occupations[: C.shape[1]]
            if self.qm.mo_occupations is not None
            else None
        )
        origin, vox = self._grid_geometry(dims)
        grid = density_grid(
            jnp.asarray(centers), jnp.asarray(exps), jnp.asarray(C),
            jnp.asarray(lmn), jnp.asarray(origin), jnp.asarray(vox),
            (dims, dims, dims),
            occupations=occ,
        )
        return np.asarray(grid), origin, vox

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
