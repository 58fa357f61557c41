"""Density-volume component: render script volume properties.

Rebuild of src/components/density_volume/density_volume.cpp (reference: the
window for Type_Volume script properties — 3D texture upload of the SDF
grid (:276-283), transfer-function DVR + up to 8 isosurfaces, model matrix
from ±extent (:193-197), per-structure reference representations, its own
camera/GBuffer).

Headless surface: pick a volume property from the session's EvalResult and
produce framebuffers via the Pallas/JAX ray-marcher.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from viamd_tpu.app.events import EventType
from viamd_tpu.render import camera as cam_mod
from viamd_tpu.render import colormap as cmap_mod
from viamd_tpu.render import volume as vol_mod

MAX_ISO = 8  # reference cap


class DensityVolumeComponent:
    name = "density_volume"

    def __init__(self, session):
        self.session = session
        self.colormap = "viridis"
        self.alpha_scale = 1.0
        self.blur_sigma = 0.0  # voxels; gaussian smoothing before rendering
        self.iso_values: tuple = ()
        self.iso_colors: tuple = ()
        # fractional clip sub-box (the reference's Clip planes GUI,
        # density_volume.cpp:405-420,826)
        self.clip_min: tuple = (0.0, 0.0, 0.0)
        self.clip_max: tuple = (1.0, 1.0, 1.0)
        session.events.subscribe(EventType.EVAL_COMPLETE, self._on_eval)
        self._last_result = None

    def _on_eval(self, ev):
        self._last_result = ev.payload

    def volume_properties(self) -> list[str]:
        res = self._last_result or self.session.eval_result
        if res is None:
            return []
        return [p.name for p in res.properties if p.kind == "volume"]

    def set_isosurfaces(self, values, colors=None):
        values = tuple(values)[:MAX_ISO]
        if colors is None:
            base = cmap_mod.colormap("plasma", max(len(values), 2))
            colors = tuple(
                (float(r), float(g), float(b), 0.8) for r, g, b in base[: len(values)]
            )
        self.iso_values = values
        self.iso_colors = tuple(colors)[: len(values)]

    def sdf_vis(self, prop_name: Optional[str] = None) -> dict:
        """The vis.sdf payload for a volume property (the reference's
        md_script_vis_eval_payload MD_SCRIPT_VISUALIZE_SDF record,
        density_volume.cpp:180-204): {extent, structures, struct_idx,
        struct_w, ref_centered}. Read from the property's spec, so it
        stays correct through property reassignment."""
        res = self._last_result or self.session.eval_result
        if res is None:
            raise ValueError("no evaluation result — run session.evaluate()")
        names = self.volume_properties()
        if not names:
            raise ValueError("no volume properties")
        prop_name = prop_name or names[0]
        if prop_name not in names:
            raise KeyError(prop_name)
        rec = res.property(prop_name).spec.vis
        if rec is None:
            # checkpoint-restored results drop spec.vis (array payloads
            # are not serialized); recover it by NAME from the session's
            # compiled script (the call-ordered "sdf" list desynchronizes
            # under property reassignment)
            compiled = self.session.compiled
            by_name = (
                compiled.visualization.get("sdf_by_name", {})
                if compiled
                else {}
            )
            if prop_name in by_name:
                return by_name[prop_name]
            raise KeyError(f"{prop_name}: no vis.sdf payload")
        return rec

    def _frame_coords(self, frame: Optional[int]) -> np.ndarray:
        ses = self.session
        return (
            ses.current_coords()
            if frame is None
            else ses.trajectory.load_frame(int(frame))[0]
        )

    def reference_frames(
        self,
        prop_name: Optional[str] = None,
        frame: Optional[int] = None,
        coords: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Per-structure world→reference 4×4 matrices for one frame (the
        inverse reference-frame matrices of density_volume.cpp:246-270):
        p_ref = R·(p_world − com). Returns (S, 4, 4)."""
        import jax.numpy as jnp

        from viamd_tpu.ops.sdf import sdf_reference_frames

        rec = self.sdf_vis(prop_name)
        ses = self.session
        if coords is None:
            coords = self._frame_coords(frame)
        cell = ses.system.cell
        R, c = sdf_reference_frames(
            jnp.asarray(coords, jnp.float32),
            jnp.asarray(rec["struct_idx"]),
            jnp.asarray(rec["struct_w"]),
            jnp.asarray(rec["ref_centered"]),
            jnp.asarray(np.asarray(cell.basis, np.float32)),
            jnp.asarray(np.asarray(cell.inv_basis, np.float32)),
        )
        R = np.asarray(R)
        c = np.asarray(c)
        S = R.shape[0]
        M = np.tile(np.eye(4, dtype=np.float32), (S, 1, 1))
        M[:, :3, :3] = R
        M[:, :3, 3] = -np.einsum("sij,sj->si", R, c)
        return M

    def render_references(
        self,
        prop_name: Optional[str] = None,
        frame: Optional[int] = None,
        width: int = 512,
        height: int = 512,
        camera: Optional[cam_mod.Camera] = None,
        max_structures: int = 100,
    ):
        """Render the SDF reference structures aligned into the volume's
        reference frame (the ≤100 per-structure reps the reference draws
        inside the density-volume window, density_volume.cpp:245-270).
        Returns ((H,W,4) RGBA, (H,W) depth) composable with render()."""
        from viamd_tpu.render.overlay import OverlayQueue

        rec = self.sdf_vis(prop_name)
        ses = self.session
        coords = self._frame_coords(frame)
        M = self.reference_frames(prop_name, frame, coords=coords)
        extent = rec["extent"]
        if camera is None:
            camera = cam_mod.compute_optimal_view(
                [-extent] * 3, [extent] * 3
            )
        from viamd_tpu.core import elements as E
        from viamd_tpu.render.color import color_atoms_cpk

        q = OverlayQueue()
        sys_ = ses.system
        all_cols = color_atoms_cpk(sys_)
        for s, atoms in enumerate(rec["structures"][:max_structures]):
            Ms = M[s]
            p = coords[atoms] @ Ms[:3, :3].T + Ms[:3, 3]
            cols = all_cols[atoms]
            radii = E.VDW_RADII[sys_.element[atoms]] * 0.3
            for k in range(len(atoms)):
                q.add_sphere(
                    p[k], float(radii[k]),
                    tuple(float(v) for v in cols[k][:3]) + (1.0,),
                    pick_id=int(atoms[k]),
                )
        img, depth, _pick = q.render(
            camera.view_matrix(),
            camera.proj_matrix(width, height),
            width, height,
            capacity=max(128, sum(len(a) for a in rec["structures"][:max_structures])),
        )
        return np.asarray(img), np.asarray(depth)

    def render(
        self,
        prop_name: Optional[str] = None,
        width: int = 512,
        height: int = 512,
        camera: Optional[cam_mod.Camera] = None,
        normalized: bool = True,
        color_volume=None,
        scene_depth=None,
    ):
        """Render a volume property → ((H,W,4) RGBA, (H,W) depth).

        `color_volume`: optional (D,D,D,3) RGB grid (ops.density.
        splat_color_volume) — DVR color comes from it instead of the TF
        (the colvol raycaster variants; supported by BOTH the ray-marcher
        and the shear-warp path).
        `scene_depth`: optional (H,W) linear view depth of opaque geometry
        rendered with the same camera — the march stops at the surface
        (the entryexit scene-depth clamp); use render_composite() for the
        full in-scene pass.
        Honors `clip_min`/`clip_max` (the Clip-planes GUI)."""
        res = self._last_result or self.session.eval_result
        if res is None:
            raise ValueError("no evaluation result — run session.evaluate()")
        names = self.volume_properties()
        if not names:
            raise ValueError("no volume properties in the evaluation")
        prop_name = prop_name or names[0]
        meta = res.property(prop_name)
        grid = (
            res.normalized_volume(prop_name)
            if normalized
            else res.volumes[prop_name]
        )
        if self.blur_sigma > 0:
            import jax.numpy as jnp

            from viamd_tpu.ops.density import gaussian_blur_3d

            grid = np.asarray(gaussian_blur_3d(jnp.asarray(grid), self.blur_sigma))
        vmax = float(grid.max()) or 1.0
        extent = meta.spec.extent
        model = vol_mod.model_matrix_from_extent(extent)
        if camera is None:
            camera = cam_mod.compute_optimal_view(
                [-extent] * 3, [extent] * 3
            )
        tf = cmap_mod.transfer_function(
            self.colormap, 256, alpha_scale=self.alpha_scale
        )
        settings = vol_mod.VolumeRenderSettings(
            width=width,
            height=height,
            value_range=(0.0, vmax),
            enable_iso=bool(self.iso_values),
            iso_values=tuple(v * vmax for v in self.iso_values),
            iso_colors=self.iso_colors,
            clip_min=tuple(self.clip_min),
            clip_max=tuple(self.clip_max),
        )
        # large screens route through the shear-warp renderer (dense MXU
        # slice compositing — 1080p×128³ in ~15 ms on one v5e; the general
        # ray-marcher is gather-bound and only sensible for small frames);
        # it falls back to the ray-marcher itself for degenerate cameras
        if width * height >= 256 * 256:
            from viamd_tpu.render.shearwarp import render_volume_shearwarp

            img, depth = render_volume_shearwarp(
                grid, tf, model, camera.view_matrix(),
                camera.proj_matrix(width, height), settings,
                color_volume=color_volume, scene_depth=scene_depth,
            )
        else:
            img, depth = vol_mod.render_volume(
                grid, tf, model, camera.view_matrix(),
                camera.proj_matrix(width, height), settings,
                color_volume=color_volume, scene_depth=scene_depth,
            )
        return np.asarray(img), np.asarray(depth)

    def render_composite(
        self,
        prop_name: Optional[str] = None,
        frame: Optional[int] = None,
        width: int = 512,
        height: int = 512,
        camera: Optional[cam_mod.Camera] = None,
        max_structures: int = 100,
        **render_kw,
    ):
        """In-scene volume pass: reference structures + the volume in ONE
        image (the reference's density-volume window render,
        density_volume.cpp:761 → volumerender_utils.cpp:451). The volume
        march is clamped against the structures' depth buffer, so an atom
        INSIDE the volume truncates the translucent march (correct
        compositing, not a binary depth compare). Returns (H,W,4) RGBA."""
        rec = self.sdf_vis(prop_name)
        extent = rec["extent"]
        if camera is None:
            camera = cam_mod.compute_optimal_view(
                [-extent] * 3, [extent] * 3
            )
        ref_img, ref_depth = self.render_references(
            prop_name, frame, width, height, camera, max_structures
        )
        vol_img, _ = self.render(
            prop_name, width, height, camera,
            scene_depth=ref_depth, **render_kw,
        )
        # volume rgb is premultiplied by its alpha: OVER-composite onto
        # the opaque structures
        va = vol_img[..., 3:4]
        rgb = vol_img[..., :3] + ref_img[..., :3] * ref_img[..., 3:4] * (
            1.0 - va
        )
        a = va + ref_img[..., 3:4] * (1.0 - va)
        return np.concatenate([rgb, a], axis=-1).astype(np.float32)
