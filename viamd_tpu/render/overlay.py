"""Immediate-mode overlay geometry: retained per-frame draw queues.

Rebuild of src/gfx/immediate_draw_utils.{h,cpp} (reference: retained
"world"/"overlay" queues of points/lines/triangles/spheres/boxes with
picking indices, API at immediate_draw_utils.h:51-108) — used for the
simulation box, script visualization geometry (main.cpp:6540-6575) and
component annotations.

Headless formulation: primitives decompose into sphere impostors (points →
spheres, lines → capsule chains, boxes → 12 edge lines) and render through
the same tiled ray tracer as molecules, depth-compositing with the main
pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class OverlayQueue:
    _pos: list = field(default_factory=list)
    _rad: list = field(default_factory=list)
    _col: list = field(default_factory=list)
    _pick: list = field(default_factory=list)

    def clear(self):
        self._pos.clear()
        self._rad.clear()
        self._col.clear()
        self._pick.clear()

    def add_point(self, p, color=(1, 1, 1, 1), radius=0.3, pick_id=-1):
        self._pos.append(np.asarray(p, np.float32))
        self._rad.append(radius)
        self._col.append(np.asarray(color, np.float32))
        self._pick.append(pick_id)

    def add_sphere(self, center, radius, color=(1, 1, 1, 1), pick_id=-1):
        self.add_point(center, color, radius, pick_id)

    def add_line(
        self, a, b, color=(1, 1, 1, 1), radius=0.12, pick_id=-1,
        spacing: float = 0.8,
    ):
        """Capsule-chain line: spheres every `spacing`·radius along a→b."""
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        length = float(np.linalg.norm(b - a))
        n = max(int(length / max(radius * 2 * spacing, 1e-6)) + 1, 2)
        for t in np.linspace(0.0, 1.0, n):
            self.add_point(a * (1 - t) + b * t, color, radius, pick_id)

    def add_box(self, basis, origin=(0, 0, 0), color=(1, 1, 0, 1),
                radius=0.1):
        """Wireframe parallelepiped from a (3,3) row-vector basis (the
        simulation-box draw of the reference's render pass)."""
        basis = np.asarray(basis, np.float64)
        o = np.asarray(origin, np.float64)
        a, b, c = basis[0], basis[1], basis[2]
        corners = [
            o, o + a, o + b, o + c, o + a + b, o + a + c, o + b + c,
            o + a + b + c,
        ]
        edges = [
            (0, 1), (0, 2), (0, 3), (1, 4), (1, 5), (2, 4), (2, 6),
            (3, 5), (3, 6), (4, 7), (5, 7), (6, 7),
        ]
        for i, j in edges:
            self.add_line(corners[i], corners[j], color, radius)

    def add_script_visualization(
        self, vis: dict, coords: np.ndarray,
        line_color=(0.2, 0.9, 0.9, 1.0), point_color=(0.9, 0.9, 0.2, 1.0),
    ):
        """Draw a CompiledScript.visualization payload (distance lines,
        angle/dihedral paths) — the md_script vis geometry of the reference."""
        for i, j in vis.get("lines", []):
            self.add_line(coords[i], coords[j], line_color)
        for tri in vis.get("angles", []):
            for i, j in zip(tri[:-1], tri[1:]):
                self.add_line(coords[i], coords[j], line_color)
            self.add_point(coords[tri[1]], point_color, 0.2)
        for quad in vis.get("dihedrals", []):
            for i, j in zip(quad[:-1], quad[1:]):
                self.add_line(coords[i], coords[j], line_color)
        for i in vis.get("points", []):
            self.add_point(coords[i], point_color, 0.25)

    def is_empty(self) -> bool:
        return not self._pos

    def primitives(self):
        """(positions (m,3), radii (m,), colors (m,4), pick ids (m,))."""
        if not self._pos:
            z = np.zeros((0, 3), np.float32)
            return z, np.zeros(0, np.float32), np.zeros((0, 4), np.float32), \
                np.zeros(0, np.int32)
        return (
            np.stack(self._pos),
            np.asarray(self._rad, np.float32),
            np.stack(self._col),
            np.asarray(self._pick, np.int32),
        )

    def render(self, view, proj, width: int, height: int, capacity=128):
        """Render the queue → (rgba, depth, pick)."""
        from viamd_tpu.render import raster

        pos, rad, col, pick = self.primitives()
        settings = raster.RasterSettings(
            width=width, height=height, capacity=capacity
        )
        img, depth, prim_pick = raster.render_molecules(
            pos, rad, col, view, proj, settings
        )
        mapped = np.where(
            prim_pick >= 0, pick[np.maximum(prim_pick, 0)], -1
        )
        return img, depth, mapped
