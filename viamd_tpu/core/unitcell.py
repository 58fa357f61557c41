"""Unit cell (periodic box) representation.

TPU-native equivalent of mdlib's md_unitcell_t (reference capability:
triclinic basis used at /root/reference/src/viamd.cpp:581-583 and PBC kernels
in md_util.h — see SURVEY.md §2.3).

A cell is a 3×3 **row-vector basis** B (rows = lattice vectors a, b, c) plus a
flags word. The basis (and its inverse) are plain float32 arrays so they pass
straight into jitted kernels as small SMEM-resident operands. `UnitCell` is
registered as a JAX pytree with static flags, so it can cross jit boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

PBC_NONE = 0
PBC_ORTHO = 1  # diagonal basis
PBC_TRICLINIC = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class UnitCell:
    """Periodic cell: row-vector basis + inverse basis + static kind flag."""

    basis: Any  # (3,3) f32, rows = a,b,c lattice vectors
    inv_basis: Any  # (3,3) f32
    kind: int = dataclasses.field(metadata=dict(static=True), default=PBC_NONE)

    # -- constructors --------------------------------------------------------
    @staticmethod
    def none() -> "UnitCell":
        z = np.zeros((3, 3), np.float32)
        return UnitCell(z, z, PBC_NONE)

    @staticmethod
    def orthorhombic(ax: float, by: float, cz: float) -> "UnitCell":
        if ax == 0 and by == 0 and cz == 0:
            return UnitCell.none()
        basis = np.diag([ax, by, cz]).astype(np.float32)
        inv = np.diag(
            [1.0 / v if v else 0.0 for v in (ax, by, cz)]
        ).astype(np.float32)
        return UnitCell(basis, inv, PBC_ORTHO)

    @staticmethod
    def from_basis(basis: np.ndarray) -> "UnitCell":
        basis = np.asarray(basis, np.float32)
        if not basis.any():
            return UnitCell.none()
        off_diag = basis - np.diag(np.diag(basis))
        if not off_diag.any():
            d = np.diag(basis)
            return UnitCell.orthorhombic(float(d[0]), float(d[1]), float(d[2]))
        inv = np.linalg.inv(basis).astype(np.float32)
        return UnitCell(basis, inv, PBC_TRICLINIC)

    @staticmethod
    def from_lengths_angles(
        a: float, b: float, c: float, alpha: float, beta: float, gamma: float
    ) -> "UnitCell":
        """Crystallographic (lengths Å, angles degrees) → lower-triangular basis."""
        if a == 0 and b == 0 and c == 0:
            return UnitCell.none()
        if alpha == 90.0 and beta == 90.0 and gamma == 90.0:
            return UnitCell.orthorhombic(a, b, c)
        ar, br, cr = np.radians([alpha, beta, gamma])
        cx = c * np.cos(br)
        cy = c * (np.cos(ar) - np.cos(br) * np.cos(cr)) / np.sin(cr)
        cz = np.sqrt(max(c * c - cx * cx - cy * cy, 0.0))
        basis = np.array(
            [
                [a, 0, 0],
                [b * np.cos(cr), b * np.sin(cr), 0],
                [cx, cy, cz],
            ],
            dtype=np.float32,
        )
        return UnitCell.from_basis(basis)

    # -- queries -------------------------------------------------------------
    @property
    def is_periodic(self) -> bool:
        return self.kind != PBC_NONE

    @property
    def is_orthorhombic(self) -> bool:
        return self.kind == PBC_ORTHO

    def extent(self) -> np.ndarray:
        """Box extents (diagonal for ortho; row norms for triclinic)."""
        b = np.asarray(self.basis)
        if self.kind == PBC_TRICLINIC:
            return np.linalg.norm(b, axis=1).astype(np.float32)
        return np.diag(b).astype(np.float32)

    def volume(self) -> float:
        return float(abs(np.linalg.det(np.asarray(self.basis, np.float64))))

    def lengths_angles(self) -> tuple[float, float, float, float, float, float]:
        b = np.asarray(self.basis, np.float64)
        la = np.linalg.norm(b, axis=1)
        if not la.all():
            return (*la.tolist(), 90.0, 90.0, 90.0)

        def ang(u, v):
            return float(
                np.degrees(
                    np.arccos(
                        np.clip(np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v)), -1, 1)
                    )
                )
            )

        return (
            float(la[0]),
            float(la[1]),
            float(la[2]),
            ang(b[1], b[2]),
            ang(b[0], b[2]),
            ang(b[0], b[1]),
        )

    def __eq__(self, o):
        return (
            isinstance(o, UnitCell)
            and self.kind == o.kind
            and np.array_equal(np.asarray(self.basis), np.asarray(o.basis))
        )

    def __hash__(self):
        return hash((self.kind, np.asarray(self.basis).tobytes()))
