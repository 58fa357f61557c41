"""VeloxChem QM data (HDF5) — molecular orbitals for GTO grid evaluation.

Capability mirror of mdlib's md_vlx.h (reference: md_vlx_parse_file at
/root/reference/src/components/veloxchem/veloxchem.cpp:1312, feeding MO/
density grids through md_gto). Holds the quantum data the veloxchem
component consumes: atom positions/charges, a cartesian GTO basis expanded
to primitives, and MO coefficient matrices.

The HDF5 reader accepts the common VeloxChem checkpoint spellings for each
dataset (alpha orbital coefficients etc.) and raises with the discovered
key inventory when a layout is unrecognized — QM checkpoint formats drift,
so `QMData.from_arrays` is the stable construction path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

BOHR_PER_ANGSTROM = 1.8897259886

# cartesian shell expansions per angular momentum
_CART = {
    0: [(0, 0, 0)],
    1: [(1, 0, 0), (0, 1, 0), (0, 0, 1)],
    2: [(2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1), (0, 0, 2)],
    3: [
        (3, 0, 0), (2, 1, 0), (2, 0, 1), (1, 2, 0), (1, 1, 1), (1, 0, 2),
        (0, 3, 0), (0, 2, 1), (0, 1, 2), (0, 0, 3),
    ],
}


@dataclass
class Shell:
    center: np.ndarray  # (3,) Bohr
    angular: int  # 0=s 1=p 2=d 3=f
    exponents: np.ndarray  # (nprim,)
    contraction: np.ndarray  # (nprim,)


@dataclass
class QMData:
    atom_coords: np.ndarray  # (na, 3) Bohr
    atom_numbers: np.ndarray  # (na,)
    shells: list[Shell]
    mo_coeffs: np.ndarray  # (nbasis_cart, nmo)
    mo_energies: np.ndarray | None = None
    mo_occupations: np.ndarray | None = None
    # expanded primitive arrays (built lazily)
    _prims: tuple | None = field(default=None, repr=False)

    @property
    def n_orbitals(self) -> int:
        return self.mo_coeffs.shape[1]

    def primitives_for_orbital(self, mo: int):
        """(centers, exponents, coeffs, lmn) with contraction × norm × MO
        coefficient folded into coeffs — direct input to ops.gto."""
        centers, exps, lmn, basis_idx, cnorm = self._expand()
        c = self.mo_coeffs[basis_idx, mo] * cnorm
        return centers, exps, c.astype(np.float32), lmn

    def primitives_all(self):
        """(centers, exponents, coeff_matrix (K, nmo), lmn)."""
        centers, exps, lmn, basis_idx, cnorm = self._expand()
        C = self.mo_coeffs[basis_idx, :] * cnorm[:, None]
        return centers, exps, C.astype(np.float32), lmn

    def _expand(self):
        if self._prims is not None:
            return self._prims
        from viamd_tpu.ops.gto import normalization

        centers, exps, lmn, bidx, cn = [], [], [], [], []
        b = 0
        for sh in self.shells:
            for l, m, n in _CART[sh.angular]:
                for a, c in zip(sh.exponents, sh.contraction):
                    centers.append(sh.center)
                    exps.append(a)
                    lmn.append((l, m, n))
                    bidx.append(b)
                    cn.append(c * normalization(float(a), l, m, n))
                b += 1
        if b != self.mo_coeffs.shape[0]:
            raise ValueError(
                f"basis size mismatch: {b} cartesian functions vs "
                f"{self.mo_coeffs.shape[0]} MO rows"
            )
        self._prims = (
            np.asarray(centers, np.float32),
            np.asarray(exps, np.float32),
            np.asarray(lmn, np.int32),
            np.asarray(bidx, np.int32),
            np.asarray(cn, np.float32),
        )
        return self._prims

    @classmethod
    def from_arrays(cls, atom_coords_bohr, atom_numbers, shells, mo_coeffs,
                    **kw) -> "QMData":
        return cls(
            np.asarray(atom_coords_bohr, np.float32),
            np.asarray(atom_numbers, np.int32),
            shells,
            np.asarray(mo_coeffs, np.float32),
            **kw,
        )


def _find(h5, *names):
    for nm in names:
        if nm in h5:
            return np.asarray(h5[nm])
    return None


def load_vlx_h5(path: str) -> QMData:
    """Best-effort VeloxChem checkpoint reader (md_vlx_parse_file analog)."""
    import h5py

    with h5py.File(path, "r") as f:
        keys = []
        f.visit(keys.append)
        coords = _find(
            f, "atom_coordinates", "molecule/coordinates", "nuclear_coordinates"
        )
        charges = _find(
            f, "nuclear_charges", "molecule/nuclear_charges", "atom_numbers"
        )
        C = _find(
            f, "alpha_orbitals", "C_alpha", "scf/alpha/orbitals",
            "mo_coefficients",
        )
        energies = _find(f, "alpha_energies", "E_alpha", "scf/alpha/energies")
        if coords is None or charges is None or C is None:
            raise ValueError(
                f"unrecognized VeloxChem h5 layout in '{path}'; datasets: "
                f"{keys[:40]}"
            )
        # basis: expect groups basis/<shell_idx> with angular/exponents/coeffs
        shells: list[Shell] = []
        if "basis" in f:
            g = f["basis"]
            for k in sorted(g.keys(), key=lambda s: int(s) if s.isdigit() else 0):
                sh = g[k]
                shells.append(
                    Shell(
                        center=np.asarray(sh["center"], np.float32),
                        angular=int(np.asarray(sh["angular"])),
                        exponents=np.asarray(sh["exponents"], np.float32),
                        contraction=np.asarray(sh["coefficients"], np.float32),
                    )
                )
        if not shells:
            raise ValueError(
                f"no basis group in '{path}' — construct QMData.from_arrays "
                "with an explicit shell list"
            )
        return QMData(
            np.asarray(coords, np.float32),
            np.asarray(charges).astype(np.int32),
            shells,
            np.asarray(C, np.float32),
            mo_energies=energies,
        )
