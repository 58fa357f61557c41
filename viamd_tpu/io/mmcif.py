"""PDBx/mmCIF structure loader.

Capability mirror of mdlib's md_mmcif.h (dispatched at
/root/reference/src/loader.cpp (cif → System|MM)).

Parses the `_atom_site` loop (the structural payload) plus the `_cell`
block for the unit cell. Columns are resolved by tag name so any column
order works; quoted tokens and multi-line values are handled for the
fields that matter here.
"""

from __future__ import annotations

import shlex

import numpy as np

from viamd_tpu.core.system import System, build_system, postprocess
from viamd_tpu.core.unitcell import UnitCell
from viamd_tpu.core import elements as E


def _split_cif_line(line: str) -> list[str]:
    """CIF tokenization: whitespace-separated, '...'/"..." quoting."""
    if "'" not in line and '"' not in line:
        return line.split()
    try:
        lex = shlex.shlex(line, posix=True)
        lex.whitespace_split = True
        lex.commenters = "#"
        return list(lex)
    except ValueError:
        return line.split()


def parse_mmcif(text: str | bytes) -> System:
    if isinstance(text, bytes):
        text = text.decode("utf-8", "replace")
    lines = text.splitlines()

    cell_vals: dict[str, float] = {}
    atom_cols: list[str] = []
    atom_rows: list[list[str]] = []

    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if line.startswith("_cell."):
            parts = line.split(None, 1)
            if len(parts) == 2:
                try:
                    cell_vals[parts[0]] = float(parts[1].split("(")[0])
                except ValueError:
                    pass
            i += 1
        elif line == "loop_":
            # collect tags
            i += 1
            tags = []
            while i < n and lines[i].strip().startswith("_"):
                tags.append(lines[i].strip().split()[0])
                i += 1
            if tags and tags[0].startswith("_atom_site."):
                atom_cols = [t.split(".", 1)[1] if "." in t else t for t in tags]
                while i < n:
                    row = lines[i].strip()
                    if (
                        not row
                        or row.startswith("#")
                        or row.startswith("_")
                        or row == "loop_"
                        or row.startswith("data_")
                    ):
                        break
                    toks = _split_cif_line(row)
                    if len(toks) >= len(atom_cols):
                        atom_rows.append(toks[: len(atom_cols)])
                    i += 1
            # else: skip other loops' data rows
        else:
            i += 1

    if not atom_rows:
        raise ValueError("mmCIF: no _atom_site loop found")

    col = {c: k for k, c in enumerate(atom_cols)}

    def get(row, *names, default=""):
        for nm in names:
            if nm in col:
                v = row[col[nm]]
                if v not in (".", "?"):
                    return v
        return default

    natoms = len(atom_rows)
    xyz = np.empty((natoms, 3), np.float32)
    names, resnames, chains = [], [], []
    resids = np.empty(natoms, np.int32)
    zs = np.zeros(natoms, np.int32)
    occ = np.ones(natoms, np.float32)
    bfac = np.zeros(natoms, np.float32)
    for k, row in enumerate(atom_rows):
        xyz[k, 0] = float(get(row, "Cartn_x", default="0"))
        xyz[k, 1] = float(get(row, "Cartn_y", default="0"))
        xyz[k, 2] = float(get(row, "Cartn_z", default="0"))
        names.append(get(row, "label_atom_id", "auth_atom_id"))
        resnames.append(get(row, "label_comp_id", "auth_comp_id"))
        chains.append(get(row, "auth_asym_id", "label_asym_id"))
        rid = get(row, "auth_seq_id", "label_seq_id", default="0")
        try:
            resids[k] = int(rid)
        except ValueError:
            resids[k] = 0
        sym = get(row, "type_symbol")
        if sym:
            zs[k] = E.symbol_to_z(sym)
        try:
            occ[k] = float(get(row, "occupancy", default="1"))
            bfac[k] = float(get(row, "B_iso_or_equiv", default="0"))
        except ValueError:
            pass

    cell = UnitCell.none()
    if "_cell.length_a" in cell_vals:
        cell = UnitCell.from_lengths_angles(
            cell_vals.get("_cell.length_a", 0.0),
            cell_vals.get("_cell.length_b", 0.0),
            cell_vals.get("_cell.length_c", 0.0),
            cell_vals.get("_cell.angle_alpha", 90.0),
            cell_vals.get("_cell.angle_beta", 90.0),
            cell_vals.get("_cell.angle_gamma", 90.0),
        )

    sys = build_system(
        coords=xyz,
        atom_names=names,
        res_names=resnames,
        res_ids=resids,
        chain_ids=chains,
        elements_z=zs,
        cell=cell,
        occupancy=occ,
        bfactor=bfac,
    )
    return postprocess(sys)


def load_mmcif(path: str) -> System:
    with open(path, "r") as f:
        return parse_mmcif(f.read())
