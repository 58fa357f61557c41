"""Dataset component: system summary + element remapping.

Rebuild of src/components/dataset/dataset.cpp (reference: dataset summary
window with atom/residue/chain/bond counts per kind, and the periodic-table
element remap that re-derives radii/masses/colors and re-infers bonds,
:137,:350).
"""

from __future__ import annotations

import numpy as np

from viamd_tpu.app.events import EventType
from viamd_tpu.core import elements as E
from viamd_tpu.core import system as S


class DatasetComponent:
    name = "dataset"

    def __init__(self, session):
        self.session = session

    def summary(self) -> dict:
        """Counts shown in the dataset window (init_dataset_items:137)."""
        sys = self.session.system
        if sys is None:
            return {}
        flags = sys.flags
        element_counts = {}
        for z in np.unique(sys.element):
            element_counts[E.SYMBOLS[z]] = int((sys.element == z).sum())
        return {
            "file": self.session.files.get("system"),
            "atoms": sys.natoms,
            "residues": sys.nres,
            "chains": sys.nchains,
            "instances": sys.ninstances,
            "bonds": sys.nbonds,
            "frames": self.session.num_frames,
            "water_atoms": int(((flags & S.FLAG_WATER) != 0).sum()),
            "ion_atoms": int(((flags & S.FLAG_ION) != 0).sum()),
            "protein_atoms": int(((flags & S.FLAG_AMINO) != 0).sum()),
            "backbone_residues": (
                sys.backbone.count if sys.backbone else 0
            ),
            "elements": element_counts,
            "cell": sys.cell.lengths_angles() if sys.cell.is_periodic else None,
        }

    def remap_element(self, filter_expr: str, element_symbol: str):
        """Set the element of matched atoms and re-derive radii, masses and
        bonds (the PeriodicTableResult apply path, dataset.cpp:350)."""
        sys = self.session.system
        z = E.symbol_to_z(element_symbol)
        if not z:
            raise ValueError(f"unknown element '{element_symbol}'")
        from viamd_tpu.script import evaluate_filter

        mask, _ = evaluate_filter(
            filter_expr, sys, self.session.stored_selections
        )
        idx = mask.indices()
        sys.element[idx] = z
        sys.radius = E.VDW_RADII[sys.element].astype(np.float32)
        sys.mass = E.MASSES[sys.element].astype(np.float32)
        from viamd_tpu.ops.bonds import infer_covalent_bonds

        sys.bonds = infer_covalent_bonds(sys.coords(), sys.element, sys.cell)
        self.session.events.broadcast(EventType.SYSTEM_INIT, self.session)
        return idx.size
