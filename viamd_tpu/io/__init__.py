"""File-format loaders + trajectory abstraction.

TPU-native rebuild of mdlib's L1 I/O layer (SURVEY.md §1 L1): system loaders
(PDB, GRO, XYZ/XMOL/ARC, mmCIF, LAMMPS data), trajectory readers (PDB, XYZ,
XTC, TRR, DCD, LAMMPS trj) and a packed frame-cache format for O(1) random
sharded frame access (the analog of mdlib's sidecar trajectory caches,
/root/reference/src/loader.cpp:118-121).
"""

from viamd_tpu.io.loader import load_file, loader_for_path, LoaderFlags

__all__ = ["load_file", "loader_for_path", "LoaderFlags"]
