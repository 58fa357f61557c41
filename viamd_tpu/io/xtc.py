"""Gromacs XTC trajectory reader/writer (native C++ codec).

Capability mirror of mdlib's md_xtc.h (xdrfile codec; dispatched at
/root/reference/src/loader.cpp). Decoding runs in the native library
(viamd_tpu/native/xtc.cpp); frame offsets are scanned once at open for O(1)
random access (the role of the reference's sidecar cache files). nm → Å.
"""

from __future__ import annotations

import ctypes

import numpy as np

from viamd_tpu.core.unitcell import UnitCell
from viamd_tpu.io.trajectory import Trajectory

NM_TO_ANGSTROM = 10.0


def _lib():
    from viamd_tpu.native import load_library

    lib = load_library("vtpu_xtc", ["xtc.cpp"])
    lib.xtc_scan.restype = ctypes.c_int64
    lib.xtc_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.xtc_read_frames.restype = ctypes.c_int32
    lib.xtc_read_frames.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.xtc_write_frames.restype = ctypes.c_int32
    lib.xtc_write_frames.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_float,
    ]
    return lib


class XTCTrajectory(Trajectory):
    def __init__(self, path: str, max_frames: int = 1 << 24):
        self.path = path
        lib = _lib()
        offsets = np.zeros(max_frames, np.int64)
        times = np.zeros(max_frames, np.float64)
        natoms = ctypes.c_int32(0)
        n = lib.xtc_scan(
            path.encode(), max_frames,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.byref(natoms),
            times.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if n <= 0:
            raise ValueError(
                f"XTC: no readable frames in '{path}'"
                if n == 0
                else f"XTC: failed to scan '{path}'"
            )
        self._offsets = offsets[:n].copy()
        self._times = times[:n].copy()
        self._natoms = int(natoms.value)

    @property
    def num_frames(self):
        return int(self._offsets.size)

    @property
    def num_atoms(self):
        return self._natoms

    @property
    def frame_times(self):
        return self._times

    def load_frames(self, indices):
        lib = _lib()
        idx = np.asarray(list(indices), np.int64)
        offs = np.ascontiguousarray(self._offsets[idx])
        B = idx.size
        coords = np.empty((B, self._natoms, 3), np.float32)
        boxes = np.empty((B, 9), np.float32)
        rc = lib.xtc_read_frames(
            self.path.encode(),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            B, self._natoms,
            coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise ValueError(f"XTC: decode error {rc} in '{self.path}'")
        coords *= NM_TO_ANGSTROM
        cells = (boxes.reshape(B, 3, 3) * NM_TO_ANGSTROM).astype(np.float32)
        return coords, cells

    def load_frame(self, idx: int):
        coords, cells = self.load_frames([int(idx)])
        return coords[0], UnitCell.from_basis(cells[0])


def write_xtc(
    path: str,
    coords: np.ndarray,  # (F, n, 3) Å
    cell: UnitCell | None = None,
    precision: float = 1000.0,
):
    """Write frames as XTC (for tests + the export path)."""
    lib = _lib()
    coords = np.ascontiguousarray(
        np.asarray(coords, np.float32) / NM_TO_ANGSTROM
    )
    F, n, _ = coords.shape
    basis = (
        np.asarray(cell.basis, np.float32) / NM_TO_ANGSTROM
        if cell is not None and cell.is_periodic
        else np.zeros((3, 3), np.float32)
    )
    boxes = np.ascontiguousarray(
        np.broadcast_to(basis, (F, 3, 3)).reshape(F, 9).astype(np.float32)
    )
    rc = lib.xtc_write_frames(
        path.encode(),
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        F, n, precision,
    )
    if rc != 0:
        raise ValueError(f"XTC: write error {rc}")
