"""Trajectory abstraction.

TPU-native equivalent of mdlib's md_trajectory_i (reference capability:
header {num_frames, num_atoms, frame_times}, random-access load_frame, and
per-thread readers — /root/reference/src/viamd.cpp:439-516).

Design difference from the reference (which streams single frames into a
4-slot LRU cache, src/viamd.h:43): the TPU eval engine consumes *batches* of
frames shaped (B, n_atoms, 3) to feed vmapped kernels, so the base interface
is `load_frames(indices) -> (B, n, 3) float32` plus `load_frame` for
interactive single-frame use. A small LRU cache backs interactive playback.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional, Sequence

import numpy as np

from viamd_tpu.core.unitcell import UnitCell


class Trajectory:
    """Abstract trajectory: random access to frames of a fixed-size system."""

    @property
    def num_frames(self) -> int:
        raise NotImplementedError

    @property
    def num_atoms(self) -> int:
        raise NotImplementedError

    @property
    def frame_times(self) -> np.ndarray:
        """(num_frames,) float64 times in ps (double for long trajectories,
        matching src/viamd.h:1100)."""
        raise NotImplementedError

    def load_frame(self, idx: int) -> tuple[np.ndarray, UnitCell]:
        """Return ((n,3) float32 coords, cell) for one frame."""
        raise NotImplementedError

    def load_frames(self, indices: Sequence[int]) -> tuple[np.ndarray, np.ndarray]:
        """Batched load: ((B,n,3) float32, (B,3,3) float32 cell bases).

        Default implementation loops `load_frame`; high-throughput backends
        (packed cache) override with a single contiguous read.
        """
        coords = np.empty((len(indices), self.num_atoms, 3), np.float32)
        cells = np.empty((len(indices), 3, 3), np.float32)
        for k, idx in enumerate(indices):
            xyz, cell = self.load_frame(int(idx))
            coords[k] = xyz
            cells[k] = np.asarray(cell.basis)
        return coords, cells

    def cell_of(self, idx: int) -> UnitCell:
        return self.load_frame(idx)[1]


class InMemoryTrajectory(Trajectory):
    """All frames resident: (F, n, 3) float32 + per-frame cells."""

    def __init__(
        self,
        coords: np.ndarray,
        cells: Optional[np.ndarray] = None,
        times: Optional[np.ndarray] = None,
        cell: Optional[UnitCell] = None,
    ):
        coords = np.asarray(coords, np.float32)
        assert coords.ndim == 3 and coords.shape[2] == 3
        self._coords = coords
        f = coords.shape[0]
        if cells is None:
            basis = (
                np.asarray(cell.basis, np.float32)
                if cell is not None
                else np.zeros((3, 3), np.float32)
            )
            cells = np.broadcast_to(basis, (f, 3, 3)).copy()
        self._cells = np.asarray(cells, np.float32)
        self._times = (
            np.asarray(times, np.float64)
            if times is not None
            else np.arange(f, dtype=np.float64)
        )

    @property
    def num_frames(self) -> int:
        return self._coords.shape[0]

    @property
    def num_atoms(self) -> int:
        return self._coords.shape[1]

    @property
    def frame_times(self) -> np.ndarray:
        return self._times

    def load_frame(self, idx: int):
        return self._coords[idx], UnitCell.from_basis(self._cells[idx])

    def load_frames(self, indices):
        idx = np.asarray(indices, np.int64)
        return self._coords[idx], self._cells[idx]


class DeviceTrajectory(Trajectory):
    """Device-resident trajectory: all frames staged into HBM once.

    The TPU-scale analog of the reference's resident frame cache
    (src/viamd.h:43): host→device transfer happens once at construction
    (chunked — the tunneled backend degrades on large single transfers),
    after which per-frame evaluation reads device arrays with zero H2D on
    the hot path. A 256-frame 100k-atom trajectory is ~300 MB of HBM.
    """

    def __init__(self, inner: Trajectory, chunk: int = 16):
        import jax
        import jax.numpy as jnp

        self._times = np.asarray(inner.frame_times)
        self._natoms = inner.num_atoms
        F = inner.num_frames
        frames = []
        cells = []
        for beg in range(0, F, chunk):
            c, b = inner.load_frames(list(range(beg, min(beg + chunk, F))))
            for k in range(c.shape[0]):
                frames.append(jax.device_put(c[k]))
                cells.append(b[k])
        self._frames = frames  # list of (n,3) device arrays
        self._cells = np.asarray(cells, np.float32)
        self._cells_dev = [jax.device_put(c) for c in self._cells]

    @property
    def num_frames(self):
        return len(self._frames)

    @property
    def num_atoms(self):
        return self._natoms

    @property
    def frame_times(self):
        return self._times

    def load_frame(self, idx: int):
        return np.asarray(self._frames[int(idx)]), UnitCell.from_basis(
            self._cells[int(idx)]
        )

    def load_frames(self, indices):
        idx = np.asarray(list(indices), np.int64)
        import jax.numpy as jnp

        coords = jnp.stack([self._frames[int(i)] for i in idx])
        return coords, self._cells[idx]

    def device_frame(self, idx: int):
        """(coords, cell basis) as device arrays — the zero-copy hot path."""
        return self._frames[int(idx)], self._cells_dev[int(idx)]


class CachedTrajectory(Trajectory):
    """LRU frame cache over another trajectory (interactive playback path).

    Mirrors the 4-slot frame cache of the reference (src/viamd.h:43,957-961).
    """

    def __init__(self, inner: Trajectory, capacity: int = 4):
        self.inner = inner
        self.capacity = capacity
        self._lru: OrderedDict[int, tuple[np.ndarray, UnitCell]] = OrderedDict()

    @property
    def num_frames(self):
        return self.inner.num_frames

    @property
    def num_atoms(self):
        return self.inner.num_atoms

    @property
    def frame_times(self):
        return self.inner.frame_times

    def load_frame(self, idx: int):
        idx = int(idx)
        hit = self._lru.get(idx)
        if hit is not None:
            self._lru.move_to_end(idx)
            return hit
        val = self.inner.load_frame(idx)
        self._lru[idx] = val
        if len(self._lru) > self.capacity:
            self._lru.popitem(last=False)
        return val

    def load_frames(self, indices):
        return self.inner.load_frames(indices)
