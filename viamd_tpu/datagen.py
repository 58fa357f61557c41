"""Synthetic system/trajectory generators (benchmarks + tests).

Stand-ins for the reference's bundled datasets (1ALA-500.pdb and the
ubiquitin/membrane configs of BASELINE.md — the datasets/ submodule is empty
in the snapshot), generated deterministically and fully vectorized so that
100k–1M-atom benchmark systems build in seconds.
"""

from __future__ import annotations

import numpy as np

from viamd_tpu.core.system import System, build_system
from viamd_tpu.core.unitcell import UnitCell
from viamd_tpu.core import elements as E
from viamd_tpu.io.trajectory import InMemoryTrajectory


def water_box(
    n_waters: int,
    density_atoms_per_A3: float = 0.1,
    n_frames: int = 8,
    jitter: float = 0.15,
    seed: int = 0,
    infer_bonds: bool = False,
) -> tuple[System, InMemoryTrajectory]:
    """Grid-packed water box: 3·n_waters atoms, periodic cube.

    Residues = waters (SOL), elements assigned directly (no inference pass),
    masses/radii from element tables. Frames are the base configuration with
    gaussian jitter — enough structure for RDF/SDF/density kernels to produce
    meaningful output at benchmark scale.
    """
    rng = np.random.RandomState(seed)
    n_atoms = n_waters * 3
    volume = n_atoms / density_atoms_per_A3
    box = float(np.cbrt(volume))
    g = int(np.ceil(n_waters ** (1 / 3)))
    cell_w = box / g
    gg = np.stack(np.meshgrid(*[np.arange(g)] * 3, indexing="ij"), -1).reshape(-1, 3)
    centers = (gg[:n_waters] + 0.5) * cell_w
    centers += rng.normal(scale=0.1 * cell_w, size=centers.shape)
    offs = np.array([[0.0, 0, 0], [0.9572, 0, 0], [-0.24, 0.9266, 0]])
    # random per-molecule rotation (vectorized, z-axis only for speed)
    th = rng.uniform(0, 2 * np.pi, n_waters)
    c, s = np.cos(th), np.sin(th)
    ox = offs[None, :, 0] * c[:, None] - offs[None, :, 1] * s[:, None]
    oy = offs[None, :, 0] * s[:, None] + offs[None, :, 1] * c[:, None]
    coords = np.empty((n_waters, 3, 3), np.float32)
    coords[:, :, 0] = centers[:, None, 0] + ox
    coords[:, :, 1] = centers[:, None, 1] + oy
    coords[:, :, 2] = centers[:, None, 2] + offs[None, :, 2]
    coords = coords.reshape(-1, 3)

    cell = UnitCell.orthorhombic(box, box, box)
    sys = build_system(
        coords=coords,
        atom_names=["OW", "HW1", "HW2"] * n_waters,
        res_names=["SOL"] * n_atoms,
        res_ids=np.repeat(np.arange(1, n_waters + 1), 3),
        elements_z=np.tile(np.array([8, 1, 1], np.int32), n_waters),
        cell=cell,
    )
    # direct postprocess (vectorized; skips name-based inference)
    sys.radius = E.VDW_RADII[sys.element].astype(np.float32)
    sys.mass = E.MASSES[sys.element].astype(np.float32)
    from viamd_tpu.core.system import FLAG_WATER

    sys.flags[:] = FLAG_WATER
    if infer_bonds:
        from viamd_tpu.ops.bonds import infer_covalent_bonds

        sys.bonds = infer_covalent_bonds(coords, sys.element, cell)
    else:
        # waters have known topology: O-H1, O-H2
        o = np.arange(0, n_atoms, 3, dtype=np.int32)
        sys.bonds = np.concatenate(
            [np.stack([o, o + 1], 1), np.stack([o, o + 2], 1)]
        )

    frames = coords[None] + rng.normal(
        scale=jitter, size=(n_frames, n_atoms, 3)
    ).astype(np.float32)
    traj = InMemoryTrajectory(frames.astype(np.float32), cell=cell)
    return sys, traj


def polyala_helix(
    n_res: int = 64, n_frames: int = 16, seed: int = 0
) -> tuple[System, InMemoryTrajectory]:
    """Ideal poly-alanine α-helix (N/CA/C/O/CB per residue) + jittered frames.

    The 1ALA-500-style smoke-test system: exercises backbone detection,
    φ/ψ angles, secondary structure, ramachandran densities.
    """
    rng = np.random.RandomState(seed)
    # helical parameters: rise 1.5 Å, 100° per residue, radius 2.3 Å
    names, zs, coords = [], [], []
    template = [("N", 7), ("CA", 6), ("C", 6), ("O", 8), ("CB", 6)]
    for r in range(n_res):
        phase = np.radians(100.0) * r
        base = np.array(
            [2.3 * np.cos(phase), 2.3 * np.sin(phase), 1.5 * r]
        )
        for k, (nm, z) in enumerate(template):
            names.append(nm)
            zs.append(z)
            local = np.array(
                [0.4 * np.cos(phase + k), 0.4 * np.sin(phase + k), 0.3 * k]
            )
            coords.append(base + local)
    coords = np.asarray(coords, np.float32)
    n = coords.shape[0]
    sys = build_system(
        coords=coords,
        atom_names=names,
        res_names=["ALA"] * n,
        res_ids=np.repeat(np.arange(1, n_res + 1), 5),
        elements_z=np.asarray(zs, np.int32),
        cell=UnitCell.none(),
    )
    from viamd_tpu.core.system import postprocess

    sys = postprocess(sys)
    frames = coords[None] + rng.normal(scale=0.08, size=(n_frames, n, 3))
    traj = InMemoryTrajectory(frames.astype(np.float32))
    return sys, traj
