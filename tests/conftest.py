"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic (shard_map over the `frames` axis) is validated on
host CPU devices, per SURVEY.md §4; real-TPU benchmarking happens in bench.py.
"""

import os

# Force CPU: the surrounding environment pins JAX_PLATFORMS=axon (a real TPU
# behind a slow tunnel), and a pytest plugin imports jax before this conftest
# runs — so setting env vars alone is too late. jax.config.update works any
# time before backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on CPU; backend was initialized too early"
)

import numpy as np
import pytest

from viamd_tpu.core.system import System, build_system, postprocess
from viamd_tpu.core.unitcell import UnitCell
from viamd_tpu.io.trajectory import InMemoryTrajectory


def make_ala_pdb(n_res: int = 4, n_models: int = 1) -> str:
    """Synthesize a small poly-alanine PDB (optionally multi-MODEL)."""
    rng = np.random.RandomState(42)
    lines = ["CRYST1   40.000   40.000   40.000  90.00  90.00  90.00 P 1           1"]
    atoms = []  # (name, element)
    template = [("N", "N"), ("CA", "C"), ("C", "C"), ("O", "O"), ("CB", "C")]
    base = np.zeros(3)
    serial = 0
    coords0 = []
    for r in range(n_res):
        base = np.array([3.8 * r + 5.0, 20.0, 20.0])
        for k, (nm, el) in enumerate(template):
            serial += 1
            p = base + np.array([k * 0.9, (k % 2) * 1.2, (k % 3) * 0.7])
            coords0.append(p)
            atoms.append((serial, nm, r + 1, el, p))
    coords0 = np.array(coords0)

    def frame_lines(coords):
        out = []
        for (serial, nm, resid, el, _), p in zip(atoms, coords):
            out.append(
                f"ATOM  {serial:5d} {nm:<4s} ALA A{resid:4d}    "
                f"{p[0]:8.3f}{p[1]:8.3f}{p[2]:8.3f}  1.00  0.00          "
                f"{el:>2s}"
            )
        return out

    if n_models == 1:
        lines += frame_lines(coords0)
    else:
        for m in range(n_models):
            lines.append(f"MODEL     {m + 1:4d}")
            jitter = rng.normal(scale=0.1, size=coords0.shape) * m
            lines += frame_lines(coords0 + jitter)
            lines.append("ENDMDL")
    lines.append("END")
    return "\n".join(lines) + "\n"


@pytest.fixture
def ala_system():
    from viamd_tpu.io.pdb import parse_pdb

    sys, _ = parse_pdb(make_ala_pdb(4))
    return sys


@pytest.fixture
def ala_traj_system():
    from viamd_tpu.io.pdb import parse_pdb

    return parse_pdb(make_ala_pdb(4, n_models=10))


def make_water_box(n_waters: int = 64, box: float = 20.0, n_frames: int = 5):
    """Random TIP3P-ish water box System + InMemoryTrajectory."""
    rng = np.random.RandomState(7)
    # grid placement so no two molecules overlap (bond inference stays clean)
    g = int(np.ceil(n_waters ** (1 / 3)))
    gg = np.stack(
        np.meshgrid(*[np.arange(g)] * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3)[:n_waters]
    centers = (gg + 0.5) * (box / g) + rng.normal(scale=0.2, size=(n_waters, 3))
    offs = np.array([[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
    coords = (centers[:, None, :] + offs[None, :, :]).reshape(-1, 3)
    n = coords.shape[0]
    names = ["OW", "HW1", "HW2"] * n_waters
    res_ids = np.repeat(np.arange(1, n_waters + 1), 3)
    cell = UnitCell.orthorhombic(box, box, box)
    sys = build_system(
        coords=coords,
        atom_names=names,
        res_names=["SOL"] * n,
        res_ids=res_ids,
        cell=cell,
    )
    sys = postprocess(sys)
    frames = coords[None] + rng.normal(scale=0.05, size=(n_frames, n, 3))
    traj = InMemoryTrajectory(frames.astype(np.float32), cell=cell)
    return sys, traj


@pytest.fixture
def water():
    return make_water_box()
