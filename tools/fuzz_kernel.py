#!/usr/bin/env python
"""Kernel parity campaign: random configs through the Pallas cell-list
kernel (interpret) vs the dense path — ortho/triclinic, radius 1/2,
symmetric/AB, slab streaming, slab sharding."""
import sys

sys.path.insert(0, "/root/repo")  # runnable standalone

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from viamd_tpu.core.unitcell import UnitCell  # noqa: E402
from viamd_tpu.ops import pallas_rdf, rdf  # noqa: E402
from viamd_tpu.ops.neighbors import (  # noqa: E402
    choose_grid_r, choose_grid_triclinic,
)

rng = np.random.RandomState(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
fails = 0
for trial in range(40):
    tri = rng.rand() < 0.4
    n = int(rng.randint(200, 1200))
    La = rng.uniform(18, 50)
    Lb = La * rng.uniform(0.7, 1.3)
    Lc = La * rng.uniform(0.7, 1.3)
    if tri:
        ang = [rng.uniform(65, 115) for _ in range(3)]
        cell = UnitCell.from_lengths_angles(La, Lb, Lc, *ang)
    else:
        cell = UnitCell.from_lengths_angles(La, Lb, Lc, 90, 90, 90)
    B = np.asarray(cell.basis, np.float32)
    inv = np.asarray(np.linalg.inv(B.astype(np.float64)), np.float32)
    x = (rng.uniform(0, 1, (n, 3)) @ B).astype(np.float32)
    rmax = float(rng.uniform(2.5, min(La, Lb, Lc) / 3.2))
    sym = rng.rand() < 0.5
    wb = (rng.rand(n) < rng.uniform(0.2, 1.0)).astype(np.float32)
    idx_a = np.arange(n, dtype=np.int32)
    idx_b = idx_a if sym else np.nonzero(wb)[0].astype(np.int32)
    if idx_b.size == 0:
        continue
    radius = 1 if tri else int(rng.choice([1, 2]))
    if tri:
        dims, cap_a = choose_grid_triclinic(B, rmax, idx_a.size, radius=1)
        _, cap_b = choose_grid_triclinic(B, rmax, idx_b.size, radius=1)
    else:
        ext = np.diag(B.astype(np.float64)).copy()
        dims, cap_a = choose_grid_r(ext, rmax, idx_a.size, radius=radius)
        _, cap_b = choose_grid_r(ext, rmax, idx_b.size, radius=radius)
    if min(dims) < 2 * radius + 1:
        continue
    slab_rows = None
    mode = rng.choice(["plain", "slab", "shard"])
    if mode == "slab" and dims[0] > 2 * radius + 1:
        slab_rows = int(rng.randint(2 * radius + 1, dims[0] + 1))
    wa_ = np.ones(n, np.float32)
    wb_ = wa_ if sym else wb
    dense = np.asarray(
        rdf.pair_dist_histogram(
            jnp.asarray(x), jnp.asarray(wa_), jnp.asarray(wb_),
            jnp.asarray(B), jnp.asarray(inv), 128, rmax, tile=128,
        )
    )
    kw = dict(radius=radius, symmetric=bool(sym), interpret=True)
    if tri:
        kw["basis"] = jnp.asarray(B)
    box = jnp.asarray(np.diag(B.astype(np.float64)).astype(np.float32).copy())
    try:
        if mode == "shard":
            ndev = int(rng.choice([2, 4, 8]))
            mesh = Mesh(np.array(jax.devices()[:ndev]), ("atoms",))
            got = pallas_rdf.pair_dist_histogram_pl_sharded(
                jnp.asarray(x), jnp.asarray(idx_a), jnp.asarray(idx_b),
                box, 128, rmax, dims, cap_a, cap_b, mesh, **kw,
            )
        else:
            got = pallas_rdf.pair_dist_histogram_pl(
                jnp.asarray(x), jnp.asarray(idx_a), jnp.asarray(idx_b),
                box, 128, rmax, dims, cap_a, cap_b,
                slab_rows=slab_rows, **kw,
            )
        got = np.asarray(got)
        err = np.abs(got - dense).max()
        tag = "OK " if err <= 1e-2 else "FAIL"
        if err > 1e-2:
            # classify: benign bin-edge transfer = totals equal AND the
            # cumulative histograms differ only at isolated bins
            diff = got - dense
            tot_ok = abs(diff.sum()) <= 1e-2
            nz = np.nonzero(diff)[0]
            adjacent = (
                tot_ok and len(nz) % 2 == 0
                and all(nz[i + 1] - nz[i] == 1 and
                        abs(diff[nz[i]] + diff[nz[i + 1]]) < 1e-6
                        for i in range(0, len(nz), 2))
            )
            if adjacent:
                tag = "EDGE"
            else:
                fails += 1
            print(f"   diff bins {nz} vals {diff[nz]}")
        print(
            f"{tag} trial={trial} n={n} tri={tri} r={radius} sym={sym} "
            f"mode={mode} dims={dims} caps=({cap_a},{cap_b}) "
            f"rmax={rmax:.2f} slab={slab_rows} maxerr={err:.4f}",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        fails += 1
        print(
            f"CRASH trial={trial} n={n} tri={tri} r={radius} sym={sym} "
            f"mode={mode} dims={dims} caps=({cap_a},{cap_b}) "
            f"rmax={rmax:.2f} slab={slab_rows}: {type(e).__name__}: {e}",
            flush=True,
        )

print(f"kernel fuzz: fails={fails}", flush=True)
