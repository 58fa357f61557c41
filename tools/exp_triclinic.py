#!/usr/bin/env python
"""Triclinic RDF on TPU: fractional cell-list kernel at headline scale.

A 100k-atom water box sheared into a 60° triclinic cell; O–O RDF through
the Pallas fractional path vs the orthorhombic kernel on the unsheared
equivalent. Per CLAUDE.md timing discipline.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 32
N_WATERS = 33_334


def timed(name, thunk):
    f = jax.jit(thunk)
    r = f()
    float(jnp.sum(r))
    t0 = time.time()
    r = f()
    s = float(jnp.sum(r))
    dt = time.time() - t0
    print(f"{name:30s} {dt/K*1000:8.3f} ms/iter  (checksum {s:.1f})", flush=True)
    return dt / K


def loop(body, x):
    def step(i, carry):
        xi = x + carry * 1e-30
        return jnp.sum(body(xi)) + carry * 0.0

    return lambda: jax.lax.fori_loop(0, K, step, jnp.float32(0.0))


def main():
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops.neighbors import choose_grid_r, choose_grid_triclinic
    from viamd_tpu.ops.pallas_rdf import pair_dist_histogram_pl
    from viamd_tpu.ops.rdf import snap_capacity, stencil_offsets

    sys_, traj = water_box_device(N_WATERS, n_frames=1, seed=3)
    traj.stage_fence()
    x, _ = traj.device_frame(0)
    box_np = np.asarray(sys_.cell.extent())
    el = np.asarray(sys_.element)
    idx_o = jnp.asarray(np.nonzero(el == 8)[0].astype(np.int32))

    # shear the cell: basis rows (L,0,0), (L/2, L·√3/2, 0), (0,0,L) — a
    # 60° monoclinic cell with the same atom count; coordinates map
    # through the fractional transform so densities stay uniform
    L = box_np[0]
    B = np.array(
        [[L, 0, 0], [0.5 * L, 0.8660254 * L, 0], [0, 0, L]], np.float32
    )
    frac = np.asarray(x) / box_np.astype(np.float32)
    x_tri = jnp.asarray((frac @ B).astype(np.float32))
    B_j = jnp.asarray(B)

    timed("null", loop(lambda v: v[0, 0] * 0.0, x))

    dims_o, cap_o = choose_grid_r(box_np, 10.0, idx_o.size, radius=1)
    cap_o = snap_capacity(
        cap_o, idx_o.size / np.prod(dims_o), len(stencil_offsets(1, True))
    )
    wid = tuple(float(w) for w in box_np / np.array(dims_o))

    def ortho(xx):
        return pair_dist_histogram_pl(
            xx, idx_o, idx_o, jnp.asarray(box_np, jnp.float32), 128, 10.0,
            dims_o, cap_o, cap_o, radius=1, symmetric=True, widths=wid,
        )

    timed("rdf orthorhombic", loop(ortho, x))

    dims_t, cap_t = choose_grid_triclinic(B, 10.0, idx_o.size, radius=1)
    cap_t = snap_capacity(
        cap_t, idx_o.size / np.prod(dims_t), len(stencil_offsets(1, True))
    )
    print(f"tri dims={dims_t} cap={cap_t}  (ortho dims={dims_o} cap={cap_o})")

    def tri(xx):
        return pair_dist_histogram_pl(
            xx, idx_o, idx_o, jnp.diagonal(B_j), 128, 10.0,
            dims_t, cap_t, cap_t, radius=1, symmetric=True,
            basis=B_j,
        )

    timed("rdf triclinic 60°", loop(tri, x_tri))


if __name__ == "__main__":
    main()
