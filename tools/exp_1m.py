#!/usr/bin/env python
"""Probe: where the 1M-atom RDF frame time goes (sort vs planes vs kernel).

Per CLAUDE.md timing discipline (fori_loop K, null-subtracted).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 8
N_WATERS = 333_334


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
    from viamd_tpu.ops.neighbors import build_cell_list, choose_grid_r
    from viamd_tpu.ops.pallas_rdf import pair_dist_histogram_pl
    from viamd_tpu.ops.rdf import neighborhood_planes, snap_capacity, stencil_offsets

    sys_, traj = water_box_device(N_WATERS, n_frames=1, seed=3)
    traj.stage_fence()
    x, _ = traj.device_frame(0)
    box_np = np.asarray(sys_.cell.extent())
    box = jnp.asarray(box_np, jnp.float32)
    el = np.asarray(sys_.element)
    idx_o = jnp.asarray(np.nonzero(el == 8)[0].astype(np.int32))
    dims, cap = choose_grid_r(box_np, 10.0, idx_o.size, radius=1)
    offs = stencil_offsets(1, True)
    cap = snap_capacity(cap, idx_o.size / float(np.prod(dims)), len(offs))
    widths = tuple(float(w) for w in box_np / np.array(dims))
    print(f"n_O={idx_o.size} dims={dims} cap={cap}", flush=True)

    timed("null", loop(lambda v: v[0, 0] * 0.0, x))

    def full(xx):
        return pair_dist_histogram_pl(
            xx, idx_o, idx_o, box, 128, 10.0, dims, cap, cap,
            radius=1, symmetric=True, widths=widths,
        )

    timed("rdf full", loop(full, x))

    def sort_only(xx):
        xa = xx[idx_o]
        cl = build_cell_list(xa, box, dims, cap)
        return jnp.sum(cl.starts.astype(jnp.float32)) + jnp.sum(
            cl.table[:, 0].astype(jnp.float32)
        )

    timed("cell list (sort+table)", loop(sort_only, x))

    def planes_only(xx):
        xa = xx[idx_o]
        cl = build_cell_list(xa, box, dims, cap)
        t4 = jnp.concatenate(
            [xa, idx_o.astype(jnp.float32)[:, None]], 1
        )[cl.table[:, :cap]]
        acc = jnp.float32(0.0)
        for ch in range(3):
            pl_ = neighborhood_planes(t4[..., ch], dims, 1, offs)
            acc = acc + jnp.sum(pl_)
        return acc

    timed("  + gather + 3 planes", loop(planes_only, x))

    def no_occ(xx):
        return pair_dist_histogram_pl(
            xx, idx_o, idx_o, box, 128, 10.0, dims, cap, cap,
            radius=1, symmetric=True, widths=widths, occ_sort=False,
        )

    timed("rdf full occ_sort=False", loop(no_occ, x))


if __name__ == "__main__":
    main()
