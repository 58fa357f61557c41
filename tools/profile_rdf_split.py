#!/usr/bin/env python
"""RDF stage split on TPU: prep (cell list + tables + stencil planes)
vs the Pallas binning kernel, plus kernel micro-variant experiments.

Same fori_loop timing discipline as tools/profile_bench.py.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 16
N_WATERS = 33_334
R_MAX = 10.0
NBINS = 128


def timed(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    float(jnp.sum(r))
    t0 = time.time()
    r = f(*args)
    s = float(jnp.sum(r))
    dt = time.time() - t0
    print(f"{name:36s} {dt/K*1000:8.3f} ms/iter   (checksum {s:.1f})", flush=True)
    return dt / K


def loop(body, x):
    def step(i, carry):
        xi = x + carry * 1e-30
        return jnp.sum(body(xi)) + carry * 0.0

    return lambda: jax.lax.fori_loop(0, K, step, jnp.float32(0.0))


def main():
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops.neighbors import build_cell_list, choose_grid_r
    from viamd_tpu.ops.rdf import neighborhood_planes, stencil_offsets

    sys_, traj = water_box_device(N_WATERS, n_frames=1, seed=3)
    traj.stage_fence()
    x, _cell = traj.device_frame(0)
    box = jnp.asarray(sys_.cell.extent(), jnp.float32)
    box_np = np.asarray(sys_.cell.extent())
    el = np.asarray(sys_.element)
    idx_o = jnp.asarray(np.nonzero(el == 8)[0].astype(np.int32))

    dims, cap = choose_grid_r(box_np, R_MAX, idx_o.size, radius=1)
    widths = tuple(float(w) for w in box_np / np.array(dims))
    print(f"dims={dims} cap={cap} widths={widths}", flush=True)

    timed("null", lambda xx: loop(lambda v: v[0, 0] * 0.0, xx)(), x)

    from viamd_tpu.ops.pallas_rdf import pair_dist_histogram_pl

    def rdf_full(xx):
        return pair_dist_histogram_pl(
            xx, idx_o, idx_o, box, NBINS, R_MAX, dims, cap, cap,
            radius=1, symmetric=True, widths=widths,
        )

    timed("rdf FULL (shipped)", lambda xx: loop(rdf_full, xx)(), x)

    # ---- prep only: cell list + packed tables + stencil planes ----------
    offsets = stencil_offsets(1, True)

    def prep(xx):
        xa = xx[idx_o]
        cl = build_cell_list(xa, box, dims, cap)
        p4 = jnp.concatenate(
            [xa, idx_o.astype(jnp.float32)[:, None]], 1
        )
        t4 = p4[cl.table]
        acc = jnp.float32(0)
        for ch in range(3):
            pl_ = neighborhood_planes(t4[..., ch], dims, 1, offsets)
            acc = acc + jnp.sum(pl_ * 1e-6)
        return acc

    timed("rdf prep (sort+tables+planes)", lambda xx: loop(prep, xx)(), x)

    def prep_notables(xx):
        xa = xx[idx_o]
        cl = build_cell_list(xa, box, dims, cap)
        p4 = jnp.concatenate(
            [xa, idx_o.astype(jnp.float32)[:, None]], 1
        )
        t4 = p4[cl.table]
        return jnp.sum(t4 * 1e-6)

    timed("rdf prep w/o planes", lambda xx: loop(prep_notables, xx)(), x)


if __name__ == "__main__":
    main()
