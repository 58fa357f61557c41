#!/usr/bin/env python
"""Experiment: RDF A-pass quantization ka=8 vs ka=16 (headline config).

At bench occupancy (lambda=33.3) the per-block A-slot count ceils to the
ka quantum: ceil(occ/8)*8 ~= 40 vs ceil(occ/16)*16 ~= 48 -> ~1.17x fewer
A slots if per-step overheads don't eat it. Measured per CLAUDE.md timing
discipline (fori_loop K, null-subtracted).
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


def timed(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    float(jnp.sum(r))
    t0 = time.time()
    r = f(*args)
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
    from viamd_tpu.ops.neighbors import choose_grid_r
    from viamd_tpu.ops.pallas_rdf import pair_dist_histogram_pl
    from viamd_tpu.ops.rdf import snap_capacity, stencil_offsets

    sys_, traj = water_box_device(N_WATERS, n_frames=1, seed=3)
    traj.stage_fence()
    x, _cell = traj.device_frame(0)
    box = jnp.asarray(sys_.cell.extent(), jnp.float32)
    box_np = np.asarray(sys_.cell.extent())
    el = np.asarray(sys_.element)
    idx_o = jnp.asarray(np.nonzero(el == 8)[0].astype(np.int32))

    dims1, cap1 = choose_grid_r(box_np, 10.0, idx_o.size, radius=1)
    cap1 = snap_capacity(
        cap1, idx_o.size / np.prod(dims1), len(stencil_offsets(1, True))
    )
    print(f"dims={dims1} cap={cap1}", flush=True)

    timed("null", lambda xx: loop(lambda v: v[0, 0] * 0.0, xx)(), x)

    for ka in (16, 8, 4):
        def rdf(xx, ka=ka):
            return pair_dist_histogram_pl(
                xx, idx_o, idx_o, box, 128, 10.0, dims1, cap1, cap1,
                radius=1, symmetric=True, ka=ka,
            )

        timed(f"rdf ka={ka}", lambda xx, ka=ka: loop(
            lambda v, ka=ka: pair_dist_histogram_pl(
                v, idx_o, idx_o, box, 128, 10.0, dims1, cap1, cap1,
                radius=1, symmetric=True, ka=ka,
            ), xx)(), x)


if __name__ == "__main__":
    main()
