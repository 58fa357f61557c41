#!/usr/bin/env python
"""RDF kernel bin_mode comparison at the headline config (block vs mxu).

One jitted fori_loop(K=32) per variant, carry-perturbed input, null
subtracted (CLAUDE.md timing discipline).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = int(__import__("os").environ.get("EXP_K", "32"))
N_WATERS = 33_334


def timed(name, fn, x, null=0.0):
    f = jax.jit(fn)
    float(jnp.sum(f(x)))
    t0 = time.time()
    s = float(jnp.sum(f(x)))
    dt = (time.time() - t0) / K - null
    print(f"{name:28s} {dt*1000:8.3f} ms/iter  (checksum {s:.1f})",
          flush=True)
    return dt


def loop(body, x):
    def step(i, carry):
        return jnp.sum(body(x + carry * 1e-30)) + carry * 0.0

    return lambda xx: jax.lax.fori_loop(0, K, step, jnp.float32(0.0))


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
    print(f"atoms={x.shape[0]} O={idx_o.size} dims={dims1} cap={cap1} K={K}",
          flush=True)

    null = timed("null", loop(lambda v: v[0, 0] * 0.0, x), x)

    def rdf(mode):
        def f(xx):
            return pair_dist_histogram_pl(
                xx, idx_o, idx_o, box, 128, 10.0, dims1, cap1, cap1,
                radius=1, symmetric=True, bin_mode=mode,
            )
        return f

    for mode in (sys.argv[1:] or ["block", "mxu"]):
        timed(f"rdf bin_mode={mode}", loop(rdf(mode), x), x, null)


if __name__ == "__main__":
    main()
