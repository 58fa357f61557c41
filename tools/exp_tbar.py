#!/usr/bin/env python
"""Probe: rdf-full (mxu, production mode) at config-#4 scale with the
packed-table-gather optimization_barrier on/off (VIAMD_TPU_RDF_TBARRIER).

Tests the gather-rematerialization hypothesis: exp_gather2 prices the
(ncells·cap)-row t4 gather at ~3.1 ms, but exp_1m's gather+planes stage
measured ~9.9 — consistent with XLA re-running the gather per consumer.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 16
N_WATERS = int(sys.argv[1]) if len(sys.argv) > 1 else 333_334


def main():
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops.neighbors import choose_grid_r
    from viamd_tpu.ops.pallas_rdf import pair_dist_histogram_pl
    from viamd_tpu.ops.rdf import snap_capacity, stencil_offsets

    sys_, traj = water_box_device(N_WATERS, n_frames=1, seed=3)
    traj.stage_fence()
    x, _ = traj.device_frame(0)
    box_np = np.asarray(sys_.cell.extent())
    box = jnp.asarray(box_np, jnp.float32)
    el = np.asarray(sys_.element)
    idx_o = jnp.asarray(np.nonzero(el == 8)[0].astype(np.int32))
    dims, cap = choose_grid_r(box_np, 10.0, int(idx_o.size), radius=1)
    offs = stencil_offsets(1, True)
    cap_b = snap_capacity(cap, idx_o.size / float(np.prod(dims)), len(offs))
    widths = tuple(float(w) for w in box_np / np.array(dims))
    print(f"n={idx_o.size} dims={dims} cap={cap} cap_b={cap_b} "
          f"tbar={os.environ.get('VIAMD_TPU_RDF_TBARRIER', '0')}",
          flush=True)

    def loop(body):
        @jax.jit
        def many(x0):
            def step(i, carry):
                xi = x0 + carry * 1e-30
                return jnp.sum(body(xi)) + carry * 0.0

            return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))

        return many

    def run(name, body):
        f = loop(body)
        float(f(x))
        best = None
        for _ in range(3):
            t0 = time.time()
            s = float(f(x))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:28s} {best/K*1000:8.3f} ms/iter (chk {s:.4g})",
              flush=True)

    run("null", lambda xx: xx[:1, :1] * 0.0)
    run("rdf full mxu", lambda xx: pair_dist_histogram_pl(
        xx, idx_o, idx_o, box, 128, 10.0, dims, cap, cap_b,
        radius=1, symmetric=True, widths=widths, bin_mode="mxu",
    ))


if __name__ == "__main__":
    main()
