#!/usr/bin/env python
"""Atom-count scaling sweep of the RDF kernel (design-scale check).

The reference reasons about 100M-atom systems (main.cpp:1134-1138); this
measures the shipped Pallas cell-list RDF at 100k → 100M atoms on one
v5e. Beyond ~20M atoms the B stencil planes exceed HBM and the kernel
streams cell-grid slabs (pair_dist_histogram_pl slab_rows — same 2 GiB
budget rule as the compiler path).

Usage: python tools/bench_scale.py [--big]   (--big: 33M + 100M only)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 4


def main() -> None:
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops.neighbors import choose_grid_r
    from viamd_tpu.ops.pallas_rdf import pair_dist_histogram_pl
    from viamd_tpu.ops.rdf import (
        choose_slab_rows, snap_capacity, stencil_offsets,
    )

    counts = (33_334, 333_334, 1_111_112, 3_333_334)
    if "--big" in sys.argv:
        counts = (11_111_112, 33_333_334)
    for n_waters in counts:
        sys_, traj = water_box_device(n_waters, n_frames=1, seed=3)
        traj.stage_fence()
        x, _ = traj.device_frame(0)
        box_np = np.asarray(sys_.cell.extent())
        box = jnp.asarray(box_np, jnp.float32)
        el = np.asarray(sys_.element)
        idx_o = jnp.asarray(np.nonzero(el == 8)[0].astype(np.int32))
        dims, cap = choose_grid_r(box_np, 10.0, idx_o.size, radius=1)
        cap = snap_capacity(
            cap, idx_o.size / float(np.prod(dims)),
            len(stencil_offsets(1, True)),
        )
        widths = tuple(float(w) for w in box_np / np.array(dims))
        S_off = len(stencil_offsets(1, True))
        slab_rows = choose_slab_rows(dims, S_off, cap, radius=1)

        @jax.jit
        def loop(x0):
            def step(i, carry):
                h = pair_dist_histogram_pl(
                    x0 + carry * 1e-30, idx_o, idx_o, box, 128, 10.0,
                    dims, cap, cap, radius=1, symmetric=True, widths=widths,
                    slab_rows=slab_rows,
                )
                return jnp.sum(h) + carry * 0.0

            return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))

        r = loop(x)
        float(r)
        t0 = time.time()
        s = float(loop(x))
        dt = (time.time() - t0) / K
        print(
            f"atoms={sys_.natoms:>10,}  dims={dims} cap={cap} "
            f"slab={slab_rows}  rdf {dt*1000:8.2f} ms/frame  (sum {s:.0f})",
            flush=True,
        )
        del x, traj


if __name__ == "__main__":
    main()
