#!/usr/bin/env python
"""Probe: the packed cell-table gather at 1M scale (p4[cl.table]).

exp_planes.py showed the neighborhood rolls are ~free; the ~10 ms that
exp_1m attributed to 'gather + planes' is the (ncells·cap) random
4-wide-row gather from the (n, 4) packed atom array (~6e7 rows/s at
n=333k — far below the ~4.3e8 rows/s measured on smaller sources).
Variants probe what the cost actually scales with:

  A  shipped: t4 = p4[table]            (random rows, 4-wide)
  B  two-step: p4s = p4[order] (n rows) then p4s[pos] (block-contiguous
     rows — per-cell slots are consecutive ranges of the sorted order)
  C  x-only 1-wide gather x[table]      (width effect)
  D  contiguous idx t4 = p4[iota]       (locality upper bound)
  E  4 separate 1-wide channel gathers  (row width vs row count)

K-loop, null-subtracted, min-of-3.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 16
N = 333_334


def timed(name, thunk):
    f = jax.jit(thunk)
    float(jnp.sum(f()))
    best = None
    for _ in range(3):
        t0 = time.time()
        s = float(jnp.sum(f()))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:40s} {best/K*1000:8.3f} ms/iter  (chk {s:.4g})",
          flush=True)
    return best / K


def loop(body, *args):
    def step(i, carry):
        xi = args[0] + carry * 1e-30
        return jnp.sum(body(xi, *args[1:])).astype(jnp.float32) + carry * 0.0

    return lambda: jax.lax.fori_loop(0, K, step, jnp.float32(0.0))


def main():
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops.neighbors import build_cell_list, choose_grid_r
    from viamd_tpu.ops.rdf import snap_capacity, stencil_offsets

    sys_, traj = water_box_device(N, n_frames=1, seed=3)
    traj.stage_fence()
    x, _ = traj.device_frame(0)
    box_np = np.asarray(sys_.cell.extent())
    box = jnp.asarray(box_np, jnp.float32)
    el = np.asarray(sys_.element)
    idx_o = jnp.asarray(np.nonzero(el == 8)[0].astype(np.int32))
    n = int(idx_o.size)
    dims, cap = choose_grid_r(box_np, 10.0, n, radius=1)
    offs = stencil_offsets(1, True)
    cap = snap_capacity(cap, n / float(np.prod(dims)), len(offs))
    ncells = int(np.prod(dims))
    print(f"n={n} dims={dims} cap={cap} rows={ncells*cap}", flush=True)

    xa = x[idx_o]
    cl = build_cell_list(xa, box, dims, cap)
    p4 = jnp.concatenate(
        [xa, idx_o.astype(jnp.float32)[:, None]], 1
    )
    # force everything resident before timing
    table = cl.table + 0
    order = cl.order + 0
    starts = cl.starts + 0
    float(jnp.sum(table) + jnp.sum(order) + jnp.sum(p4))

    timed("null", loop(lambda p: p[:1, :1] * 0.0, p4))

    timed("A p4[table] (shipped)",
          loop(lambda p, t: jnp.sum(p[t], axis=(1, 2)), p4, table))

    slot = jax.lax.broadcasted_iota(jnp.int32, (ncells, cap), 1)
    pos = jnp.minimum(starts[:-1][:, None] + slot, n - 1)

    def two_step(p, o, ps):
        p4s = p[o]
        return jnp.sum(p4s[ps], axis=(1, 2))

    timed("B p4[order] then [pos]", loop(two_step, p4, order, pos))

    xonly = p4[:, 0] + 0.0
    timed("C x[table] 1-wide",
          loop(lambda xx, t: jnp.sum(xx[t], axis=1), xonly, table))

    iota_t = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (ncells, cap), 0) * cap + slot,
        n - 1,
    )
    timed("D p4[contiguous iota]",
          loop(lambda p, t: jnp.sum(p[t], axis=(1, 2)), p4, iota_t))

    chans = [p4[:, k] + 0.0 for k in range(4)]

    def per_chan(p, t, c1, c2, c3):
        return (
            jnp.sum(p[t], axis=1) + jnp.sum(c1[t], axis=1)
            + jnp.sum(c2[t], axis=1) + jnp.sum(c3[t], axis=1)
        )

    timed("E 4 separate 1-wide gathers",
          loop(per_chan, chans[0], table, *chans[1:]))


if __name__ == "__main__":
    main()
