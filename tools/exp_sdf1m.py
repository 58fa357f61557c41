#!/usr/bin/env python
"""Probe: config-#4 SDF (667k H targets, 64 structures) stage split.

The c4pieces total (17.0 ms) undercuts the standalone 667k argsort
build measurement (~19 ms, tools/exp_groupsort.py) — this probe times
the REAL compiled sdf sub-stages to find where the time actually goes.

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
N_WATERS = 333_334


def timed(name, thunk):
    f = jax.jit(thunk)
    float(jnp.sum(f()))
    best = None
    for _ in range(3):
        t0 = time.time()
        s = float(jnp.sum(f()))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:36s} {best/K*1000:8.3f} ms/iter  (chk {s:.4g})",
          flush=True)
    return best / K


def loop(body, x):
    def step(i, carry):
        xi = x + carry * 1e-30
        return jnp.sum(body(xi)).astype(jnp.float32) + carry * 0.0

    return lambda: jax.lax.fori_loop(0, K, step, jnp.float32(0.0))


def main():
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops import sdf as sdf_ops
    from viamd_tpu.ops.neighbors import build_cell_list, choose_grid_r

    sys_, traj = water_box_device(N_WATERS, n_frames=1, seed=3)
    traj.stage_fence()
    x, _ = traj.device_frame(0)
    box_np = np.asarray(sys_.cell.extent())
    box = jnp.asarray(box_np, jnp.float32)
    el = np.asarray(sys_.element)
    idx_t = np.nonzero(el == 1)[0].astype(np.int32)
    extent = 5.0

    # mirror the compiler's sizing (script/compiler.py _sdf)
    cl_dims, cl_cap = choose_grid_r(
        box_np, 1.7320508 * extent, idx_t.size, radius=1, tail=3.5
    )
    x0_np = np.asarray(sys_.coords())
    xt0 = x0_np[idx_t]
    f0 = np.mod(xt0 / box_np, 1.0)
    cell3 = np.minimum(
        np.floor(f0 * np.array(cl_dims)).astype(np.int64),
        np.array(cl_dims) - 1,
    )
    flat = (cell3[:, 0] * cl_dims[1] + cell3[:, 1]) * cl_dims[2] + cell3[:, 2]
    occ0 = int(np.bincount(flat).max())
    cl_cap = max(cl_cap, int(1.5 * occ0) + 8)
    stencil = sdf_ops.make_sdf_stencil(extent, box_np / np.array(cl_dims))
    print(f"dims={cl_dims} cap={cl_cap} ncells={np.prod(cl_dims)} "
          f"S3={len(stencil)} n_t={idx_t.size}", flush=True)

    # structures: residue(1:64) = first 64 waters
    res = np.asarray(sys_.atom_res_idx)
    structs = [np.nonzero(res == i)[0].astype(np.int32) for i in range(64)]
    masses = np.asarray(sys_.mass)
    idx, w, refc = sdf_ops.make_structure_inputs(structs, masses, x0_np)

    support0 = sdf_ops.sdf_frame0_support_count(
        xt0, x0_np, np.asarray(idx), np.asarray(w), np.asarray(refc),
        box_np, extent, 64,
    )
    compact_cap = sdf_ops.sdf_compact_capacity(
        len(structs), int(idx_t.size), box_np, extent, 64,
        support_count=support0,
    )
    print(f"compact_cap={compact_cap} support0={support0}", flush=True)

    idx_tj = jnp.asarray(idx_t)
    tw = np.zeros(x0_np.shape[0], np.float32)
    tw[idx_t] = 1.0
    twj = jnp.asarray(tw)
    idxj = jnp.asarray(idx)
    wj = jnp.asarray(w)
    refcj = jnp.asarray(refc)
    stj = stencil

    timed("null", loop(lambda v: v[:1, :1] * 0.0, x))

    def build_only(xx):
        cl = build_cell_list(xx[idx_tj], box, cl_dims, cl_cap)
        return jnp.sum(cl.starts.astype(jnp.float32)) + jnp.sum(
            cl.order[:128].astype(jnp.float32)
        )

    timed("cell build (sort+starts)", loop(build_only, x))

    def full(xx):
        return sdf_ops.sdf_accumulate_cl(
            xx, twj, idxj, wj, refcj, extent, 64, box,
            cl_dims, cl_cap, stj, idx_t=idx_tj, compact_cap=compact_cap,
        )

    timed("sdf full (shipped)", loop(full, x))

    def no_compact(xx):
        return sdf_ops.sdf_accumulate_cl(
            xx, twj, idxj, wj, refcj, extent, 64, box,
            cl_dims, cl_cap, stj, idx_t=idx_tj, compact_cap=None,
        )

    timed("sdf no-compact", loop(no_compact, x))


if __name__ == "__main__":
    main()
