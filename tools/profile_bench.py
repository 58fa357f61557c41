#!/usr/bin/env python
"""Component-level TPU profiling of the headline bench pipeline.

Timing discipline (CLAUDE.md): after the first scalar readback this backend
dispatches synchronously (~31 ms tunnel RTT per dispatch), so each piece is
ONE jitted dispatch that loops K iterations internally (lax.fori_loop with a
carry-perturbed input so XLA can neither hoist nor parallelize the body),
timed around [dispatch + scalar readback]. Subtract the null row.

Profiles the SHIPPED kernel configurations (what script/compiler.py picks
at the bench scale). See tools/profile_render.py for the renderer.
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


def timed(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)  # compile + warmup
    float(jnp.sum(r))
    t0 = time.time()
    r = f(*args)
    s = float(jnp.sum(r))
    dt = time.time() - t0
    print(
        f"{name:30s} {dt/K*1000:8.3f} ms/iter   (checksum {s:.1f})",
        flush=True,
    )
    return dt / K


def loop(body, x):
    """K serialized iterations of body over a carry-perturbed input."""

    def step(i, carry):
        xi = x + carry * 1e-30
        return jnp.sum(body(xi)) + carry * 0.0

    return lambda: jax.lax.fori_loop(0, K, step, jnp.float32(0.0))


def main():
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops.neighbors import build_cell_list, choose_grid_r
    from viamd_tpu.ops.pallas_rdf import pair_dist_histogram_pl
    from viamd_tpu.ops import sdf as sdf_ops
    from viamd_tpu.ops import covariance as cov_ops

    sys_, traj = water_box_device(N_WATERS, n_frames=1, seed=3)
    traj.stage_fence()
    x, _cell = traj.device_frame(0)
    box = jnp.asarray(sys_.cell.extent(), jnp.float32)
    box_np = np.asarray(sys_.cell.extent())
    el = np.asarray(sys_.element)
    idx_o = jnp.asarray(np.nonzero(el == 8)[0].astype(np.int32))
    n = x.shape[0]
    print(f"atoms={n} O={idx_o.size} box={box_np}", flush=True)

    timed("null", lambda xx: loop(lambda v: v[0, 0] * 0.0, xx)(), x)

    # --- RDF (shipped config: radius-1 Poisson grid, symmetric) -----------
    dims1, cap1 = choose_grid_r(box_np, 10.0, idx_o.size, radius=1)
    from viamd_tpu.ops.rdf import snap_capacity, stencil_offsets

    cap1 = snap_capacity(
        cap1, idx_o.size / np.prod(dims1), len(stencil_offsets(1, True))
    )
    print(f"rdf dims={dims1} cap={cap1} (lane-snapped)", flush=True)

    def rdf(xx):
        return pair_dist_histogram_pl(
            xx, idx_o, idx_o, box, 128, 10.0, dims1, cap1, cap1,
            radius=1, symmetric=True, bin_mode="mxu",
        )

    timed("rdf (shipped: radius-1, mxu)", lambda xx: loop(rdf, xx)(), x)

    def rdf_block(xx):
        return pair_dist_histogram_pl(
            xx, idx_o, idx_o, box, 128, 10.0, dims1, cap1, cap1,
            radius=1, symmetric=True, bin_mode="block",
        )

    timed("rdf (block bin loop, pre-r3)", lambda xx: loop(rdf_block, xx)(), x)

    def cl_only(xx):
        cl = build_cell_list(xx[idx_o], box, dims1, cap1)
        return cl.order.astype(jnp.float32) * 1e-6

    timed("rdf cell-list sort", lambda xx: loop(cl_only, xx)(), x)

    # --- SDF (shipped config: radius-1 target grid, packed gather) --------
    res = np.asarray(sys_.atom_res_idx)
    structs = [np.nonzero(res == r)[0].astype(np.int32) for r in range(64)]
    idx_s, w_s, refc = sdf_ops.make_structure_inputs(
        structs, jnp.asarray(sys_.mass), np.asarray(x)
    )
    idx_s, w_s, refc = jnp.asarray(idx_s), jnp.asarray(w_s), jnp.asarray(refc)
    tw = jnp.asarray((el == 1).astype(np.float32))
    idx_t = jnp.asarray(np.nonzero(el == 1)[0].astype(np.int32))
    extent = 5.0
    cl_dims, cl_cap = choose_grid_r(
        box_np, 1.7320508 * extent, idx_t.size, radius=1, tail=3.5
    )
    stencil = sdf_ops.make_sdf_stencil(extent, box_np / np.array(cl_dims))
    print(
        f"sdf dims={cl_dims} cap={cl_cap} stencil={len(stencil)} "
        f"targets={idx_t.size}",
        flush=True,
    )

    def sdf_align(xx):
        R, c = sdf_ops.sdf_reference_frames(
            xx, idx_s, w_s, refc, jnp.diag(box), jnp.diag(1.0 / box)
        )
        return R

    timed("sdf align (64 structs)", lambda xx: loop(sdf_align, xx)(), x)

    ccap = sdf_ops.sdf_compact_capacity(
        len(structs), int(idx_t.size), box_np, extent, 64
    )

    def sdf_full(xx):
        return sdf_ops.sdf_accumulate_cl(
            xx, tw, idx_s, w_s, refc, extent, 64, box,
            cl_dims, cl_cap, stencil, idx_t=idx_t, compact_cap=ccap,
        )

    timed("sdf FULL 64^3 (cell-list)", lambda xx: loop(sdf_full, xx)(), x)

    # --- SDF pairs route (what the compiler ships at this scale:
    # S*n_t = 64*66,668 <= 1.5e8 routes sort-free) --------------------
    x_np = np.asarray(x)
    cnt0 = sdf_ops.sdf_frame0_ball_count(
        x_np[np.asarray(idx_t)], x_np, np.asarray(idx_s),
        np.asarray(w_s), box_np, extent, 64,
    )
    pair_cap = sdf_ops.sdf_pair_capacity(
        64, int(idx_t.size), box_np, extent, 64, per_struct_count=cnt0,
    )
    support0 = sdf_ops.sdf_frame0_support_count(
        x_np[np.asarray(idx_t)], x_np, np.asarray(idx_s),
        np.asarray(w_s), np.asarray(refc), box_np, extent, 64,
    )
    ccap_p = sdf_ops.sdf_compact_capacity(
        64, int(idx_t.size), box_np, extent, 64, support_count=support0,
    )
    print(f"sdf pairs pair_cap={pair_cap} compact_cap={ccap_p}", flush=True)

    def sdf_pairs(xx):
        return sdf_ops.sdf_accumulate_pairs(
            xx, tw, idx_s, w_s, refc, extent, 64,
            jnp.diag(box), jnp.diag(1.0 / box), idx_t, pair_cap,
            compact_cap=ccap_p,
        )

    timed("sdf FULL 64^3 (pairs, shipped)", lambda xx: loop(sdf_pairs, xx)(), x)

    # --- shape weights -----------------------------------------------------
    wall = jnp.ones((n,), jnp.float32)

    def shape(xx):
        return cov_ops.shape_weights(
            xx, wall, jnp.diag(box), jnp.diag(1.0 / box)
        )

    timed("shape_weights (100k)", lambda xx: loop(shape, xx)(), x)


if __name__ == "__main__":
    main()
