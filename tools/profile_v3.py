#!/usr/bin/env python
"""TPU timing v3: occupancy-skip RDF + SDF sub-piece breakdown."""

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
    r = f(*args)
    float(jnp.sum(r))
    t0 = time.time()
    r = f(*args)
    float(jnp.sum(r))
    dt = time.time() - t0
    print(f"{name:30s} {dt/K*1000:8.3f} ms/iter", flush=True)
    return dt / K


def loop(body, x):
    def step(i, carry):
        xi = x + carry * 1e-30
        return jnp.sum(body(xi)) + carry * 0.0

    return lambda: jax.lax.fori_loop(0, K, step, jnp.float32(0.0))


def main():
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops.pallas_rdf import pair_dist_histogram_pl
    from viamd_tpu.ops.neighbors import (
        build_cell_list, cell3_of_points, choose_grid, choose_grid_r,
    )
    from viamd_tpu.ops import sdf as sdf_ops
    from viamd_tpu.ops.density import splat_trilinear_dense

    sys_, traj = water_box_device(N_WATERS, n_frames=1, seed=3)
    traj.stage_fence()
    x, _ = traj.device_frame(0)
    box = jnp.asarray(sys_.cell.extent(), jnp.float32)
    box_np = np.asarray(sys_.cell.extent())
    el = np.asarray(sys_.element)
    idx_o = jnp.asarray(np.nonzero(el == 8)[0].astype(np.int32))
    n = x.shape[0]

    timed("null", lambda xx: loop(lambda v: v[0, 0] * 0.0, xx)(), x)

    dims1, cap1 = choose_grid_r(box_np, 10.0, idx_o.size, radius=1)

    def rdf(xx):
        return pair_dist_histogram_pl(
            xx, idx_o, idx_o, box, 128, 10.0, dims1, cap1, cap1,
            radius=1, symmetric=True,
        )

    timed("rdf r1 + occ-skip", lambda xx: loop(rdf, xx)(), x)

    def rdf_prep_only(xx):
        from viamd_tpu.ops.rdf import neighborhood_planes, stencil_offsets

        xa = xx[idx_o]
        cl = build_cell_list(xa, box, dims1, 64)
        b_xyz = xa[cl.table]
        offsets = stencil_offsets(1, True)
        pls = [
            neighborhood_planes(b_xyz[..., k], dims1, 1, offsets)
            for k in range(3)
        ]
        return pls[0] + pls[1] + pls[2]

    timed("rdf r1 prep(planes)", lambda xx: loop(rdf_prep_only, xx)(), x)

    # ---- SDF pieces (64^3, target-only cl) --------------------------------
    res = np.asarray(sys_.atom_res_idx)
    structs = [np.nonzero(res == r)[0].astype(np.int32) for r in range(64)]
    idx_s, w_s, refc = sdf_ops.make_structure_inputs(
        structs, jnp.asarray(sys_.mass), np.asarray(x)
    )
    idx_s, w_s, refc = jnp.asarray(idx_s), jnp.asarray(w_s), jnp.asarray(refc)
    tw = jnp.asarray((el == 1).astype(np.float32))
    idx_t = jnp.asarray(np.nonzero(el == 1)[0].astype(np.int32))
    extent = 5.0
    cl_dims, _ = choose_grid(box_np, 1.7320508 * extent, n)
    lam = idx_t.size / float(np.prod(cl_dims))
    cl_cap = int(np.ceil(lam + 4.5 * np.sqrt(lam) + 2.0))
    stencil = sdf_ops.make_sdf_stencil(extent, box_np / np.array(cl_dims))
    npts = len(stencil) * cl_cap * 64
    print(f"sdf candidates={npts}", flush=True)

    def cl_only(xx):
        cl = build_cell_list(xx[idx_t], box, cl_dims, cl_cap)
        return cl.table.astype(jnp.float32) * 1e-6

    timed("sdf cl build (66k t)", lambda xx: loop(cl_only, xx)(), x)

    def gather_transform(xx):
        xt = x_t = xx[idx_t]
        cl = build_cell_list(x_t, box, cl_dims, cl_cap)
        R, c = sdf_ops.sdf_reference_frames(
            xx, idx_s, w_s, refc, jnp.diag(box), jnp.diag(1.0 / box)
        )
        c3 = cell3_of_points(c, box, cl.dims)
        offs = jnp.asarray(stencil, jnp.int32)
        dims_arr = jnp.array(cl.dims, jnp.int32)
        dxc, dyc, dzc = cl.dims
        cells = jnp.mod(c3[:, None, :] + offs[None, :, :], dims_arr)
        cell_ids = (cells[..., 0] * dyc + cells[..., 1]) * dzc + cells[..., 2]
        cand = cl.table[cell_ids].reshape(c.shape[0], -1)
        d = xt[cand] - c[:, None, :]
        d = d - box * jnp.round(d / box)
        d0, d1, d2 = d[..., 0], d[..., 1], d[..., 2]
        p = (
            R[:, 0, 0, None] * d0 + R[:, 0, 1, None] * d1
            + R[:, 0, 2, None] * d2
        )
        return p

    timed("sdf gather+transform", lambda xx: loop(gather_transform, xx)(), x)

    def sdf_full(xx):
        return sdf_ops.sdf_accumulate_cl(
            xx, tw, idx_s, w_s, refc, extent, 64, box,
            cl_dims, cl_cap, stencil, idx_t=idx_t,
        )

    timed("sdf FULL 64^3", lambda xx: loop(sdf_full, xx)(), x)

    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (npts, 3), minval=-6.0, maxval=6.0)
    wts = jnp.ones((npts,), jnp.float32)

    def splat(pp):
        origin = jnp.full((3,), -extent, jnp.float32)
        voxel = jnp.full((3,), 2 * extent / 64, jnp.float32)
        return splat_trilinear_dense(pp, wts, (64, 64, 64), origin, voxel)

    timed(f"sdf splat alone 64^3", lambda pp: loop(splat, pp)(), pts)


if __name__ == "__main__":
    main()
