#!/usr/bin/env python
"""Component-level TPU profiling of the headline bench pipeline.

Timing discipline (CLAUDE.md): after the first scalar readback this backend
dispatches synchronously, so each piece is ONE jitted dispatch that loops K
iterations internally (lax.fori_loop with a carry-perturbed input so XLA can
neither hoist nor parallelize the body), timed around [dispatch + scalar
readback], with the null-loop dispatch time subtracted.
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
    float(jnp.sum(r))
    dt = time.time() - t0
    print(f"{name:28s} {dt/K*1000:8.3f} ms/iter   ({dt:.3f} s / {K})", flush=True)
    return dt / K


def loop(body, x):
    """K serialized iterations of body over a carry-perturbed input."""

    def step(i, carry):
        xi = x + carry * 1e-30
        return jnp.sum(body(xi)) * 1e-12 + carry * 0.5

    return lambda: jax.lax.fori_loop(0, K, step, jnp.float32(0.0))


def main():
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops.neighbors import build_cell_list
    from viamd_tpu.ops.pallas_rdf import pair_dist_histogram_pl
    from viamd_tpu.ops.rdf import neighborhood_planes, stencil_offsets
    from viamd_tpu.ops import sdf as sdf_ops
    from viamd_tpu.ops import covariance as cov_ops

    sys_, traj = water_box_device(N_WATERS, n_frames=1, seed=3)
    traj.stage_fence()
    x, _cell = traj.device_frame(0)  # (n,3) device
    box = jnp.asarray(sys_.cell.extent(), jnp.float32)
    el = np.asarray(sys_.element)
    idx_o = jnp.asarray(np.nonzero(el == 8)[0].astype(np.int32))
    n = x.shape[0]
    print(f"atoms={n} O={idx_o.size} box={np.asarray(box)}", flush=True)

    # --- null loop (dispatch + readback overhead)
    timed("null", lambda xx: loop(lambda v: v[0, 0], xx)(), x)

    # --- RDF pieces -------------------------------------------------------
    dims2, cap2 = (20, 20, 20), 13
    dims1, cap1 = (10, 10, 10), 64

    def cl_build(xx):
        cl = build_cell_list(xx[idx_o], box, dims2, cap2)
        return cl.table.astype(jnp.float32) * 1e-6

    timed("cell_list r2 (33k O)", lambda xx: loop(cl_build, xx)(), x)

    def rdf_prep(xx, dims, cap, radius):
        xa = xx[idx_o]
        cl = build_cell_list(xa, box, dims, cap)
        b_xyz = xa[cl.table]
        offsets = stencil_offsets(radius, True)
        pl_ = [
            neighborhood_planes(b_xyz[..., k], dims, radius, offsets)
            for k in range(3)
        ]
        return pl_[0] + pl_[1] + pl_[2]

    timed(
        "rdf prep r2 (planes only)",
        lambda xx: loop(lambda v: rdf_prep(v, dims2, cap2, 2), xx)(),
        x,
    )

    def rdf_full(xx, dims, cap, radius):
        return pair_dist_histogram_pl(
            xx, idx_o, idx_o, box, 128, 10.0, dims, cap, cap,
            radius=radius, symmetric=True,
        )

    timed(
        "rdf FULL r2 (current)",
        lambda xx: loop(lambda v: rdf_full(v, dims2, cap2, 2), xx)(),
        x,
    )
    timed(
        "rdf FULL r1 cap64",
        lambda xx: loop(lambda v: rdf_full(v, dims1, cap1, 1), xx)(),
        x,
    )

    # --- SDF pieces -------------------------------------------------------
    res = np.asarray(sys_.atom_res_idx)
    structs = [np.nonzero(res == r)[0].astype(np.int32) for r in range(64)]
    masses = jnp.asarray(sys_.mass)
    idx_s, w_s, refc = sdf_ops.make_structure_inputs(
        structs, masses, np.asarray(x)
    )
    idx_s, w_s, refc = jnp.asarray(idx_s), jnp.asarray(w_s), jnp.asarray(refc)
    tw = jnp.asarray((el == 1).astype(np.float32))
    extent = 5.0
    from viamd_tpu.ops.neighbors import cell3_of_points

    box_np = np.asarray(box)
    cl_dims = tuple(int(d) for d in np.floor(box_np / (1.7320508 * extent / 2)))
    cl_cap = int(np.ceil(n / np.prod(cl_dims) * 3))
    stencil = sdf_ops.make_sdf_stencil(extent, box_np / np.array(cl_dims))
    print(f"sdf cl_dims={cl_dims} cap={cl_cap} stencil={len(stencil)}", flush=True)

    def sdf_align(xx):
        R, c = sdf_ops.sdf_reference_frames(
            xx, idx_s, w_s, refc, jnp.diag(box), jnp.diag(1.0 / box)
        )
        return R

    timed("sdf align (64 structs)", lambda xx: loop(sdf_align, xx)(), x)

    def sdf_cl_build(xx):
        cl = build_cell_list(xx, box, cl_dims, cl_cap)
        return cl.table.astype(jnp.float32) * 1e-6

    timed("sdf cell_list (100k)", lambda xx: loop(sdf_cl_build, xx)(), x)

    def sdf_gather(xx):
        cl = build_cell_list(xx, box, cl_dims, cl_cap)
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
        d = xx[cand] - c[:, None, :]
        return d[..., 0]

    timed("sdf gather+rel", lambda xx: loop(sdf_gather, xx)(), x)

    def sdf_full(xx):
        return sdf_ops.sdf_accumulate_cl(
            xx, tw, idx_s, w_s, refc, extent, 32, box,
            cl_dims, cl_cap, stencil,
        )

    timed("sdf FULL (current)", lambda xx: loop(sdf_full, xx)(), x)

    # splat alone on a fixed candidate-scale point set
    npts = len(stencil) * cl_cap * 64
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (npts, 3), minval=-6.0, maxval=6.0)
    wts = jnp.ones((npts,), jnp.float32)
    from viamd_tpu.ops.density import splat_trilinear_dense

    def splat(pp):
        origin = jnp.full((3,), -extent, jnp.float32)
        voxel = jnp.full((3,), 2 * extent / 32, jnp.float32)
        return splat_trilinear_dense(pp, wts, (32, 32, 32), origin, voxel)

    timed(f"sdf splat alone ({npts})", lambda pp: loop(splat, pp)(), pts)

    # --- shape weights ----------------------------------------------------
    wall = jnp.ones((n,), jnp.float32)

    def shape(xx):
        return cov_ops.shape_weights(xx, wall, jnp.diag(box), jnp.diag(1.0 / box))

    timed("shape_weights (100k)", lambda xx: loop(shape, xx)(), x)


if __name__ == "__main__":
    main()
