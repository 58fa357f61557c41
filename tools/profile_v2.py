#!/usr/bin/env python
"""TPU timing of the v2 kernels (radius-1 Poisson, class-split r2, SDF-t)."""

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
    s = float(jnp.sum(r))
    dt = time.time() - t0
    print(f"{name:28s} {dt/K*1000:8.3f} ms/iter  sum/K={s/K:.1f}", flush=True)
    return dt / K


def loop(body, x):
    def step(i, carry):
        xi = x + carry * 1e-30
        return jnp.sum(body(xi)) + carry * 0.0

    return lambda: jax.lax.fori_loop(0, K, step, jnp.float32(0.0))


def main():
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops.pallas_rdf import pair_dist_histogram_pl
    from viamd_tpu.ops.neighbors import choose_grid, choose_grid_r
    from viamd_tpu.ops import sdf as sdf_ops

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
    dims2, cap2 = choose_grid(box_np, 10.0, idx_o.size)
    w1 = tuple(float(w) for w in box_np / np.array(dims1))
    w2 = tuple(float(w) for w in box_np / np.array(dims2))
    print(f"r1 dims={dims1} cap={cap1}; r2 dims={dims2} cap={cap2}", flush=True)

    def rdf(xx, dims, cap, radius, widths):
        return pair_dist_histogram_pl(
            xx, idx_o, idx_o, box, 128, 10.0, dims, cap, cap,
            radius=radius, symmetric=True, widths=widths,
        )

    h1 = rdf(x, dims1, cap1, 1, None)
    h2 = rdf(x, dims2, cap2, 2, w2)
    d = float(jnp.max(jnp.abs(h1 - h2)))
    print(f"r1 vs r2+classes max|Δ| = {d} (sum {float(jnp.sum(h1)):.0f})", flush=True)

    timed("rdf r1 poisson", lambda xx: loop(lambda v: rdf(v, dims1, cap1, 1, None), xx)(), x)
    timed("rdf r2 + classes", lambda xx: loop(lambda v: rdf(v, dims2, cap2, 2, w2), xx)(), x)
    timed("rdf r1 + classes", lambda xx: loop(lambda v: rdf(v, dims1, cap1, 1, w1), xx)(), x)

    # SDF v2: target-only cell list + bf16 tent product, 64^3 grid
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
    cl_cap_t = int(np.ceil(lam + 4.5 * np.sqrt(lam) + 2.0))
    cl_cap_all = int(np.ceil(n / np.prod(cl_dims) * 3))
    stencil = sdf_ops.make_sdf_stencil(extent, box_np / np.array(cl_dims))
    print(f"sdf dims={cl_dims} cap_t={cl_cap_t} cap_all={cl_cap_all}", flush=True)

    def sdf_old(xx):
        return sdf_ops.sdf_accumulate_cl(
            xx, tw, idx_s, w_s, refc, extent, 64, box,
            cl_dims, cl_cap_all, stencil,
        )

    def sdf_new(xx):
        return sdf_ops.sdf_accumulate_cl(
            xx, tw, idx_s, w_s, refc, extent, 64, box,
            cl_dims, cl_cap_t, stencil, idx_t=idx_t,
        )

    g_old = sdf_old(x)
    g_new = sdf_new(x)
    print(
        f"sdf old sum={float(jnp.sum(g_old)):.2f} new sum="
        f"{float(jnp.sum(g_new)):.2f} max|Δ|={float(jnp.max(jnp.abs(g_old-g_new))):.4f}",
        flush=True,
    )
    timed("sdf 64^3 all-atom cl", lambda xx: loop(sdf_old, xx)(), x)
    timed("sdf 64^3 target cl+bf16", lambda xx: loop(sdf_new, xx)(), x)


if __name__ == "__main__":
    main()
