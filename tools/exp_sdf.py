#!/usr/bin/env python
"""Experiment: SDF stage budget at the headline config (64 structs, 64^3).

Stages probed separately (fori_loop K, null-subtracted): cell list, align,
candidate gather only, gather+transform, full. Plus a finer-cell variant
(radius-2-style stencil) to test the geometric-crop/Poisson-tail tradeoff.
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


def timed(name, thunk):
    f = jax.jit(thunk)
    r = f()
    float(jnp.sum(r))
    t0 = time.time()
    r = f()
    s = float(jnp.sum(r))
    dt = time.time() - t0
    print(f"{name:34s} {dt/K*1000:8.3f} ms/iter  (checksum {s:.1f})", flush=True)
    return dt / K


def loop(body, x):
    def step(i, carry):
        xi = x + carry * 1e-30
        return jnp.sum(body(xi)) + carry * 0.0

    return lambda: jax.lax.fori_loop(0, K, step, jnp.float32(0.0))


def main():
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops.neighbors import build_cell_list, cell3_of_points, choose_grid_r
    from viamd_tpu.ops import sdf as sdf_ops
    from viamd_tpu.ops.density import splat_trilinear

    sys_, traj = water_box_device(N_WATERS, n_frames=1, seed=3)
    traj.stage_fence()
    x, _cell = traj.device_frame(0)
    box = jnp.asarray(sys_.cell.extent(), jnp.float32)
    box_np = np.asarray(sys_.cell.extent())
    el = np.asarray(sys_.element)
    res = np.asarray(sys_.atom_res_idx)
    structs = [np.nonzero(res == r)[0].astype(np.int32) for r in range(64)]
    idx_s, w_s, refc = sdf_ops.make_structure_inputs(
        structs, jnp.asarray(sys_.mass), np.asarray(x)
    )
    idx_s, w_s, refc = jnp.asarray(idx_s), jnp.asarray(w_s), jnp.asarray(refc)
    tw = jnp.asarray((el == 1).astype(np.float32))
    idx_t = jnp.asarray(np.nonzero(el == 1)[0].astype(np.int32))
    extent = 5.0
    D = 1.7320508 * extent

    timed("null", loop(lambda v: v[0, 0] * 0.0, x))

    for tag, dims_r in (("shipped r1", 1), ("fine r2", 2)):
        cl_dims, cl_cap = choose_grid_r(
            box_np, D / dims_r, idx_t.size, radius=1, tail=3.5
        )
        stencil = sdf_ops.make_sdf_stencil(extent, box_np / np.array(cl_dims))
        slots = len(stencil) * cl_cap
        print(
            f"--- {tag}: dims={cl_dims} cap={cl_cap} stencil={len(stencil)} "
            f"slots/struct={slots}",
            flush=True,
        )

        def full(xx, cl_dims=cl_dims, cl_cap=cl_cap, stencil=stencil):
            return sdf_ops.sdf_accumulate_cl(
                xx, tw, idx_s, w_s, refc, extent, 64, box,
                cl_dims, cl_cap, stencil, idx_t=idx_t,
            )

        timed(f"sdf FULL ({tag})", loop(full, x))

        ccap = sdf_ops.sdf_compact_capacity(64, int(idx_t.size), box_np, extent, 64)
        print(f"    compact_cap={ccap}", flush=True)

        def full_c(xx, cl_dims=cl_dims, cl_cap=cl_cap, stencil=stencil, ccap=ccap):
            return sdf_ops.sdf_accumulate_cl(
                xx, tw, idx_s, w_s, refc, extent, 64, box,
                cl_dims, cl_cap, stencil, idx_t=idx_t, compact_cap=ccap,
            )

        timed(f"sdf FULL+compact ({tag})", loop(full_c, x))

        # substage: everything up to (and incl.) the compaction gather,
        # skipping the splat — isolates cumsum+searchsorted+gather cost
        def to_compact(xx, cl_dims=cl_dims, cl_cap=cl_cap, stencil=stencil,
                       ccap=ccap):
            from viamd_tpu.ops.neighbors import build_cell_list, cell3_of_points
            xt = xx[idx_t]
            twt = tw[idx_t]
            cl = build_cell_list(xt, box, cl_dims, cl_cap)
            R, c = sdf_ops.sdf_reference_frames(
                xx, idx_s, w_s, refc, jnp.diag(box), jnp.diag(1.0 / box)
            )
            c3 = cell3_of_points(c, box, cl.dims)
            offs = jnp.asarray(stencil, jnp.int32)
            dims_arr = jnp.array(cl.dims, jnp.int32)
            dxc, dyc, dzc = cl.dims
            cells = jnp.mod(c3[:, None, :] + offs[None, :, :], dims_arr)
            cell_ids = (cells[..., 0] * dyc + cells[..., 1]) * dzc + cells[..., 2]
            nt = xt.shape[0]
            st = cl.starts[cell_ids]
            cnt = cl.starts[cell_ids + 1] - st
            slot = jnp.arange(cl_cap, dtype=jnp.int32)
            pos = st[..., None] + slot
            ok = (slot < cnt[..., None]).reshape(c.shape[0], -1)
            xs4 = jnp.concatenate([xt, twt[:, None]], axis=1)[cl.order]
            cd = xs4[jnp.minimum(pos, nt - 1).reshape(c.shape[0], -1)]
            d = cd[..., :3] - c[:, None, :]
            d = d - box * jnp.round(d / box)
            d0, d1, d2 = d[..., 0], d[..., 1], d[..., 2]
            p = jnp.stack(
                [
                    R[:, 0, 0, None] * d0 + R[:, 0, 1, None] * d1 + R[:, 0, 2, None] * d2,
                    R[:, 1, 0, None] * d0 + R[:, 1, 1, None] * d1 + R[:, 1, 2, None] * d2,
                    R[:, 2, 0, None] * d0 + R[:, 2, 1, None] * d1 + R[:, 2, 2, None] * d2,
                ],
                axis=-1,
            )
            w = cd[..., 3] * ok.astype(jnp.float32)
            pf = p.reshape(-1, 3)
            wf = w.reshape(-1)
            sup = extent + 0.5 * (2.0 * extent / 64)
            m = (wf > 0.0) & (jnp.max(jnp.abs(pf), axis=-1) < sup)
            cum = jnp.cumsum(m.astype(jnp.int32))
            j = jnp.arange(ccap, dtype=jnp.int32)
            src = jnp.searchsorted(cum, j + 1, side="left").astype(jnp.int32)
            keep = j < cum[-1]
            src = jnp.minimum(src, pf.shape[0] - 1)
            return jnp.sum(jnp.where(keep, wf[src], 0.0)) + jnp.sum(pf[src])

        timed(f"  ..through compact gather", loop(to_compact, x))

        def to_mask(xx, cl_dims=cl_dims, cl_cap=cl_cap, stencil=stencil):
            from viamd_tpu.ops.neighbors import build_cell_list, cell3_of_points
            xt = xx[idx_t]
            twt = tw[idx_t]
            cl = build_cell_list(xt, box, cl_dims, cl_cap)
            R, c = sdf_ops.sdf_reference_frames(
                xx, idx_s, w_s, refc, jnp.diag(box), jnp.diag(1.0 / box)
            )
            c3 = cell3_of_points(c, box, cl.dims)
            offs = jnp.asarray(stencil, jnp.int32)
            dims_arr = jnp.array(cl.dims, jnp.int32)
            dxc, dyc, dzc = cl.dims
            cells = jnp.mod(c3[:, None, :] + offs[None, :, :], dims_arr)
            cell_ids = (cells[..., 0] * dyc + cells[..., 1]) * dzc + cells[..., 2]
            nt = xt.shape[0]
            st = cl.starts[cell_ids]
            cnt = cl.starts[cell_ids + 1] - st
            slot = jnp.arange(cl_cap, dtype=jnp.int32)
            pos = st[..., None] + slot
            ok = (slot < cnt[..., None]).reshape(c.shape[0], -1)
            xs4 = jnp.concatenate([xt, twt[:, None]], axis=1)[cl.order]
            cd = xs4[jnp.minimum(pos, nt - 1).reshape(c.shape[0], -1)]
            d = cd[..., :3] - c[:, None, :]
            d = d - box * jnp.round(d / box)
            d0, d1, d2 = d[..., 0], d[..., 1], d[..., 2]
            p = jnp.stack(
                [
                    R[:, 0, 0, None] * d0 + R[:, 0, 1, None] * d1 + R[:, 0, 2, None] * d2,
                    R[:, 1, 0, None] * d0 + R[:, 1, 1, None] * d1 + R[:, 1, 2, None] * d2,
                    R[:, 2, 0, None] * d0 + R[:, 2, 1, None] * d1 + R[:, 2, 2, None] * d2,
                ],
                axis=-1,
            )
            w = cd[..., 3] * ok.astype(jnp.float32)
            pf = p.reshape(-1, 3)
            wf = w.reshape(-1)
            sup = extent + 0.5 * (2.0 * extent / 64)
            m = (wf > 0.0) & (jnp.max(jnp.abs(pf), axis=-1) < sup)
            return jnp.sum(m.astype(jnp.float32))

        timed(f"  ..through mask (no cumsum)", loop(to_mask, x))

        def gather_only(xx, cl_dims=cl_dims, cl_cap=cl_cap, stencil=stencil):
            xt = xx[idx_t]
            twt = tw[idx_t]
            cl = build_cell_list(xt, box, cl_dims, cl_cap)
            R, c = sdf_ops.sdf_reference_frames(
                xx, idx_s, w_s, refc, jnp.diag(box), jnp.diag(1.0 / box)
            )
            c3 = cell3_of_points(c, box, cl.dims)
            offs = jnp.asarray(stencil, jnp.int32)
            dims_arr = jnp.array(cl.dims, jnp.int32)
            dxc, dyc, dzc = cl.dims
            cells = jnp.mod(c3[:, None, :] + offs[None, :, :], dims_arr)
            cell_ids = (cells[..., 0] * dyc + cells[..., 1]) * dzc + cells[..., 2]
            nt = xt.shape[0]
            st = cl.starts[cell_ids]
            cnt = cl.starts[cell_ids + 1] - st
            slot = jnp.arange(cl_cap, dtype=jnp.int32)
            pos = st[..., None] + slot
            ok = (slot < cnt[..., None]).reshape(c.shape[0], -1)
            xs4 = jnp.concatenate([xt, twt[:, None]], axis=1)[cl.order]
            cd = xs4[jnp.minimum(pos, nt - 1).reshape(c.shape[0], -1)]
            return jnp.sum(cd[..., 3] * ok) + jnp.sum(R)

        timed(f"  cell-list+align+gather", loop(gather_only, x))


if __name__ == "__main__":
    main()
