#!/usr/bin/env python
"""Dissect the SDF pairs route (the shipped headline path) stage by
stage on the real TPU: align / (S,n_t) ball test / rank select /
gather+transform / splat. Timing discipline per CLAUDE.md (K-loop with
carry perturbation, null subtraction, min-of-3).
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
    r = f(*args)
    float(jnp.sum(r))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        r = f(*args)
        s = float(jnp.sum(r))
        best = min(best, time.time() - t0)
    print(f"{name:34s} {best/K*1000:8.3f} ms/iter  (checksum {s:.1f})",
          flush=True)
    return best / K


def loop(body, x):
    def step(i, carry):
        xi = x + carry * 1e-30
        return jnp.sum(body(xi)) + carry * 0.0

    return lambda: jax.lax.fori_loop(0, K, step, jnp.float32(0.0))


def main():
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops import sdf as sdf_ops
    from viamd_tpu.ops.density import splat_trilinear

    sys_, traj = water_box_device(N_WATERS, n_frames=1, seed=3)
    traj.stage_fence()
    x, _ = traj.device_frame(0)
    box = jnp.asarray(sys_.cell.extent(), jnp.float32)
    box_np = np.asarray(sys_.cell.extent())
    el = np.asarray(sys_.element)
    res = np.asarray(sys_.atom_res_idx)
    structs = [np.nonzero(res == r)[0].astype(np.int32) for r in range(64)]
    idx_s, w_s, refc = sdf_ops.make_structure_inputs(
        structs, jnp.asarray(sys_.mass), np.asarray(x)
    )
    idx_s, w_s, refc = (jnp.asarray(idx_s), jnp.asarray(w_s),
                        jnp.asarray(refc))
    tw = jnp.asarray((el == 1).astype(np.float32))
    idx_t = jnp.asarray(np.nonzero(el == 1)[0].astype(np.int32))
    extent, dims = 5.0, 64
    basis, inv_basis = jnp.diag(box), jnp.diag(1.0 / box)
    x_np = np.asarray(x)
    cnt0 = sdf_ops.sdf_frame0_ball_count(
        x_np[np.asarray(idx_t)], x_np, np.asarray(idx_s),
        np.asarray(w_s), box_np, extent, dims,
    )
    pair_cap = sdf_ops.sdf_pair_capacity(
        64, int(idx_t.size), box_np, extent, dims, per_struct_count=cnt0,
    )
    support0 = sdf_ops.sdf_frame0_support_count(
        x_np[np.asarray(idx_t)], x_np, np.asarray(idx_s),
        np.asarray(w_s), np.asarray(refc), box_np, extent, dims,
    )
    ccap = sdf_ops.sdf_compact_capacity(
        64, int(idx_t.size), box_np, extent, dims, support_count=support0,
    )
    print(f"n_t={idx_t.size} pair_cap={pair_cap} compact_cap={ccap}",
          flush=True)

    timed("null", lambda xx: loop(lambda v: v[0, 0] * 0.0, xx)(), x)

    def align(xx):
        R, c = sdf_ops.sdf_reference_frames(
            xx, idx_s, w_s, refc, basis, inv_basis
        )
        return R

    timed("align (ref frames)", lambda xx: loop(align, xx)(), x)

    voxel_w = 2.0 * extent / dims
    sup = 1.7320508 * (extent + 0.5 * voxel_w) + 1e-4

    def ball(xx):
        xt = xx[idx_t]
        twt = tw[idx_t]
        R, c = sdf_ops.sdf_reference_frames(
            xx, idx_s, w_s, refc, basis, inv_basis
        )
        dk = [xt[:, k][None, :] - c[:, k][:, None] for k in range(3)]
        f = [
            dk[0] * inv_basis[0, a] + dk[1] * inv_basis[1, a]
            + dk[2] * inv_basis[2, a]
            for a in range(3)
        ]
        r = [jnp.round(fa) for fa in f]
        d2 = jnp.zeros_like(dk[0])
        for a in range(3):
            corr = (r[0] * basis[0, a] + r[1] * basis[1, a]
                    + r[2] * basis[2, a])
            da = dk[a] - corr
            d2 = d2 + da * da
        m = (twt[None, :] > 0.0) & (d2 < sup * sup)
        return m.astype(jnp.float32)[:, :128]

    timed("align + ball test (S,n_t)", lambda xx: loop(ball, xx)(), x)

    def full(xx):
        return sdf_ops.sdf_accumulate_pairs(
            xx, tw, idx_s, w_s, refc, extent, dims, basis, inv_basis,
            idx_t, pair_cap, compact_cap=ccap,
        )

    timed("FULL pairs", lambda xx: loop(full, xx)(), x)

    def full_nocompact(xx):
        return sdf_ops.sdf_accumulate_pairs(
            xx, tw, idx_s, w_s, refc, extent, dims, basis, inv_basis,
            idx_t, pair_cap, compact_cap=None,
        )

    timed("FULL pairs (no compact)", lambda xx: loop(full_nocompact, xx)(), x)

    # splat alone at the compacted slot count
    pf = jnp.asarray(
        np.random.default_rng(0).uniform(-5, 5, (ccap, 3)), jnp.float32
    )
    wf = jnp.ones((ccap,), jnp.float32)
    origin = jnp.full((3,), -extent, jnp.float32)
    voxel = jnp.full((3,), voxel_w, jnp.float32)

    def splat(p):
        return splat_trilinear(p, wf, (dims, dims, dims), origin, voxel)

    timed(f"splat alone ({ccap} slots)", lambda xx: loop(splat, xx)(), pf)


if __name__ == "__main__" and __import__("sys").argv[1:] != ["stages"]:
    main()


def stages():
    """Fine-grained rank-select stage timings (run: exp_sdfpairs.py stages)."""
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops import sdf as sdf_ops

    sys_, traj = water_box_device(N_WATERS, n_frames=1, seed=3)
    traj.stage_fence()
    x, _ = traj.device_frame(0)
    box = jnp.asarray(sys_.cell.extent(), jnp.float32)
    el = np.asarray(sys_.element)
    res = np.asarray(sys_.atom_res_idx)
    structs = [np.nonzero(res == r)[0].astype(np.int32) for r in range(64)]
    idx_s, w_s, refc = sdf_ops.make_structure_inputs(
        structs, jnp.asarray(sys_.mass), np.asarray(x)
    )
    idx_s, w_s, refc = (jnp.asarray(idx_s), jnp.asarray(w_s),
                        jnp.asarray(refc))
    tw = jnp.asarray((el == 1).astype(np.float32))
    idx_t = jnp.asarray(np.nonzero(el == 1)[0].astype(np.int32))
    extent, dims = 5.0, 64
    basis, inv_basis = jnp.diag(box), jnp.diag(1.0 / box)
    S, C = 64, 384
    n_t = int(idx_t.size)
    voxel_w = 2.0 * extent / dims
    sup = 1.7320508 * (extent + 0.5 * voxel_w) + 1e-4

    def mask_of(xx):
        xt = xx[idx_t]
        twt = tw[idx_t]
        R, c = sdf_ops.sdf_reference_frames(
            xx, idx_s, w_s, refc, basis, inv_basis
        )
        dk = [xt[:, k][None, :] - c[:, k][:, None] for k in range(3)]
        d2 = jnp.zeros_like(dk[0])
        for a in range(3):
            da = dk[a] - box[a] * jnp.round(dk[a] / box[a])
            d2 = d2 + da * da
        return (twt[None, :] > 0.0) & (d2 < sup * sup), xt, twt, R, c

    npad = -(-n_t // 128) * 128

    def upto_cumsum(xx):
        m, *_ = mask_of(xx)
        m2 = jnp.pad(
            m.astype(jnp.int32), ((0, 0), (0, npad - n_t))
        ).reshape(S, -1, 128)
        rs = jnp.cumsum(m2, axis=2)
        return rs[:, :, 127].astype(jnp.float32)[:, :128]

    def upto_blocksel(xx):
        m, *_ = mask_of(xx)
        m2 = jnp.pad(
            m.astype(jnp.int32), ((0, 0), (0, npad - n_t))
        ).reshape(S, -1, 128)
        rs = jnp.cumsum(m2, axis=2)
        blk = jnp.cumsum(rs[:, :, 127], axis=1)
        nb = blk.shape[1]
        j1 = jnp.arange(1, C + 1, dtype=jnp.int32)
        b = jnp.sum(
            (blk[:, None, :] < j1[None, :, None]).astype(jnp.int32), axis=2
        )
        return b.astype(jnp.float32)

    def upto_lanesel(xx):
        m, *_ = mask_of(xx)
        m2 = jnp.pad(
            m.astype(jnp.int32), ((0, 0), (0, npad - n_t))
        ).reshape(S, -1, 128)
        rs = jnp.cumsum(m2, axis=2)
        blk = jnp.cumsum(rs[:, :, 127], axis=1)
        nb = blk.shape[1]
        j1 = jnp.arange(1, C + 1, dtype=jnp.int32)
        b = jnp.sum(
            (blk[:, None, :] < j1[None, :, None]).astype(jnp.int32), axis=2
        )
        b = jnp.minimum(b, nb - 1)
        srow = (
            jax.lax.broadcasted_iota(jnp.int32, (S, C), 0) * nb + b
        ).reshape(-1)
        rows = rs.reshape(S * nb, 128)[srow].reshape(S, C, 128)
        blkb = blk.reshape(-1)[srow].reshape(S, C)
        r_in = j1[None, :] - (blkb - rows[:, :, 127])
        lane = jnp.sum((rows < r_in[:, :, None]).astype(jnp.int32), axis=2)
        src = jnp.minimum(b * 128 + jnp.minimum(lane, 127), n_t - 1)
        return src.astype(jnp.float32)

    def upto_lanesel_mxu(xx):
        """Same select, but the in-block prefix comes from an MXU
        triangle matmul on ONLY the gathered mask rows (bf16 exact for
        0/1 counts <= 128) — the full (S, nb, 128) lane cumsum is never
        materialized and the gather source is bf16 (half the bytes)."""
        m, *_ = mask_of(xx)
        mbf = jnp.pad(
            m.astype(jnp.bfloat16), ((0, 0), (0, npad - n_t))
        ).reshape(S, -1, 128)
        bs = jnp.sum(mbf.astype(jnp.float32), axis=2)  # (S, nb) block sums
        blk = jnp.cumsum(bs, axis=1)  # (S, nb) f32 (integers, exact)
        nb = blk.shape[1]
        j1f = jnp.arange(1, C + 1, dtype=jnp.float32)
        b = jnp.sum(
            (blk[:, None, :] < j1f[None, :, None]).astype(jnp.int32), axis=2
        )
        b = jnp.minimum(b, nb - 1)
        srow = (
            jax.lax.broadcasted_iota(jnp.int32, (S, C), 0) * nb + b
        ).reshape(-1)
        rows_m = mbf.reshape(S * nb, 128)[srow]  # (S*C, 128) bf16
        tri = jnp.asarray(
            np.triu(np.ones((128, 128), np.float32)).T, jnp.bfloat16
        )  # tri[k, l] = 1 for k <= l
        prefix = jax.lax.dot_general(
            rows_m, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(S, C, 128)
        blkb = blk.reshape(-1)[srow].reshape(S, C)
        r_in = j1f[None, :] - (blkb - prefix[:, :, 127])
        lane = jnp.sum((prefix < r_in[:, :, None]).astype(jnp.int32), axis=2)
        src = jnp.minimum(b * 128 + jnp.minimum(lane, 127), n_t - 1)
        return src.astype(jnp.float32)

    x0 = x
    timed("null", lambda xx: loop(lambda v: v[0, 0] * 0.0, xx)(), x0)
    timed("mask only", lambda xx: loop(
        lambda v: mask_of(v)[0].astype(jnp.float32)[:, :128], xx)(), x0)
    timed("+ lane cumsum", lambda xx: loop(upto_cumsum, xx)(), x0)
    timed("+ block select (S,C,nb)", lambda xx: loop(upto_blocksel, xx)(), x0)
    timed("+ rows gather + lane sel", lambda xx: loop(upto_lanesel, xx)(), x0)
    timed("+ rows gather + lane sel MXU", lambda xx: loop(upto_lanesel_mxu, xx)(), x0)
    # equality check (CPU-visible): same src on the real inputs
    a = np.asarray(jax.jit(upto_lanesel)(x0))
    bb = np.asarray(jax.jit(upto_lanesel_mxu)(x0))
    print("src equal:", np.array_equal(a, bb), flush=True)


if __name__ == "__main__" and __import__("sys").argv[1:] == ["stages"]:
    stages()
