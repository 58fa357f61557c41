#!/usr/bin/env python
"""Probe: grouped packed sort vs argsort for the 1M-atom cell list.

Times build_cell_list variants (argsort fallback vs the G-group packed
sort) and the stage pieces of the grouped build, fori_loop(K)
null-subtracted per CLAUDE.md timing discipline.
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
    r = f()
    float(jnp.sum(r))  # force the warmup (lazy-queue backend)
    best = None
    for _ in range(3):
        t0 = time.time()
        r = f()
        s = float(jnp.sum(r))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:34s} {best/K*1000:8.3f} ms/iter  (chk {s:.1f})",
          flush=True)
    return best / K


def loop(body, x):
    def step(i, carry):
        xi = x + carry * 1e-30
        return jnp.sum(body(xi)) + carry * 0.0

    return lambda: jax.lax.fori_loop(0, K, step, jnp.float32(0.0))


def main():
    import viamd_tpu.ops.neighbors as nb
    from viamd_tpu.datagen import water_box_device

    sys_, traj = water_box_device(N_WATERS, n_frames=1, seed=3)
    traj.stage_fence()
    x, _ = traj.device_frame(0)
    box_np = np.asarray(sys_.cell.extent())
    box = jnp.asarray(box_np, jnp.float32)
    el = np.asarray(sys_.element)
    cases = [
        (el == 8, "O(333k) rdf-grid", 10.0, 1),
        (el == 1, "H(667k) rdf-grid", 10.0, 1),
        # the config-#4 SDF target grid: cell width >= sqrt(3)*extent/...
        # (choose_grid: width >= cutoff/2 with cutoff = sqrt(3)*5*2)
        (el == 1, "H(667k) sdf-grid", 1.7320508 * 5.0 * 2.0, 2),
    ]
    for sel, name, cutoff, radius in cases:
        idx = jnp.asarray(np.nonzero(sel)[0].astype(np.int32))
        dims, cap = nb.choose_grid_r(
            box_np, cutoff, idx.size, radius=radius)
        n = idx.size
        ncells = int(np.prod(dims))
        cell_bits = int(np.ceil(np.log2(ncells + 1)))
        idx_bits = int(np.ceil(np.log2(n)))
        G = nb._grouped_sort_groups(n, cell_bits, idx_bits)
        print(f"-- {name}: dims={dims} cap={cap} G={G}", flush=True)

        timed("null", loop(lambda v: v[0, 0] * 0.0, x))

        real = nb._grouped_sort_groups

        def use(cl):
            return (
                jnp.sum(cl.starts.astype(jnp.float32))
                + jnp.sum(cl.table[:, 0].astype(jnp.float32))
                + jnp.sum(cl.valid[:, 0].astype(jnp.float32))
            )

        # argsort fallback
        nb._grouped_sort_groups = lambda *a, **k: None
        jax.clear_caches()
        timed("argsort build", loop(
            lambda xx: use(nb.build_cell_list(xx[idx], box, dims, cap)), x))
        # grouped
        nb._grouped_sort_groups = real
        jax.clear_caches()
        timed("grouped build", loop(
            lambda xx: use(nb.build_cell_list(xx[idx], box, dims, cap)), x))

        if G:
            # stage pieces of the grouped build
            m = -(-n // G)
            mbits = max(int(np.ceil(np.log2(max(m, 2)))), 1)

            def cid_of(xx):
                dims_arr = jnp.array(dims, jnp.int32)
                frac = xx[idx] / box
                frac = frac - jnp.floor(frac)
                c3 = jnp.clip(
                    (frac * dims_arr).astype(jnp.int32), 0, dims_arr - 1)
                return (c3[:, 0] * dims[1] + c3[:, 1]) * dims[2] + c3[:, 2]

            def sort_only(xx):
                cid = cid_of(xx)
                key = (cid << mbits) | (
                    jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0] % m)
                key = jnp.pad(key, (0, G * m - n),
                              constant_values=(ncells << mbits))
                return jnp.sum(
                    jnp.sort(key.reshape(G, m), axis=1)[:, 0]
                    .astype(jnp.float32))

            timed("  grouped: batched sort only", loop(sort_only, x))

            def sort_starts(xx):
                cid = cid_of(xx)
                key = (cid << mbits) | (
                    jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0] % m)
                key = jnp.pad(key, (0, G * m - n),
                              constant_values=(ncells << mbits))
                skey = jnp.sort(key.reshape(G, m), axis=1)
                cells = jax.lax.broadcasted_iota(
                    jnp.int32, (ncells + 1, 1), 0)[:, 0]
                starts_g = jax.vmap(
                    lambda row: jnp.searchsorted(
                        row, cells << mbits, side="left")
                )(skey).astype(jnp.int32)
                return jnp.sum(starts_g.astype(jnp.float32))

            timed("  + vmapped searchsorted", loop(sort_starts, x))

        # flat sort baseline for scale
        def flat_sort(xx):
            cid = cid_of(xx) if G else None
            dims_arr = jnp.array(dims, jnp.int32)
            frac = xx[idx] / box
            frac = frac - jnp.floor(frac)
            c3 = jnp.clip(
                (frac * dims_arr).astype(jnp.int32), 0, dims_arr - 1)
            cid = (c3[:, 0] * dims[1] + c3[:, 1]) * dims[2] + c3[:, 2]
            return jnp.sum(jnp.sort(cid)[:128].astype(jnp.float32))

        timed("  flat jnp.sort(cid) baseline", loop(flat_sort, x))


if __name__ == "__main__":
    main()
