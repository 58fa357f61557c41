#!/usr/bin/env python
"""Probe: B-plane construction cost — rolls vs per-cell-row gather.

The r2 design used wrapped ROLLS for the neighborhood planes on the
theory that gathers are slow and rolls run at HBM bandwidth. But the
roll stride (dz·K elements) is generally NOT a multiple of the 128-lane
tile (e.g. K=64, dz=21 → 1344 mod 128 = 64), so every roll forces a
full cross-lane relayout of the whole table — measured ~8.5 ms at the
1M config, ~100× the HBM bound. The alternative: ONE gather of
(ncells · S) table ROWS (row-priced at ~4.3e8 rows/s → ~0.3 ms) via
candidate_cells. This probe measures both + checks equality.

K-loop, null-subtracted, min-of-3 (CLAUDE.md discipline).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 16


def timed(name, thunk):
    f = jax.jit(thunk)
    float(jnp.sum(f()))
    best = None
    for _ in range(3):
        t0 = time.time()
        s = float(jnp.sum(f()))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:36s} {best/K*1000:8.3f} ms/iter  (chk {s:.3g})",
          flush=True)
    return best / K


def loop(body, x):
    def step(i, carry):
        xi = x + carry * 1e-30
        return jnp.sum(body(xi)).astype(jnp.float32) + carry * 0.0

    return lambda: jax.lax.fori_loop(0, K, step, jnp.float32(0.0))


def gather_planes(tbl, dims, offsets, box, gax_mags):
    """(ncells, K) → (ncells, S·K) via ONE row gather + wrap pre-shift.

    gax_mags: per-axis wrap magnitudes (box extents / 1.0 fractional) for
    the coordinate channel being built, or None for id planes.
    """
    dx, dy, dz = dims
    offs = np.asarray(offsets, np.int32)  # (S, 3)
    S = offs.shape[0]
    cells3 = np.stack(
        np.meshgrid(
            np.arange(dx), np.arange(dy), np.arange(dz), indexing="ij"
        ),
        -1,
    ).reshape(-1, 3)  # (ncells, 3)
    c = cells3[:, None, :] + offs[None, :, :]  # (ncells, S, 3)
    wrapped_hi = c >= np.array(dims)
    wrapped_lo = c < 0
    cm = np.mod(c, np.array(dims))
    nb = (cm[..., 0] * dy + cm[..., 1]) * dz + cm[..., 2]  # (ncells, S)
    nb_j = jnp.asarray(nb.astype(np.int32))
    pl = tbl[nb_j]  # (ncells, S, K) — ncells·S row gather
    if gax_mags is not None:
        shift = np.zeros(nb.shape, np.float32)
        for ax, mag in enumerate(gax_mags):
            shift += (
                wrapped_hi[..., ax].astype(np.float32)
                - wrapped_lo[..., ax].astype(np.float32)
            ) * mag
        pl = pl + jnp.asarray(shift)[:, :, None]
    ncells = dx * dy * dz
    return pl.reshape(ncells, S * tbl.shape[1])


def run_scale(n_sel, label):
    from viamd_tpu.ops.neighbors import choose_grid_r
    from viamd_tpu.ops.rdf import (
        neighborhood_planes, snap_capacity, stencil_offsets,
    )

    rng = np.random.RandomState(3)
    box_np = np.full(3, (n_sel / 0.0333) ** (1 / 3))
    dims, cap = choose_grid_r(box_np, 10.0, n_sel, radius=1)
    offs = stencil_offsets(1, True)
    cap = snap_capacity(cap, n_sel / float(np.prod(dims)), len(offs))
    ncells = int(np.prod(dims))
    print(f"-- {label}: dims={dims} cap={cap} ncells={ncells} "
          f"S={len(offs)}", flush=True)
    tbl = jnp.asarray(
        rng.uniform(0, box_np[0], (ncells, cap)).astype(np.float32)
    )
    box = jnp.asarray(box_np, jnp.float32)

    timed("null", loop(lambda t: t[:1, :1] * 0.0, tbl))

    def rolls3(t):
        acc = jnp.float32(0.0)
        for ax in range(3):
            pl = neighborhood_planes(
                t + ax, dims, 1, offs, wrap_shift=(ax, box[ax])
            )
            acc = acc + jnp.sum(pl)
        return acc

    timed("rolls x3 channels (shipped)", loop(rolls3, tbl))

    def gath3(t):
        acc = jnp.float32(0.0)
        for ax in range(3):
            mags = [0.0, 0.0, 0.0]
            mags[ax] = float(box_np[ax])
            pl = gather_planes(t + ax, dims, offs, box, mags)
            acc = acc + jnp.sum(pl)
        return acc

    timed("row-gather x3 channels", loop(gath3, tbl))

    # equality (single channel, wrap shift on axis 0)
    a = neighborhood_planes(tbl, dims, 1, offs, wrap_shift=(0, box[0]))
    b = gather_planes(tbl, dims, offs, box, [float(box_np[0]), 0.0, 0.0])
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"   max |rolls - gather| = {err:g}", flush=True)


def main():
    run_scale(33_334, "headline O(33k)")
    run_scale(333_334, "config4 O(333k)")


if __name__ == "__main__":
    main()
