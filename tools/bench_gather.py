#!/usr/bin/env python
"""Microbench: gather throughput on the TPU for RDF-prep-shaped access.

Decides whether pooled (compacted) candidate tables — a (ncells*P)-row
gather — pay for themselves vs the roll-built per-offset planes.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 16
N = 33_334


def timed(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    float(jnp.sum(r))
    t0 = time.time()
    r = f(*args)
    s = float(jnp.sum(r))
    dt = (time.time() - t0) / K
    print(f"{name:34s} {dt*1000:8.3f} ms/iter (sum {s:.0f})", flush=True)


def loop(body, x):
    def step(i, carry):
        xi = x + carry * 1e-30
        return jnp.sum(body(xi)) + carry * 0.0

    return lambda: jax.lax.fori_loop(0, K, step, jnp.float32(0.0))


def main():
    rng = np.random.RandomState(0)
    p4 = jnp.asarray(rng.randn(N, 4).astype(np.float32))
    idx62k = jnp.asarray(rng.randint(0, N, (1000, 62)).astype(np.int32))
    idx640k = jnp.asarray(rng.randint(0, N, (1000, 640)).astype(np.int32))
    idx640k_sorted = jnp.asarray(
        np.sort(rng.randint(0, N, (1000, 640)).astype(np.int32), axis=1)
    )

    timed("null", lambda xx: loop(lambda v: v[0, 0] * 0.0, xx)(), p4)
    timed(
        "gather 62k rows x4",
        lambda xx: loop(lambda v: jnp.sum(v[idx62k] * 1e-6, (1, 2)), xx)(),
        p4,
    )
    timed(
        "gather 640k rows x4",
        lambda xx: loop(lambda v: jnp.sum(v[idx640k] * 1e-6, (1, 2)), xx)(),
        p4,
    )
    timed(
        "gather 640k rows x4 (sorted idx)",
        lambda xx: loop(
            lambda v: jnp.sum(v[idx640k_sorted] * 1e-6, (1, 2)), xx
        )(),
        p4,
    )
    # 1-column variant: maybe row width matters
    p1 = p4[:, 0]
    timed(
        "gather 640k x1",
        lambda xx: loop(lambda v: jnp.sum(v[idx640k] * 1e-6, (1,)), xx)(),
        p1,
    )
    # take_along_axis style on a (1000, 896) -> compaction-shaped reindex
    tbl = jnp.asarray(rng.randn(1000, 896).astype(np.float32))
    lane_idx = jnp.asarray(rng.randint(0, 896, (1000, 640)).astype(np.int32))
    timed(
        "take_along_axis (1000,896)->640",
        lambda xx: loop(
            lambda v: jnp.sum(
                jnp.take_along_axis(v, lane_idx, axis=1) * 1e-6, (1,)
            ),
            xx,
        )(),
        tbl,
    )


if __name__ == "__main__":
    main()
