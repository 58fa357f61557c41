#!/usr/bin/env python
"""Micro-probe: cost split of mask→cumsum→searchsorted→gather compaction.

At the headline SDF shape (133k slots → 5120 outputs). Per CLAUDE.md
timing discipline (fori_loop K=32, null-subtracted).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 32
N = 64 * 2079  # 133,056 slots
M = 5120


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
    rng = np.random.RandomState(0)
    pf = jnp.asarray(rng.uniform(-9, 9, (N, 3)).astype(np.float32))
    wf = jnp.asarray((rng.rand(N) < 0.5).astype(np.float32))
    sup = 5.0 + 0.5 * (10.0 / 64)

    timed("null", loop(lambda v: v[0, 0] * 0.0, pf))
    timed("mask only", loop(
        lambda v: jnp.sum(((wf > 0) & (jnp.max(jnp.abs(v), -1) < sup)).astype(jnp.float32)), pf))

    def cums(v):
        m = (wf > 0) & (jnp.max(jnp.abs(v), -1) < sup)
        return jnp.cumsum(m.astype(jnp.int32))[-1].astype(jnp.float32)

    timed("mask+cumsum", loop(cums, pf))

    def cums2(v):
        m = (wf > 0) & (jnp.max(jnp.abs(v), -1) < sup)
        npad = -(-N // 128) * 128
        m2 = jnp.pad(m.astype(jnp.int32), (0, npad - N)).reshape(-1, 128)
        rs = jnp.cumsum(m2, axis=1)  # lane-dim cumsum per row
        blk = jnp.cumsum(rs[:, -1])  # tiny scan over rows
        cum = rs + (blk - rs[:, -1])[:, None]
        return cum.reshape(-1)[-1].astype(jnp.float32)

    timed("mask+2-level cumsum", loop(cums2, pf))

    def full(v):
        m = (wf > 0) & (jnp.max(jnp.abs(v), -1) < sup)
        cum = jnp.cumsum(m.astype(jnp.int32))
        j = jnp.arange(M, dtype=jnp.int32)
        src = jnp.searchsorted(cum, j + 1, side="left").astype(jnp.int32)
        keep = j < cum[-1]
        src = jnp.minimum(src, N - 1)
        return jnp.sum(jnp.where(keep, wf[src], 0.0)) + jnp.sum(v[src])

    timed("mask+cumsum+search+gather", loop(full, pf))

    def full_sort(v):
        m = (wf > 0) & (jnp.max(jnp.abs(v), -1) < sup)
        cum = jnp.cumsum(m.astype(jnp.int32))
        j = jnp.arange(M, dtype=jnp.int32)
        src = jnp.searchsorted(
            cum, j + 1, side="left", method="sort"
        ).astype(jnp.int32)
        keep = j < cum[-1]
        src = jnp.minimum(src, N - 1)
        return jnp.sum(jnp.where(keep, wf[src], 0.0)) + jnp.sum(v[src])

    timed("  (searchsorted method=sort)", loop(full_sort, pf))

    # dest-index formulation: src positions via where(m, cum-1, N)... needs
    # scatter — instead probe compare_all (one (M, N/…) bound? too big).

    def hier(v):
        m = (wf > 0) & (jnp.max(jnp.abs(v), -1) < sup)
        npad = -(-N // 128) * 128
        m2 = jnp.pad(m.astype(jnp.int32), (0, npad - N)).reshape(-1, 128)
        rs = jnp.cumsum(m2, axis=1)
        row_tot = rs[:, -1]
        blk = jnp.cumsum(row_tot)  # (N/128,) inclusive block cumsum
        j = jnp.arange(M, dtype=jnp.int32)
        b = jnp.searchsorted(blk, j + 1, side="left").astype(jnp.int32)
        b = jnp.minimum(b, blk.shape[0] - 1)
        prev = jnp.where(b > 0, blk[jnp.maximum(b - 1, 0)], 0)
        r = j + 1 - prev  # rank within row, 1-based (≤128)
        rows = rs[b]  # (M, 128) gathered rows
        lane = jnp.sum((rows < r[:, None]).astype(jnp.int32), axis=1)
        src = b * 128 + jnp.minimum(lane, 127)
        keep = j < blk[-1]
        src = jnp.minimum(src, N - 1)
        return jnp.sum(jnp.where(keep, wf[src], 0.0)) + jnp.sum(v[src])

    timed("hier row-cumsum+compare", loop(hier, pf))

    def hier2(v):
        m = (wf > 0) & (jnp.max(jnp.abs(v), -1) < sup)
        npad = -(-N // 128) * 128
        m2 = jnp.pad(m.astype(jnp.int32), (0, npad - N)).reshape(-1, 128)
        rs = jnp.cumsum(m2, axis=1)
        blk = jnp.cumsum(rs[:, -1])  # (nb,) inclusive block cumsum
        j1 = jnp.arange(1, M + 1, dtype=jnp.int32)
        # block of the j-th point: count of blocks fully before it
        b = jnp.sum((blk[None, :] < j1[:, None]).astype(jnp.int32), axis=1)
        b = jnp.minimum(b, blk.shape[0] - 1)
        rows = rs[b]  # (M, 128)
        prev = blk[b] - rows[:, -1]  # exclusive prefix before block b
        r = j1 - prev  # rank within block, 1-based
        lane = jnp.sum((rows < r[:, None]).astype(jnp.int32), axis=1)
        src = b * 128 + jnp.minimum(lane, 127)
        keep = j1 <= blk[-1]
        src = jnp.minimum(src, N - 1)
        return jnp.sum(jnp.where(keep, wf[src], 0.0)) + jnp.sum(v[src])

    timed("hier2 compare-count both", loop(hier2, pf))


if __name__ == "__main__":
    main()
