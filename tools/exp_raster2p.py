#!/usr/bin/env python
"""Raster inner-loop A/B: the shipped 7-select chain vs a two-phase
(min-track + id-matched masked-FMA resolve) slot loop.

ROADMAP names "raster kernel ~2x more" with per-slot op count near
floor (~21-25, select-dominated). The two-phase idea: selects cost
~3.7x an FMA on this VPU (685 vs 2507 Gop/s, tools/exp_roofline.py),
and only the min-reduction needs selects — attribute resolution can be
one id-equality compare + masked FMAs per slot AFTER the winner is
known, with no per-slot t recompute (match on the tracked winner id).

Modeled: A = 12 arith + 13 cmp/sel ~ 23.8 units; B = p1 (12 arith +
4 cmp/sel) + p2 (2 cmp/cast + 6 FMA) ~ 15.9 -> 1.5x. This microbench
measures both styles on the real kernel's data layout ((1, 128)
sublane-broadcast slot rows against (8, 128) pixel blocks, VMEM-
resident tables, python-unrolled slot loop) at realistic K.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K_SLOTS = 64           # slots per program (amortize table DMA: 164 KB/program)
GRID = 256             # programs (tile rows x strips equivalent)
PIX = (64, 128)        # pixel block per program (matches the real kernel: tile-pixel sublanes x 128 tile lanes)
REPS = 16              # fori reps inside the kernel (compute >> table DMA)


def _rays():
    ys = jax.lax.broadcasted_iota(jnp.int32, PIX, 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, PIX, 1).astype(jnp.float32)
    dx = (xs - 64.0) * 0.002
    dy = (ys - 32.0) * 0.002
    dd = dx * dx + dy * dy + 1.0
    return dx, dy, dd, 1.0 / dd


def _slot_t(tbl_ref, j, dx, dy, dd, inv_dd):
    ks = slice(j, j + 1)
    cx = tbl_ref[0, ks, :]
    cy = tbl_ref[1, ks, :]
    cz = tbl_ref[2, ks, :]
    rk = tbl_ref[3, ks, :]
    cc = cx * cx + cy * cy + cz * cz - rk * rk
    dc = dx * cx + dy * cy - cz
    disc = dc * dc - dd * cc
    t = (dc - jnp.sqrt(jnp.maximum(disc, 0.0))) * inv_dd
    ok = (disc > 0) & (t > 1e-6)
    return t, ok, (cx, cy, cz, rk)


def kernel_a(tbl_ref, out_ref):
    """Shipped style: every slot carries t + 6 attribute selects."""
    dx, dy, dd, inv_dd = _rays()

    def body(r, carry):
        bt, bcx, bcy, bcz, brk, bpi = carry
        for j in range(K_SLOTS):
            t, ok, (cx, cy, cz, rk) = _slot_t(tbl_ref, j, dx, dy, dd, inv_dd)
            m = ok & (t < bt)
            bt = jnp.where(m, t, bt)
            bcx = jnp.where(m, cx, bcx)
            bcy = jnp.where(m, cy, bcy)
            bcz = jnp.where(m, cz, bcz)
            brk = jnp.where(m, rk, brk)
            bpi = jnp.where(m, tbl_ref[4, j:j + 1, :], bpi)
        return (bt + r * 1e-30, bcx, bcy, bcz, brk, bpi)

    big = jnp.full(PIX, 1e9, jnp.float32)
    zero = jnp.zeros(PIX, jnp.float32)
    bt, bcx, bcy, bcz, brk, bpi = jax.lax.fori_loop(
        0, REPS, body, (big, zero, zero, zero, zero, zero)
    )
    out_ref[0, :, :] = bt
    out_ref[1, :, :] = bcx + bcy + bcz
    out_ref[2, :, :] = brk
    out_ref[3, :, :] = bpi


def kernel_b(tbl_ref, out_ref):
    """Two-phase: min-track (t, id), then id-matched masked-FMA resolve."""
    dx, dy, dd, inv_dd = _rays()

    def body(r, carry):
        bt, bid = carry[0], carry[1]
        # phase 1: winner (t, id) only
        for j in range(K_SLOTS):
            t, ok, _ = _slot_t(tbl_ref, j, dx, dy, dd, inv_dd)
            m = ok & (t < bt)
            bt = jnp.where(m, t, bt)
            bid = jnp.where(m, jnp.float32(j), bid)
        # phase 2: attribute resolve by id match (compare + FMA only)
        acx = jnp.zeros(PIX, jnp.float32)
        acy = jnp.zeros(PIX, jnp.float32)
        acz = jnp.zeros(PIX, jnp.float32)
        ark = jnp.zeros(PIX, jnp.float32)
        api = jnp.zeros(PIX, jnp.float32)
        for j in range(K_SLOTS):
            w = (bid == jnp.float32(j)).astype(jnp.float32)
            acx = acx + w * tbl_ref[0, j:j + 1, :]
            acy = acy + w * tbl_ref[1, j:j + 1, :]
            acz = acz + w * tbl_ref[2, j:j + 1, :]
            ark = ark + w * tbl_ref[3, j:j + 1, :]
            api = api + w * tbl_ref[4, j:j + 1, :]
        return (bt + r * 1e-30, bid, acx, acy, acz, ark, api)

    big = jnp.full(PIX, 1e9, jnp.float32)
    neg = jnp.full(PIX, -1.0, jnp.float32)
    zero = jnp.zeros(PIX, jnp.float32)
    bt, bid, acx, acy, acz, ark, api = jax.lax.fori_loop(
        0, REPS, body, (big, neg, zero, zero, zero, zero, zero)
    )
    out_ref[0, :, :] = bt
    out_ref[1, :, :] = acx + acy + acz
    out_ref[2, :, :] = ark
    out_ref[3, :, :] = api


def run(kernel, tbl):
    f = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((5, K_SLOTS, 128), lambda i: (0, i, 0))],
        out_specs=pl.BlockSpec((4, 64, 128), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((4, GRID * 64, 128), jnp.float32),
    )
    return jax.jit(f)(tbl)


def main():
    rng = np.random.default_rng(0)
    # slot rows: centers in view space in front of the rays, mixed
    # hit/miss density; ~25% poisoned (cz=+1e6 -> t<0 -> rejected)
    tbl = np.empty((5, GRID * K_SLOTS, 128), np.float32)
    tbl[0] = rng.uniform(-0.3, 0.3, tbl.shape[1:])
    tbl[1] = rng.uniform(-0.3, 0.3, tbl.shape[1:])
    tbl[2] = -rng.uniform(2.0, 30.0, tbl.shape[1:])
    tbl[3] = rng.uniform(0.05, 0.4, tbl.shape[1:])
    tbl[4] = rng.integers(0, 1e6, tbl.shape[1:]).astype(np.float32)
    poison = rng.random(tbl.shape[1:]) < 0.25
    tbl[2][poison] = 1e6
    tbl_d = jnp.asarray(tbl)

    outs = {}
    for name, kern in [("A 7-select", kernel_a), ("B two-phase", kernel_b)]:
        r = run(kern, tbl_d)
        float(jnp.sum(r))  # compile + drain
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            r = run(kern, tbl_d)
            s = float(jnp.sum(r))
            best = min(best, time.time() - t0)
        slots = GRID * K_SLOTS * 128 * 64 * REPS
        print(
            f"{name}: {best*1000:8.2f} ms  "
            f"{slots/best/1e9:7.1f} Gslot/s  (chk {s:.3e})",
            flush=True,
        )
        outs[name] = np.asarray(r)

    a, b = outs["A 7-select"], outs["B two-phase"]
    # t channel must agree exactly; attribute channels agree wherever a
    # winner exists (bid >= 0) -- ties broken identically (first wins in
    # A via strict <, first wins in B the same way)
    print("t equal:", np.array_equal(a[0], b[0]),
          " attrs equal:", np.allclose(a[1:], b[1:], atol=1e-5), flush=True)


if __name__ == "__main__":
    main()
