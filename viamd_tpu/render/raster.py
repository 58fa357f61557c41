"""Headless molecule renderer: tiled sphere / capsule impostor ray-tracing.

Capability rebuild of mdlib's md_gl rasterizer (reference: shader-based
impostor rendering of SPACE_FILL / LICORICE / BALL_AND_STICK reps with
per-rep colors, draw-op list at /root/reference/src/main.cpp:6878-6925).

TPU formulation — a tiled forward ray-tracer with static shapes:
1. sphere centers project to screen space; each sphere registers into the
   16×16-px screen tiles its footprint covers (3×3 tile cap) via the same
   sort→capacity-table construction as the MD cell list (ops.neighbors
   pattern — no scatter);
2. every pixel ray-intersects only its tile's spheres (fixed capacity K),
   keeping nearest hit: depth, normal, color, atom id → a full GBuffer
   (the gbuffer.h analog: color/normal/depth/picking);
3. bonds render as capsules (licorice/ball-and-stick) through the same
   tiles, parameterized by their two endpoint atoms.

Output framebuffers composite with the volume renderer via depth.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

TILE = 16  # pixels per screen tile
# max auto-raised global huge-tier capacity (each power-of-two tier is a
# separate cached compile; past this the tier drops the farthest with a
# warning — callers can still set RasterSettings.huge_cap higher manually)
_HUGE_CAP_CEIL = 1024
FOOT = 3  # max 3×3 tile footprint per primitive


@dataclass(frozen=True)
class RasterSettings:
    width: int = 512
    height: int = 512
    rep: str = "spacefill"  # spacefill | licorice | ballstick
    radius_scale: float = 1.0
    licorice_radius: float = 0.25
    capacity: int = 64  # primitives per tile (XLA engine union table)
    # per home-tile slots (Pallas engine); 0 → auto from primitive count
    # vs tile count in render_molecules (nearest-first slot ordering makes
    # overflow drop only the most-occluded primitives of a crowded tile)
    home_capacity: int = 0
    # global huge-tier list capacities (spheres with vertical radius
    # ≥ 40 px / oversized bond capsules). render_molecules auto-raises
    # these to the next power-of-two tier when the host-side count
    # exceeds them (each tier is a separate cached compile), up to
    # _HUGE_CAP_CEIL — so the old hard 64/32 caps only bind past the
    # ceiling
    huge_cap: int = 64
    huge_capsule_cap: int = 32
    ambient: float = 0.25
    specular: float = 0.35
    shininess: float = 48.0
    light_dir: tuple = (0.4, 0.7, 0.6)
    background: tuple = (0.0, 0.0, 0.0, 0.0)
    # auto → Pallas kernel on TPU, XLA everywhere else; "pallas" on a CPU
    # backend runs the kernel in interpret mode (tests)
    engine: str = "auto"  # auto | xla | pallas


def _build_tile_table(
    sx, sy, rpx, valid, tiles_x: int, tiles_y: int, capacity: int
):
    """Bin primitives (screen pos + pixel radius) into tiles: (T, K) ids."""
    n = sx.shape[0]
    tx = jnp.clip((sx // TILE).astype(jnp.int32), 0, tiles_x - 1)
    ty = jnp.clip((sy // TILE).astype(jnp.int32), 0, tiles_y - 1)
    ids_list = []
    ok_list = []
    for oy in (-1, 0, 1):
        for ox in (-1, 0, 1):
            cx = tx + ox
            cy = ty + oy
            inb = (cx >= 0) & (cx < tiles_x) & (cy >= 0) & (cy < tiles_y)
            # does the sphere's footprint reach this neighbor tile?
            reach = rpx + TILE  # conservative: within one tile + radius
            near = (
                (jnp.abs(ox * TILE) <= reach) & (jnp.abs(oy * TILE) <= reach)
            )
            ids_list.append(cy * tiles_x + cx)
            ok_list.append(valid & inb & near)
    tile_of = jnp.stack(ids_list, 1).reshape(-1)  # (n*9,)
    ok = jnp.stack(ok_list, 1).reshape(-1)
    prim = jnp.tile(
        jnp.arange(n, dtype=jnp.int32)[:, None], (1, FOOT * FOOT)
    ).reshape(-1)
    ntiles = tiles_x * tiles_y
    tile_key = jnp.where(ok, tile_of, ntiles)  # invalid → sentinel bin
    order = jnp.argsort(tile_key).astype(jnp.int32)
    key_s = tile_key[order]
    prim_s = prim[order]
    bins = jax.lax.broadcasted_iota(jnp.int32, (ntiles + 1, 1), 0)[:, 0]
    starts = jnp.searchsorted(key_s, bins, side="left").astype(jnp.int32)
    slot = jax.lax.broadcasted_iota(jnp.int32, (ntiles, capacity), 1)
    pos = starts[:-1][:, None] + slot
    count = (starts[1:] - starts[:-1])[:, None]
    tvalid = slot < count
    table = prim_s[jnp.minimum(pos, n * FOOT * FOOT - 1)]
    counts = jnp.minimum(count[:, 0], capacity)
    return table, tvalid, counts


def _build_home_table(
    sx, sy, valid, tiles_x: int, tiles_y: int, cap: int,
    stride_x: int | None = None,
    depth=None,
):
    """Bin primitives into their HOME screen tile only: (T, cap) ids +
    validity + per-tile counts. One sort of n keys — the 3×3 footprint
    union is expanded afterwards by rolls / halo reads (the XLA union
    table sorts n·9 keys; TPU bitonic sort cost is the prep bottleneck
    at ~n log² n element-passes). `stride_x` pads the grid to that many
    columns per row (pad tiles stay empty). `depth` (view distance per
    primitive) orders each tile's slots NEAREST-FIRST, so capacity
    overflow drops the farthest primitives of a crowded tile — the ones
    almost certainly occluded by the ≥cap nearer spheres in the same
    16-px footprint."""
    n = sx.shape[0]
    sxx = stride_x or tiles_x
    T = sxx * tiles_y
    tx = jnp.clip((sx // TILE).astype(jnp.int32), 0, tiles_x - 1)
    ty = jnp.clip((sy // TILE).astype(jnp.int32), 0, tiles_y - 1)
    tid = jnp.where(valid, ty * sxx + tx, T)
    idx_bits = max(int(np.ceil(np.log2(max(n, 2)))), 1)
    if depth is not None:
        # 8-bit depth bucket in the key's low bits; the tiebreak is a
        # payload (argsort) since id bits no longer fit
        d = jnp.where(valid, depth, 0.0)
        d_lo = jnp.min(d)
        scale = 255.0 / jnp.maximum(jnp.max(d) - d_lo, 1e-6)
        dq = ((d - d_lo) * scale).astype(jnp.int32)
        order = jnp.argsort((tid << 8) | dq).astype(jnp.int32)
        tid_sorted = tid[order]
    elif idx_bits + int(np.ceil(np.log2(T + 1))) + 1 <= 31:
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        packed = jnp.sort((tid << idx_bits) | iota)
        order = (packed & ((1 << idx_bits) - 1)).astype(jnp.int32)
        tid_sorted = (packed >> idx_bits).astype(jnp.int32)
    else:
        order = jnp.argsort(tid).astype(jnp.int32)
        tid_sorted = tid[order]
    bins = jax.lax.broadcasted_iota(jnp.int32, (T + 1, 1), 0)[:, 0]
    starts = jnp.searchsorted(tid_sorted, bins, side="left").astype(jnp.int32)
    slot = jax.lax.broadcasted_iota(jnp.int32, (T, cap), 1)
    pos = starts[:-1][:, None] + slot
    count = (starts[1:] - starts[:-1])[:, None]
    tvalid = slot < count
    table = order[jnp.minimum(pos, n - 1)]
    return table, tvalid, jnp.minimum(count[:, 0], cap)


def _shade(base_rgb, normal, light, view_dir, s: RasterSettings):
    ndl = jnp.maximum(jnp.sum(normal * light, axis=-1), 0.0)
    half = light + view_dir
    half = half / jnp.maximum(
        jnp.linalg.norm(half, axis=-1, keepdims=True), 1e-12
    )
    ndh = jnp.maximum(jnp.sum(normal * half, axis=-1), 0.0)
    lum = s.ambient + (1 - s.ambient) * ndl
    spec = s.specular * ndh**s.shininess
    return base_rgb * lum[..., None] + spec[..., None]


@functools.partial(jax.jit, static_argnames=("settings",))
def _raster_impl(
    centers,  # (n,3) view-space sphere centers
    radii,  # (n,)
    colors,  # (n,4)
    cyl12,  # (m,12) view-space cylinders: p0(3) axis(3) len r rgb(3) pick
    proj,  # (4,4)
    settings: RasterSettings,
):
    s = settings
    W, H = s.width, s.height
    tiles_x, tiles_y = -(-W // TILE), -(-H // TILE)
    n = centers.shape[0]
    m_cyl = cyl12.shape[0]

    # project to screen
    x, y, z = centers[:, 0], centers[:, 1], centers[:, 2]
    cw = -z  # view looks down -Z; w = -z for standard perspective
    px_x = proj[0, 0] * x + proj[0, 2] * z
    px_y = proj[1, 1] * y + proj[1, 2] * z
    valid = cw > 1e-6
    sx = (px_x / jnp.maximum(cw, 1e-6) * 0.5 + 0.5) * W
    sy = (px_y / jnp.maximum(cw, 1e-6) * 0.5 + 0.5) * H
    # screen-space pixel radii are ANISOTROPIC whenever proj00·W and
    # proj11·H differ (e.g. off-aspect projection matrices): use per-axis
    # extents for binning/footprints
    rpx_x = radii * proj[0, 0] / jnp.maximum(cw, 1e-6) * 0.5 * W
    rpx = radii * proj[1, 1] / jnp.maximum(cw, 1e-6) * 0.5 * H

    engine = s.engine
    if engine == "auto":
        engine = "xla" if jax.default_backend() == "cpu" else "pallas"
    if engine == "pallas" and n >= (1 << 24):
        engine = "xla"  # ids must stay exact as f32 values
    if m_cyl and engine == "pallas" and tiles_x > 127:
        engine = "xla"  # capsules live in the halo-row kernel only

    if engine == "xla":
        table, tvalid, tcounts = _build_tile_table(
            sx, sy, rpx, valid, tiles_x, tiles_y, s.capacity
        )  # (T, K)

    light = jnp.asarray(s.light_dir, jnp.float32)
    light = light / jnp.linalg.norm(light)

    # pixel rays in view space (from origin through pixel); proj[0,2]/
    # proj[1,2] carry the TAA sub-pixel jitter (camera.perspective)
    ppx = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2 - 1
    ppy = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2 - 1
    gx, gy = jnp.meshgrid(ppx, ppy)
    dirx = (gx + proj[0, 2]) / proj[0, 0]
    diry = (gy + proj[1, 2]) / proj[1, 1]
    # direction (dirx, diry, -1), unnormalized; t = distance along -z

    # ALL tiles processed together: one gather hoists every per-tile
    # primitive attribute out of the loop, then a single K-step fori_loop
    # runs dense (T, TILE²) vector ops. (The earlier lax.map over tiles ran
    # 8k+ sequential tiny-block iterations with gathers inside the loop
    # body — XLA pessimizes both — and measured ~9 s/frame at 1080p/100k
    # atoms; this form is ~milliseconds.)
    T = tiles_x * tiles_y
    P = TILE * TILE

    def tile_major(img2d):  # (H', W') → (T, P)
        a = img2d.reshape(tiles_y, TILE, tiles_x, TILE)
        return a.transpose(0, 2, 1, 3).reshape(T, P)

    Wp, Hp = tiles_x * TILE, tiles_y * TILE
    dirx_p = jnp.pad(dirx, ((0, Hp - H), (0, Wp - W)))
    diry_p = jnp.pad(diry, ((0, Hp - H), (0, Wp - W)))
    dx = tile_major(dirx_p)  # (T, P)
    dy = tile_major(diry_p)

    if engine == "pallas":
        from viamd_tpu.render.pallas_raster import (
            BTL, OFFS, OFFS4, raster_rows_pl,
        )

        cap = s.home_capacity
        if cap == 0:
            # static per (n, W, H): ~2× the mean primitives-per-tile,
            # clamped (slot loops are unrolled in the kernel — compile
            # time bounds the ceiling; nearest-first ordering makes
            # overflow drop only occluded primitives)
            auto = int(np.ceil(2.0 * n / T / 8.0)) * 8
            cap = min(max(auto, 16), 96)
        lt = np.asarray(s.light_dir, np.float32)
        lt = tuple((lt / np.linalg.norm(lt)).tolist())
        # halo-row path: the 3×3/2×2 unions never materialize (halo row
        # refs + in-kernel lane rolls). The halo grid is ≤127 real tiles
        # wide; wider frames render as VERTICAL STRIPS — primitives
        # register into every strip their footprint reaches (validity
        # masks), ray directions use global pixel coords (x_off), and the
        # strip images concatenate. 1080p = one strip; 1440p/4K = 2.
        TXW = BTL - 2
        n_strips = -(-tiles_x // TXW)
        strip_tiles = -(-tiles_x // n_strips)

        def halo_strip(tx0: int, txn: int):
            TX = BTL
            Tp = TX * tiles_y
            BCAP = 16
            GCAP = s.huge_cap  # global huge-sphere list capacity
            GCCAP = s.huge_capsule_cap  # global huge-capsule capacity
            x0p = float(tx0 * TILE)
            x1p = float((tx0 + txn) * TILE)
            sxl = sx - x0p
            reach = valid & (sx + rpx_x >= x0p) & (sx - rpx_x <= x1p)
            # THREE sphere tiers, ONE sort: small spheres (radius < 8 px)
            # key by their footprint TOP-LEFT tile (kernel gathers only
            # the 2x2 OFFS4 reach); big spheres (8–32 px) key into a
            # per-ROW key space appended after the tile ids (the kernel
            # tests them row-wide over a ±2-row window, which covers
            # vertical radii to ~40 px); HUGE spheres (vertical radius
            # ≥ 40 px — exactly where the row window started clipping,
            # so routing them globally is strictly additive) key into
            # one global bin tested by every program — no footprint
            # cap. Slots order nearest-first via an 8-bit depth
            # bucket, so capacity overflow drops the most-occluded
            # primitives.
            small = jnp.maximum(rpx, rpx_x) < 8.0
            huge = rpx >= 40.0
            tlx = jnp.clip(
                ((sxl - rpx_x) // TILE).astype(jnp.int32), 0, txn - 1
            )
            tly = jnp.clip(
                ((sy - rpx) // TILE).astype(jnp.int32), 0, tiles_y - 1
            )
            row_of = jnp.clip(
                (sy // TILE).astype(jnp.int32), 0, tiles_y - 1
            )
            key = jnp.where(
                reach & small,
                tly * TX + tlx,
                jnp.where(
                    reach & ~huge,
                    Tp + row_of,
                    jnp.where(reach, Tp + tiles_y, Tp + tiles_y + 1),
                ),
            )
            dvals = jnp.where(valid, cw, 0.0)
            d_lo = jnp.min(dvals)
            dsc = 255.0 / jnp.maximum(jnp.max(dvals) - d_lo, 1e-6)
            dq = ((dvals - d_lo) * dsc).astype(jnp.int32)
            order = jnp.argsort((key << 8) | dq).astype(jnp.int32)
            key_sorted = key[order]
            bins = jax.lax.broadcasted_iota(
                jnp.int32, (Tp + tiles_y + 2, 1), 0
            )[:, 0]
            starts = jnp.searchsorted(
                key_sorted, bins, side="left"
            ).astype(jnp.int32)

            def slot_table(beg, nbins, kcap):
                slot = jax.lax.broadcasted_iota(jnp.int32, (nbins, kcap), 1)
                pos = starts[beg : beg + nbins][:, None] + slot
                count = (
                    starts[beg + 1 : beg + nbins + 1]
                    - starts[beg : beg + nbins]
                )[:, None]
                tv = slot < count
                tb = order[jnp.minimum(pos, n - 1)]
                return tb, tv, jnp.minimum(count[:, 0], kcap)

            table_h, tvalid_h, counts_h = slot_table(0, Tp, cap)
            btab, btv, bcnt_rows = slot_table(Tp, tiles_y, BCAP)
            gtab, gtv, gcnt_sph = slot_table(Tp + tiles_y, 1, GCAP)

            rgbp = (
                jnp.round(jnp.clip(colors[:, 0], 0, 1) * 255) * 65536.0
                + jnp.round(jnp.clip(colors[:, 1], 0, 1) * 255) * 256.0
                + jnp.round(jnp.clip(colors[:, 2], 0, 1) * 255)
            )
            prim6 = jnp.stack(
                [
                    centers[:, 0], centers[:, 1], centers[:, 2], radii,
                    rgbp, jnp.arange(n, dtype=jnp.float32),
                ],
                axis=1,
            )
            ah = prim6[table_h]  # (T', cap, 6) — ONE row gather
            ah = jnp.stack(
                [
                    ah[..., 0],
                    ah[..., 1],
                    # poison invalid slots: t comes out negative, no
                    # per-slot validity compare in the kernel
                    jnp.where(tvalid_h, ah[..., 2], 1e6),
                    jnp.where(tvalid_h, ah[..., 3], 1.0),
                    ah[..., 4],
                    jnp.where(tvalid_h, ah[..., 5], -1.0),
                ],
                axis=-1,
            )
            attr6 = ah.transpose(2, 1, 0)  # (6, cap, T')
            bah = prim6[btab]  # (ty, BCAP, 6)
            bpo = jnp.stack(
                [
                    bah[..., 0],
                    bah[..., 1],
                    jnp.where(btv, bah[..., 2], 1e6),
                    jnp.where(btv, bah[..., 3], 1.0),
                    bah[..., 4],
                    jnp.where(btv, bah[..., 5], -1.0),
                ],
                axis=-1,
            )
            # lane-replicate each row's list across its 128 tiles
            battr = jnp.broadcast_to(
                bpo.transpose(2, 1, 0)[:, :, :, None],
                (6, BCAP, tiles_y, TX),
            ).reshape(6, BCAP, Tp)
            gah = prim6[gtab[0]]  # (GCAP, 6)
            gpo = jnp.stack(
                [
                    gah[:, 0],
                    gah[:, 1],
                    jnp.where(gtv[0], gah[:, 2], 1e6),
                    jnp.where(gtv[0], gah[:, 3], 1.0),
                    gah[:, 4],
                    jnp.where(gtv[0], gah[:, 5], -1.0),
                ],
                axis=0,
            )  # (6, GCAP)
            gsph = jnp.broadcast_to(gpo[:, :, None], (6, GCAP, BTL))
            rws = jnp.arange(tiles_y)
            bocc5 = jnp.stack(
                [
                    jnp.where(
                        (rws + d >= 0) & (rws + d < tiles_y),
                        bcnt_rows[jnp.clip(rws + d, 0, tiles_y - 1)],
                        0,
                    )
                    for d in (-2, -1, 0, 1, 2)
                ],
                axis=-1,
            ).astype(jnp.int32)
            cnt = counts_h.reshape(tiles_y, TX)
            occ_cols = []
            for oy, ox in OFFS4:
                c = jnp.roll(cnt, (-oy, -ox), axis=(0, 1))
                c = jnp.where(
                    ((rws + oy >= 0) & (rws + oy < tiles_y))[:, None], c, 0
                )
                occ_cols.append(jnp.max(c[:, :txn], axis=1))
            occ4 = jnp.stack(occ_cols, -1).astype(jnp.int32)
            cattr10 = cocc9 = gcyl = None
            gcnt_cyl = jnp.int32(0)
            if m_cyl:
                # bond capsules: home-bin each cylinder at SAMP points
                # along its axis (endpoints + interior thirds; idx % m
                # recovers the cylinder). With the 3×3 reach that covers
                # screen lengths to ~96 px; longer/thicker bonds route to
                # the global huge tier below (no footprint cap).
                SAMP = 4
                ccap = min(max(int(np.ceil(8.0 * m_cyl / T / 8.0)) * 8, 8),
                           96)
                cp0 = cyl12[:, 0:3]
                cax = cyl12[:, 3:6]
                clen = cyl12[:, 6:7]
                pts = jnp.concatenate(
                    [cp0 + cax * (clen * f) for f in
                     (0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0)], 0
                )
                cwc = jnp.maximum(-pts[:, 2], 1e-6)
                csx = (proj[0, 0] * pts[:, 0] / cwc * 0.5 + 0.5) * W
                csy = (proj[1, 1] * pts[:, 1] / cwc * 0.5 + 0.5) * H
                cvalid = (
                    (-pts[:, 2] > 1e-6)
                    & (csx >= x0p - 32.0)
                    & (csx <= x1p + 32.0)
                )
                # huge capsules: screen length beyond the sampled 3×3
                # coverage (~96 px) or radius beyond the ±1-tile reach.
                # They STAY in the home bins too (duplicate tests are
                # harmless under the nearest-hit depth test), so global-
                # list overflow degrades to the old partial coverage
                # instead of dropping the bond entirely.
                slen = jnp.hypot(
                    csx[3 * m_cyl :] - csx[:m_cyl],
                    csy[3 * m_cyl :] - csy[:m_cyl],
                )
                zmin = jnp.minimum(cwc[:m_cyl], cwc[3 * m_cyl :])
                crad = (
                    cyl12[:, 7] * proj[1, 1] / zmin * 0.5 * H
                )
                # any SAMPLE in front/in reach qualifies — a bond whose
                # endpoints are both off-strip can still cross it
                front_any = (
                    cvalid.reshape(SAMP, m_cyl).any(axis=0)
                )
                hugec = front_any & ((slen > 80.0) | (crad > 14.0))
                ctab, ctv, ccnt = _build_home_table(
                    csx - x0p, csy, cvalid, txn, tiles_y, ccap,
                    stride_x=TX, depth=cwc,
                )
                crgbp = (
                    jnp.round(jnp.clip(cyl12[:, 8], 0, 1) * 255) * 65536.0
                    + jnp.round(jnp.clip(cyl12[:, 9], 0, 1) * 255) * 256.0
                    + jnp.round(jnp.clip(cyl12[:, 10], 0, 1) * 255)
                )
                prim10 = jnp.concatenate(
                    [cp0, cax, clen, cyl12[:, 7:8], crgbp[:, None],
                     cyl12[:, 11:12]],
                    axis=1,
                )
                # global huge-capsule list, nearest-first
                dqc = jnp.clip(
                    (zmin - d_lo) * dsc, -1e9, 1e9
                ).astype(jnp.int32)
                gc = min(GCCAP, m_cyl)
                order_c = jnp.argsort(
                    jnp.where(hugec, dqc, jnp.int32(1 << 30))
                )[:gc].astype(jnp.int32)
                gvc = hugec[order_c]
                g10 = prim10[order_c]  # (gc, 10)
                g10 = jnp.concatenate(
                    [
                        g10[:, :6],
                        jnp.where(gvc, g10[:, 6], -1.0)[:, None],
                        g10[:, 7:],
                    ],
                    axis=1,
                )
                if gc < GCCAP:
                    inv_row = jnp.zeros((GCCAP - gc, 10), jnp.float32)
                    inv_row = inv_row.at[:, 6].set(-1.0)
                    g10 = jnp.concatenate([g10, inv_row], axis=0)
                gcyl = jnp.broadcast_to(
                    g10.T[:, :, None], (10, GCCAP, BTL)
                )
                gcnt_cyl = jnp.minimum(
                    jnp.sum(hugec.astype(jnp.int32)), GCCAP
                )
                ahc = prim10[ctab % m_cyl]  # (T', ccap, 10)
                ahc = jnp.concatenate(
                    [
                        ahc[..., :6],
                        # poison: len = -1 ⇒ the axial test never passes
                        jnp.where(ctv, ahc[..., 6], -1.0)[..., None],
                        ahc[..., 7:],
                    ],
                    axis=-1,
                )
                cattr10 = ahc.transpose(2, 1, 0)
                ccnt_g = ccnt.reshape(tiles_y, TX)
                ccols = []
                for oy, ox in OFFS:
                    c = jnp.roll(ccnt_g, (-oy, -ox), axis=(0, 1))
                    c = jnp.where(
                        ((rws + oy >= 0) & (rws + oy < tiles_y))[:, None],
                        c, 0,
                    )
                    ccols.append(jnp.max(c[:, :txn], axis=1))
                cocc9 = jnp.stack(ccols, -1).astype(jnp.int32)
            gocc = jnp.stack(
                [gcnt_sph[0].astype(jnp.int32), gcnt_cyl.astype(jnp.int32)]
            ).reshape(1, 2)
            rgb_r, rgb_g, rgb_b, a_t, d_t, id_t = raster_rows_pl(
                attr6, occ4, proj[0, 0], proj[1, 1], proj[0, 2], proj[1, 2],
                battr, bocc5, cattr10, cocc9, gsph, gcyl, gocc,
                cap=cap, tiles_y=tiles_y, width=W, height=H,
                ambient=s.ambient, specular=s.specular,
                shininess=s.shininess, light=lt,
                background=tuple(s.background),
                x_off=tx0 * TILE,
                interpret=jax.default_backend() == "cpu",
            )
            rgb_t = jnp.stack([rgb_r, rgb_g, rgb_b], -1)
            d_t = jnp.where(id_t >= 0, d_t, jnp.inf)

            def assemble_p(tiles, ch):
                t = tiles.reshape(tiles_y, TX, TILE, TILE, *ch)
                t = jnp.moveaxis(t, 2, 1).reshape(
                    tiles_y * TILE, TX * TILE, *ch
                )
                return t[:H, : txn * TILE]

            img_s = jnp.concatenate(
                [assemble_p(rgb_t, (3,)), assemble_p(a_t, ())[..., None]],
                axis=-1,
            )
            return img_s, assemble_p(d_t, ()), assemble_p(id_t, ())

        if True:
            strips = []
            for si in range(n_strips):
                tx0 = si * strip_tiles
                strips.append(
                    halo_strip(tx0, min(strip_tiles, tiles_x - tx0))
                )
            if n_strips == 1:
                img, d_img, p_img = strips[0]
            else:
                img = jnp.concatenate([st[0] for st in strips], axis=1)
                d_img = jnp.concatenate([st[1] for st in strips], axis=1)
                p_img = jnp.concatenate([st[2] for st in strips], axis=1)
            return img[:, :W], d_img[:, :W], p_img[:, :W]


    dd = dx * dx + dy * dy + 1.0

    # packed (x, y, z, r, red, green, blue) per (tile, slot): ONE gather
    prim7 = jnp.concatenate(
        [centers, radii[:, None], colors[:, :3]], axis=1
    )[table]  # (T, K, 7)
    pid_t = table  # (T, K)
    pv_t = tvalid  # (T, K)

    best_t = jnp.full((T, P), 1e30)
    best_id = jnp.full((T, P), -1, jnp.int32)
    best_nx = jnp.zeros((T, P))
    best_ny = jnp.zeros((T, P))
    best_nz = jnp.zeros((T, P))
    best_r = jnp.zeros((T, P))
    best_g = jnp.zeros((T, P))
    best_b = jnp.zeros((T, P))

    def body(k, carry):
        bt, bid, bnx, bny, bnz, br, bg_, bb = carry
        p7 = jax.lax.dynamic_index_in_dim(
            prim7, k, axis=1, keepdims=False
        )  # (T, 7)
        cx, cy, cz, rk = (
            p7[:, 0:1], p7[:, 1:2], p7[:, 2:3], p7[:, 3:4]
        )  # (T, 1) broadcast over pixels
        pvk = jax.lax.dynamic_index_in_dim(pv_t, k, axis=1)  # (T, 1)
        pidk = jax.lax.dynamic_index_in_dim(pid_t, k, axis=1)
        # ray: o=0, d=(dx,dy,-1); |t·d − c|² = r²
        dc = dx * cx + dy * cy - cz
        cc = cx * cx + cy * cy + cz * cz - rk * rk
        disc = dc * dc - dd * cc
        ok = (disc > 0) & pvk
        t = (dc - jnp.sqrt(jnp.maximum(disc, 0.0))) / dd
        ok = ok & (t > 1e-6) & (t < bt)
        inv = 1.0 / jnp.maximum(rk, 1e-12)
        bt = jnp.where(ok, t, bt)
        bid = jnp.where(ok, pidk, bid)
        bnx = jnp.where(ok, (dx * t - cx) * inv, bnx)
        bny = jnp.where(ok, (dy * t - cy) * inv, bny)
        bnz = jnp.where(ok, (-t - cz) * inv, bnz)
        br = jnp.where(ok, p7[:, 4:5], br)
        bg_ = jnp.where(ok, p7[:, 5:6], bg_)
        bb = jnp.where(ok, p7[:, 6:7], bb)
        return bt, bid, bnx, bny, bnz, br, bg_, bb

    best_t, best_id, best_nx, best_ny, best_nz, best_r, best_g, best_b = (
        jax.lax.fori_loop(
            0, s.capacity, body,
            (best_t, best_id, best_nx, best_ny, best_nz,
             best_r, best_g, best_b),
        )
    )

    if m_cyl:
        # bond capsules: open finite cylinders (the sphere impostors at
        # the endpoints are the caps — md_gl LICORICE/BALL_AND_STICK).
        # Each cylinder registers into the tile table at BOTH endpoint
        # projections, so screen-long bonds still land in every tile
        # their halves touch.
        p0 = cyl12[:, 0:3]
        p1 = p0 + cyl12[:, 3:6] * cyl12[:, 6:7]
        sxy = []
        for pe in (p0, p1):
            cwc = jnp.maximum(-pe[:, 2], 1e-6)
            sxy.append(
                (
                    (proj[0, 0] * pe[:, 0] / cwc * 0.5 + 0.5) * W,
                    (proj[1, 1] * pe[:, 1] / cwc * 0.5 + 0.5) * H,
                    -pe[:, 2] > 1e-6,
                )
            )
        csx = jnp.concatenate([a[0] for a in sxy])
        csy = jnp.concatenate([a[1] for a in sxy])
        cvalid = jnp.concatenate([a[2] for a in sxy])
        crpx = jnp.concatenate(
            [cyl12[:, 7] * proj[1, 1] / jnp.maximum(-pe[:, 2], 1e-6)
             * 0.5 * H for pe in (p0, p1)]
        )
        ctable, ctvalid, _ = _build_tile_table(
            csx, csy, crpx, cvalid, tiles_x, tiles_y, s.capacity
        )
        cyl_t = cyl12[ctable % m_cyl]  # (T, K, 12)
        cv_t = ctvalid

        def cbody(k, carry):
            bt, bid, bnx, bny, bnz, br, bg_, bb = carry
            c12 = jax.lax.dynamic_index_in_dim(
                cyl_t, k, axis=1, keepdims=False
            )  # (T, 12)
            px, py, pz = c12[:, 0:1], c12[:, 1:2], c12[:, 2:3]
            ax, ay, az = c12[:, 3:4], c12[:, 4:5], c12[:, 5:6]
            Lk, rk = c12[:, 6:7], c12[:, 7:8]
            cvk = jax.lax.dynamic_index_in_dim(cv_t, k, axis=1)
            # ray o=0, d=(dx,dy,-1) vs infinite cylinder about (p, a),
            # then clamp the axial parameter to [0, L]
            da = dx * ax + dy * ay - az
            dp = dx * px + dy * py - pz
            pa = px * ax + py * ay + pz * az
            pp = px * px + py * py + pz * pz
            A = jnp.maximum(dd - da * da, 1e-9)
            B = dp - da * pa
            C = pp - pa * pa - rk * rk
            disc = B * B - A * C
            t = (B - jnp.sqrt(jnp.maximum(disc, 0.0))) / A
            sax = t * da - pa
            ok = (
                cvk & (disc > 0) & (t > 1e-6) & (t < bt)
                & (sax >= 0) & (sax <= Lk)
            )
            inv = 1.0 / jnp.maximum(rk, 1e-12)
            bt = jnp.where(ok, t, bt)
            bid = jnp.where(ok, c12[:, 11:12].astype(jnp.int32), bid)
            bnx = jnp.where(ok, (dx * t - px - sax * ax) * inv, bnx)
            bny = jnp.where(ok, (dy * t - py - sax * ay) * inv, bny)
            bnz = jnp.where(ok, (-t - pz - sax * az) * inv, bnz)
            br = jnp.where(ok, c12[:, 8:9], br)
            bg_ = jnp.where(ok, c12[:, 9:10], bg_)
            bb = jnp.where(ok, c12[:, 10:11], bb)
            return bt, bid, bnx, bny, bnz, br, bg_, bb

        (best_t, best_id, best_nx, best_ny, best_nz, best_r, best_g,
         best_b) = jax.lax.fori_loop(
            0, s.capacity, cbody,
            (best_t, best_id, best_nx, best_ny, best_nz,
             best_r, best_g, best_b),
        )

    hit = best_id >= 0
    best_n = jnp.stack([best_nx, best_ny, best_nz], -1)
    best_rgb = jnp.stack([best_r, best_g, best_b], -1)
    vd = jnp.stack([-dx, -dy, jnp.ones_like(dx)], -1)
    vd = vd / jnp.maximum(jnp.linalg.norm(vd, axis=-1, keepdims=True), 1e-12)
    shaded = _shade(best_rgb, best_n, light, vd, s)
    bg = jnp.asarray(s.background, jnp.float32)
    rgb_t = jnp.where(hit[..., None], shaded, bg[:3] * bg[3])
    a_t = jnp.where(hit, 1.0, 0.0)
    d_t = jnp.where(hit, best_t, jnp.inf)
    id_t = best_id

    # reassemble tile-major buffers → image
    def assemble(tiles, ch):
        t = tiles.reshape(tiles_y, tiles_x, TILE, TILE, *ch)
        t = jnp.moveaxis(t, 2, 1).reshape(tiles_y * TILE, tiles_x * TILE, *ch)
        return t[:H, :W]

    img = jnp.concatenate(
        [assemble(rgb_t, (3,)), assemble(a_t, ())[..., None]], axis=-1
    )
    depth = assemble(d_t, ())
    picking = assemble(id_t, ())
    return img, depth, picking


def render_molecules(
    positions: np.ndarray,  # (n,3) world
    radii: np.ndarray,
    colors: np.ndarray,  # (n,4)
    view: np.ndarray,
    proj: np.ndarray,
    settings: RasterSettings,
    bonds: np.ndarray | None = None,
):
    """Render atoms (+bond capsules for licorice reps) →
    ((H,W,4) RGBA, (H,W) view-space depth, (H,W) int32 picking ids).

    Picking ids are the per-pixel nearest atom index (-1 = none) — the
    reference's GBuffer picking attachment (viamd.h:1687-1760) as an array.
    """
    s = settings
    pos = np.asarray(positions, np.float32)
    vm = np.asarray(view, np.float32)
    pv = pos @ vm[:3, :3].T + vm[:3, 3]
    rad = np.asarray(radii, np.float32) * s.radius_scale
    cyl12 = np.zeros((0, 12), np.float32)
    if s.rep in ("licorice", "ballstick"):
        keep = rad > 0  # radius-0 = culled (filtered-out) atoms
        atom_r = (
            np.where(keep, s.licorice_radius, 0.0).astype(np.float32)
            if s.rep == "licorice"
            else rad * 0.35
        )
        rad = atom_r
        cols = np.asarray(colors, np.float32)
        pick_src = np.arange(pos.shape[0], dtype=np.int32)
        if bonds is not None and len(bonds):
            bonds = np.asarray(bonds)
            bonds = bonds[keep[bonds[:, 0]] & keep[bonds[:, 1]]]
        if bonds is not None and len(bonds):
            # bonds as TRUE capsule impostors: two half-cylinders per
            # bond, each colored + picked by its atom (the md_gl
            # LICORICE split-color convention); the endpoint atom
            # spheres are the caps
            b = np.asarray(bonds)
            pa, pb = pv[b[:, 0]], pv[b[:, 1]]
            mid = (pa + pb) * 0.5
            halves = []
            for p_from, owner in ((pa, b[:, 0]), (pb, b[:, 1])):
                axis = mid - p_from
                length = np.linalg.norm(axis, axis=1, keepdims=True)
                axis = axis / np.maximum(length, 1e-12)
                halves.append(
                    np.concatenate(
                        [
                            p_from, axis, length,
                            np.full((len(b), 1), s.licorice_radius,
                                    np.float32),
                            cols[owner][:, :3],
                            owner[:, None].astype(np.float32),
                        ],
                        axis=1,
                    )
                )
            cyl12 = np.concatenate(halves).astype(np.float32)
    else:
        cols = np.asarray(colors, np.float32)
        pick_src = np.arange(pos.shape[0], dtype=np.int32)

    # oversized primitives (spheres with vertical radius ≥ 40 px; bond
    # halves screen-longer than ~80 px or thicker than ~14 px) route to
    # the GLOBAL huge tier (no footprint cap). The host counts them here
    # and auto-raises the tier capacity to the next power-of-two (each
    # tier is a separate cached compile), so the old hard 64/32 caps only
    # bind past _HUGE_CAP_CEIL — and then with a rate-limited warning.
    zs = -np.asarray(pv)[:, 2]
    front = zs > 1e-2  # atoms behind the eye never rasterize
    if rad.size and front.any():
        p11 = float(np.asarray(proj)[1, 1])
        rpx_v = rad[front] / zs[front] * p11 * (s.height * 0.5)
        n_huge_sph = int(np.sum(rpx_v >= 40.0))
        if n_huge_sph > s.huge_cap:
            import dataclasses as _dc

            cap = s.huge_cap
            while cap < n_huge_sph and cap < _HUGE_CAP_CEIL:
                cap *= 2
            s = _dc.replace(s, huge_cap=cap)
            if n_huge_sph > cap:
                from viamd_tpu.core.vlog import warning

                # static message so vlog's dedup window suppresses repeats
                warning(
                    "raster: huge-sphere count exceeds the maximum "
                    "global-tier capacity — the tier drops the farthest "
                    "(raise RasterSettings.huge_cap to override)"
                )
    if len(cyl12):
        c = np.asarray(cyl12)
        z0 = -c[:, 2]
        z1 = -(c[:, 2] + c[:, 5] * c[:, 6])
        frontc = (z0 > 1e-2) | (z1 > 1e-2)
        if frontc.any():
            p11 = float(np.asarray(proj)[1, 1])
            zm = np.maximum(np.minimum(z0, z1), 1e-2)
            # conservative screen-length/radius estimates (host-side)
            slen_est = c[:, 6] / zm * p11 * (s.height * 0.5)
            crad_est = c[:, 7] / zm * p11 * (s.height * 0.5)
            n_huge = int(
                np.sum(frontc & ((slen_est > 80.0) | (crad_est > 14.0)))
            )
            if n_huge > s.huge_capsule_cap:
                import dataclasses as _dc

                cap = s.huge_capsule_cap
                while cap < n_huge and cap < _HUGE_CAP_CEIL // 2:
                    cap *= 2
                s = _dc.replace(s, huge_capsule_cap=cap)
                if n_huge > cap:
                    from viamd_tpu.core.vlog import warning

                    warning(
                        "raster: huge-capsule count exceeds the maximum "
                        "global-tier capacity — the farthest fall back "
                        "to sampled home-bin coverage (possible mid-span "
                        "gaps beyond ~96 px; raise "
                        "RasterSettings.huge_capsule_cap to override)"
                    )

    img, depth, pick_idx = _raster_impl(
        jnp.asarray(pv), jnp.asarray(rad), jnp.asarray(cols),
        jnp.asarray(cyl12), jnp.asarray(proj), s,
    )
    # map primitive ids back to atom ids
    pick_np = np.asarray(pick_idx)
    pick_atoms = np.where(
        pick_np >= 0, np.asarray(pick_src)[np.maximum(pick_np, 0)], -1
    )
    return np.asarray(img), np.asarray(depth), pick_atoms
