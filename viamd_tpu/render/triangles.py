"""Tiled triangle rasterizer (ray-cast, XLA).

Capability rebuild of the reference's triangle geometry paths: the script
visualization payload's triangle primitives
(/root/reference/src/main.cpp:6540-6575, immediate_draw_utils.h:51-108)
and the extruded ribbon/cartoon backbone meshes md_gl draws
(/root/reference/src/viamd.h:161-169, draw ops src/main.cpp:6878-6925).

TPU formulation (same pattern as render/raster.py): triangles bin
host-side into 16×16-pixel screen tiles by projected bbox (nearest-first
on overflow), then one vmapped kernel intersects each tile's pixel rays
against its candidate list (Möller-Trumbore in view space, two-sided) and
keeps the nearest hit — color, view depth (t along the (dx,dy,-1) ray,
matching raster.py), and picking id per pixel. Outputs composite with the
impostor raster by depth compare.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE = 16


@functools.lru_cache(maxsize=32)
def _tile_kernel(cap: int, w: int, h: int, tx: int, shade: bool):
    @jax.jit
    def run(tri15, proj00, proj11, light):
        # tri15: (ntiles, cap, 15) = v0 v1 v2 (9), rgba (4), pick, valid
        ntiles = tri15.shape[0]
        # pixel rays per tile: local (16,16) grid + per-tile origin
        tids = jnp.arange(ntiles, dtype=jnp.int32)
        ox = (tids % tx) * TILE
        oy = (tids // tx) * TILE
        lx = jnp.arange(TILE, dtype=jnp.float32)
        px = (ox[:, None, None] + lx[None, None, :]) + 0.5  # (nt,1,16)
        py = (oy[:, None, None] + lx[None, :, None]) + 0.5  # (nt,16,1)
        ndc_x = px / w * 2.0 - 1.0
        ndc_y = 1.0 - py / h * 2.0
        dx = ndc_x / proj00  # ray dir (dx, dy, -1), origin 0 (view space)
        dy = ndc_y / proj11
        dx = jnp.broadcast_to(dx, (ntiles, TILE, TILE)).reshape(ntiles, -1)
        dy = jnp.broadcast_to(dy, (ntiles, TILE, TILE)).reshape(ntiles, -1)

        P = TILE * TILE
        best_t = jnp.full((ntiles, P), jnp.inf, jnp.float32)
        best_i = jnp.full((ntiles, P), -1, jnp.int32)
        best_n = jnp.zeros((ntiles, P, 3), jnp.float32)

        def body(k, carry):
            bt, bi, bn = carry
            tri = tri15[:, k]  # (nt, 15)
            v0 = tri[:, 0:3][:, None, :]  # (nt,1,3)
            e1 = (tri[:, 3:6] - tri[:, 0:3])[:, None, :]
            e2 = (tri[:, 6:9] - tri[:, 0:3])[:, None, :]
            d = jnp.stack([dx, dy, -jnp.ones_like(dx)], axis=-1)  # (nt,P,3)
            # Möller-Trumbore, origin = 0
            pvec = jnp.cross(d, e2)
            det = jnp.sum(pvec * e1, axis=-1)  # (nt,P)
            inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvec = -v0  # origin - v0
            u = jnp.sum(tvec * pvec, axis=-1) * inv
            qvec = jnp.cross(tvec, e1)  # (nt,1,3)
            v = jnp.sum(qvec * d, axis=-1) * inv
            # dot(e2, qvec) is a per-tile scalar row; per-pixel t comes
            # from the per-pixel inv(det)
            t = jnp.sum(qvec * e2, axis=-1) * inv
            hit = (
                (jnp.abs(det) > 1e-12)
                & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > 1e-3) & (t < bt)
                & (tri[:, 14:15] > 0)  # valid flag; 0 = padding slot
            )
            n = jnp.cross(e1, e2)  # (nt,1,3) face normal
            nl = jnp.linalg.norm(n, axis=-1, keepdims=True)
            n = n / jnp.maximum(nl, 1e-12)
            # two-sided: flip toward the viewer (ray dir d)
            flip = jnp.sum(n * d, axis=-1, keepdims=True) > 0
            n_px = jnp.where(flip, -n, n)  # (nt,P,3)
            bt = jnp.where(hit, t, bt)
            bi = jnp.where(hit, k, bi)
            bn = jnp.where(hit[..., None], n_px, bn)
            return bt, bi, bn

        best_t, best_i, best_n = jax.lax.fori_loop(
            0, cap, body, (best_t, best_i, best_n)
        )
        safe_i = jnp.maximum(best_i, 0)
        attr = jnp.take_along_axis(
            tri15, safe_i[..., None], axis=1
        )  # (nt,P,15)
        rgba = attr[..., 9:13]
        pick = attr[..., 13].astype(jnp.int32)
        hitm = best_i >= 0
        if shade:
            d = jnp.stack([dx, dy, -jnp.ones_like(dx)], axis=-1)
            dn = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            ndotl = jnp.maximum(
                jnp.sum(best_n * light[None, None, :], axis=-1), 0.0
            )
            hvec = light[None, None, :] - dn
            hvec = hvec / jnp.maximum(
                jnp.linalg.norm(hvec, axis=-1, keepdims=True), 1e-12
            )
            spec = jnp.maximum(jnp.sum(best_n * hvec, axis=-1), 0.0) ** 32
            lit = rgba[..., :3] * (0.25 + 0.75 * ndotl[..., None]) + (
                0.25 * spec[..., None]
            )
        else:
            lit = rgba[..., :3]
        out_rgb = jnp.where(hitm[..., None], jnp.clip(lit, 0.0, 1.0), 0.0)
        out_a = jnp.where(hitm, rgba[..., 3], 0.0)
        img = jnp.concatenate([out_rgb, out_a[..., None]], axis=-1)
        depth = jnp.where(hitm, best_t, jnp.inf)
        pick = jnp.where(hitm, pick, -1)
        return img, depth, pick

    return run


def arrow_mesh(
    beg: np.ndarray,
    end: np.ndarray,
    radius: float,
    head_radius: float | None = None,
    body_fraction: float = 0.8,
    segments: int = 16,
) -> np.ndarray:
    """World-space triangle mesh of an arrow: cylinder body over the first
    `body_fraction` of beg→end plus a cone head (the reference's dipole-
    moment representation draws immediate::cylinder + immediate::cone with
    head radius 1.5× body, /root/reference/src/main.cpp:6939-6953).
    Returns (T, 3, 3) triangles."""
    beg = np.asarray(beg, np.float64)
    end = np.asarray(end, np.float64)
    head_radius = 1.5 * radius if head_radius is None else head_radius
    axis = end - beg
    ln = np.linalg.norm(axis)
    if ln < 1e-12:
        return np.zeros((0, 3, 3), np.float32)
    az = axis / ln
    ref = np.array([1.0, 0, 0]) if abs(az[0]) < 0.9 else np.array([0, 1.0, 0])
    ax = np.cross(az, ref)
    ax /= np.linalg.norm(ax)
    ay = np.cross(az, ax)
    mid = beg + axis * body_fraction
    ang = np.linspace(0, 2 * np.pi, segments, endpoint=False)
    ring = np.cos(ang)[:, None] * ax + np.sin(ang)[:, None] * ay  # (S,3)
    b0 = beg + ring * radius
    b1 = mid + ring * radius
    h0 = mid + ring * head_radius
    tris = []
    for i in range(segments):
        j = (i + 1) % segments
        # cylinder side (two triangles)
        tris.append([b0[i], b1[i], b0[j]])
        tris.append([b0[j], b1[i], b1[j]])
        # cone side
        tris.append([h0[i], end, h0[j]])
        # cone base annulus + body base cap
        tris.append([b1[i], h0[i], b1[j]])
        tris.append([b1[j], h0[i], h0[j]])
        tris.append([b0[i], b0[j], beg])
    return np.asarray(tris, np.float32)


def render_triangles(
    verts_view: np.ndarray,  # (T,3,3) view-space vertices
    colors: np.ndarray,  # (T,4) rgba per triangle
    pick_ids: np.ndarray,  # (T,) int32 (≥0; -1 disables picking)
    proj: np.ndarray,
    width: int,
    height: int,
    light=(0.57735, 0.57735, 0.57735),
    shade: bool = True,
    max_per_tile: int = 64,
):
    """→ ((H,W,4) RGBA, (H,W) view depth, (H,W) int32 pick ids)."""
    T = int(len(verts_view))
    tx = -(-width // TILE)
    ty = -(-height // TILE)
    ntiles = tx * ty
    if T == 0:
        return (
            np.zeros((height, width, 4), np.float32),
            np.full((height, width), np.inf, np.float32),
            np.full((height, width), -1, np.int32),
        )
    v = np.asarray(verts_view, np.float32)
    proj = np.asarray(proj, np.float32)
    p00, p11 = float(proj[0, 0]), float(proj[1, 1])

    # host binning: projected bbox per triangle → covered tile range
    z = -v[..., 2]  # (T,3)
    front = (z > 1e-2).any(axis=1)
    zc = np.maximum(z, 1e-2)
    sx = (v[..., 0] / zc * p00 * 0.5 + 0.5) * width
    sy = (-v[..., 1] / zc * p11 * 0.5 + 0.5) * height
    x0 = np.clip(np.floor(sx.min(1) / TILE), 0, tx - 1).astype(np.int64)
    x1 = np.clip(np.floor(sx.max(1) / TILE), 0, tx - 1).astype(np.int64)
    y0 = np.clip(np.floor(sy.min(1) / TILE), 0, ty - 1).astype(np.int64)
    y1 = np.clip(np.floor(sy.max(1) / TILE), 0, ty - 1).astype(np.int64)
    nx = x1 - x0 + 1
    ny = y1 - y0 + 1
    cnt = np.where(front, nx * ny, 0)
    tot = int(cnt.sum())
    tri_of = np.repeat(np.arange(T), cnt)
    # per-entry tile coordinates
    off = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    k = np.arange(tot) - off[tri_of]
    txy = x0[tri_of] + (k % nx[tri_of]) + tx * (y0[tri_of] + k // nx[tri_of])
    # nearest-first within each tile on overflow
    znear = zc.min(axis=1)
    order = np.lexsort((znear[tri_of], txy))
    txy_s = txy[order]
    tri_s = tri_of[order]
    seg_start = np.searchsorted(txy_s, np.arange(ntiles))
    seg_end = np.searchsorted(txy_s, np.arange(ntiles) + 1)
    occ = np.minimum(seg_end - seg_start, max_per_tile)
    cap = max(int(occ.max()), 1)
    cap = min(-(-cap // 8) * 8, max_per_tile)
    slots = np.full((ntiles, cap), -1, np.int64)
    slot_idx = np.arange(cap)
    sel = slot_idx[None, :] < occ[:, None]
    slots[sel] = tri_s[
        (seg_start[:, None] + slot_idx[None, :])[sel]
    ]
    tri15 = np.zeros((ntiles, cap, 15), np.float32)
    tri15[..., 13] = -1.0
    filled = slots >= 0
    src = slots[filled]
    tri15[filled] = np.concatenate(
        [
            v[src].reshape(-1, 9),
            np.asarray(colors, np.float32)[src],
            np.asarray(pick_ids, np.float32)[src, None],
            np.ones((len(src), 1), np.float32),
        ],
        axis=1,
    )
    run = _tile_kernel(cap, width, height, tx, shade)
    img_t, d_t, p_t = run(
        jnp.asarray(tri15), p00, p11,
        jnp.asarray(np.asarray(light, np.float32)),
    )

    def assemble(tiles, ch):
        a = np.asarray(tiles).reshape(ty, tx, TILE, TILE, *ch)
        a = a.transpose(0, 2, 1, 3, *range(4, 4 + len(ch)))
        a = a.reshape(ty * TILE, tx * TILE, *ch)
        return a[:height, :width]

    return (
        assemble(img_t.reshape(ntiles, TILE, TILE, 4), (4,)),
        assemble(d_t.reshape(ntiles, TILE, TILE), ()),
        assemble(p_t.reshape(ntiles, TILE, TILE), ()),
    )
