"""HBAO: normals-aware, mip-sampled horizon-based ambient occlusion.

Full-algorithm rebuild of the reference's SSAO pass
(/root/reference/src/shaders/ssao/ssao.frag:1-177 + the control setup in
src/gfx/postprocessing_utils.cpp:441-563 `setup_ubo_hbao_data`): per-pixel
view-space position reconstruction via proj_info, screen-space-derivative
view normals (the shader's compute_view_space_normal path), the 32-entry
Intel-ASSAO spiral sample pattern with per-4x4-pixel jitter (rotation,
pattern offset, uv scale), per-sample mip-level depth fetches
(mip_offset = log2(radius_pixels*4) - 4.3), NdotV-bias obscurance with
quadratic distance falloff, and the depth-aware separable blur
(ssao/blur.frag, sharpness = 4/sqrt(radius),
postprocessing_utils.cpp:565).

TPU formulation: the per-pixel jitter tile is 4x4 and deterministic, so the
rotated sample directions / weights / mip biases / weight sums are all
STATIC (16, 4, 4) numpy tables computed at trace time and tiled across the
image — the only dynamic work per sample is one packed nearest-texel gather
from a flattened full-res-upsampled mip stack plus elementwise math. The
reference defaults (viamd.h:1232-1237) are intensity 6, radius 6, bias 0.1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Intel ASSAO sample pattern (x, y, weight, mip bias), the same 32-entry
# table the reference embeds (postprocessing_utils.cpp:465-497) — public
# constant data from Intel's ASSAO sample, not code.
_SAMPLE_PATTERN = np.array([
    [0.78488064, 0.56661671, 1.500000, -0.126083],
    [0.26022232, -0.29575172, 1.500000, -1.064030],
    [0.10459357, 0.08372527, 1.110000, -2.730563],
    [-0.68286800, 0.04963045, 1.090000, -0.498827],
    [-0.13570161, -0.64190155, 1.250000, -0.532765],
    [-0.26193795, -0.08205118, 0.670000, -1.783245],
    [-0.61177456, 0.66664219, 0.710000, -0.044234],
    [0.43675563, 0.25119025, 0.610000, -1.167283],
    [0.07884444, 0.86618668, 0.640000, -0.459002],
    [-0.12790935, -0.29869005, 0.600000, -1.729424],
    [-0.04031125, 0.02413622, 0.600000, -4.792042],
    [0.16201244, -0.52851415, 0.790000, -1.067055],
    [-0.70991218, 0.47301072, 0.640000, -0.335236],
    [0.03277707, -0.22349690, 0.600000, -1.982384],
    [0.68921727, 0.36800742, 0.630000, -0.266718],
    [0.29251814, 0.37775412, 0.610000, -1.422520],
    [-0.12224089, 0.96582592, 0.600000, -0.426142],
    [0.11071457, -0.16131058, 0.600000, -2.165947],
    [0.46562141, -0.59747696, 0.600000, -0.189760],
    [-0.51548797, 0.11804193, 0.600000, -1.246800],
    [0.89141309, -0.42090443, 0.600000, 0.028192],
    [-0.32402530, -0.01591529, 0.600000, -1.543018],
    [0.60771245, 0.41635221, 0.600000, -0.605411],
    [0.02379565, -0.08239821, 0.600000, -3.809046],
    [0.48951152, -0.23657045, 0.600000, -1.189011],
    [-0.17611565, -0.81696892, 0.600000, -0.513724],
    [-0.33930185, -0.20732205, 0.600000, -1.698047],
    [-0.91974425, 0.05403209, 0.600000, 0.062246],
    [-0.15064627, -0.14949332, 0.600000, -1.896062],
    [0.53180975, -0.35210401, 0.600000, -0.758838],
    [0.41487166, 0.81442589, 0.600000, -0.505648],
    [-0.24106961, -0.32721516, 0.600000, -1.665244],
], dtype=np.float64)

_N_SAMPLES = 16  # AO_NUM_SAMPLES (ssao.frag:14)
_TILE = 4        # AO_RANDOM_TEX_SIZE
_N_MIPS = 5
_GLOBAL_MIP_OFFSET = -4.3  # ssao.frag:118 (intel ASSAO recommendation)


@functools.lru_cache(maxsize=1)
def _jitter_tables():
    """Static per-tile-phase tables replacing the random texture
    (initialize_rnd_tex, postprocessing_utils.cpp:542-563): for each of the
    4x4 pixel phases, the 16 rotated+scaled sample directions, weights, mip
    biases, and the weight sum."""
    rng = np.random.RandomState(12345)
    r = rng.rand(_TILE * _TILE, 3)
    ang = 2 * np.pi * r[:, 0]
    cos_a, sin_a = np.cos(ang), np.sin(ang)
    # offset = floor((jitter.z*0.5+0.5)*32)&31 with jitter.z = rand2*2-1
    # is simply floor(rand2*32) (ssao.frag:129)
    offset = np.floor(r[:, 1] * 32.0).astype(np.int64) & 31
    # uv_scale = 0.5 + 0.5*(0.5 + jitter.w*0.5), jitter.w = rand3*2-1
    uv_scale = 0.5 + 0.5 * (0.5 + (r[:, 2] * 2 - 1) * 0.5)

    dirs = np.zeros((_N_SAMPLES, _TILE, _TILE, 2))
    wgts = np.zeros((_N_SAMPLES, _TILE, _TILE))
    mips = np.zeros((_N_SAMPLES, _TILE, _TILE))
    for t in range(_TILE * _TILE):
        ty, tx = t // _TILE, t % _TILE
        for i in range(_N_SAMPLES):
            s = _SAMPLE_PATTERN[(offset[t] + i) & 31]
            # rotate_sample (ssao.frag:103-105)
            dx = s[0] * cos_a[t] - s[1] * sin_a[t]
            dy = s[0] * sin_a[t] + s[1] * cos_a[t]
            dirs[i, ty, tx] = (dx * uv_scale[t], dy * uv_scale[t])
            wgts[i, ty, tx] = s[2]
            mips[i, ty, tx] = s[3]
    wsum = wgts.sum(axis=0)
    return (
        dirs.astype(np.float32),
        wgts.astype(np.float32),
        mips.astype(np.float32),
        wsum.astype(np.float32),
    )


def _tile_to(table: np.ndarray, H: int, W: int):
    """Tile a (4,4,...) phase table across an (H,W) image."""
    reps = (-(-H // _TILE), -(-W // _TILE)) + (1,) * (table.ndim - 2)
    return jnp.asarray(np.tile(table, reps)[:H, :W])


def proj_info(proj: np.ndarray, ortho: bool):
    """(sx, sy, ox, oy) uv→view unprojection constants + (proj_scl, z_max)
    — setup_ubo_hbao_data (postprocessing_utils.cpp:500-526). `proj` is the
    row-major 4x4 from render/camera.py."""
    p = np.asarray(proj, np.float64)
    if not ortho:
        info = (
            2.0 / p[0, 0],
            2.0 / p[1, 1],
            -(1.0 - p[0, 2]) / p[0, 0],
            -(1.0 + p[1, 2]) / p[1, 1],
        )
        proj_scl = p[1, 1] * 0.5  # * height, applied by the caller
        z_max = p[2, 3] / (p[2, 2] + 1.0)
    else:
        info = (
            2.0 / p[0, 0],
            2.0 / p[1, 1],
            -(1.0 + p[0, 3]) / p[0, 0],
            -(1.0 - p[1, 3]) / p[1, 1],
        )
        proj_scl = p[1, 1] * 0.5
        z_max = (-2.0 + p[2, 3]) / p[2, 2]
    return info, float(proj_scl), float(z_max)


def _uv_to_view(u, v, eye_z, info, ortho: bool):
    """uv ([0,1]², v top-down) + linear depth → view-space position with
    z = +eye_z (ssao.frag:43-49)."""
    sx, sy, ox, oy = info
    if ortho:
        x = u * sx + ox
        y = v * sy + oy
    else:
        x = (u * sx + ox) * eye_z
        y = (v * sy + oy) * eye_z
    return x, y, eye_z


def view_normals(view_depth, proj, ortho: bool = False):
    """(H,W,3) view-space normals from the linear depth buffer via
    screen-space forward differences — the shader's
    compute_view_space_normal (ssao.frag:72-80)."""
    H, W = view_depth.shape
    info, _, _ = proj_info(proj, ortho)
    d = jnp.where(jnp.isfinite(view_depth), view_depth, 1e8)
    u = (jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5) / W
    v = (jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5) / H
    u = jnp.broadcast_to(u, (H, W))
    v = jnp.broadcast_to(v, (H, W))

    def pos(uu, vv, dd):
        return jnp.stack(_uv_to_view(uu, vv, dd, info, ortho), axis=-1)

    p0 = pos(u, v, d)
    dE = jnp.concatenate([d[:, 1:], d[:, -1:]], axis=1)
    dS = jnp.concatenate([d[1:, :], d[-1:, :]], axis=0)
    px = pos(u + 1.0 / W, v, dE)
    py = pos(u, v + 1.0 / H, dS)
    n = -jnp.cross(px - p0, py - p0)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def _mip_stack(d):
    """(M, H, W) linear-depth mip pyramid, each level a 2^m-box average
    upsampled back to full resolution (nearest) so per-pixel mip fetches
    are flat-index gathers."""
    H, W = d.shape
    levels = [d]
    cur = d
    for _ in range(1, _N_MIPS):
        h, w = cur.shape
        ph, pw = h + (h & 1), w + (w & 1)
        p = jnp.pad(cur, ((0, ph - h), (0, pw - w)), mode="edge")
        cur = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        up = jnp.repeat(jnp.repeat(cur, 2 ** len(levels), 0),
                        2 ** len(levels), 1)[:H, :W]
        levels.append(up)
    return jnp.stack(levels)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "info", "proj_scl", "z_max",
                     "ortho", "intensity", "radius", "bias"),
)
def _hbao_impl(view_depth, normals, *, height, width, info, proj_scl,
               z_max, ortho, intensity, radius, bias):
    H, W = height, width
    d = jnp.where(jnp.isfinite(view_depth), view_depth, 1e8)
    dirs, wgts, mips, wsum = _jitter_tables()
    dirs_t = _tile_to(dirs.transpose(1, 2, 0, 3), H, W)   # (H, W, 16, 2)
    wgts_t = _tile_to(wgts.transpose(1, 2, 0), H, W)      # (H, W, 16)
    mips_t = _tile_to(mips.transpose(1, 2, 0), H, W)
    wsum_t = _tile_to(wsum, H, W)

    radius_to_screen = radius * 0.5 * proj_scl * H
    neg_inv_r2 = -1.0 / (radius * radius)
    n_dot_v_bias = min(max(bias, 0.0), 1.0 - 1e-7)
    ao_multiplier = 1.0 / (1.0 - n_dot_v_bias)

    if ortho:
        radius_pixels = jnp.full((H, W), max(radius_to_screen, 3.0))
    else:
        radius_pixels = jnp.maximum(radius_to_screen / d, 3.0)

    mip_offset = jnp.log2(radius_pixels * 4.0) + _GLOBAL_MIP_OFFSET

    u = jnp.broadcast_to(
        (jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5) / W, (H, W))
    v = jnp.broadcast_to(
        (jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5) / H, (H, W))
    Px, Py, Pz = _uv_to_view(u, v, d, info, ortho)
    Nx, Ny, Nz = normals[..., 0], normals[..., 1], normals[..., 2]

    stack = _mip_stack(d).reshape(-1)

    ao = jnp.zeros((H, W))
    for i in range(_N_SAMPLES):
        duv = dirs_t[:, :, i, :] * radius_pixels[..., None]  # pixels
        su = u + duv[..., 0] / W
        sv = v + duv[..., 1] / H
        m = jnp.clip(
            jnp.round(mip_offset + mips_t[:, :, i]), 0, _N_MIPS - 1
        ).astype(jnp.int32)
        xi = jnp.clip((su * W).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip((sv * H).astype(jnp.int32), 0, H - 1)
        sz = stack[m * (H * W) + yi * W + xi]
        Sx, Sy, Sz = _uv_to_view(su, sv, sz, info, ortho)
        Vx, Vy, Vz = Sx - Px, Sy - Py, Sz - Pz
        vdotv = Vx * Vx + Vy * Vy + Vz * Vz
        ndotv = (Nx * Vx + Ny * Vy + Nz * Vz) * jax.lax.rsqrt(
            jnp.maximum(vdotv, 1e-12)
        )
        falloff = jnp.maximum(0.0, vdotv * neg_inv_r2 + 1.0)
        ao = ao + jnp.maximum(0.0, ndotv - n_dot_v_bias) * falloff \
            * wgts_t[:, :, i]

    ao = jnp.clip(1.0 - ao * (ao_multiplier / wsum_t), 0.0, 1.0)
    ao = ao ** max(intensity, 0.0)
    return jnp.where(d > z_max, 1.0, ao)


def hbao(view_depth, proj, *, intensity: float = 6.0, radius: float = 6.0,
         bias: float = 0.1, ortho: bool = False, normals=None,
         blur: bool = True):
    """(H,W) linear view depth (+proj from render/camera.py) → (H,W) AO
    factor in [0,1]; reference defaults per viamd.h:1232-1237."""
    view_depth = jnp.asarray(view_depth)
    H, W = view_depth.shape
    info, proj_scl, z_max = proj_info(proj, ortho)
    if normals is None:
        normals = view_normals(view_depth, proj, ortho)
    ao = _hbao_impl(
        view_depth, normals, height=H, width=W, info=info,
        proj_scl=proj_scl, z_max=z_max * 0.99, ortho=ortho,
        intensity=float(intensity), radius=float(radius), bias=float(bias),
    )
    if blur:
        sharpness = 4.0 / np.sqrt(max(radius, 1e-6))  # compute_sharpness
        ao = hbao_blur(ao, view_depth, sharpness=sharpness,
                       z_max=z_max * 0.99)
    return ao


@functools.partial(jax.jit, static_argnames=("sharpness", "z_max"))
def hbao_blur(ao, view_depth, *, sharpness: float, z_max: float):
    """Depth-aware separable 3-tap-radius blur (ssao/blur.frag:1-55),
    horizontal then vertical."""
    d = jnp.where(jnp.isfinite(view_depth), view_depth, 1e8)
    kr = 3
    sigma = kr * 0.5
    fall = 1.0 / (2.0 * sigma * sigma)

    def one_axis(c, axis):
        total = c
        wtot = jnp.ones_like(c)
        for r in range(1, kr + 1):
            for sgn in (1, -1):
                cs = _shift_edge(c, sgn * r, axis)
                ds = _shift_edge(d, sgn * r, axis)
                ddiff = (ds - d) * sharpness
                w = jnp.exp2(-r * r * fall - ddiff * ddiff)
                total = total + cs * w
                wtot = wtot + w
        return jnp.where(d > z_max, c, total / wtot)

    return one_axis(one_axis(ao, 1), 0)


def _shift_edge(img, shift: int, axis: int):
    """Shift with clamp-to-edge (texture CLAMP_TO_EDGE semantics)."""
    n = img.shape[axis]
    idx = jnp.clip(jnp.arange(n) + shift, 0, n - 1)
    return jnp.take(img, idx, axis=axis)
