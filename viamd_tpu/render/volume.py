"""Headless volume renderer: DVR + multi-isosurface ray-marching.

Capability rebuild of the reference's volume pipeline
(/root/reference/src/gfx/volumerender_utils.{h,cpp} +
src/shaders/volume/raycaster.frag): entry/exit determination, jittered
fixed-rate marching with opacity correction to a reference sampling rate
(raycaster.frag:50-52,179), transfer-function DVR compositing with early-ray
termination at α=0.995, isosurface crossing detection with linear
refinement + gradient (central-difference) GGX-style shading
(raycaster.frag:254-305,344-387), and depth output for compositing.

TPU formulation: rasterized entry/exit cube passes become a closed-form
ray-box intersection; the data-dependent march becomes a fixed-length
fori_loop with transmittance masking (ERT via masked updates — SURVEY.md §7
"fixed-step march with masking"). Rays process as a flat pixel vector; XLA
fuses the per-step sampling chain. One simplification vs the fragment
shader: multiple iso crossings inside the SAME segment composite in
iso-index order instead of exact within-segment sort — indistinguishable at
the default 2-samples-per-voxel rate.
"""

from __future__ import annotations

import functools
import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

EARLY_TERMINATION_ALPHA = 0.995  # raycaster.frag:51
REF_SAMPLING_RATE = 150.0  # raycaster.frag:50


@dataclass
class VolumeRenderSettings:
    width: int = 512
    height: int = 512
    samples_per_voxel: float = 2.0  # SAMPLING_RATE analog
    enable_dvr: bool = True
    enable_iso: bool = False
    iso_values: tuple = ()
    iso_colors: tuple = ()  # (r,g,b,a) per iso
    value_range: tuple = (0.0, 1.0)
    background: tuple = (0.0, 0.0, 0.0, 0.0)
    jitter: bool = True
    light_dir: tuple = (0.577, 0.577, 0.577)
    ambient: float = 0.2
    specular: float = 0.4
    shininess: float = 32.0
    # DVR takes its color from a (D,D,D,3) color volume instead of the TF
    # (the raycaster.frag colvol program variants; alpha stays TF-driven)
    use_color_volume: bool = False
    # fractional clip sub-box [clip_min, clip_max] in texture space — the
    # reference's clip planes (volumerender_utils.h:44,72: RenderDesc
    # clip_volume {min,max}, density_volume.cpp:405-420 GUI); rays march
    # only inside the sub-box
    clip_min: tuple = (0.0, 0.0, 0.0)
    clip_max: tuple = (1.0, 1.0, 1.0)


def _sample_trilinear(grid: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample at texture coords p ∈ [0,1]³ (clamp-to-edge).

    grid: (D0,D1,D2); p: (P,3) → (P,)."""
    dims = jnp.array(grid.shape, jnp.float32)
    g = p * dims - 0.5
    g0 = jnp.floor(g)
    f = g - g0
    g0 = g0.astype(jnp.int32)
    out = jnp.zeros(p.shape[0], grid.dtype)
    maxi = jnp.array(grid.shape, jnp.int32) - 1
    for corner in range(8):
        off = np.array([(corner >> 2) & 1, (corner >> 1) & 1, corner & 1])
        idx = jnp.clip(g0 + off, 0, maxi)
        wt = jnp.prod(
            jnp.where(jnp.asarray(off) == 1, f, 1.0 - f), axis=-1
        )
        out = out + wt * grid[idx[:, 0], idx[:, 1], idx[:, 2]]
    return out


def _sample_trilinear_c(grid: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of a channelful (D0,D1,D2,C) grid → (P,C)."""
    dims = jnp.array(grid.shape[:3], jnp.float32)
    g = p * dims - 0.5
    g0 = jnp.floor(g)
    f = g - g0
    g0 = g0.astype(jnp.int32)
    out = jnp.zeros((p.shape[0], grid.shape[3]), grid.dtype)
    maxi = jnp.array(grid.shape[:3], jnp.int32) - 1
    for corner in range(8):
        off = np.array([(corner >> 2) & 1, (corner >> 1) & 1, corner & 1])
        idx = jnp.clip(g0 + off, 0, maxi)
        wt = jnp.prod(
            jnp.where(jnp.asarray(off) == 1, f, 1.0 - f), axis=-1
        )
        out = out + wt[:, None] * grid[idx[:, 0], idx[:, 1], idx[:, 2]]
    return out


def _sample_tf(tf: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Linear lookup into an (N,4) RGBA transfer function, t ∈ [0,1]."""
    n = tf.shape[0]
    x = jnp.clip(t, 0.0, 1.0) * (n - 1)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 1)
    i1 = jnp.clip(i0 + 1, 0, n - 1)
    f = (x - i0.astype(jnp.float32))[:, None]
    return tf[i0] * (1 - f) + tf[i1] * f


def _apply44(m: jnp.ndarray, p: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous transform of (P,3) points (+w column), expanded
    elementwise — (P,4)@(4,4) matmuls are pathological on the TPU backend
    (tiny-K MXU dispatch). Returns (P,3) after perspective divide."""
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    out = [
        m[i, 0] * x + m[i, 1] * y + m[i, 2] * z + m[i, 3] * w
        for i in range(4)
    ]
    # guard the perspective divide: |w'|→0 at depth extremes produces inf,
    # and inf·0 in a later affine transform turns into NaN (hit on TPU f32)
    ww = out[3]
    ww = jnp.where(jnp.abs(ww) < 1e-12, jnp.where(ww < 0, -1e-12, 1e-12), ww)
    return jnp.stack(out[:3], axis=1) / ww[:, None]


def ray_box(
    orig: jnp.ndarray, direc: jnp.ndarray, lo=0.0, hi=1.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Entry/exit params of rays vs the box [lo, hi]³ (the entry/exit
    rasterization pass of volumerender_utils become closed form; lo/hi
    may be per-axis (3,) — the clip-planes sub-box)."""
    inv = 1.0 / jnp.where(jnp.abs(direc) < 1e-12, 1e-12, direc)
    t1 = (jnp.asarray(lo) - orig) * inv
    t2 = (jnp.asarray(hi) - orig) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    tmin = jnp.maximum(tmin, 0.0)
    return tmin, tmax


@functools.partial(jax.jit, static_argnames=("settings",))
def _render_impl(
    grid, tf, model, view, proj, seed, settings: "VolumeRenderSettings",
    y0=0.0, y1=1.0, cvol=None, scene_depth=None,
):
    if cvol is None:
        cvol = jnp.zeros((1, 1, 1, 3), jnp.float32)
    # y0/y1 are DYNAMIC (all equal-height bands share one compilation)
    W, H = settings.width, settings.height  # H = rows in THIS band
    P = W * H
    inv_vp = jnp.linalg.inv(proj @ view)
    inv_model = jnp.linalg.inv(model)

    # per-pixel rays in world space (NDC corners unprojected); [y0,y1) is
    # this band's screen fraction (banded rendering of large resolutions)
    px = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2.0 - 1.0
    py = (
        y0 + (jnp.arange(H, dtype=jnp.float32) + 0.5) / H * (y1 - y0)
    ) * 2.0 - 1.0
    gx, gy = jnp.meshgrid(px, py)  # (H, W)
    ndc = jnp.stack(
        [gx.reshape(-1), gy.reshape(-1)], axis=1
    )  # (P, 2)

    def unproject(z):
        clip = jnp.concatenate([ndc, jnp.full((P, 1), z)], axis=1)
        return _apply44(inv_vp, clip, jnp.ones(P))

    p_near = unproject(-1.0)
    # a SECOND point on the ray — NDC mid-depth, not the far plane: the
    # far-plane unprojection degenerates (w'→0 → inf coords) and only the
    # ray direction matters (ray_box renormalizes the parametrization)
    p_far = unproject(0.0)
    # into model (texture) space
    def to_model(p):
        return _apply44(inv_model, p, jnp.ones(P))

    o = to_model(p_near)
    e = to_model(p_far)
    d = e - o
    # clip-planes sub-box (volumerender_utils.h:44,72): rays march only
    # inside [clip_min, clip_max] of texture space
    t0, t1 = ray_box(
        o, d,
        jnp.asarray(settings.clip_min, jnp.float32),
        jnp.asarray(settings.clip_max, jnp.float32),
    )
    if scene_depth is not None:
        # scene-depth-clamped exit (entryexit.frag:28,61-68): stop the
        # march where the ray passes the opaque scene surface. View depth
        # is affine in the shared ray parameter t (p_w(t) = p_near_w +
        # t·(p_far_w − p_near_w), and model is affine), so solve
        # zd(t) = zd_scene for t and clamp t1.
        def vdepth(p):  # world point → view depth (−z_view), no divide
            return -(
                view[2, 0] * p[:, 0] + view[2, 1] * p[:, 1]
                + view[2, 2] * p[:, 2] + view[2, 3]
            )

        zd0 = vdepth(p_near)
        zdb = vdepth(p_far) - zd0
        zdb = jnp.where(jnp.abs(zdb) < 1e-12, 1e-12, zdb)
        zs = jnp.asarray(scene_depth, jnp.float32).reshape(-1)
        t_scene = (zs - zd0) / zdb
        t1 = jnp.minimum(t1, jnp.where(jnp.isfinite(zs), t_scene, t1))
    hit = t1 > t0

    D = max(grid.shape)
    nsteps = int(D * settings.samples_per_voxel)
    dt = jnp.where(hit, (t1 - t0) / nsteps, 0.0)
    # per-ray texture-space step length: opacity correction references the
    # texture-space sampling rate (raycaster.frag correctedOpacity)
    tex_dt = dt * jnp.linalg.norm(d, axis=1)

    if settings.jitter:
        key = jax.random.PRNGKey(0)
        key = jax.random.fold_in(key, seed)
        jit = jax.random.uniform(key, (P,))
    else:
        jit = jnp.zeros(P)

    vmin, vmax = settings.value_range
    vspan = max(vmax - vmin, 1e-30)
    tfj = tf.astype(jnp.float32)
    light = jnp.asarray(settings.light_dir, jnp.float32)
    light = light / jnp.linalg.norm(light)

    iso_vals = settings.iso_values
    iso_cols = settings.iso_colors

    def grad_at(p):
        h = 1.0 / D
        gx_ = _sample_trilinear(grid, p + jnp.array([h, 0, 0])) - _sample_trilinear(
            grid, p - jnp.array([h, 0, 0])
        )
        gy_ = _sample_trilinear(grid, p + jnp.array([0, h, 0])) - _sample_trilinear(
            grid, p - jnp.array([0, h, 0])
        )
        gz_ = _sample_trilinear(grid, p + jnp.array([0, 0, h])) - _sample_trilinear(
            grid, p - jnp.array([0, 0, h])
        )
        g = jnp.stack([gx_, gy_, gz_], axis=1)
        n = g / jnp.maximum(jnp.linalg.norm(g, axis=1, keepdims=True), 1e-12)
        return n

    def shade(base_rgb, normal, view_dir):
        ndl = jnp.abs(jnp.sum(normal * light, axis=1))
        half = light + view_dir
        half = half / jnp.maximum(
            jnp.linalg.norm(half, axis=1, keepdims=True), 1e-12
        )
        ndh = jnp.abs(jnp.sum(normal * half, axis=1))
        spec = settings.specular * ndh**settings.shininess
        lum = settings.ambient + (1 - settings.ambient) * ndl
        return base_rgb * lum[:, None] + spec[:, None]

    view_dir = -d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-12)

    def step(k, carry):
        rgb, alpha, depth, prev_s = carry
        t = t0 + (k + jit) * dt
        p = o + d * t[:, None]
        s = _sample_trilinear(grid, p)
        live = hit & (alpha < EARLY_TERMINATION_ALPHA) & (k * dt + t0 < t1)
        trans = 1.0 - alpha

        # isosurfaces: crossing between prev_s and s
        for vi, col in zip(iso_vals, iso_cols):
            crossed = live & ((prev_s - vi) * (s - vi) < 0) & (k > 0)
            frac = jnp.where(
                jnp.abs(s - prev_s) > 1e-12, (vi - prev_s) / (s - prev_s), 0.5
            )
            t_hit = t0 + (k - 1 + jit + jnp.clip(frac, 0, 1)) * dt
            p_hit = o + d * t_hit[:, None]
            normal = grad_at(p_hit)
            base = jnp.asarray(col[:3], jnp.float32)
            shaded = shade(jnp.broadcast_to(base, (P, 3)), normal, view_dir)
            a_iso = jnp.float32(col[3])
            contrib_a = jnp.where(crossed, trans * a_iso, 0.0)
            rgb = rgb + shaded * contrib_a[:, None]
            alpha = alpha + contrib_a
            depth = jnp.where(
                crossed & (depth >= 1e30), t_hit, depth
            )
            trans = 1.0 - alpha

        if settings.enable_dvr:
            c = _sample_tf(tfj, (s - vmin) / vspan)
            # opacity correction to the reference sampling rate
            a_corr = 1.0 - jnp.power(
                jnp.maximum(1.0 - c[:, 3], 1e-7),
                tex_dt * REF_SAMPLING_RATE,
            )
            a_eff = jnp.where(live, trans * a_corr, 0.0)
            if settings.use_color_volume:
                base_rgb = _sample_trilinear_c(cvol, p)
            else:
                base_rgb = c[:, :3]
            rgb = rgb + base_rgb * a_eff[:, None]
            alpha = alpha + a_eff
            depth = jnp.where(
                (alpha > 0.5) & (depth >= 1e30), t, depth
            )
        return rgb, alpha, depth, s

    rgb0 = jnp.zeros((P, 3))
    a0 = jnp.zeros(P)
    depth0 = jnp.full(P, 1e30)
    s0 = jnp.zeros(P)
    rgb, alpha, depth, _ = jax.lax.fori_loop(
        0, nsteps, step, (rgb0, a0, depth0, s0)
    )

    bg = jnp.asarray(settings.background, jnp.float32)
    out_rgb = rgb + bg[:3] * (1.0 - alpha)[:, None] * bg[3]
    img = jnp.concatenate([out_rgb, alpha[:, None]], axis=1)
    return (
        img.reshape(H, W, 4),
        jnp.where(depth >= 1e30, jnp.inf, depth).reshape(H, W),
    )


def render_volume(
    grid,
    tf,
    model: np.ndarray,
    view: np.ndarray,
    proj: np.ndarray,
    settings: VolumeRenderSettings,
    seed: int = 0,
    color_volume=None,
    scene_depth=None,
):
    """Render a density grid → ((H,W,4) float32 RGBA, (H,W) depth).

    model: 4×4 matrix mapping the unit cube [0,1]³ (texture space) to world
    (the reference's model matrix from ±extent, density_volume.cpp:193-197).
    `scene_depth`: optional (H,W) linear view depth of the opaque scene
    rendered with the SAME view/proj — the march stops at the surface
    (entryexit.frag scene-depth clamp), so translucent volumes composite
    correctly against geometry inside them.
    """
    # hashable settings for jit: freeze tuples
    s = settings
    frozen = VolumeRenderSettings(
        width=s.width, height=s.height,
        samples_per_voxel=s.samples_per_voxel,
        enable_dvr=s.enable_dvr, enable_iso=s.enable_iso,
        iso_values=tuple(s.iso_values) if s.enable_iso else (),
        iso_colors=tuple(tuple(c) for c in s.iso_colors) if s.enable_iso else (),
        value_range=tuple(s.value_range),
        background=tuple(s.background),
        jitter=s.jitter, light_dir=tuple(s.light_dir),
        ambient=s.ambient, specular=s.specular, shininess=s.shininess,
        use_color_volume=color_volume is not None,
        clip_min=tuple(float(v) for v in s.clip_min),
        clip_max=tuple(float(v) for v in s.clip_max),
    )
    gridj = jnp.asarray(grid, jnp.float32)
    tfj = jnp.asarray(tf, jnp.float32)
    modelj = jnp.asarray(model, jnp.float32)
    viewj = jnp.asarray(view, jnp.float32)
    projj = jnp.asarray(proj, jnp.float32)
    sdj = (
        jnp.asarray(scene_depth, jnp.float32)
        if scene_depth is not None
        else None
    )
    # band the screen into ≤MAX_PIXELS_PER_PASS row strips: the fused
    # ray-march program crashes the TPU worker above ~0.3 Mpixel (gather
    # buffer blowup); banding keeps arbitrary resolutions working
    MAXP = 1 << 18
    cvolj = (
        jnp.asarray(color_volume, jnp.float32)
        if color_volume is not None
        else None
    )
    if s.width * s.height <= MAXP:
        return _render_impl(gridj, tfj, modelj, viewj, projj, seed,
                            _Frozen(frozen), 0.0, 1.0, cvolj, sdj)
    rows_per = max(1, MAXP // s.width)
    imgs, deps = [], []
    y = 0
    while y < s.height:
        h = min(rows_per, s.height - y)
        band = dataclasses.replace(frozen, height=h)
        img, dep = _render_impl(
            gridj, tfj, modelj, viewj, projj, seed, _Frozen(band),
            y / s.height, (y + h) / s.height, cvolj,
            None if sdj is None else sdj[y : y + h],
        )
        imgs.append(img)
        deps.append(dep)
        y += h
    return jnp.concatenate(imgs, axis=0), jnp.concatenate(deps, axis=0)


class _Frozen:
    """Hashable wrapper so VolumeRenderSettings can be a static jit arg."""

    def __init__(self, s: VolumeRenderSettings):
        self.s = s
        self._key = (
            s.width, s.height, s.samples_per_voxel, s.enable_dvr,
            s.enable_iso, s.iso_values, s.iso_colors, s.value_range,
            s.background, s.jitter, s.light_dir, s.ambient, s.specular,
            s.shininess, s.use_color_volume, tuple(s.clip_min),
            tuple(s.clip_max),
        )

    def __getattr__(self, k):
        return getattr(self.s, k)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, o):
        return isinstance(o, _Frozen) and self._key == o._key


def model_matrix_from_extent(extent: float | np.ndarray, center=None) -> np.ndarray:
    """Unit cube → world box spanning ±extent about `center` (the SDF grid's
    model matrix, density_volume.cpp:193-197)."""
    e = np.asarray(extent, np.float64) * np.ones(3)
    c = np.zeros(3) if center is None else np.asarray(center, np.float64)
    m = np.eye(4)
    m[:3, :3] = np.diag(2 * e)
    m[:3, 3] = c - e
    return m.astype(np.float32)
