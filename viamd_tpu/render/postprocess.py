"""Postprocess pipeline: tonemapping, SSAO, FXAA, TAA, DOF, compose.

Rebuild of src/gfx/postprocessing_utils.{h,cpp} (reference pass order at
:1938-2171: linearize depth → SSAO → deferred compose → DOF → tonemap →
transparency → luma → FXAA → TAA+motion blur → sharpen) and the tonemap
shader family (src/shaders/tonemap/*: passthrough, exposure-gamma,
Uncharted-2 filmic, Hejl-Dawson, ACES).

All passes are pure jitted array functions over (H, W, C) framebuffers —
the GL render-to-texture chain becomes function composition. The TAA
accumulator mirrors the 8-sample Halton jitter convergence the reference
uses for screenshots (main.cpp:6794-6820).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


# -- tonemap family (src/shaders/tonemap/*) ----------------------------------


def tonemap_passthrough(rgb):
    return jnp.clip(rgb, 0.0, 1.0)


def tonemap_exposure_gamma(rgb, exposure=1.0, gamma=2.2):
    return jnp.clip(1.0 - jnp.exp(-rgb * exposure), 0.0, 1.0) ** (1.0 / gamma)


def tonemap_aces(rgb):
    """ACES filmic fit (the raycaster's in-shader tonemap, raycaster.frag:69)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    x = jnp.maximum(rgb, 0.0)
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def _uncharted_partial(x):
    A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((x * (A * x + C * B) + D * E) / (x * (A * x + B) + D * F)) - E / F


def tonemap_uncharted2(rgb, exposure=2.0, white=11.2):
    x = _uncharted_partial(jnp.maximum(rgb, 0.0) * exposure)
    return jnp.clip(x / _uncharted_partial(jnp.asarray(white)), 0.0, 1.0) ** (
        1 / 2.2
    )


def tonemap_hejl_dawson(rgb):
    x = jnp.maximum(rgb - 0.004, 0.0)
    return (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)


TONEMAPS = {
    "passthrough": tonemap_passthrough,
    "exposure_gamma": tonemap_exposure_gamma,
    "aces": tonemap_aces,
    "uncharted2": tonemap_uncharted2,
    "hejl_dawson": tonemap_hejl_dawson,
}


# -- depth utilities ----------------------------------------------------------


def linearize_depth(depth, znear, zfar):
    """NDC/projected depth or +inf view depth → linear [0,1] view depth."""
    d = jnp.where(jnp.isfinite(depth), depth, zfar)
    return jnp.clip((d - znear) / max(zfar - znear, 1e-6), 0.0, 1.0)


def normals_from_depth(view_depth, proj):
    """Reconstruct view-space normals from a (H,W) view depth buffer
    (screen-space derivative method the SSAO pass uses)."""
    H, W = view_depth.shape
    d = jnp.where(jnp.isfinite(view_depth), view_depth, 1e6)
    px = (jnp.arange(W) + 0.5) / W * 2 - 1
    py = (jnp.arange(H) + 0.5) / H * 2 - 1
    gx, gy = jnp.meshgrid(px, py)
    vx = gx / proj[0, 0] * d
    vy = gy / proj[1, 1] * d
    p = jnp.stack([vx, vy, -d], -1)
    ddx = jnp.diff(p, axis=1, append=p[:, -1:])
    ddy = jnp.diff(p, axis=0, append=p[-1:, :])
    n = jnp.cross(ddx, ddy)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return n


# -- SSAO (src/shaders/ssao) ---------------------------------------------


@functools.partial(jax.jit, static_argnames=("radius_px", "n_samples"))
def ssao(view_depth, strength=1.0, radius_px: int = 8, n_samples: int = 8):
    """Screen-space AO from the depth buffer: horizon-style occlusion from a
    fixed spiral sample pattern (HBAO-lite; ssao.frag capability)."""
    H, W = view_depth.shape
    d = jnp.where(jnp.isfinite(view_depth), view_depth, 1e6)
    occl = jnp.zeros((H, W))
    golden = 2.399963
    for k in range(n_samples):
        ang = k * golden
        r = radius_px * (k + 1) / n_samples
        dy, dx = int(round(np.sin(ang) * r)), int(round(np.cos(ang) * r))
        shifted = jnp.roll(d, (dy, dx), axis=(0, 1))
        delta = d - shifted  # positive: neighbor is closer → occludes
        occl = occl + jnp.clip(delta / (0.05 * d + 1e-3), 0.0, 1.0) * jnp.exp(
            -jnp.abs(delta) / (d * 0.2 + 1e-3)
        )
    ao = jnp.clip(1.0 - strength * occl / n_samples, 0.0, 1.0)
    # edge-aware-ish blur (ssao/blur.frag): small box
    ao = (
        ao
        + jnp.roll(ao, 1, 0) + jnp.roll(ao, -1, 0)
        + jnp.roll(ao, 1, 1) + jnp.roll(ao, -1, 1)
    ) / 5.0
    return ao


# -- FXAA -----------------------------------------------------------------
# The full FXAA 3.11 port lives in render/fxaa.py (fxaa311) and is what the
# pipeline runs; `fxaa` below is the cheap luma-blend fallback kept for
# callers that want a single-pass approximation.

from viamd_tpu.render.fxaa import fxaa311  # noqa: E402  (pipeline pass)


@jax.jit
def fxaa(rgb):
    """Simplified FXAA: luma-gradient-directed blend (the quality knee of
    the full 3.11 kernel without the search loop)."""
    luma = rgb[..., :3] @ jnp.asarray([0.299, 0.587, 0.114])
    lN = jnp.roll(luma, 1, 0)
    lS = jnp.roll(luma, -1, 0)
    lW = jnp.roll(luma, 1, 1)
    lE = jnp.roll(luma, -1, 1)
    lmin = jnp.minimum(luma, jnp.minimum(jnp.minimum(lN, lS), jnp.minimum(lW, lE)))
    lmax = jnp.maximum(luma, jnp.maximum(jnp.maximum(lN, lS), jnp.maximum(lW, lE)))
    contrast = lmax - lmin
    edge = contrast > jnp.maximum(0.0312, lmax * 0.125)
    blur = (
        rgb
        + jnp.roll(rgb, 1, 0) + jnp.roll(rgb, -1, 0)
        + jnp.roll(rgb, 1, 1) + jnp.roll(rgb, -1, 1)
    ) / 5.0
    w = jnp.where(edge, jnp.clip(contrast * 4.0, 0.0, 0.75), 0.0)
    return rgb * (1 - w[..., None]) + blur * w[..., None]


# -- DOF ----------------------------------------------------------------------
# The full single-pass bokeh DOF port (dof/dof.frag) lives in render/bokeh.py
# (bokeh_dof) and is what the pipeline runs; `depth_of_field` below is the
# cheap ring-blur fallback kept for callers that want a fast approximation.

from viamd_tpu.render.bokeh import bokeh_dof  # noqa: E402  (pipeline pass)


@functools.partial(jax.jit, static_argnames=("max_radius",))
def depth_of_field(rgb, view_depth, focus_depth, focus_scale=0.05,
                   max_radius: int = 6):
    """Gather DOF: blend widening ring blurs by circle of confusion."""
    d = jnp.where(jnp.isfinite(view_depth), view_depth, 1e6)
    coc = jnp.clip(
        jnp.abs(d - focus_depth) / (focus_depth * focus_scale + 1e-6), 0, 1
    )
    out = rgb
    acc = rgb
    taps = 1.0
    for r in range(1, max_radius + 1):
        ring = (
            jnp.roll(rgb, (r, 0), (0, 1)) + jnp.roll(rgb, (-r, 0), (0, 1))
            + jnp.roll(rgb, (0, r), (0, 1)) + jnp.roll(rgb, (0, -r), (0, 1))
            + jnp.roll(rgb, (r, r), (0, 1)) + jnp.roll(rgb, (-r, -r), (0, 1))
            + jnp.roll(rgb, (r, -r), (0, 1)) + jnp.roll(rgb, (-r, r), (0, 1))
        ) / 8.0
        t = jnp.clip(coc * max_radius - (r - 1), 0.0, 1.0)[..., None]
        acc = acc + ring * t
        taps = taps + t
    return acc / taps


# -- TAA (temporal.frag capability) -------------------------------------------


@dataclass
class TAAState:
    history: np.ndarray | None = None
    count: int = 0


def taa_accumulate(state: TAAState, rgb: np.ndarray, alpha=0.1) -> np.ndarray:
    """Exponential history blend; feed with per-frame Halton-jittered renders
    (camera.taa_jitter_sequence) — converges like the reference's screenshot
    accumulation (main.cpp:6794-6820)."""
    rgb = np.asarray(rgb)
    if state.history is None or state.history.shape != rgb.shape:
        state.history = rgb.copy()
        state.count = 1
        return state.history
    # converging average for the first samples, exponential after
    w = max(alpha, 1.0 / (state.count + 1))
    state.history = state.history * (1 - w) + rgb * w
    state.count += 1
    return state.history


# -- motion blur (temporal.frag + velocity/blit_tilemax/neighbormax) ----------


@functools.partial(jax.jit, static_argnames=("tile",))
def velocity_dilate(velocity: jnp.ndarray, tile: int = 20) -> jnp.ndarray:
    """Tile-max + 3×3 neighbor-max dominant velocity (the reference's
    blit_tilemax/blit_neighbormax passes): per `tile`² block keep the
    largest-magnitude velocity, then dilate across neighboring tiles so
    fast movers smear over tile borders. velocity: (H, W, 2) in pixels."""
    H, W, _ = velocity.shape
    Ht, Wt = -(-H // tile), -(-W // tile)
    pad_h, pad_w = Ht * tile - H, Wt * tile - W
    v = jnp.pad(velocity, ((0, pad_h), (0, pad_w), (0, 0)))
    v = v.reshape(Ht, tile, Wt, tile, 2).transpose(0, 2, 1, 3, 4)
    v = v.reshape(Ht, Wt, tile * tile, 2)
    mag = jnp.sum(v * v, axis=-1)
    best = jnp.argmax(mag, axis=-1)
    tmax = jnp.take_along_axis(v, best[..., None, None], axis=2)[:, :, 0]
    # neighbor max across the 3×3 tile neighborhood
    nmag = jnp.sum(tmax * tmax, axis=-1)
    cand_v, cand_m = [], []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            cand_v.append(jnp.roll(tmax, (dy, dx), (0, 1)))
            cand_m.append(jnp.roll(nmag, (dy, dx), (0, 1)))
    cv = jnp.stack(cand_v)  # (9, Ht, Wt, 2)
    cm = jnp.stack(cand_m)
    pick = jnp.argmax(cm, axis=0)
    nmax = jnp.take_along_axis(
        cv, pick[None, ..., None], axis=0
    )[0]
    # back to pixel resolution
    full = jnp.repeat(jnp.repeat(nmax, tile, axis=0), tile, axis=1)
    return full[:H, :W]


@functools.partial(jax.jit, static_argnames=("n_taps", "tile"))
def motion_blur(
    rgb: jnp.ndarray,
    velocity: jnp.ndarray,
    scale: float = 1.0,
    n_taps: int = 8,
    tile: int = 20,
) -> jnp.ndarray:
    """Per-pixel motion blur along the dilated dominant velocity
    (temporal.frag's motion-blur half; the TAA half is taa_accumulate).
    Taps sample bilinearly along ±velocity·scale."""
    from jax.scipy.ndimage import map_coordinates

    H, W, _ = rgb.shape
    vdom = velocity_dilate(velocity, tile=tile) * scale
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    acc = rgb
    wsum = 1.0
    for k in range(1, n_taps + 1):
        t = (k / (n_taps + 1) - 0.5)  # taps in [-0.5, 0.5] around the pixel
        cy = jnp.clip(yy + vdom[..., 1] * t, 0, H - 1)
        cx = jnp.clip(xx + vdom[..., 0] * t, 0, W - 1)
        tap = jnp.stack(
            [
                map_coordinates(rgb[..., c], [cy, cx], order=1)
                for c in range(rgb.shape[-1])
            ],
            axis=-1,
        )
        acc = acc + tap
        wsum += 1.0
    return acc / wsum


def velocity_image(
    pick: np.ndarray,
    screen_xy: np.ndarray,
    prev_screen_xy: np.ndarray,
) -> np.ndarray:
    """(H, W, 2) per-pixel velocity from the picking buffer: each pixel
    inherits its atom's screen-space motion (current − previous projected
    position, pixels). pick: (H, W) int32 atom ids, −1 = background (the
    reference's velocity gbuffer attachment, gbuffer.h:14-44)."""
    import numpy as _np

    pick = _np.asarray(pick)
    ids = _np.maximum(pick, 0)
    vel = _np.asarray(screen_xy)[ids] - _np.asarray(prev_screen_xy)[ids]
    vel[pick < 0] = 0.0
    return vel.astype(_np.float32)


# -- sharpen (the final pass) --------------------------------------------------


@jax.jit
def sharpen(rgb, amount=0.3):
    blur = (
        rgb * 4
        + jnp.roll(rgb, 1, 0) + jnp.roll(rgb, -1, 0)
        + jnp.roll(rgb, 1, 1) + jnp.roll(rgb, -1, 1)
    ) / 8.0
    return jnp.clip(rgb + (rgb - blur) * amount, 0.0, 1.0)


# -- the pipeline (postprocess_pipeline::execute, :1938) -----------------------


@dataclass
class PostprocessSettings:
    tonemap: str = "aces"
    exposure: float = 1.0
    gamma: float = 2.2
    enable_ssao: bool = True
    ssao_strength: float = 1.0
    # HBAO controls (reference defaults, viamd.h:1232-1237) — used when a
    # projection matrix is passed to execute(); falls back to the
    # depth-only `ssao` pass otherwise.
    ssao_intensity: float = 6.0
    ssao_radius: float = 6.0
    ssao_bias: float = 0.1
    enable_fxaa: bool = True
    enable_dof: bool = False
    focus_depth: float = 10.0
    focus_scale: float = 10.0
    dof_max_blur: float = 15.0  # MAX_BLUR_SIZE (dof.frag:16)
    enable_sharpen: bool = False
    enable_motion_blur: bool = False
    motion_blur_scale: float = 1.0
    background: tuple = (0.05, 0.05, 0.08)


def execute(
    rgba: np.ndarray,
    view_depth: np.ndarray,
    settings: PostprocessSettings = PostprocessSettings(),
    velocity: np.ndarray | None = None,
    proj: np.ndarray | None = None,
    ortho: bool = False,
) -> np.ndarray:
    """Run the pass chain on a rendered frame → display-ready (H,W,3).

    `velocity`: optional (H,W,2) per-pixel screen velocity (pixels) for the
    motion-blur pass — build one from the picking buffer with
    velocity_image().
    `proj`: optional 4x4 projection matrix (render/camera.py). When given,
    the AO pass is the full normals-aware mip-sampled HBAO
    (render/hbao.py); without it the depth-only `ssao` approximation runs."""
    rgb = jnp.asarray(rgba[..., :3])
    a = jnp.asarray(rgba[..., 3])
    depth = jnp.asarray(view_depth)
    if settings.enable_ssao:
        if proj is not None:
            from viamd_tpu.render.hbao import hbao

            ao = hbao(
                depth, proj,
                intensity=settings.ssao_intensity * settings.ssao_strength,
                radius=settings.ssao_radius,
                bias=settings.ssao_bias,
                ortho=ortho,
            )
        else:
            ao = ssao(depth, settings.ssao_strength)
        rgb = rgb * ao[..., None]
    if settings.enable_motion_blur and velocity is not None:
        rgb = motion_blur(
            rgb, jnp.asarray(velocity), scale=settings.motion_blur_scale
        )
    if settings.enable_dof:
        rgb = bokeh_dof(
            rgb, depth,
            focus_depth=float(settings.focus_depth),
            focus_scale=float(settings.focus_scale),
            max_blur=float(settings.dof_max_blur),
        )
    tm = TONEMAPS[settings.tonemap]
    if settings.tonemap == "exposure_gamma":
        rgb = tm(rgb, settings.exposure, settings.gamma)
    else:
        rgb = tm(rgb * settings.exposure)
    bg = jnp.asarray(settings.background)
    rgb = rgb * a[..., None] + bg * (1 - a[..., None])
    if settings.enable_fxaa:
        rgb = fxaa311(rgb)
    if settings.enable_sharpen:
        rgb = sharpen(rgb)
    return np.asarray(jnp.clip(rgb, 0, 1))
