"""Bokeh depth-of-field: the reference's single-pass scatter-as-gather DOF.

Full-algorithm rebuild of /root/reference/src/shaders/dof/dof.frag (the
Tuxedolabs single-pass bokeh; the half-res prepass feeds only the #ifdef
APPROX path which the reference does NOT compile, so the full-res
golden-angle spiral IS the shipped algorithm) with the reference defaults
focus_depth 10, focus_scale 10 (viamd.h:1256-1257) and apply_dof's wiring
(src/gfx/postprocessing_utils.cpp:1516-1540).

Semantics kept: signed circle-of-confusion clamp((1/focus - 1/depth) *
scale, -1, 1) scaled by MAX_BLUR_SIZE=15 px; golden-angle spiral with
radius schedule r += RAD_SCALE/r from RAD_SCALE=1.5; per-sample coc
smoothstep gate; separate near/far layers with depth-gated weights; near
layer composited over far by its presence; per-pixel random spiral phase
and output dither from the shader's sin-hash rand().

TPU formulation: the radius schedule is data-independent, so the GPU's
per-fragment dynamic loop becomes a STATIC unrolled tap schedule (~74
taps, the worst case every divergent warp pays); per-pixel adaptive
max_radius becomes a lane mask over taps. Color+depth are packed into one
(H*W, 4) row table so each tap is a single bilinear packed gather
(4 corner row-gathers) — the gather-cost pattern from ops/sdf.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN_ANGLE = 2.39996323
MAX_BLUR_SIZE = 15.0
RAD_SCALE = 1.5


@functools.lru_cache(maxsize=None)
def _radius_schedule(max_blur: float = MAX_BLUR_SIZE):
    """The shader's data-independent spiral radii: r=1.5; r += 1.5/r
    while r < max_blur (dof.frag:72-99; 74 taps at the reference's
    MAX_BLUR_SIZE)."""
    radii = []
    r = RAD_SCALE
    while r < max_blur:
        radii.append(r)
        r += RAD_SCALE / r
    return tuple(radii)


def _glsl_rand(x, y):
    """fract(sin(dot(n, (12.9898, 78.233))) * 43758.5453) (dof.frag:22)."""
    s = jnp.sin(x * 12.9898 + y * 78.233) * 43758.5453
    return s - jnp.floor(s)


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _bilinear_rows(flat_rows, X, Y, W, H):
    """Bilinear sample of packed rows ((H*W, C)) at float pixel-center
    coords, clamp-to-edge; one gather per corner."""
    x0 = jnp.floor(X - 0.5)
    y0 = jnp.floor(Y - 0.5)
    fx = (X - 0.5 - x0)[..., None]
    fy = (Y - 0.5 - y0)[..., None]
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    v00 = flat_rows[y0 * W + x0]
    v10 = flat_rows[y0 * W + x1]
    v01 = flat_rows[y1 * W + x0]
    v11 = flat_rows[y1 * W + x1]
    top = v00 * (1 - fx) + v10 * fx
    bot = v01 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


@functools.partial(
    jax.jit,
    static_argnames=("focus_depth", "focus_scale", "time", "dither",
                     "max_blur"),
)
def bokeh_dof(
    rgb,
    view_depth,
    focus_depth: float = 10.0,
    focus_scale: float = 10.0,
    time: float = 0.0,
    dither: bool = True,
    max_blur: float = MAX_BLUR_SIZE,
):
    """(H,W,3|4) color + (H,W) linear view depth → bokeh-blurred color.

    `time` animates the spiral phase + dither exactly like the shader's
    u_time (pass the frame time for temporal variation; 0 = static).
    `max_blur` caps the blur radius in pixels (reference: 15; smaller
    values shorten the static tap schedule ~linearly — compile-time
    lever for tests/previews).
    """
    nch = rgb.shape[-1]
    rgb3 = jnp.asarray(rgb)[..., :3]
    H, W = view_depth.shape
    d = jnp.where(jnp.isfinite(view_depth), view_depth, 1e8)
    d = jnp.maximum(d, 1e-6)

    u = jnp.broadcast_to(
        (jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5) / W, (H, W))
    v = jnp.broadcast_to(
        (jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5) / H, (H, W))

    def signed_coc(depth):
        return jnp.clip(
            (1.0 / focus_depth - 1.0 / depth) * focus_scale, -1.0, 1.0)

    center_coc = signed_coc(d)
    center_radius = jnp.abs(center_coc) * max_blur
    max_radius = jnp.clip(center_radius * 1.35 + 1.0, 2.0, max_blur)

    # packed (rgb, depth) rows: ONE gather per tap corner
    table = jnp.concatenate([rgb3, d[..., None]], axis=-1).reshape(-1, 4)

    near_center = center_coc < 0.0
    near_sum = jnp.where(near_center[..., None], rgb3, 0.0)
    far_sum = jnp.where(near_center[..., None], 0.0, rgb3)
    near_w = jnp.where(near_center, 1.0, 0.0)
    far_w = jnp.where(near_center, 0.0, 1.0)
    near_occ = jnp.zeros((H, W))

    ang0 = _glsl_rand(u + time, v + time) * 2.0 * np.pi
    xs = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5, (H, W))
    ys = jnp.broadcast_to(
        jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5, (H, W))

    for k, radius in enumerate(_radius_schedule(max_blur)):
        ang = ang0 + k * GOLDEN_ANGLE
        tx = xs + jnp.cos(ang) * radius
        ty = ys + jnp.sin(ang) * radius
        s = _bilinear_rows(table, tx, ty, W, H)
        s_rgb, s_d = s[..., :3], jnp.maximum(s[..., 3], 1e-6)
        s_coc = signed_coc(s_d)
        s_radius = jnp.abs(s_coc) * max_blur
        coc_w = _smoothstep(radius - 0.5, radius + 0.5, s_radius)
        active = radius < max_radius  # per-pixel dynamic trip count
        coc_w = jnp.where(active, coc_w, 0.0)

        is_near = s_coc < 0.0
        gate_n = _smoothstep(0.0, 0.004, d - s_d)
        w_n = coc_w * (0.2 + 0.8 * gate_n) * is_near
        gate_f = _smoothstep(0.0, 0.004, s_d - d)
        w_f = coc_w * (0.15 + 0.85 * gate_f) * (~is_near)

        near_sum = near_sum + s_rgb * w_n[..., None]
        near_w = near_w + w_n
        near_occ = near_occ + w_n
        far_sum = far_sum + s_rgb * w_f[..., None]
        far_w = far_w + w_f

    near_color = jnp.where(
        (near_w > 0.0)[..., None], near_sum / jnp.maximum(near_w, 1e-12)[..., None], rgb3)
    far_color = jnp.where(
        (far_w > 0.0)[..., None], far_sum / jnp.maximum(far_w, 1e-12)[..., None], rgb3)
    near_presence = near_occ / (near_w + far_w + 1e-5)
    near_alpha = jnp.clip(
        jnp.maximum(jnp.where(near_center, 1.0, 0.0), near_presence), 0.0, 1.0)
    out = far_color + (near_color - far_color) * near_alpha[..., None]

    # in-focus early exit (dof.frag:52)
    out = jnp.where((center_radius < 0.5)[..., None], rgb3, out)

    if dither:
        # rand4(tc + u_time)/20 banding dither (dof.frag:151-153)
        s = jnp.sin(
            (u + time) * 12.9898 + (v + time) * 78.233)[..., None] * jnp.asarray(
            [43758.5453, 28001.8384, 50849.4141])
        out = out + (s - jnp.floor(s)) / 20.0

    if nch > 3:
        return jnp.concatenate([out, jnp.asarray(rgb)[..., 3:]], axis=-1)
    return out
