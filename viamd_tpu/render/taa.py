"""Velocity-reprojected temporal antialiasing resolve (TAA).

Rebuild of the reference's temporal resolve
(/root/reference/src/shaders/temporal.frag:374-560, Playdead
"Temporal Reprojection Anti-Aliasing" formulation) with the shader's
shipping configuration: 3x3 closest-fragment velocity dilation
(USE_DILATION, find_closest_fragment_3x3 :158), unjittered current
sample (UNJITTER_COLORSAMPLES), rounded 3x3 neighborhood min/max
(MINMAX_3X3_ROUNDED :404-426), center-clip AABB history clamp
(clip_aabb USE_OPTIMIZATIONS :222-238), Lottes unbiased-luminance
feedback mix between u_feedback_min/max = 0.88/0.97 (:65-66,:477-481),
and the motion-blur half: neighbormax velocity, velocity-trust blend
(vel_trust_full=2, none=15 :530-536) over an 11-tap triangle-weighted
line blur with per-pixel noise offset (sample_color_motion :286-306).

TPU formulation: the per-fragment texture taps become whole-image
rolls (the 3x3 stencils), the bilinear history fetch at the
reprojected coordinate is one map_coordinates gather, and the
data-dependent neighbor picks (closest fragment, neighbor-max) are
9-way masked selects — no per-pixel control flow, everything jits to
one fused XLA graph per frame.

Static exponential accumulation for converged screenshots lives in
render/postprocess.py (taa_accumulate); this module is the
moving-camera playback path.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

_NINE = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
         (1, -1), (1, 0), (1, 1)]
_LUMA_W = (0.2125, 0.7154, 0.0721)  # temporal.frag:97


def _roll2(a, dy, dx):
    """a[y+dy, x+dx] at every pixel (texture tap at uv + (dx,dy) texels)."""
    return jnp.roll(a, (-dy, -dx), (0, 1))


def _sample_bilinear(img, yy, xx):
    """Clamped bilinear fetch of (H,W,C) at float pixel coords (H,W)."""
    from jax.scipy.ndimage import map_coordinates

    H, W = img.shape[:2]
    cy = jnp.clip(yy, 0.0, H - 1.0)
    cx = jnp.clip(xx, 0.0, W - 1.0)
    return jnp.stack(
        [
            map_coordinates(img[..., c], [cy, cx], order=1)
            for c in range(img.shape[-1])
        ],
        axis=-1,
    )


def closest_fragment_velocity(view_depth, velocity):
    """3x3 closest-fragment velocity dilation (find_closest_fragment_3x3,
    temporal.frag:158-188): each pixel takes the velocity of its nearest
    (min linear depth) 3x3 neighbor, so thin silhouettes drag their
    background neighbors with them. Returns (ss_vel (H,W,2), vs_dist)."""
    d = jnp.where(jnp.isfinite(view_depth), view_depth, 3.0e38)
    ds = jnp.stack([_roll2(d, dy, dx) for dy, dx in _NINE])
    k = jnp.argmin(ds, axis=0)
    vs_dist = jnp.min(ds, axis=0)
    ss_vel = jnp.zeros_like(velocity)
    for i, (dy, dx) in enumerate(_NINE):
        ss_vel = jnp.where(
            (k == i)[..., None], _roll2(velocity, dy, dx), ss_vel
        )
    return ss_vel, vs_dist


def clip_aabb(cmin, cmax, p, q):
    """Center-clip q toward the AABB [cmin, cmax] (clip_aabb
    USE_OPTIMIZATIONS branch, temporal.frag:222-238): only clips toward
    the box center, which is cheap and artifact-free in practice."""
    eps = 1e-7
    p_clip = 0.5 * (cmax + cmin)
    e_clip = 0.5 * (cmax - cmin) + eps
    v_clip = q - p_clip
    a_unit = jnp.abs(v_clip / e_clip)
    ma = jnp.max(a_unit, axis=-1, keepdims=True)
    return jnp.where(ma > 1.0, p_clip + v_clip / ma, q)


def _neighborhood_rounded(curr):
    """Rounded 3x3 min/max/avg (MINMAX_3X3_ROUNDED, temporal.frag:404-426):
    average of the full 3x3 stats and the 5-tap cross stats."""
    taps = [_roll2(curr, dy, dx) for dy, dx in _NINE]
    stack9 = jnp.stack(taps)
    cmin9, cmax9 = jnp.min(stack9, 0), jnp.max(stack9, 0)
    cavg9 = jnp.mean(stack9, 0)
    cross = jnp.stack([taps[i] for i in (1, 3, 4, 5, 7)])
    cmin5, cmax5 = jnp.min(cross, 0), jnp.max(cross, 0)
    cavg5 = jnp.mean(cross, 0)
    return (
        0.5 * (cmin9 + cmin5),
        0.5 * (cmax9 + cmax5),
        0.5 * (cavg9 + cavg5),
    )


def sample_color_motion(curr, ss_vel, time_seed=0.0):
    """11-tap triangle-weighted line blur along the velocity
    (sample_color_motion, temporal.frag:286-306): taps at pos0 + i*v/(2*taps)
    for i in [-taps, taps], with a per-pixel PDsrand noise offset that
    breaks the trailing-shell artifact into noise."""
    H, W = curr.shape[:2]
    taps = 5
    v = 0.5 * ss_vel
    vtap = v / taps
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    # PDsrand(uv + time) (temporal.frag:102,116): fract-sin hash -> [-1,1]
    u = xx / W + time_seed
    w_ = yy / H + time_seed
    n = jnp.sin(u * 12.9898 + w_ * 78.233) * 43758.5453
    srand = (n - jnp.floor(n)) * 2.0 - 1.0
    y0 = yy + srand * vtap[..., 1] * 0.5
    x0 = xx + srand * vtap[..., 0] * 0.5
    acc = jnp.zeros_like(curr)
    wsum = 0.0
    for i in range(-taps, taps + 1):
        wgt = float(taps - abs(i) + 1)
        acc = acc + wgt * _sample_bilinear(
            curr, y0 + i * vtap[..., 1], x0 + i * vtap[..., 0]
        )
        wsum += wgt
    return acc / wsum


@functools.partial(jax.jit, static_argnames=("motion_blur",))
def taa_resolve(
    curr,
    history,
    velocity,
    view_depth,
    jitter_px=(0.0, 0.0),
    feedback_min: float = 0.88,
    feedback_max: float = 0.97,
    motion_blur: bool = False,
    motion_scale: float = 1.0,
    time_seed: float = 0.0,
):
    """One temporal resolve step (temporal.frag main, :487-560).

    curr:      (H, W, 3) this frame's shaded color (jittered render).
    history:   (H, W, 3) previous resolve output (`to_buffer`).
    velocity:  (H, W, 2) screen-space motion in PIXELS (+x right, +y down),
               current minus previous position of the surface under the
               pixel (velocity_image() in render/postprocess.py).
    view_depth:(H, W) linear view depth (+inf background) for the
               closest-fragment velocity dilation.
    jitter_px: this frame's sub-pixel camera jitter in pixels; the current
               color is resampled at -jitter (UNJITTER_COLORSAMPLES).

    Returns (to_buffer, to_screen): `to_buffer` is the new history to feed
    the next step; `to_screen` adds the velocity-trust-blended motion blur
    (equal to to_buffer when motion_blur=False).
    """
    curr = jnp.asarray(curr)
    history = jnp.asarray(history)
    H, W = curr.shape[:2]
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )

    # velocity dilation (USE_DILATION, 3x3 nearest)
    ss_vel, _ = closest_fragment_velocity(view_depth, jnp.asarray(velocity))

    # texel0: unjittered current sample
    jx = jnp.asarray(jitter_px[0], jnp.float32)
    jy = jnp.asarray(jitter_px[1], jnp.float32)
    texel0 = _sample_bilinear(curr, yy - jy, xx - jx)

    # texel1: history fetched at the velocity-reprojected coordinate
    texel1 = _sample_bilinear(
        history, yy - ss_vel[..., 1], xx - ss_vel[..., 0]
    )

    # clamp history to the current 3x3 neighborhood (rounded min/max)
    cmin, cmax, cavg = _neighborhood_rounded(curr)
    texel1 = clip_aabb(cmin, cmax, jnp.clip(cavg, cmin, cmax), texel1)

    # Lottes unbiased-luminance feedback (temporal.frag:477-481)
    wl = jnp.asarray(_LUMA_W)
    lum0 = texel0 @ wl
    lum1 = texel1 @ wl
    unbiased = 1.0 - jnp.abs(lum0 - lum1) / jnp.maximum(
        lum0, jnp.maximum(lum1, 0.2)
    )
    k_feedback = (
        feedback_min + (feedback_max - feedback_min) * unbiased * unbiased
    )[..., None]
    to_buffer = texel0 * (1.0 - k_feedback) + texel1 * k_feedback

    if not motion_blur:
        return to_buffer, to_buffer

    # motion-blur half: neighbormax velocity, trust blend (:522-548)
    from viamd_tpu.render.postprocess import velocity_dilate

    mv = velocity_dilate(jnp.asarray(velocity)) * motion_scale
    vel_mag = jnp.sqrt(jnp.sum(mv * mv, axis=-1))
    trust_full, trust_none = 2.0, 15.0
    trust = 1.0 - jnp.clip(vel_mag - trust_full, 0.0,
                           trust_none - trust_full) / (
        trust_none - trust_full
    )
    color_motion = sample_color_motion(curr, mv, time_seed=time_seed)
    to_screen = (
        color_motion * (1.0 - trust[..., None])
        + to_buffer * trust[..., None]
    )
    return to_buffer, to_screen


@dataclass
class TAAReprojector:
    """Stateful wrapper feeding taa_resolve across a frame sequence (the
    gbuffer history attachment, src/gfx/gbuffer.h:14-44). First frame
    passes through; later frames resolve against the running history."""

    feedback_min: float = 0.88
    feedback_max: float = 0.97
    history: np.ndarray | None = field(default=None, repr=False)
    frame: int = 0

    def reset(self):
        self.history = None
        self.frame = 0

    def step(
        self,
        curr: np.ndarray,
        velocity: np.ndarray,
        view_depth: np.ndarray,
        jitter_px=(0.0, 0.0),
        motion_blur: bool = False,
        motion_scale: float = 1.0,
    ) -> np.ndarray:
        curr = np.asarray(curr, np.float32)
        if self.history is None or self.history.shape != curr.shape:
            self.history = curr.copy()
            self.frame = 1
            return curr
        to_buffer, to_screen = taa_resolve(
            curr,
            self.history,
            np.asarray(velocity, np.float32),
            np.asarray(view_depth, np.float32),
            jitter_px=(float(jitter_px[0]), float(jitter_px[1])),
            feedback_min=self.feedback_min,
            feedback_max=self.feedback_max,
            motion_blur=motion_blur,
            motion_scale=motion_scale,
            time_seed=float(self.frame % 64) / 64.0,
        )
        self.history = np.asarray(to_buffer)
        self.frame += 1
        return np.asarray(to_screen)
