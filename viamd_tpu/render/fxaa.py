"""FXAA 3.11 (PC quality) as a jitted image kernel.

Full-algorithm rebuild of the reference's antialiasing pass: NVIDIA FXAA
3.11 by Timothy Lottes, PC quality path, QUALITY__PRESET 12, as shipped in
/root/reference/src/shaders/fxaa.frag (luma precomputed per luma.frag:
dot(rgb, (0.299, 0.587, 0.114))) with the reference's tuning
(fxaa.frag:981-1007: subpix 0.5, edge_threshold 0.125, edge_threshold_min
0.0625). Re-derived from the published algorithm, not translated: the
per-pixel branches become masked lane math, the dynamic end-of-edge search
becomes a fixed 5-step masked march (preset 12's step schedule
1, 1.5, 2, 4, 12 — the same worst-case trip count the GPU pays inside a
divergent warp), and the half-texel bilinear taps become explicit
4-corner gathers on the padded luma plane.

Pipeline contract matches the reference (applied on the tonemapped LDR
image, after compose): (H, W, 3|4) in, same shape out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# FXAA_QUALITY__PRESET 12 (fxaa.frag:194-200)
_STEPS = (1.0, 1.5, 2.0, 4.0, 12.0)

_LUMA_W = (0.299, 0.587, 0.114)  # luma.frag


def _bilinear_gather(flat_rows, X, Y, W, H):
    """Bilinear sample rows of flat_rows ((H*W, C)) at float pixel coords
    (X, Y) arrays, clamp-to-edge — one packed gather per corner."""
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
    jax.jit, static_argnames=("subpix", "edge_threshold", "edge_threshold_min")
)
def fxaa311(
    rgb,
    subpix: float = 0.5,
    edge_threshold: float = 0.125,
    edge_threshold_min: float = 0.0625,
):
    """→ antialiased image, FXAA 3.11 PC quality, preset 12."""
    nch = rgb.shape[-1]
    rgb3 = rgb[..., :3]
    luma = rgb3 @ jnp.asarray(_LUMA_W)
    H, W = luma.shape
    lp = jnp.pad(luma, 1, mode="edge")

    lM = luma
    lN = lp[0:H, 1 : W + 1]
    lS = lp[2 : H + 2, 1 : W + 1]
    lW_ = lp[1 : H + 1, 0:W]
    lE = lp[1 : H + 1, 2 : W + 2]
    lNW = lp[0:H, 0:W]
    lNE = lp[0:H, 2 : W + 2]
    lSW = lp[2 : H + 2, 0:W]
    lSE = lp[2 : H + 2, 2 : W + 2]

    rng_max = jnp.maximum(
        lM, jnp.maximum(jnp.maximum(lN, lS), jnp.maximum(lW_, lE))
    )
    rng_min = jnp.minimum(
        lM, jnp.minimum(jnp.minimum(lN, lS), jnp.minimum(lW_, lE))
    )
    rng = rng_max - rng_min
    early_exit = rng < jnp.maximum(edge_threshold_min, rng_max * edge_threshold)

    luma_ns = lN + lS
    luma_we = lW_ + lE
    subpix_rcp_range = 1.0 / jnp.maximum(rng, 1e-12)
    subpix_nswe = luma_ns + luma_we
    edge_horz1 = -2.0 * lM + luma_ns
    edge_vert1 = -2.0 * lM + luma_we
    edge_horz2 = -2.0 * lE + (lNE + lSE)
    edge_vert2 = -2.0 * lN + (lNW + lNE)
    edge_horz3 = -2.0 * lW_ + (lNW + lSW)
    edge_vert3 = -2.0 * lS + (lSW + lSE)
    edge_horz = (
        jnp.abs(edge_horz3) + jnp.abs(edge_horz1) * 2.0 + jnp.abs(edge_horz2)
    )
    edge_vert = (
        jnp.abs(edge_vert3) + jnp.abs(edge_vert1) * 2.0 + jnp.abs(edge_vert2)
    )
    horz_span = edge_horz >= edge_vert

    # perpendicular pair: for a horizontal span the N/S neighbors, else W/E
    luma1 = jnp.where(horz_span, lN, lW_)
    luma2 = jnp.where(horz_span, lS, lE)
    gradient1 = luma1 - lM
    gradient2 = luma2 - lM
    pair1 = jnp.abs(gradient1) >= jnp.abs(gradient2)
    gradient = jnp.maximum(jnp.abs(gradient1), jnp.abs(gradient2))
    # lengthSign in pixels: +1 toward S/E, flipped to -1 when the
    # stronger gradient is on the N/W side
    length_sign = jnp.where(pair1, -1.0, 1.0)
    luma_pair = jnp.where(pair1, luma1 + lM, luma2 + lM)

    subpix_a = subpix_nswe * 2.0 + (lNW + lNE + lSW + lSE)
    subpix_b = subpix_a * (1.0 / 12.0) - lM
    subpix_c = jnp.clip(jnp.abs(subpix_b) * subpix_rcp_range, 0.0, 1.0)
    subpix_d = -2.0 * subpix_c + 3.0
    subpix_e = subpix_c * subpix_c
    subpix_f = subpix_d * subpix_e
    subpix_g = subpix_f * subpix_f
    subpix_h = subpix_g * subpix

    gradient_scaled = gradient * 0.25
    luma_mm = lM - luma_pair * 0.5
    luma_m_lt_zero = luma_mm < 0.0

    # search start: half a pixel toward the stronger-gradient side,
    # perpendicular to the span
    xs = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5, (H, W)
    )
    ys = jnp.broadcast_to(
        jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5, (H, W)
    )
    pos_bx = jnp.where(horz_span, xs, xs + length_sign * 0.5)
    pos_by = jnp.where(horz_span, ys + length_sign * 0.5, ys)
    off_x = jnp.where(horz_span, 1.0, 0.0)
    off_y = jnp.where(horz_span, 0.0, 1.0)

    luma_flat = luma.reshape(-1, 1)

    pos_nx = pos_bx - off_x * _STEPS[0]
    pos_ny = pos_by - off_y * _STEPS[0]
    pos_px = pos_bx + off_x * _STEPS[0]
    pos_py = pos_by + off_y * _STEPS[0]
    luma_end_n = (
        _bilinear_gather(luma_flat, pos_nx, pos_ny, W, H)[..., 0]
        - luma_pair * 0.5
    )
    luma_end_p = (
        _bilinear_gather(luma_flat, pos_px, pos_py, W, H)[..., 0]
        - luma_pair * 0.5
    )
    done_n = jnp.abs(luma_end_n) >= gradient_scaled
    done_p = jnp.abs(luma_end_p) >= gradient_scaled

    for step in _STEPS[1:]:
        pos_nx = jnp.where(done_n, pos_nx, pos_nx - off_x * step)
        pos_ny = jnp.where(done_n, pos_ny, pos_ny - off_y * step)
        pos_px = jnp.where(done_p, pos_px, pos_px + off_x * step)
        pos_py = jnp.where(done_p, pos_py, pos_py + off_y * step)
        ln = (
            _bilinear_gather(luma_flat, pos_nx, pos_ny, W, H)[..., 0]
            - luma_pair * 0.5
        )
        lp_ = (
            _bilinear_gather(luma_flat, pos_px, pos_py, W, H)[..., 0]
            - luma_pair * 0.5
        )
        luma_end_n = jnp.where(done_n, luma_end_n, ln)
        luma_end_p = jnp.where(done_p, luma_end_p, lp_)
        done_n = done_n | (jnp.abs(luma_end_n) >= gradient_scaled)
        done_p = done_p | (jnp.abs(luma_end_p) >= gradient_scaled)

    dst_n = jnp.where(horz_span, xs - pos_nx, ys - pos_ny)
    dst_p = jnp.where(horz_span, pos_px - xs, pos_py - ys)
    good_span_n = (luma_end_n < 0.0) != luma_m_lt_zero
    good_span_p = (luma_end_p < 0.0) != luma_m_lt_zero
    span_len = dst_p + dst_n
    direction_n = dst_n < dst_p
    dst = jnp.minimum(dst_n, dst_p)
    good_span = jnp.where(direction_n, good_span_n, good_span_p)
    pixel_offset = dst * (-1.0 / jnp.maximum(span_len, 1e-12)) + 0.5
    pixel_offset_good = jnp.where(good_span, pixel_offset, 0.0)
    pixel_offset_subpix = jnp.maximum(pixel_offset_good, subpix_h)

    pos_mx = jnp.where(
        horz_span, xs, xs + pixel_offset_subpix * length_sign
    )
    pos_my = jnp.where(
        horz_span, ys + pixel_offset_subpix * length_sign, ys
    )
    out3 = _bilinear_gather(rgb3.reshape(-1, 3), pos_mx, pos_my, W, H)
    out3 = jnp.where(early_exit[..., None], rgb3, out3)
    if nch > 3:
        return jnp.concatenate([out3, rgb[..., 3:]], axis=-1)
    return out3
