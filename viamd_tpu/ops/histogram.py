"""Scatter-free histogram primitives.

TPUs have no fast scatter-add; the reference's CPU histogram loops
(compute_histogram_masked, /root/reference/src/main.cpp:172-230, and the
per-frame RDF/SDF accumulation inside md_script eval) are rebuilt here as:

- compare-CDF histograms: weighted counts below each bin edge, reduced on the
  VPU with full producer fusion (no (P × nbins) one-hot ever materializes),
  then differenced — ideal for small-to-moderate bin counts;
- sorted segment-sum histograms: for very large flat id spaces (density
  volumes), sort ids then `segment_sum(..., indices_are_sorted=True)`.

All functions are jittable/vmappable; accumulation across frames/shards is a
plain `psum`-able add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def histogram_cdf(
    values: jnp.ndarray,
    weights: jnp.ndarray,
    nbins: int,
    vmin: float | jnp.ndarray,
    vmax: float | jnp.ndarray,
) -> jnp.ndarray:
    """Weighted histogram of `values` into nbins over [vmin, vmax).

    values/weights: (...,) same shape, reduced over ALL axes → (nbins,).
    Out-of-range values fall into the end bins only if inside [vmin, vmax);
    outside values get zero weight (matching the masked re-binning behavior
    of the reference's compute_histogram_masked).
    """
    v = values.reshape(-1)
    w = weights.reshape(-1).astype(jnp.float32)
    span = jnp.maximum(vmax - vmin, 1e-30)
    inside = (v >= vmin) & (v < vmax)
    w = jnp.where(inside, w, 0.0)
    t = (v - vmin) / span  # in [0,1)
    edges = jnp.arange(1, nbins + 1, dtype=jnp.float32) / nbins  # upper edges
    below = (t[:, None] < edges[None, :]).astype(jnp.float32)  # fused into sum
    cdf = jnp.sum(below * w[:, None], axis=0)  # (nbins,)
    return jnp.concatenate([cdf[:1], jnp.diff(cdf)])


def histogram_bins(
    bin_ids: jnp.ndarray, weights: jnp.ndarray, nbins: int
) -> jnp.ndarray:
    """Weighted histogram of integer bin ids (−1 or ≥nbins = dropped).

    Compare-based (id == k) reduction — fused, scatter-free. Use for
    nbins ≲ 1024; use `histogram_segment` beyond.
    """
    ids = bin_ids.reshape(-1)
    w = weights.reshape(-1).astype(jnp.float32)
    ks = jnp.arange(nbins, dtype=bin_ids.dtype)
    eq = (ids[:, None] == ks[None, :]).astype(jnp.float32)
    return jnp.sum(eq * w[:, None], axis=0)


def histogram_segment(
    bin_ids: jnp.ndarray, weights: jnp.ndarray, nbins: int
) -> jnp.ndarray:
    """Weighted histogram via sort + sorted segment-sum (large id spaces).

    The density-volume path: flat voxel ids can number 128³ ≈ 2M, far beyond
    compare-based binning. Sorting costs O(P log P) on the TPU's bitonic
    sorter, after which segment_sum becomes a contiguous reduction.
    """
    ids = bin_ids.reshape(-1)
    w = weights.reshape(-1).astype(jnp.float32)
    order = jnp.argsort(ids)
    ids_s = ids[order]
    w_s = w[order]
    return jax.ops.segment_sum(
        w_s, ids_s, num_segments=nbins, indices_are_sorted=True
    )


def resample_histogram(hist: jnp.ndarray, new_bins: int) -> jnp.ndarray:
    """Conservative rebin of a histogram to a different bin count
    (the export resampling of draw_property_export_window,
    /root/reference/src/main.cpp:5822-5831)."""
    n = hist.shape[-1]
    # distribute each source bin's mass over overlapping target bins
    src_edges = jnp.linspace(0.0, 1.0, n + 1)
    dst_edges = jnp.linspace(0.0, 1.0, new_bins + 1)
    lo = jnp.maximum(src_edges[None, :-1], dst_edges[:-1, None])
    hi = jnp.minimum(src_edges[None, 1:], dst_edges[1:, None])
    overlap = jnp.maximum(hi - lo, 0.0) * n  # fraction of each source bin
    return hist @ overlap.T
