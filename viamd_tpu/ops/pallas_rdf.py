"""Pallas TPU kernel: cell-list pair-distance histogram.

The hottest kernel in the framework (BASELINE.md north star: ≥5k frames/s
RDF at 100k atoms). The XLA cell-major formulation (ops.rdf.
pair_dist_histogram_cl) reaches ~10% of VPU peak — the 4D broadcast-compare-
reduce fusion spills awkward intermediates. This kernel keeps the whole
distance→mask→bin→accumulate chain in VMEM with lane-aligned shapes:

- each grid step processes G cells × one chunk of their candidate lists;
  the G·Ka A-side atoms live in the LANE dimension (G·Ka = 128), candidates
  in the SUBLANE dimension (Cc), giving a transpose-light (Cc, 128)
  min-image distance tile;
- the B-side chunk loads as (G, Cc) and is reoriented once per step (one
  small transpose + a lane-repeat) instead of per-pair gathers;
- the histogram accumulates with a per-bin masked full-tile reduce (bins
  loop in a rolled fori; Mosaic's lane-slice alignment rules preclude the
  per-lane one-hot extraction, and the masked reduce keeps VMEM pressure at
  a handful of (Cc, 128) buffers);
- the grid is (cell-blocks × candidate-chunks); each step writes its own
  partial-histogram row, summed afterwards in XLA (no cross-step
  accumulation → safe under vmap over frames).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _hist_kernel(
    box_ref,  # SMEM (1, 3)
    ax_ref, ay_ref, az_ref, aw_ref, aid_ref,  # (1, 1, 128) A planes
    bx_ref, by_ref, bz_ref, bw_ref, bid_ref,  # (1, G, Cc) B chunk planes
    out_ref,  # (1, 1, nbins)
    *,
    ka: int,
    nbins: int,
    r_max: float,
):
    inv_bin = nbins / r_max
    Lx = box_ref[0, 0]
    Ly = box_ref[0, 1]
    Lz = box_ref[0, 2]

    def expand(ref):
        # (G, Cc) → (Cc, G) → lane-tile ×ka → (Cc, 128); lane l ↔ cell l%G
        return pltpu.repeat(ref[0].T, ka, axis=1)

    def mimg(d, L):
        return d - L * jnp.round(d / L)

    dx = mimg(expand(bx_ref) - ax_ref[0, 0][None, :], Lx)
    dy = mimg(expand(by_ref) - ay_ref[0, 0][None, :], Ly)
    dz = mimg(expand(bz_ref) - az_ref[0, 0][None, :], Lz)
    dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)  # (Cc, 128)
    w = expand(bw_ref) * aw_ref[0, 0][None, :]
    w = jnp.where(expand(bid_ref) == aid_ref[0, 0][None, :], 0.0, w)
    bin_id = jnp.where(
        dist < r_max, (dist * inv_bin).astype(jnp.int32), nbins + 1
    )

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, nbins), 1)

    def bin_body(b, hist):
        val = jnp.sum(jnp.where(bin_id == b, w, 0.0))
        return hist + jnp.where(lane_iota == b, val, 0.0)

    hist = jax.lax.fori_loop(
        0, nbins, bin_body, jnp.zeros((1, nbins), jnp.float32)
    )
    out_ref[0, :, :] = hist


@functools.partial(
    jax.jit,
    static_argnames=(
        "nbins", "r_max", "dims", "cap_a", "cap_b", "radius", "interpret",
    ),
)
def pair_dist_histogram_pl(
    x: jnp.ndarray,
    idx_a: jnp.ndarray,
    idx_b: jnp.ndarray,
    box: jnp.ndarray,
    nbins: int,
    r_max: float,
    dims: tuple,
    cap_a: int,
    cap_b: int,
    radius: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in Pallas replacement for ops.rdf.pair_dist_histogram_cl.

    Same cell-list preprocessing (ops.neighbors) and semantics: symmetric
    counting, self-pair exclusion by global id, capacity-dropped overflow.
    A-side capacity is unbounded: cells with more than 16 A atoms process
    in multiple kernel passes over 16-slot chunks of the A table, all
    sharing one set of B neighborhoods. `radius`: stencil reach in cells
    (cells must be ≥ r_max/radius wide; radius=1 → 27 rolls for dense
    systems, radius=2 → 125 rolls with tighter cells). nbins must be a
    multiple of 128.
    """
    from viamd_tpu.ops.neighbors import build_cell_list
    from viamd_tpu.ops.rdf import neighborhood_planes

    assert nbins % LANES == 0, "nbins must be a multiple of 128"
    ka = 8 if cap_a <= 8 else 16
    n_pass = -(-cap_a // ka)
    cap_a_pad = n_pass * ka
    G = LANES // ka

    xa = x[idx_a]
    xb = x[idx_b]
    cl_a = build_cell_list(xa, box, dims, cap_a_pad)
    cl_b = build_cell_list(xb, box, dims, cap_b)
    dx_, dy_, dz_ = dims
    ncells = dx_ * dy_ * dz_

    a_xyz = xa[cl_a.table]  # (ncells, cap_a_pad, 3)
    a_w = cl_a.valid.astype(jnp.float32)
    a_gid = jnp.where(cl_a.valid, idx_a[cl_a.table], -1)
    b_xyz = xb[cl_b.table]
    b_w = cl_b.valid.astype(jnp.float32)
    b_gid = jnp.where(cl_b.valid, idx_b[cl_b.table], -2)

    S = (2 * radius + 1) ** 3
    C = S * cap_b
    # candidate chunking: keep per-step tiles ≈ (512, 128)
    nchunks = max(1, -(-C // 512))
    Cc = -(-C // (nchunks * 8)) * 8
    C_tot = nchunks * Cc
    nblocks = -(-ncells // G)
    padc = nblocks * G - ncells

    def prep_a(arr):  # (ncells, ka) → (nblocks, 1, ka*G); lane = k*G + g
        arr = jnp.pad(arr, [(0, padc), (0, 0)])
        return (
            arr.reshape(nblocks, G, ka)
            .transpose(0, 2, 1)
            .reshape(nblocks, 1, ka * G)
        )

    def prep_b(arr):  # (ncells, C) → (nblocks·nchunks, G, Cc)
        arr = jnp.pad(arr, [(0, padc), (0, C_tot - C)])
        return (
            arr.reshape(nblocks, G, nchunks, Cc)
            .transpose(0, 2, 1, 3)
            .reshape(nblocks * nchunks, G, Cc)
        )

    bxp = prep_b(neighborhood_planes(b_xyz[..., 0], dims, radius))
    byp = prep_b(neighborhood_planes(b_xyz[..., 1], dims, radius))
    bzp = prep_b(neighborhood_planes(b_xyz[..., 2], dims, radius))
    bwp = prep_b(neighborhood_planes(b_w, dims, radius))
    bidp = prep_b(neighborhood_planes(b_gid, dims, radius))

    a_spec = pl.BlockSpec(
        (1, 1, LANES),
        lambda i: (i // nchunks, 0, 0),
        memory_space=pltpu.VMEM,
    )
    b_spec = pl.BlockSpec(
        (1, G, Cc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    total = jnp.zeros(nbins, jnp.float32)
    for p in range(n_pass):
        sl = slice(p * ka, (p + 1) * ka)
        partial_hists = pl.pallas_call(
            functools.partial(_hist_kernel, ka=ka, nbins=nbins, r_max=r_max),
            out_shape=jax.ShapeDtypeStruct(
                (nblocks * nchunks, 1, nbins), jnp.float32
            ),
            grid=(nblocks * nchunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                a_spec, a_spec, a_spec, a_spec, a_spec,
                b_spec, b_spec, b_spec, b_spec, b_spec,
            ],
            out_specs=pl.BlockSpec(
                (1, 1, nbins), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(
            box.reshape(1, 3).astype(jnp.float32),
            prep_a(a_xyz[:, sl, 0]),
            prep_a(a_xyz[:, sl, 1]),
            prep_a(a_xyz[:, sl, 2]),
            prep_a(a_w[:, sl]),
            prep_a(a_gid[:, sl]),
            bxp, byp, bzp, bwp, bidp,
        )
        total = total + jnp.sum(partial_hists, axis=(0, 1))
    return total
