"""Pallas TPU kernel: cell-list pair-distance histogram.

The hottest kernel in the framework (BASELINE.md north star: ≥5k frames/s
RDF at 100k atoms). The XLA cell-major formulation (ops.rdf.
pair_dist_histogram_cl) reaches ~10% of VPU peak — the 4D broadcast-compare-
reduce fusion spills awkward intermediates. This kernel keeps the whole
distance→mask→bin→accumulate chain in VMEM with lane-aligned shapes:

- each grid step processes G cells × one chunk of their candidate lists;
  the G·Ka A-side atoms live in the SUBLANE dimension (G·Ka = 128, prepared
  as (128,1) columns in XLA), candidates in the LANE dimension (Cc),
  giving a (128, Cc) min-image distance tile with ZERO in-kernel
  transposes/relayouts (B planes expand by a cheap sublane repeat);
- the histogram accumulates per-bin into rows of an (nbins, Cc) VMEM
  scratch — sublane reductions only inside the bins loop, one lane
  reduction at the end, leaving as an (nbins, 1) column;
- the grid is (cell-blocks × candidate-chunks); each step writes its own
  partial-histogram column, summed afterwards in XLA (no cross-step
  accumulation → safe under vmap over frames).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of a (3,3) basis — jnp.linalg.inv /
    tiny matmuls are pathological on this backend (CLAUDE.md)."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + d * B + g * C
    rows = jnp.stack(
        [jnp.stack([A, B, C]), jnp.stack([D, E, F]), jnp.stack([G, H, I])]
    )
    return rows / det


def _hist_kernel(
    *refs,
    ka: int,
    nbins: int,
    r_max: float,
    nchunks: int,
    cap_b: int,
    symmetric: bool,
    M: int,
    g_lo: int = 0,
    a_lo: int = 0,
    triclinic: bool = False,
    bin_mode: str = "block",
    use_ids: bool = True,
    n_pass_k: int = 1,
):
    """Pair tile orientation: A atoms in SUBLANES ((128,1) columns prepared
    in XLA), B candidates in LANES. The B planes expand with a sublane
    pltpu.repeat (cheap copy) — NO in-kernel transposes/relayouts anywhere:
    the earlier orientation ((Cc,128) with A in lanes) needed a (G,Cc)→(Cc,G)
    Mosaic relayout per plane per step (5 transposes × grid ≈ 2/3 of kernel
    time), and the output leaves as an (nbins,1) COLUMN so the final
    sublane vector never crosses into lanes. Each step processes M
    cell-blocks (fixed per-step cost dominates at ~1000 steps).

    refs = (box_ref, occ_ref, <A columns>, <B planes>, out_ref, scratch):
      box_ref   SMEM (1, 3) extents / (1, 9) triclinic basis
      occ_ref   SMEM (nblocks,) int32 max A-cell occupancy per cell block
      A columns (1, M·128, 1): x, y, z [, id int32]  (id only if use_ids)
      B planes  (1, M·G, Cc):  x, y, z [, id int32]

    PRE-SHIFTED planes: the B coordinate planes arrive shifted by the
    stencil offset's periodic wrap (neighborhood_planes wrap_shift), so
    displacements are plain subtractions — no per-slot min-image round.
    Validity rides in coordinate SENTINELS (invalid A ≪ 0, invalid B ≫ 0
    → pair distance far beyond r_max, binned out of range), so classes
    whose offsets exclude (0,0,0) need no id planes at all: a slot pairs
    atoms from two DISTINCT cells, which can never be the same atom.
    `use_ids` classes (containing the (0,0,0) self-cell offset, when the
    selections can share atoms) carry id planes purely for self/duplicate-
    pair exclusion ON THE SELF-CELL LANES (chunk 0's first cap_b lanes):
    symmetric mode keeps each unordered pair once there (bid > aid),
    overlap mode drops exact self-pairs (bid != aid); non-self lanes in
    the same class need no id test (distinct cells). NOTE: splitting the
    (0,0,0) offset into its own id-carrying pallas_call so the rest runs
    id-free measured net-negative end-to-end (the second grid launch per
    pass costs more than two dropped planes save); classes stay merged.
    Same-day A/B vs the always-id kernel: 214.8 vs 203.0 headline f/s
    (cross-day headline spread is ±15% tunnel/chip noise — see
    docs/PERF.md).
    """
    box_ref, occ_ref = refs[0], refs[1]
    if use_ids:
        (ax_ref, ay_ref, az_ref, aid_ref,
         bx_ref, by_ref, bz_ref, bid_ref,
         out_ref, scratch_ref) = refs[2:]
    else:
        (ax_ref, ay_ref, az_ref,
         bx_ref, by_ref, bz_ref,
         out_ref, scratch_ref) = refs[2:]
    pid = pl.program_id(0)  # hoisted: program_id inside a pl.when branch
    occ = occ_ref[pid // nchunks]  # breaks interpret mode

    if bin_mode == "mxu":
        # MERGED A-pass loop (mxu mode only): all `n_pass_k` A passes run
        # inside ONE grid sweep, so each step's B planes are DMA'd and
        # sublane-expanded ONCE instead of once per pass (~8× less plane
        # traffic at the headline config, where n_pass=8). The r2 "merged
        # A-passes" negative verdict (docs/PERF.md) measured the BLOCK bin
        # loop, whose per-slot (nbins, Cc) scratch read-modify-write
        # dominated; here each pass accumulates an (NC, 16) register value
        # and issues one tiny out_ref add, and dead passes (block max
        # occupancy ≤ the pass's first A slot) skip their whole slot block
        # via the same pl.when occupancy gate the per-pass sweep used.
        NC = nbins // 16
        out_ref[0, :, :] = jnp.zeros_like(out_ref[0])
        inv_bin = nbins / r_max
        if triclinic:
            B = [box_ref[0, k] for k in range(9)]
        if use_ids:
            lane1 = jax.lax.broadcasted_iota(
                jnp.int32, (1, bx_ref.shape[2]), 1
            )
            thresh = jnp.where(pid % nchunks == 0, cap_b, 0)
            not_self1 = lane1 >= thresh  # (1, Cc) row
        for m in range(M):

            def expand(ref, m=m):
                # (G, Cc) → sublane-tile ×ka → (G·ka=128, Cc)
                return pltpu.repeat(
                    ref[0, m * (128 // ka) : (m + 1) * (128 // ka)],
                    ka, axis=0,
                )

            bxe = expand(bx_ref)
            bye = expand(by_ref)
            bze = expand(bz_ref)
            bide = expand(bid_ref) if use_ids else None
            for p in range(n_pass_k):

                @pl.when(occ > a_lo + p * ka)
                def _pass(p=p, m=m, bxe=bxe, bye=bye, bze=bze, bide=bide):
                    asl = slice((p * M + m) * 128, (p * M + m + 1) * 128)
                    if triclinic:
                        f0 = bxe - ax_ref[0, asl]
                        f1 = bye - ay_ref[0, asl]
                        f2 = bze - az_ref[0, asl]
                        dx = f0 * B[0] + f1 * B[3] + f2 * B[6]
                        dy = f0 * B[1] + f1 * B[4] + f2 * B[7]
                        dz = f0 * B[2] + f1 * B[5] + f2 * B[8]
                    else:
                        dx = bxe - ax_ref[0, asl]
                        dy = bye - ay_ref[0, asl]
                        dz = bze - az_ref[0, asl]
                    dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                    # no out-of-range select needed: dist ≥ r_max gives
                    # bin_id ≥ nbins → blk_c ≥ NC → no coarse one-hot row,
                    # so the slot contributes nothing to C @ Fᵀ (sentinel
                    # magnitudes stay well inside int32 after the cast)
                    bin_id = (dist * inv_bin).astype(jnp.int32)
                    blk_c = bin_id >> 4
                    if use_ids:
                        aid = aid_ref[0, asl]
                        dedupe = (bide > aid) if symmetric else (bide != aid)
                        pair_ok = not_self1 | dedupe
                        sub_c = jnp.where(pair_ok, bin_id & 15, 16)
                    else:
                        sub_c = bin_id & 15
                    hist_acc = jnp.zeros((NC, 16), jnp.float32)
                    rows = dist.shape[0]
                    Cc_ = dist.shape[1]
                    CHUNK_L = min(256, Cc_)
                    for c0 in range(0, Cc_, CHUNK_L):
                        cw = min(CHUNK_L, Cc_ - c0)
                        Sc = rows * cw
                        blkf = jnp.reshape(blk_c[:, c0 : c0 + cw], (1, Sc))
                        subf = jnp.reshape(sub_c[:, c0 : c0 + cw], (1, Sc))
                        Cm = (
                            blkf
                            == jax.lax.broadcasted_iota(
                                jnp.int32, (NC, Sc), 0
                            )
                        ).astype(jnp.bfloat16)
                        Fm = (
                            subf
                            == jax.lax.broadcasted_iota(
                                jnp.int32, (16, Sc), 0
                            )
                        ).astype(jnp.bfloat16)
                        hist_acc = hist_acc + jax.lax.dot_general(
                            Cm, Fm, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    out_ref[0, :, :] = out_ref[0, :, :] + hist_acc

        return

    @pl.when(occ <= a_lo)
    def _skip():
        # This A-slot pass is empty for every cell of this block (max
        # occupancy ≤ the pass's first slot) — contributions would all be
        # invalid. Also skips fully empty blocks (vacuum, padding) in the
        # base pass.
        out_ref[0, :, :] = jnp.zeros_like(out_ref[0])

    @pl.when(occ > a_lo)
    def _run():
        inv_bin = nbins / r_max
        if triclinic:
            # box_ref is the (1, 9) row-major basis; displacements arrive
            # in FRACTIONAL space pre-shifted (no wrap round needed), and
            # the cartesian conversion is the expanded row-vector product
            B = [box_ref[0, k] for k in range(9)]
        # ortho: the extents are baked into the pre-shifted planes — the
        # kernel never reads box_ref

        zero_bf = jnp.bfloat16(0)
        if use_ids:
            # self-cell lanes = chunk 0's first cap_b candidate slots (the
            # (0,0,0) offset leads its class); every other lane pairs two
            # DISTINCT cells where the same atom cannot appear twice
            lane1 = jax.lax.broadcasted_iota(
                jnp.int32, (1, bx_ref.shape[2]), 1
            )
            thresh = jnp.where(pid % nchunks == 0, cap_b, 0)
            not_self1 = lane1 >= thresh  # (1, Cc) row, broadcasts over rows
        for m in range(M):

            def expand(ref):
                # (G, Cc) → sublane-tile ×ka → (G·ka=128, Cc); sublane s ↔ s%G
                return pltpu.repeat(
                    ref[0, m * (128 // ka) : (m + 1) * (128 // ka)], ka, axis=0
                )

            asl = slice(m * 128, (m + 1) * 128)
            if triclinic:
                f0 = expand(bx_ref) - ax_ref[0, asl]
                f1 = expand(by_ref) - ay_ref[0, asl]
                f2 = expand(bz_ref) - az_ref[0, asl]
                dx = f0 * B[0] + f1 * B[3] + f2 * B[6]
                dy = f0 * B[1] + f1 * B[4] + f2 * B[7]
                dz = f0 * B[2] + f1 * B[5] + f2 * B[8]
            else:
                dx = expand(bx_ref) - ax_ref[0, asl]
                dy = expand(by_ref) - ay_ref[0, asl]
                dz = expand(bz_ref) - az_ref[0, asl]
            dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)  # (128, Cc)
            if use_ids:
                aid = aid_ref[0, asl]  # (128, 1) int32
                bid = expand(bid_ref)  # (128, Cc) int32
                # id test only matters on the self-cell lanes; invalid
                # slots are already out of range via coordinate sentinels
                dedupe = (bid > aid) if symmetric else (bid != aid)
                pair_ok = not_self1 | dedupe
            bin_id = jnp.where(
                dist < r_max, (dist * inv_bin).astype(jnp.int32), nbins + 16
            )
            # select+accumulate rows in bf16 — EXACT (per-(bin, lane) partial
            # counts ≤ 128 sublanes are integers ≤ 256, all exactly
            # representable) and 2×-packed on the VPU; the compare stays
            # int32 (the target VPU has no bf16 compare). Cross-m
            # accumulation happens in the f32 scratch (4·128 could exceed
            # bf16's exact range). No-id classes count the bin-equality
            # compare directly (cast, no select) — invalid slots carry
            # sentinel coordinates, so their bin_id is out of range and
            # never matches.
            if use_ids:
                w_bf = pair_ok.astype(jnp.bfloat16)

            # Dynamic bin-range bounds: the tile's valid-pair distance
            # min/max determine which 16-bin blocks can receive any count.
            # Excluded-volume chemistry empties the low bins (water O–O
            # min ≈ 2.4 Å), and sparse selections empty most tiles
            # entirely — both skip at block granularity, exactly.
            sentinel_lo = jnp.float32(2.0 * r_max)
            d_ok = (dist < r_max) if not use_ids else (
                pair_ok & (dist < r_max)
            )
            d_lo = jnp.min(jnp.where(d_ok, dist, sentinel_lo))
            d_hi = jnp.max(jnp.where(d_ok, dist, 0.0))

            # Per-bin masked accumulate into rows of the (nbins, Cc)
            # scratch: only sublane reductions per bin (no cross-lane
            # shuffles, no loop-carried scalar — a reduce-to-scalar per bin
            # serializes the VPU pipeline), one lane reduction at the very
            # end. Bins write in STATIC 16-row blocks (fully unrolled).
            # Blocks below g_lo are statically skipped: callers pass
            # candidate classes whose stencil offsets have a geometric
            # minimum distance (dmin > 0 once cells are ≥ one cell apart),
            # so the low bins are unreachable.
            for g in range(g_lo, nbins // 16):
                gsl = slice((g - g_lo) * 16, (g - g_lo + 1) * 16)
                blk_lo = (16 * g) / inv_bin
                blk_hi = (16 * (g + 1)) / inv_bin
                live = (d_lo < blk_hi) & (d_hi >= blk_lo)

                def _compute(gsl=gsl, g=g, m=m):
                    rows = [
                        jnp.sum(
                            jnp.where(bin_id == g * 16 + j, w_bf, zero_bf)
                            if use_ids
                            else (bin_id == g * 16 + j).astype(jnp.bfloat16),
                            axis=0,
                            keepdims=True,
                            dtype=jnp.bfloat16,
                        ).astype(jnp.float32)
                        for j in range(16)
                    ]
                    block = jnp.concatenate(rows, axis=0)
                    if m == 0:
                        scratch_ref[gsl, :] = block
                    else:
                        scratch_ref[gsl, :] = scratch_ref[gsl, :] + block

                def _dead(gsl=gsl, m=m):
                    if m == 0:
                        scratch_ref[gsl, :] = jnp.zeros_like(
                            scratch_ref[gsl, :]
                        )

                pl.when(live)(_compute)
                pl.when(jnp.logical_not(live))(_dead)
        out_ref[0, :, :] = jnp.sum(scratch_ref[...], axis=1)[:, None]


def _offset_classes(
    offsets: list, widths: tuple | None, r_max: float, nbins: int
) -> list:
    """Group stencil offsets by the 16-bin group their geometric minimum
    distance makes reachable. An atom pair from cells offset by o is at
    least dmin(o) = |(max(|o_i|−1, 0)·w_i)| apart, so bins below
    dmin/bin_width can never be hit by that offset — the kernel statically
    skips them. `widths`: per-axis cell widths (host floats; must not
    overestimate the true per-frame widths — same staticity assumption as
    the grid dims themselves). None → single class, no skipping. Offsets
    with dmin ≥ r_max are pruned outright. Returns [(g_lo, [offsets])]
    sorted ascending, preserving offset order within a class (the
    symmetric self offset (0,0,0) stays first in class 0)."""
    if widths is None:
        return [(0, list(offsets))]
    import math

    bin_w = r_max / nbins
    classes: dict = {}
    for o in offsets:
        dmin = math.sqrt(
            sum((max(abs(c) - 1, 0) * w) ** 2 for c, w in zip(o, widths))
        )
        if dmin >= r_max:
            continue
        g = min(int(dmin / bin_w) // 16, nbins // 16 - 1)
        classes.setdefault(g, []).append(o)
    return sorted(classes.items())


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
    symmetric: bool = False,
    widths: tuple | None = None,
    ka: int | None = None,
    interpret: bool = False,
    occ_sort: bool = True,
    slab_rows: int | None = None,
    basis: jnp.ndarray | None = None,
    slab_shard: "tuple[str, int] | None" = None,
    bin_mode: str = "block",
    need_ids: bool | None = None,
) -> jnp.ndarray:
    """See _pair_dist_histogram_impl — this wrapper only resolves
    `need_ids` OUTSIDE the jit boundary (the overlap test must see
    concrete index arrays; inside the jitted impl they are tracers).
    None → ids are needed iff the selections can share an atom
    (symmetric, actual index overlap, or indices too abstract to check).
    """
    if need_ids is None:
        if symmetric:
            need_ids = True
        else:
            try:
                need_ids = bool(
                    np.intersect1d(
                        np.asarray(idx_a), np.asarray(idx_b)
                    ).size
                )
            except (
                jax.errors.TracerArrayConversionError,
                jax.errors.ConcretizationTypeError,
            ):  # traced (sharded/vmapped callers): be safe
                need_ids = True
    return _pair_dist_histogram_impl(
        x, idx_a, idx_b, box, nbins, r_max, dims, cap_a, cap_b,
        radius=radius, symmetric=symmetric, widths=widths, ka=ka,
        interpret=interpret, occ_sort=occ_sort, slab_rows=slab_rows,
        basis=basis, slab_shard=slab_shard, bin_mode=bin_mode,
        need_ids=need_ids,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "nbins", "r_max", "dims", "cap_a", "cap_b", "radius", "symmetric",
        "widths", "ka", "interpret", "occ_sort", "slab_rows", "slab_shard",
        "bin_mode", "need_ids",
    ),
)
def _pair_dist_histogram_impl(
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
    symmetric: bool = False,
    widths: tuple | None = None,
    ka: int | None = None,
    interpret: bool = False,
    occ_sort: bool = True,
    slab_rows: int | None = None,
    basis: jnp.ndarray | None = None,
    slab_shard: "tuple[str, int] | None" = None,
    bin_mode: str = "block",
    need_ids: bool = True,
) -> jnp.ndarray:
    """Drop-in Pallas replacement for ops.rdf.pair_dist_histogram_cl.

    Same cell-list preprocessing (ops.neighbors) and semantics: symmetric
    counting, self-pair exclusion by global id, capacity-dropped overflow.
    A-side capacity is unbounded: cells with more than 16 A atoms process
    in multiple kernel passes over 16-slot chunks of the A table, all
    sharing one set of B neighborhoods. `radius`: stencil reach in cells
    (cells must be ≥ r_max/radius wide; radius=1 → 27 rolls for dense
    systems, radius=2 → 125 rolls with tighter cells). nbins must be a
    multiple of 128. `widths`: static per-axis cell widths enabling
    distance-class bin-range skipping (see _offset_classes) — at radius 2
    the far stencil shells (78% of candidates) only touch the upper half
    of the bins, saving ~40% of the binning loop. `slab_rows`: process
    the cell grid in slabs of this many leading-axis rows — bounds the
    materialized B-plane memory to slab size (the 100M-atom path; see
    the slab-streaming comment below); None = one full-grid slab.
    `slab_shard=(axis_name, n_devices)`: MULTI-CHIP slab sharding — must
    be called inside a shard_map over `axis_name`; each device processes
    one slab window of cell rows (derived from lax.axis_index) and
    returns its partial histogram (caller psums). Distributes the
    B-plane memory wall — the single-chip 100M-atom limit — across the
    atom mesh axis; replaces slab_rows.
    `bin_mode`: "block" = the unrolled 16-bin compare/select/reduce loop
    with static (g_lo classes) and dynamic (d_lo/d_hi) bin-block skipping;
    "mxu" = two-level one-hot MXU contraction (flat cost over all bins —
    bin-range skipping does not apply, so offset classes collapse to one
    pruned class).
    `basis`: a (3,3) row-vector cell basis enables TRICLINIC mode —
    atoms bin on a uniform grid in fractional space (size with
    ops.neighbors.choose_grid_triclinic), the tables carry fractional
    coords, and the kernel applies the same single-round fractional
    min-image as ops.pbc.min_image before converting displacements to
    cartesian (`box` is ignored; pass widths=None).
    """
    from viamd_tpu.ops.neighbors import build_cell_list
    from viamd_tpu.ops.rdf import neighborhood_planes, stencil_offsets

    assert nbins % LANES == 0, "nbins must be a multiple of 128"
    if ka is None:
        # ka=8 halves the per-block A quantization waste (ceil(occ/ka)·ka)
        # at the occupancies the radius-1 grids produce — measured ~5%
        # whole-RDF win at λ≈33 (tools/exp_ka.py) and −8% at the 1M
        # config whose cap_a=65 used to flip to ka=16 (30.5→28.0 ms,
        # r5 A/B); at high caps the extra pass launches win back, so
        # keep ka=16 beyond 96
        ka = 8 if cap_a <= 96 else 16
    n_pass = -(-cap_a // ka)
    cap_a_pad = n_pass * ka
    G = LANES // ka

    tri = basis is not None
    if tri:
        from viamd_tpu.ops.pbc import cellmul

        xw = cellmul(x, _inv3x3(basis))  # fractional coords
        # wrap into [0,1): build_cell_list frac-floors the CELL index, so
        # stored coordinates must agree with their wrapped cell or
        # out-of-box atoms bin with a box-magnitude displacement error
        xw = xw - jnp.floor(xw)
        box_bins = jnp.ones(3, jnp.float32)
    else:
        # wrap into [0,box) for the same cell-index/coordinate consistency
        # (handles atoms exactly at L, slightly negative, or unwrapped
        # whole-molecule trajectories)
        xw = x - box * jnp.floor(x / box)
        box_bins = box
    xa = xw[idx_a]
    dx_, dy_, dz_ = dims
    ncells = dx_ * dy_ * dz_

    pack_ids = x.shape[0] < (1 << 24)  # global atom ids exact as f32 values

    # Validity rides in coordinate SENTINELS: invalid A slots sit far
    # negative, invalid B slots far positive, so any pair touching one is
    # binned out of range with zero in-kernel masking. Magnitudes give
    # ≥1000·r_max of slack over any real coordinate (fractional coords are
    # ≤1; cartesian boxes ≪ 1e5 Å), including after the ± one-box
    # pre-shift the planes add.
    A_SENT = -1.0e3 if tri else -1.0e6
    B_SENT = 3.0e3 if tri else 3.0e6

    def tables(xs, idx, cl, cap, inval):
        # packed (x,y,z,id) gather: one table lookup for coords + ids. Ids
        # ride as exact f32 VALUES (not bitcasts — int32 bit patterns are
        # f32 denormals, which this hardware flushes to zero in fused
        # copies), exact below 2^24 entries.
        # Sorted-payload form (the ops/sdf.py pattern): permute the packed
        # atoms into cell order ONCE (n rows), then index by segment
        # position — the (ncells·cap)-row cl.table build gather is never
        # consumed and DCEs away. vs t4 = p4[cl.table]: two (ncells·cap)-
        # row gathers → one n-row + one (ncells·cap)-row; gathers price
        # per ROW at ~1.9e8 rows/s at this scale (tools/exp_gather2.py),
        # so this saves ~2 ms at the 1M config.
        ncells_t = cl.table.shape[0]
        slot_t = jax.lax.broadcasted_iota(jnp.int32, (ncells_t, cap), 1)
        valid = slot_t < (cl.starts[1:] - cl.starts[:-1])[:, None]
        # the sorted-payload form materializes an extra (n, 4) permuted
        # copy (n·16 B); at the 100M-atom design scale that ~0.5 GB broke
        # the slab-streaming memory budget (r5: RESOURCE_EXHAUSTED at the
        # 33M-O selection) — beyond 8M selected atoms keep the slot-table
        # route, whose saving (~2.6 ms at 333k) is noise at that scale
        if cl.order is not None and xs.shape[0] <= 8_000_000:
            n_t = cl.order.shape[0]
            pos = jnp.minimum(cl.starts[:-1][:, None] + slot_t, n_t - 1)
            if pack_ids:
                p4 = jnp.concatenate(
                    [xs, idx.astype(jnp.float32)[:, None]], 1
                )
                t4 = p4[cl.order][pos]
                gid = t4[..., 3].astype(jnp.int32)
                gid = jnp.where(valid, gid, inval)
                return t4[..., :3], gid, valid
            os_ = cl.order[pos]
            gid = jnp.where(valid, idx[os_], inval)
            return xs[os_], gid, valid
        # grouped cell list: no globally-sorted order — table route
        if pack_ids:
            p4 = jnp.concatenate([xs, idx.astype(jnp.float32)[:, None]], 1)
            t4 = p4[cl.table[:, :cap]]
            gid = t4[..., 3].astype(jnp.int32)
            gid = jnp.where(cl.valid[:, :cap], gid, inval)
            return t4[..., :3], gid, cl.valid[:, :cap]
        xyz = xs[cl.table[:, :cap]]
        gid = jnp.where(cl.valid[:, :cap], idx[cl.table[:, :cap]], inval)
        return xyz, gid, cl.valid[:, :cap]

    if symmetric:
        # same selection on both sides: ONE sort + table + gather serve both
        capm = max(cap_a_pad, cap_b)
        cl_a = build_cell_list(xa, box_bins, dims, capm)
        xyz_m, gid_m, val_m = tables(xa, idx_a, cl_a, capm, -1)
        a_xyz = jnp.where(
            val_m[:, :cap_a_pad, None], xyz_m[:, :cap_a_pad], A_SENT
        )
        a_gid = gid_m[:, :cap_a_pad]
        b_xyz = jnp.where(val_m[:, :cap_b, None], xyz_m[:, :cap_b], B_SENT)
        b_gid = jnp.where(gid_m[:, :cap_b] < 0, -2, gid_m[:, :cap_b])
    else:
        xb = xw[idx_b]
        cl_a = build_cell_list(xa, box_bins, dims, cap_a_pad)
        cl_b = build_cell_list(xb, box_bins, dims, cap_b)
        xyz_a, a_gid, val_a = tables(xa, idx_a, cl_a, cap_a_pad, -1)
        a_xyz = jnp.where(val_a[..., None], xyz_a, A_SENT)
        xyz_b, b_gid, val_b = tables(xb, idx_b, cl_b, cap_b, -2)
        b_xyz = jnp.where(val_b[..., None], xyz_b, B_SENT)

    # `need_ids` (resolved by the public wrapper): id planes are needed
    # ONLY where the same atom could land in both sides of a pair slot —
    # the (0,0,0) self-cell offset when the two selections share atoms
    # (always true in symmetric mode, which also dedupes unordered pairs
    # there by id order). Every other offset pairs two DISTINCT cells, and
    # one atom lives in exactly one cell, so those classes drop the id
    # planes and all per-slot validity math.

    if symmetric:
        assert min(dims) >= 2 * radius + 1, "half stencil needs distinct rolls"
    offsets = stencil_offsets(radius, symmetric)

    # M cell-blocks per grid step (tunable; measured M=4 ≈ M=1 at 100k
    # atoms — per-step overhead is not the bottleneck, so keep steps small)
    M = 1
    yz = dy_ * dz_
    counts_full = cl_a.starts[1:] - cl_a.starts[:-1]

    # slab streaming along the leading cell axis: the B neighborhood
    # planes are the memory wall (ncells · S·cap_b · 16 B — ~12 GB at
    # 100M atoms); per-slab roll+slice builds only a w·dy·dz-row window
    # (slice-of-roll fuses, full planes never materialize). One slab ≡
    # the original full-grid path.
    x0_dyn = row_ok = None
    if slab_shard is not None:
        # multi-chip slab sharding: device k owns global cell rows
        # [k·w, (k+1)·w). dynamic_slice clamps the window start at dx−w,
        # so the slice can overlap a neighbor's rows — the row mask kills
        # those A cells (counts→0, gid→−1); B planes need no mask (a pair
        # needs a live A slot).
        ax_name, n_dev = slab_shard
        # derive the REAL axis size at trace time (static under shard_map)
        # — trusting the declared count silently drops cell rows when the
        # runtime mesh is smaller (compile_script(atom_shard=…) takes the
        # count on faith)
        n_actual = jax.lax.axis_size(ax_name)
        if int(n_dev) != int(n_actual):
            raise ValueError(
                f"slab_shard declared {n_dev} devices on axis "
                f"'{ax_name}' but the mesh has {n_actual}"
            )
        w_sh = max(-(-dx_ // int(n_dev)), min(dx_, 2 * radius + 1))
        k_dev = jax.lax.axis_index(ax_name)
        x0_dyn = jnp.minimum(k_dev * w_sh, dx_ - w_sh)
        g_row = x0_dyn + jnp.arange(w_sh)
        row_ok = (g_row >= k_dev * w_sh) & (g_row < (k_dev + 1) * w_sh)

    def _slab_partial(x0, w, row_ok_, a_xyz_d, a_gid_d, counts_d,
                      b_xyz_d, b_gid_d):
        """One slab window's histogram contribution.

        `x0` int → static slicing (XLA folds the w == dx_ case to the
        original full-grid path); traced → dynamic_slice with `row_ok_`
        masking rows outside the requested window (the clamped window
        can overlap a neighbour's rows — counts→0, gid→−1, coords→A_SENT
        so those cells contribute nothing)."""
        tot = jnp.zeros(nbins, jnp.float32)
        ncells_s = w * yz
        if not isinstance(x0, int):  # dynamic slab (sharded / fori)
            sl_s = a_xyz_d.shape[1]
            a_xyz_s = jax.lax.dynamic_slice_in_dim(
                a_xyz_d.reshape(dx_, yz, sl_s, 3), x0, w, 0
            )
            a_gid_s = jax.lax.dynamic_slice_in_dim(
                a_gid_d.reshape(dx_, yz, sl_s), x0, w, 0
            )
            counts_s = jax.lax.dynamic_slice_in_dim(
                counts_d.reshape(dx_, yz), x0, w, 0
            )
            a_gid_s = jnp.where(row_ok_[:, None, None], a_gid_s, -1)
            # no-id classes read validity from coordinates — mask the
            # overlapping neighbor rows there too, not just in the ids
            a_xyz_s = jnp.where(
                row_ok_[:, None, None, None], a_xyz_s, A_SENT
            )
            counts_s = jnp.where(row_ok_[:, None], counts_s, 0)
            a_xyz_s = a_xyz_s.reshape(ncells_s, sl_s, 3)
            a_gid_s = a_gid_s.reshape(ncells_s, sl_s)
            counts_s = counts_s.reshape(-1)
        elif w < dx_:
            sl_s = a_xyz_d.shape[1]
            a_xyz_s = a_xyz_d.reshape(dx_, yz, sl_s, 3)[x0 : x0 + w]
            a_xyz_s = a_xyz_s.reshape(ncells_s, sl_s, 3)
            a_gid_s = a_gid_d.reshape(dx_, yz, sl_s)[x0 : x0 + w]
            a_gid_s = a_gid_s.reshape(ncells_s, sl_s)
            counts_s = counts_d.reshape(dx_, yz)[x0 : x0 + w].reshape(-1)
        else:
            a_xyz_s, a_gid_s, counts_s = a_xyz_d, a_gid_d, counts_d

        nblocks = -(-ncells_s // G)
        nblocks = -(-nblocks // M) * M
        padc = nblocks * G - ncells_s

        def prep_a(arr, fill=0, nblocks=nblocks, padc=padc):
            # (ncells_s, ka) → (nblocks/M, M·ka·G, 1); sublane =
            # m·128 + k·G + g. Id planes MUST pad with the invalid
            # sentinel (id 0 is a real atom).
            arr = jnp.pad(arr, [(0, padc), (0, 0)], constant_values=fill)
            return (
                arr.reshape(nblocks, G, ka)
                .transpose(0, 2, 1)
                .reshape(nblocks // M, M * ka * G, 1)
            )

        # occupancy-sorted cell order: grouping similar-occupancy cells
        # into the G-cell blocks tightens the per-block max that gates A
        # passes (unsorted, every block's max ≈ the global Poisson max,
        # so nearly all blocks run ceil(max/ka) passes; sorted, low
        # blocks run fewer). The permute costs only ~ncells gathered
        # ROWS (row count, not elements, is what gathers charge for on
        # this backend — docs/PERF.md) applied to the A tables and the
        # roll-built B planes. Per-slab in slab mode.
        perm = None
        if occ_sort and ncells_s >= 64:
            perm = jnp.argsort(counts_s).astype(jnp.int32)
            a_xyz_s = a_xyz_s[perm]
            a_gid_s = a_gid_s[perm]
            counts_s = counts_s[perm]

        a_cols = [
            [
                prep_a(a_xyz_s[:, sl, 0], fill=A_SENT),
                prep_a(a_xyz_s[:, sl, 1], fill=A_SENT),
                prep_a(a_xyz_s[:, sl, 2], fill=A_SENT),
                prep_a(a_gid_s[:, sl], fill=-1),
            ]
            for sl in (slice(p * ka, (p + 1) * ka) for p in range(n_pass))
        ]
        # max A occupancy per cell block → per-step dynamic pass skipping
        occ_blk = jnp.max(
            jnp.pad(counts_s, (0, padc)).reshape(nblocks // M, M * G), axis=1
        ).astype(jnp.int32)

        if bin_mode == "mxu":
            # one class: keep the dmin ≥ r_max offset pruning, drop the
            # bin-range classing (the MXU contraction has flat bin cost)
            pruned = [
                o for _, offs in _offset_classes(offsets, widths, r_max,
                                                 nbins) for o in offs
            ]
            classes = [(0, pruned)]
        else:
            classes = _offset_classes(offsets, widths, r_max, nbins)
        # the self-cell offset must LEAD its class: the kernel's id dedupe
        # gates on chunk 0's first cap_b lanes (non-symmetric full stencils
        # generate (0,0,0) mid-list)
        classes = [
            (g_, ([(0, 0, 0)] + [o for o in offs_ if o != (0, 0, 0)])
             if (0, 0, 0) in offs_ else list(offs_))
            for g_, offs_ in classes
        ]
        # id planes ride only in the class containing the (0,0,0) self-cell
        # offset (and only when the selections can share atoms); all other
        # classes run the leaner no-id kernel (validity via coordinate
        # sentinels). Splitting (0,0,0) into its OWN class measured
        # net-negative (see _hist_kernel docstring) — classes stay merged.
        for g_lo, offs_k in classes:
            offs_k = list(offs_k)
            k_ids = need_ids and (0, 0, 0) in offs_k
            S = len(offs_k)
            C = S * cap_b
            # candidate chunking: per-step tiles (128, Cc) with Cc a lane
            # multiple; target Cc ≈ 2048 (amortizes per-step grid/DMA
            # overhead)
            nchunks = max(1, -(-C // 2048))
            Cc = -(-C // (nchunks * LANES)) * LANES
            C_tot = nchunks * Cc
            nb_eff = nbins - 16 * g_lo

            def prep_b(
                arr, fill=0, nblocks=nblocks, padc=padc,
                nchunks=nchunks, Cc=Cc, C_tot=C_tot, C=C,
            ):  # (ncells_s, C) → (nsteps, M·G, Cc)
                arr = jnp.pad(
                    arr, [(0, padc), (0, C_tot - C)], constant_values=fill
                )
                return (
                    arr.reshape(nblocks // M, M, G, nchunks, Cc)
                    .transpose(0, 3, 1, 2, 4)
                    .reshape(nblocks // M * nchunks, M * G, Cc)
                )

            def planes(
                arr, fill=0, offs_k=offs_k, prep_b=prep_b, perm=perm,
                wrap_shift=None,
            ):
                pl_ = neighborhood_planes(
                    arr, dims, radius, offs_k, x0=x0, w=w,
                    wrap_shift=wrap_shift,
                )
                if perm is not None:
                    pl_ = pl_[perm]
                return prep_b(pl_, fill=fill)

            # coordinate planes pre-shift by the periodic wrap of their
            # stencil offset (fractional coords wrap by 1) — the kernel
            # subtracts coordinates directly, no min-image round
            mags = (1.0, 1.0, 1.0) if tri else (box[0], box[1], box[2])
            bxp = planes(b_xyz_d[..., 0], fill=B_SENT, wrap_shift=(0, mags[0]))
            byp = planes(b_xyz_d[..., 1], fill=B_SENT, wrap_shift=(1, mags[1]))
            bzp = planes(b_xyz_d[..., 2], fill=B_SENT, wrap_shift=(2, mags[2]))
            if k_ids:
                bidp = planes(b_gid_d, fill=-2)

            a_spec = pl.BlockSpec(
                (1, M * LANES, 1),
                lambda i, nch=nchunks: (i // nch, 0, 0),
                memory_space=pltpu.VMEM,
            )
            b_spec = pl.BlockSpec(
                (1, M * G, Cc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
            nsteps = nblocks // M * nchunks
            if bin_mode == "mxu":
                out_blk = (1, nbins // 16, 16)
                # the kernel's mxu branch never touches scratch; a minimal
                # VMEM block satisfies the signature
                scratch = pltpu.VMEM((8, LANES), jnp.float32)
            else:
                out_blk = (1, nb_eff, 1)
                scratch = pltpu.VMEM((nb_eff, Cc), jnp.float32)
            n_ab = 4 if k_ids else 3
            if bin_mode == "mxu":
                # MERGED A passes: one pallas_call runs every pass inside
                # each grid step, so the step's B planes DMA once instead
                # of once per pass (see the merged-branch comment in
                # _hist_kernel). A columns for all passes concatenate
                # along the sublane axis — pass p, step m at sublanes
                # (p·M + m)·128. DEFAULT OFF: the merged sweep measured
                # SLOWER end-to-end (headline 248-250 vs 265 f/s per-pass,
                # steady 0.52 vs 0.48 s — docs/PERF.md r4 "merged A-pass
                # re-attempt") even though the standalone K-loop microbench
                # suggested 2.21→1.90 ms (cross-day noise band ±15%); the
                # out_ref read-modify-write per (m, p) and the n_pass×
                # larger A block outweigh the saved plane DMA, which XLA's
                # grid pipelining already overlaps. VIAMD_TPU_RDF_MERGED=1
                # re-enables for A/B.
                merged = os.environ.get("VIAMD_TPU_RDF_MERGED", "0") == "1"
                groups = (
                    [(0, n_pass)] if merged
                    else [(p, 1) for p in range(n_pass)]
                )
                for p0, np_k in groups:
                    a_all = [
                        jnp.concatenate(
                            [a_cols[p0 + q][k] for q in range(np_k)], axis=1
                        ) if np_k > 1 else a_cols[p0][k]
                        for k in range(n_ab)
                    ]
                    a_spec_m = pl.BlockSpec(
                        (1, np_k * M * LANES, 1),
                        lambda i, nch=nchunks: (i // nch, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                    partial_hists = pl.pallas_call(
                        functools.partial(
                            _hist_kernel, ka=ka, nbins=nbins, r_max=r_max,
                            nchunks=nchunks, cap_b=cap_b,
                            symmetric=symmetric,
                            M=M, g_lo=g_lo, a_lo=p0 * ka, triclinic=tri,
                            bin_mode=bin_mode, use_ids=k_ids,
                            n_pass_k=np_k,
                        ),
                        out_shape=jax.ShapeDtypeStruct(
                            (nsteps,) + out_blk[1:], jnp.float32
                        ),
                        grid=(nsteps,),
                        in_specs=[
                            pl.BlockSpec(memory_space=pltpu.SMEM),
                            pl.BlockSpec(memory_space=pltpu.SMEM),
                        ]
                        + [a_spec_m] * n_ab
                        + [b_spec] * n_ab,
                        out_specs=pl.BlockSpec(
                            out_blk,
                            lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                        scratch_shapes=[scratch],
                        interpret=interpret,
                    )(
                        (
                            basis.reshape(1, 9) if tri else box.reshape(1, 3)
                        ).astype(jnp.float32),
                        occ_blk,
                        *a_all,
                        *((bxp, byp, bzp, bidp) if k_ids
                          else (bxp, byp, bzp)),
                    )
                    tot = tot + jnp.sum(partial_hists, axis=0).reshape(
                        nbins
                    )
                continue
            for p in range(n_pass):
                partial_hists = pl.pallas_call(
                    functools.partial(
                        _hist_kernel, ka=ka, nbins=nbins, r_max=r_max,
                        nchunks=nchunks, cap_b=cap_b, symmetric=symmetric,
                        M=M, g_lo=g_lo, a_lo=p * ka, triclinic=tri,
                        bin_mode=bin_mode, use_ids=k_ids,
                    ),
                    out_shape=jax.ShapeDtypeStruct(
                        (nsteps,) + out_blk[1:], jnp.float32
                    ),
                    grid=(nsteps,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                    ]
                    + [a_spec] * n_ab
                    + [b_spec] * n_ab,
                    out_specs=pl.BlockSpec(
                        out_blk,
                        lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    scratch_shapes=[scratch],
                    interpret=interpret,
                )(
                    (
                        basis.reshape(1, 9) if tri else box.reshape(1, 3)
                    ).astype(jnp.float32),
                    occ_blk,
                    *(a_cols[p] if k_ids else a_cols[p][:3]),
                    *((bxp, byp, bzp, bidp) if k_ids else (bxp, byp, bzp)),
                )
                tot = tot.at[16 * g_lo :].add(
                    jnp.sum(partial_hists, axis=(0, 2))
                )
        return tot

    if slab_shard is not None:
        total = _slab_partial(
            x0_dyn, w_sh, row_ok, a_xyz, a_gid, counts_full, b_xyz, b_gid
        )
    elif slab_rows is None or slab_rows >= dx_:
        total = _slab_partial(
            0, dx_, None, a_xyz, a_gid, counts_full, b_xyz, b_gid
        )
    else:
        sr = max(int(slab_rows), 2 * radius + 1)
        nslabs = -(-dx_ // sr)
        total = jnp.zeros(nbins, jnp.float32)
        if nslabs <= 4:
            # few slabs: python-unrolled, optimization_barrier-sequenced
            # so XLA cannot hoist every slab's plane build to the front
            # (which would defeat the live-memory bound)
            for i in range(nslabs):
                x0s = i * sr
                ws = min(sr, dx_ - x0s)
                (total, a_d, g_d, b_d, bg_d, c_d) = (
                    jax.lax.optimization_barrier(
                        (total, a_xyz, a_gid, b_xyz, b_gid, counts_full)
                    )
                )
                total = total + _slab_partial(
                    x0s, ws, None, a_d, g_d, c_d, b_d, bg_d
                )
        else:
            # many slabs (the 100M-atom design scale): a fori_loop over
            # ONE dynamic slab body — the python-unrolled form emitted
            # nslabs × n_pass × n_class pallas_calls in one HLO, which
            # crashed the remote compile helper at the 100³-cell grid
            # (r5); the loop form bounds both compile size and live
            # memory to a single slab
            def slab_body(i, tot_c):
                x0d = jnp.minimum(i * sr, dx_ - sr)
                g_row = x0d + jnp.arange(sr)
                rok = (g_row >= i * sr) & (g_row < (i + 1) * sr)
                return tot_c + _slab_partial(
                    x0d, sr, rok, a_xyz, a_gid, counts_full, b_xyz, b_gid
                )

            total = jax.lax.fori_loop(0, nslabs, slab_body, total)
    return total * 2.0 if symmetric else total


def pair_dist_histogram_pl_sharded(
    x: jnp.ndarray,
    idx_a: jnp.ndarray,
    idx_b: jnp.ndarray,
    box: jnp.ndarray,
    nbins: int,
    r_max: float,
    dims: tuple,
    cap_a: int,
    cap_b: int,
    mesh,
    axis: str = "atoms",
    radius: int = 1,
    symmetric: bool = False,
    interpret: bool = False,
    basis: jnp.ndarray | None = None,
    bin_mode: str = "block",
) -> jnp.ndarray:
    """Multi-chip slab-sharded cell-list pair histogram → (nbins,).

    The 100M-atom scale-out (SURVEY.md §2.4 atom-range parallelism across
    chips): the B neighborhood planes — the single-chip memory wall
    (~12 GB at 100M atoms; docs/PERF.md) — shard over the `axis` mesh
    dimension. Each device builds only ITS window of cell rows
    (roll+dynamic-slice, same fusion as the single-chip slab streaming),
    runs the Pallas kernel on that slab, and the (nbins,) partials psum
    over ICI. Coordinates and cell tables are replicated (cheap relative
    to the planes); results are bit-identical to the single-chip kernel.
    """
    fn = _sharded_fn(
        mesh, axis, nbins, r_max, dims, cap_a, cap_b, radius, symmetric,
        interpret, basis is not None, bin_mode,
    )
    args = (x, idx_a, idx_b, box) + ((basis,) if basis is not None else ())
    return fn(*args)


@functools.lru_cache(maxsize=64)
def _sharded_fn(
    mesh, axis, nbins, r_max, dims, cap_a, cap_b, radius, symmetric,
    interpret, has_basis, bin_mode="block",
):
    """Cached jitted shard_map for pair_dist_histogram_pl_sharded — a
    fresh closure per call would retrace/relower the whole kernel graph
    every invocation (minutes per compile on the tunneled backend)."""
    from jax.sharding import PartitionSpec as P

    n_dev = int(mesh.shape[axis])

    def local(x_, ia_, ib_, box_, *maybe_basis):
        h = pair_dist_histogram_pl(
            x_, ia_, ib_, box_, nbins, r_max, dims, cap_a, cap_b,
            radius=radius, symmetric=symmetric, interpret=interpret,
            basis=maybe_basis[0] if has_basis else None,
            slab_shard=(axis, n_dev), bin_mode=bin_mode,
        )
        return jax.lax.psum(h, axis)

    nargs = 4 + (1 if has_basis else 0)
    return jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=tuple(P() for _ in range(nargs)),
            out_specs=P(), check_vma=False,
        )
    )
