"""Radial distribution function (RDF) kernels.

Rebuild of the `rdf(sel_a, sel_b, cutoff)` script builtin's accumulation
(reference capability: md_script.h distribution properties, SURVEY.md §2.3;
default script `r = rdf(element('C'), element('H'), 10.0)`,
/root/reference/src/main.cpp:528).

Strategy (TPU-first, SURVEY.md §7 "scatter-add histograms"):
frames are vmapped/sharded; within a frame, pair distances are produced in
row tiles whose distance→compare-CDF→reduce chain XLA fuses into a single
VPU kernel — no (na, nb) distance matrix and no one-hot ever hits HBM.
Self-pairs are excluded by global-index comparison. Accumulators add across
frames and `psum` across shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from viamd_tpu.ops.pbc import min_image


def pair_dist_histogram(
    x: jnp.ndarray,
    w_a: jnp.ndarray,
    w_b: jnp.ndarray,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
    nbins: int,
    r_max: float,
    tile: int = 256,
) -> jnp.ndarray:
    """Weighted min-image pair-distance histogram over [0, r_max) → (nbins,).

    w_a/w_b: dense (n,) 0/1 (or weighted) selection masks. Pair (i,j) weight
    is w_a[i]·w_b[j]; i==j is excluded. Both (i,j) and (j,i) are counted when
    both masks cover them — the symmetric convention the g(r) normalization
    below assumes.
    """
    n = x.shape[0]
    n_pad = -(-n // tile) * tile
    pad = n_pad - n
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    wap = jnp.pad(w_a.astype(jnp.float32), (0, pad))
    edges = (jnp.arange(1, nbins + 1, dtype=jnp.float32) / nbins) * r_max
    idx_all = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)[:, 0]
    wb = w_b.astype(jnp.float32)

    def row_tile(carry, i0):
        xa = jax.lax.dynamic_slice(xp, (i0, 0), (tile, 3))
        wa = jax.lax.dynamic_slice(wap, (i0,), (tile,))
        ia = jax.lax.dynamic_slice(idx_all, (i0,), (tile,))
        d = xa[:, None, :] - x[None, :, :]
        d = min_image(d, basis, inv_basis)
        dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))
        w = wa[:, None] * wb[None, :]
        w = jnp.where(ia[:, None] == idx_all[None, :n], 0.0, w)
        below = (dist[:, :, None] < edges[None, None, :]).astype(jnp.float32)
        cdf = jnp.sum(below * w[:, :, None], axis=(0, 1))
        return carry + cdf, None

    starts = jnp.arange(0, n_pad, tile, dtype=jnp.int32)
    cdf, _ = jax.lax.scan(row_tile, jnp.zeros(nbins, jnp.float32), starts)
    return jnp.concatenate([cdf[:1], jnp.diff(cdf)])


def pair_dist_histogram_scatter(
    x: jnp.ndarray,
    w_a: jnp.ndarray,
    w_b: jnp.ndarray,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
    nbins: int,
    r_max: float,
    tile: int = 256,
) -> jnp.ndarray:
    """`pair_dist_histogram` via scatter-add — the HOST-backend variant.

    Same contract as pair_dist_histogram. TPU has no fast scatter (the
    compare-CDF path above exists for exactly that reason), but on CPU
    XLA lowers `.at[].add` to a plain store loop that beats the
    (tile, n, nbins) compare-CDF tensor by ~50× at small n — and the
    reference's own 1ALA-500 regime (BASELINE config #1) runs on CPU.
    """
    n = x.shape[0]
    n_pad = -(-n // tile) * tile
    pad = n_pad - n
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    wap = jnp.pad(w_a.astype(jnp.float32), (0, pad))
    idx_all = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)[:, 0]
    wb = w_b.astype(jnp.float32)
    inv_bin = nbins / r_max

    def row_tile(carry, i0):
        xa = jax.lax.dynamic_slice(xp, (i0, 0), (tile, 3))
        wa = jax.lax.dynamic_slice(wap, (i0,), (tile,))
        ia = jax.lax.dynamic_slice(idx_all, (i0,), (tile,))
        d = xa[:, None, :] - x[None, :, :]
        d = min_image(d, basis, inv_basis)
        dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))
        w = wa[:, None] * wb[None, :]
        w = jnp.where(ia[:, None] == idx_all[None, :n], 0.0, w)
        bins = jnp.where(
            dist < r_max, (dist * inv_bin).astype(jnp.int32), nbins
        )
        hist = jnp.zeros(nbins + 1, jnp.float32).at[bins.ravel()].add(
            w.ravel()
        )
        return carry + hist[:nbins], None

    starts = jnp.arange(0, n_pad, tile, dtype=jnp.int32)
    hist, _ = jax.lax.scan(
        row_tile, jnp.zeros(nbins, jnp.float32), starts
    )
    return hist


def pair_dist_histogram_scatter_idx(
    x: jnp.ndarray,
    idx_a: jnp.ndarray,  # (na,) static global indices of the A selection
    idx_b: jnp.ndarray,  # (nb,) static global indices of the B selection
    w_a: jnp.ndarray,  # (na,) weights at idx_a
    w_b: jnp.ndarray,  # (nb,) weights at idx_b
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
    nbins: int,
    r_max: float,
    tile: int = 256,
) -> jnp.ndarray:
    """Selection-compacted `pair_dist_histogram_scatter`.

    The dense scatter variant pays n² distance rows no matter how sparse
    the selections are; the reference's own 1ALA-500 default script
    (rdf(element('C'), element('H')), main.cpp:513-530) selects 192+128
    of 448 atoms — an 8× pair-count cut. Gather each selection once
    (host-static index lists, the compiler already has them) and run the
    same min-image → bin → scatter-add over the (na, nb) block, tiled on
    the A side. Self pairs excluded by global-id comparison, so
    overlapping selections keep the dense path's semantics.
    """
    na = int(idx_a.shape[0])
    if na == 0 or int(idx_b.shape[0]) == 0:
        return jnp.zeros(nbins, jnp.float32)
    xa = x[idx_a]
    xb = x[idx_b]
    tile = min(tile, max(na, 1))
    n_pad = -(-na // tile) * tile
    pad = n_pad - na
    xap = jnp.pad(xa, ((0, pad), (0, 0)))
    wap = jnp.pad(w_a.astype(jnp.float32), (0, pad))
    iap = jnp.pad(idx_a, (0, pad), constant_values=-1)
    wb = w_b.astype(jnp.float32)
    inv_bin = nbins / r_max

    def row_tile(carry, i0):
        xr = jax.lax.dynamic_slice(xap, (i0, 0), (tile, 3))
        wr = jax.lax.dynamic_slice(wap, (i0,), (tile,))
        ir = jax.lax.dynamic_slice(iap, (i0,), (tile,))
        d = xr[:, None, :] - xb[None, :, :]
        d = min_image(d, basis, inv_basis)
        dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))
        w = wr[:, None] * wb[None, :]
        w = jnp.where(ir[:, None] == idx_b[None, :], 0.0, w)
        bins = jnp.where(
            dist < r_max, (dist * inv_bin).astype(jnp.int32), nbins
        )
        hist = jnp.zeros(nbins + 1, jnp.float32).at[bins.ravel()].add(
            w.ravel()
        )
        return carry + hist[:nbins], None

    starts = jnp.arange(0, n_pad, tile, dtype=jnp.int32)
    hist, _ = jax.lax.scan(
        row_tile, jnp.zeros(nbins, jnp.float32), starts
    )
    return hist


def stencil_offsets(radius: int, symmetric: bool = False) -> list:
    """Cell-offset stencil. `symmetric`: self-cell first + the lexicographic
    upper half — each unordered CELL pair appears exactly once (pairs within
    the self cell dedupe by id ordering in the kernel), so a same-selection
    RDF can process half the candidates and double the histogram. Requires
    min(dims) ≥ 2·radius+1 (offsets +o and −o must be distinct rolls)."""
    offs = [
        (ox, oy, oz)
        for ox in range(-radius, radius + 1)
        for oy in range(-radius, radius + 1)
        for oz in range(-radius, radius + 1)
    ]
    if not symmetric:
        return offs
    return [(0, 0, 0)] + [o for o in offs if o > (0, 0, 0)]


def snap_capacity(
    cap: int, lam: float, n_offsets: int, lanes: int = 128
) -> int:
    """Snap a per-cell B capacity DOWN to the pallas kernel's lane quantum.

    n_offsets·cap pads up to a multiple of `lanes` in the pair kernel, so
    dead padding is free to trade for capacity: if the next-lower lane
    multiple still gives each cell ≥ λ + 3.5√λ slots (Poisson tail ~3e-4
    per draw — the documented capacity-drop semantics), use it. Returns
    the possibly-reduced capacity."""
    import math

    c_tot = n_offsets * cap
    if c_tot % lanes == 0:
        return cap
    snapped = (c_tot // lanes) * lanes // n_offsets
    if snapped >= 1 and snapped >= lam + 3.5 * math.sqrt(max(lam, 0.0)):
        return snapped
    return cap


def neighborhood_planes(
    arr: jnp.ndarray, dims: tuple, radius: int = 2, offsets: list = None,
    x0: int = 0, w: "int | None" = None,
    wrap_shift: "tuple[int, float] | None" = None,
) -> jnp.ndarray:
    """(ncells, K) per-cell data → (w·dy·dz, S·K) stencil neighborhoods.

    Built with S=(2r+1)³ wrapped ROLLS of the 3D cell grid instead of a
    random gather: rolls are contiguous copies at HBM bandwidth, while the
    equivalent fancy-index gather runs at a few elements/cycle — the
    difference dominates frame time at ≥1M atoms. `offsets` overrides the
    full cube (see stencil_offsets). `(x0, w)` restricts the output to a
    leading-axis slab window of cell rows x0..x0+w (default: the full
    grid) — XLA fuses slice-of-roll (a roll lowers to a concat of two
    slices), so only the window materializes; this is the memory bound
    behind the 100M-atom slab streaming in ops/pallas_rdf.

    `wrap_shift=(grid_axis, magnitude)`: PRE-SHIFT mode for coordinate
    planes — wherever the roll along `grid_axis` wrapped around the
    periodic boundary, add ±magnitude (the box extent along that axis,
    or 1.0 for fractional coords) so the plane carries the candidate's
    UNWRAPPED position relative to the owning cell. Pair kernels can then
    subtract coordinates directly with no per-slot min-image round (the
    shift is a per-cell-row broadcast add, charged once per plane row
    instead of per pair slot).
    """
    dx, dy, dz = dims
    if w is None:
        w = dx
    K = arr.shape[1]
    a4 = arr.reshape(dx, dy, dz, K)
    if offsets is None:
        offsets = stencil_offsets(radius)
    dynamic = not isinstance(x0, int)
    # Dynamic (traced x0) windows extract an x-HALO FIRST — one
    # x0-dependent roll + static slice covering rows x0−r..x0+w+r−1
    # (wrapped) — and take each x-offset as a static slice of that
    # window. The per-offset form (roll the FULL grid, then
    # dynamic_slice) is x0-INDEPENDENT in its roll, so inside a
    # fori_loop slab sweep XLA hoists all S full-grid rolled copies out
    # of the loop — ~11.5 GB at the 100M-atom grid, the r5 OOM. The
    # halo roll depends on x0 and cannot hoist; only one full-size
    # transient lives per channel.
    halo = None
    r_h = max((abs(o[0]) for o in offsets), default=0)
    if dynamic and w + 2 * r_h <= dx:
        halo = jnp.roll(a4, r_h - x0, axis=0)[: w + 2 * r_h]
    parts = []
    for ox, oy, oz in offsets:
        if halo is not None:
            win = halo[r_h + ox : r_h + ox + w]
            if (oy, oz) != (0, 0):
                win = jnp.roll(win, (-oy, -oz), axis=(1, 2))
        else:
            rolled = jnp.roll(a4, (-ox, -oy, -oz), axis=(0, 1, 2))
            win = (
                jax.lax.dynamic_slice_in_dim(rolled, x0, w, axis=0)
                if dynamic  # traced slab start; NB dynamic_slice clamps
                # x0 to dx-w — callers mask A rows
                else rolled[x0 : x0 + w]
            )
        if wrap_shift is not None:
            gax, mag = wrap_shift
            off_g = (ox, oy, oz)[gax]
            if off_g != 0:
                n_g = dims[gax]
                if gax == 0:
                    # clamp like dynamic_slice does internally, so the
                    # wrap shifts stay aligned with the rows actually
                    # sliced even for an unclamped traced x0
                    idx_g = (
                        jnp.minimum(x0, dx - w) + jnp.arange(w)
                        if dynamic
                        else jnp.arange(x0, x0 + w)
                    )
                    shape = (w, 1, 1, 1)
                elif gax == 1:
                    idx_g = jnp.arange(dy)
                    shape = (1, dy, 1, 1)
                else:
                    idx_g = jnp.arange(dz)
                    shape = (1, 1, dz, 1)
                j = idx_g + off_g
                # mag may be a traced scalar (box extents under jit)
                s = (
                    (j >= n_g).astype(jnp.float32)
                    - (j < 0).astype(jnp.float32)
                ) * mag
                win = win + s.reshape(shape)
        parts.append(win.reshape(w * dy * dz, K))
    return jnp.concatenate(parts, axis=1)


def choose_slab_rows(
    dims: tuple,
    n_offsets: int,
    cap_b: int,
    radius: int,
    budget: "int | None" = None,
) -> "int | None":
    """Slab width for pair_dist_histogram_pl's slab streaming, or None.

    The B neighborhood planes cost ncells · n_offsets · cap_b · 16 B
    (x, y, z, id as f32); when that exceeds `budget` the cell grid
    streams in leading-axis slabs sized to fit. Shared by the compiler's
    rdf path and tools/bench_scale so they measure the same config.
    Default budget 2 GiB, overridable with VIAMD_TPU_SLAB_BUDGET_MB
    (design-scale memory tuning, tools/bench_scale.py --big).
    """
    import math
    import os

    if budget is None:
        budget = (
            int(os.environ.get("VIAMD_TPU_SLAB_BUDGET_MB", "2048")) << 20
        )
    plane_bytes = math.prod(int(d) for d in dims) * n_offsets * cap_b * 16
    if plane_bytes <= budget:
        return None
    return max(2 * radius + 1, int(dims[0] * budget / plane_bytes))


def pair_dist_histogram_cl(
    x: jnp.ndarray,
    idx_a: jnp.ndarray,  # (na,) static global indices of the A selection
    idx_b: jnp.ndarray,  # (nb,) static global indices of the B selection
    box: jnp.ndarray,  # (3,) orthorhombic extents
    nbins: int,
    r_max: float,
    dims: tuple,
    cap_a: int,
    cap_b: int,
    block: int = 64,
    radius: int = 2,
    basis: jnp.ndarray | None = None,  # (3,3) triclinic cell basis
    inv_basis: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Cell-list pair-distance histogram (orthorhombic or triclinic) → (nbins,).

    Cell-major packed-tile formulation (the TPU-fast shape): each selection
    subset gets its own cell list; coordinates pack into dense per-cell
    tiles (ncells, K, 3), and the B side additionally into per-cell
    neighborhoods (ncells, S·Kb, 3) — ONE moderate gather per frame instead
    of a per-query-atom gather (which is ~n·k random accesses and dominated
    the naive formulation). The compare-CDF histogram then runs as a scan
    over cell blocks with everything fused.

    With `basis`/`inv_basis` the cell is TRICLINIC: atoms bin uniformly in
    FRACTIONAL space (the grid sized by ops.neighbors.choose_grid_triclinic
    so a radius-r stencil still covers the cutoff ball), tiles carry
    fractional coordinates, and distances apply a single-round fractional
    min-image before mapping back through the basis — the same semantics
    as the Pallas triclinic kernel and ops.pbc.min_image for reduced cells.
    This is the non-Pallas backend's escape from the O(n²) dense fallback
    for skewed production cells (rhombic dodecahedron etc.).

    Both (i,j) and (j,i) count when both selections cover them (the
    symmetric convention of the dense kernel). Self pairs excluded by
    global-id comparison. Atoms beyond a cell's capacity are dropped —
    capacities are sized host-side with headroom (ops.neighbors.choose_grid).
    """
    from viamd_tpu.ops.neighbors import build_cell_list
    from viamd_tpu.ops.pbc import cellmul

    tri = basis is not None
    if tri:
        frac = cellmul(x, inv_basis)
        frac = frac - jnp.floor(frac)
        xa = frac[idx_a]
        xb = frac[idx_b]
        box = jnp.ones(3, x.dtype)
    else:
        xa = x[idx_a]
        xb = x[idx_b]
    cl_a = build_cell_list(xa, box, dims, cap_a)
    cl_b = build_cell_list(xb, box, dims, cap_b)
    dx, dy, dz = dims
    ncells = dx * dy * dz

    # dense per-cell tiles
    a_x = xa[cl_a.table]  # (ncells, Ka, 3)
    a_w = cl_a.valid.astype(jnp.float32)
    a_gid = jnp.where(cl_a.valid, idx_a[cl_a.table], -1)
    b_x = xb[cl_b.table]
    b_w = cl_b.valid.astype(jnp.float32)
    b_gid = jnp.where(cl_b.valid, idx_b[cl_b.table], -2)

    S = (2 * radius + 1) ** 3
    C = S * cap_b
    # B neighborhoods via wrapped rolls (HBM-bandwidth copies, no gather)
    nb_x = jnp.stack(
        [
            neighborhood_planes(b_x[..., k], dims, radius)
            for k in range(3)
        ],
        axis=-1,
    )
    nb_w = neighborhood_planes(b_w, dims, radius)
    nb_gid = neighborhood_planes(b_gid, dims, radius)

    edges = (jnp.arange(1, nbins + 1, dtype=jnp.float32) / nbins) * r_max
    nc_pad = -(-ncells // block) * block
    pad = nc_pad - ncells
    if pad:
        a_x = jnp.pad(a_x, ((0, pad), (0, 0), (0, 0)))
        a_w = jnp.pad(a_w, ((0, pad), (0, 0)))
        a_gid = jnp.pad(a_gid, ((0, pad), (0, 0)), constant_values=-1)
        nb_x = jnp.pad(nb_x, ((0, pad), (0, 0), (0, 0)))
        nb_w = jnp.pad(nb_w, ((0, pad), (0, 0)))
        nb_gid = jnp.pad(nb_gid, ((0, pad), (0, 0)), constant_values=-2)

    def cell_block(carry, c0):
        ax = jax.lax.dynamic_slice(a_x, (c0, 0, 0), (block, a_x.shape[1], 3))
        aw = jax.lax.dynamic_slice(a_w, (c0, 0), (block, a_w.shape[1]))
        aid = jax.lax.dynamic_slice(a_gid, (c0, 0), (block, a_gid.shape[1]))
        bx = jax.lax.dynamic_slice(nb_x, (c0, 0, 0), (block, C, 3))
        bw = jax.lax.dynamic_slice(nb_w, (c0, 0), (block, C))
        bid = jax.lax.dynamic_slice(nb_gid, (c0, 0), (block, C))
        d = ax[:, :, None, :] - bx[:, None, :, :]  # (CB, Ka, C, 3)
        if tri:
            d = d - jnp.round(d)  # fractional single-round min-image
            d = cellmul(d, basis)  # back to cartesian (exact f32 FMAs)
        else:
            d = d - box * jnp.round(d / box)
        dist2 = jnp.sum(d * d, axis=-1)
        w = aw[:, :, None] * bw[:, None, :]
        w = jnp.where(aid[:, :, None] == bid[:, None, :], 0.0, w)
        dist = jnp.sqrt(jnp.maximum(dist2, 0.0))
        below = (dist[..., None] < edges).astype(jnp.float32)
        cdf = jnp.sum(below * w[..., None], axis=(0, 1, 2))
        return carry + cdf, None

    starts = jnp.arange(0, nc_pad, block, dtype=jnp.int32)
    cdf, _ = jax.lax.scan(cell_block, jnp.zeros(nbins, jnp.float32), starts)
    return jnp.concatenate([cdf[:1], jnp.diff(cdf)])


def rdf_normalize(
    hist: jnp.ndarray,
    count_a: jnp.ndarray,
    count_b: jnp.ndarray,
    volume: jnp.ndarray,
    r_max: float,
    n_frames: jnp.ndarray,
) -> jnp.ndarray:
    """Convert an accumulated pair histogram to g(r).

    g(r_k) = H_k / (F · N_a · ρ_b · V_shell(k)) with ρ_b = N_b / V.
    For aperiodic systems (volume 0) falls back to a shell-area-normalized
    relative density (finite, shape-preserving), matching the reference's
    behavior of still plotting rdf without a unit cell.
    """
    nbins = hist.shape[-1]
    dr = r_max / nbins
    r_lo = jnp.arange(nbins, dtype=jnp.float32) * dr
    shell = 4.0 / 3.0 * jnp.pi * ((r_lo + dr) ** 3 - r_lo**3)
    vol = jnp.maximum(volume, 0.0)
    rho_b = jnp.where(vol > 0, count_b / jnp.maximum(vol, 1e-30), 1.0)
    denom = (
        jnp.maximum(n_frames, 1)
        * jnp.maximum(count_a, 1e-30)
        * rho_b
        * shell
    )
    return hist / denom


@functools.partial(jax.jit, static_argnames=("nbins", "tile"))
def rdf_frames(
    coords: jnp.ndarray,  # (F, n, 3)
    w_a: jnp.ndarray,  # (n,)
    w_b: jnp.ndarray,  # (n,)
    basis: jnp.ndarray,  # (3,3) or (F,3,3)
    inv_basis: jnp.ndarray,
    nbins: int,
    r_max: float,
    tile: int = 256,
) -> jnp.ndarray:
    """Histogram accumulated over a frame batch (vmap + sum): (nbins,)."""
    if basis.ndim == 2:
        basis = jnp.broadcast_to(basis, (coords.shape[0], 3, 3))
        inv_basis = jnp.broadcast_to(inv_basis, (coords.shape[0], 3, 3))
    per_frame = jax.vmap(
        lambda x, b, ib: pair_dist_histogram(
            x, w_a, w_b, b, ib, nbins, r_max, tile
        )
    )(coords, basis, inv_basis)
    return jnp.sum(per_frame, axis=0)


def pair_dist_histogram_atom_sharded(
    x: jnp.ndarray,
    w_a: jnp.ndarray,
    w_b: jnp.ndarray,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
    nbins: int,
    r_max: float,
    mesh,
    axis: str = "atoms",
    tile: int = 256,
) -> jnp.ndarray:
    """Atom-axis (tensor-parallel) sharded pair histogram → (nbins,).

    The intra-frame scaling axis for ≥1M-atom systems (SURVEY.md §2.4
    "atom-range parallelism" across chips): each device owns a block of A
    rows (w_a shards over `axis`), sees the full coordinate set (replicated —
    1.2 MB/frame rides ICI trivially), computes its row-block histogram with
    the dense tiled kernel, and the (nbins,) partials all-reduce.
    """
    from jax.sharding import PartitionSpec as P

    n = x.shape[0]
    ndev = mesh.shape[axis]
    n_pad = -(-n // (ndev * tile)) * (ndev * tile)
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    wap = jnp.pad(w_a.astype(jnp.float32), (0, n_pad - n))
    wbp = jnp.pad(w_b.astype(jnp.float32), (0, n_pad - n))
    idx = jnp.arange(n_pad, dtype=jnp.int32)

    def shard_fn(x_rep, wa_block, wb_rep, ia_block, basis, inv_basis):
        edges = (jnp.arange(1, nbins + 1, dtype=jnp.float32) / nbins) * r_max
        rows = wa_block.shape[0]

        def row_tile(carry, t0):
            xa = jax.lax.dynamic_slice(
                x_rep, (ia_block[0] + t0, 0), (tile, 3)
            )
            wa = jax.lax.dynamic_slice(wa_block, (t0,), (tile,))
            ia = jax.lax.dynamic_slice(ia_block, (t0,), (tile,))
            d = min_image(
                xa[:, None, :] - x_rep[None, :, :], basis, inv_basis
            )
            dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 0.0))
            w = wa[:, None] * wb_rep[None, :]
            w = jnp.where(ia[:, None] == idx[None, :], 0.0, w)
            below = (dist[:, :, None] < edges).astype(jnp.float32)
            return carry + jnp.sum(below * w[:, :, None], axis=(0, 1)), None

        starts = jnp.arange(0, rows, tile, dtype=jnp.int32)
        cdf, _ = jax.lax.scan(
            row_tile, jnp.zeros(nbins, jnp.float32), starts
        )
        hist = jnp.concatenate([cdf[:1], jnp.diff(cdf)])
        return jax.lax.psum(hist, axis)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(), P(axis), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(xp, wap, wbp, idx, basis, inv_basis)
