"""Spatial distribution function (SDF) accumulation.

Rebuild of the `sdf(ref_sel, target_sel, extent)` script builtin
(reference capability: VOLUME-flagged script properties accumulated in the
internal reference frame of each matched structure — SURVEY.md §3.5;
consumed by density_volume.cpp:180-285 with per-structure world→reference
matrices).

Per frame and per reference structure S:
1. deperiodize S about its PBC-aware COM and Kabsch-align to its static
   reference coordinates → rotation R_s, center c_s (ops.rmsd.align_frame);
2. map every target atom t into the reference frame:
   p = R_s · min_image(x_t − c_s);
3. trilinear-splat targets with |p|∞ ≤ extent into the (D,D,D) grid.

Structures are padded to a common max atom count (static shapes) and vmapped;
frames vmap/shard on top; grids sum across frames and psum across shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from viamd_tpu.ops.density import splat_trilinear
from viamd_tpu.ops.pbc import min_image
from viamd_tpu.ops.rmsd import align_frame


def sdf_reference_frames(
    x: jnp.ndarray,  # (n, 3) frame coords
    struct_idx: jnp.ndarray,  # (S, K) padded atom indices per structure
    struct_w: jnp.ndarray,  # (S, K) weights (0 for padding)
    ref_centered: jnp.ndarray,  # (S, K, 3) static centered reference coords
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-structure (R (S,3,3), center (S,3)) world→reference transforms."""

    def one(idx, w, ref):
        return align_frame(x[idx], w, ref, basis, inv_basis)

    return jax.vmap(one)(struct_idx, struct_w, ref_centered)


def sdf_accumulate(
    x: jnp.ndarray,  # (n, 3)
    target_w: jnp.ndarray,  # (n,) dense target mask/weights
    struct_idx: jnp.ndarray,  # (S, K)
    struct_w: jnp.ndarray,  # (S, K)
    ref_centered: jnp.ndarray,  # (S, K, 3)
    extent: float,
    dims: int,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
) -> jnp.ndarray:
    """One frame's SDF grid (dims, dims, dims), summed over structures."""
    R, c = sdf_reference_frames(
        x, struct_idx, struct_w, ref_centered, basis, inv_basis
    )
    origin = jnp.full((3,), -extent, jnp.float32)
    voxel = jnp.full((3,), 2.0 * extent / dims, jnp.float32)

    def one_structure(Rs, cs):
        d = min_image(x - cs, basis, inv_basis)  # targets relative to S
        d0, d1, d2 = d[..., 0], d[..., 1], d[..., 2]
        p = jnp.stack(
            [
                Rs[0, 0] * d0 + Rs[0, 1] * d1 + Rs[0, 2] * d2,
                Rs[1, 0] * d0 + Rs[1, 1] * d1 + Rs[1, 2] * d2,
                Rs[2, 0] * d0 + Rs[2, 1] * d1 + Rs[2, 2] * d2,
            ],
            axis=-1,
        )  # into reference frame (expanded 3x3 apply)
        return splat_trilinear(p, target_w, (dims, dims, dims), origin, voxel)

    grids = jax.vmap(one_structure)(R, c)
    return jnp.sum(grids, axis=0)


def sdf_accumulate_cl(
    x: jnp.ndarray,
    target_w: jnp.ndarray,
    struct_idx: jnp.ndarray,
    struct_w: jnp.ndarray,
    ref_centered: jnp.ndarray,
    extent: float,
    dims: int,
    box: jnp.ndarray,  # (3,) orthorhombic extents
    cl_dims: tuple,
    cl_capacity: int,
    stencil: "np.ndarray",  # (S3,3) pruned cell offsets (host-computed)
    idx_t: "jnp.ndarray | None" = None,  # static target indices
    compact_cap: "int | None" = None,
    basis: "jnp.ndarray | None" = None,  # (3,3) → TRICLINIC mode
) -> jnp.ndarray:
    """Cell-list SDF for large systems: only targets near each structure.

    Coverage: any atom mapping into the ±extent reference cube lies within
    √3·extent of the structure COM; the pruned stencil (make_sdf_stencil)
    covers that ball. All structures splat into ONE grid through a single
    sorted segment-sum (ops.density.splat_trilinear on the concatenated
    candidate set).

    `idx_t`: static indices of the target selection — the cell list then
    bins only target atoms (smaller sort, tighter capacity, fewer dead
    candidates). Callers passing idx_t must size cl_capacity from
    idx_t.size.

    `compact_cap`: pre-splat compaction capacity. The stencil covers the
    √3·extent ball but the splat only reads points inside the ±extent
    cube (+½ voxel of tent support) — at headline scale that's ~4k of
    133k candidate slots, and the splat's (chunk, dims²) tent-product HBM
    traffic scales with SLOT count. A sort-free mask→cumsum→searchsorted
    compaction packs the in-support points into `compact_cap` static
    slots first (exact when the count fits; the cap is sized with the
    same Poisson-tail drop semantics as the cell capacities).
    """
    from viamd_tpu.ops.density import splat_trilinear
    from viamd_tpu.ops.neighbors import build_cell_list, cell3_of_points
    from viamd_tpu.ops.pbc import cellmul

    if idx_t is None:
        xt, twt = x, target_w
    else:
        xt = x[idx_t]
        twt = target_w[idx_t]
    tri = basis is not None
    if tri:
        from viamd_tpu.ops.pallas_rdf import _inv3x3

        inv_b = _inv3x3(basis)
        xt_b = cellmul(xt, inv_b)  # bin + gather in FRACTIONAL space
        box_bins = jnp.ones(3, jnp.float32)
        Rb, cb = basis, inv_b
    else:
        xt_b = xt
        box_bins = box
        Rb, cb = jnp.diag(box), jnp.diag(1.0 / box)
    cl = build_cell_list(xt_b, box_bins, cl_dims, cl_capacity)
    R, c = sdf_reference_frames(
        x, struct_idx, struct_w, ref_centered, Rb, cb
    )
    # candidate targets per structure from the pruned stencil, gathered
    # directly from the sorted order via per-cell segment offsets — the
    # dense (ncells, cap) slot table is never materialized (its gather is
    # pure overhead when the stencil visits fewer cells than the grid has)
    c_b = cellmul(c, inv_b) if tri else c
    c3 = cell3_of_points(c_b, box_bins, cl.dims)  # (S,3)
    offs = jnp.asarray(stencil, jnp.int32)  # (S3,3)
    dims_arr = jnp.array(cl.dims, jnp.int32)
    dxc, dyc, dzc = cl.dims
    cells = jnp.mod(c3[:, None, :] + offs[None, :, :], dims_arr)
    cell_ids = (cells[..., 0] * dyc + cells[..., 1]) * dzc + cells[..., 2]
    nt = xt.shape[0]
    xs4 = jnp.concatenate([xt_b, twt[:, None]], axis=1)
    if cl.order is not None:
        st = cl.starts[cell_ids]  # (S, S3)
        cnt = cl.starts[cell_ids + 1] - st
        slot = jnp.arange(cl_capacity, dtype=jnp.int32)
        pos = st[..., None] + slot  # (S, S3, cap)
        ok = (slot < cnt[..., None]).reshape(c.shape[0], -1)
        # ONE candidate gather: coords+weight packed (nt, 4) and
        # pre-sorted into cell order, indexed by segment position
        # directly — the order[pos] → xt[cand] → w[cand] triple
        # indirection was the dominant SDF cost (three ~C-sized gathers
        # instead of this single one); the dense (ncells, cap) table is
        # never touched so XLA dead-code-eliminates its build
        cd = xs4[cl.order][
            jnp.minimum(pos, nt - 1).reshape(c.shape[0], -1)
        ]  # (S, C, 4)
    else:
        # grouped cell list (large n): no globally-sorted order exists —
        # address candidates through the slot table instead (same row
        # counts: (S, S3) table rows + (S, C) payload rows)
        cand = cl.table[cell_ids]  # (S, S3, cap)
        ok = cl.valid[cell_ids].reshape(c.shape[0], -1)
        cd = xs4[cand.reshape(c.shape[0], -1)]  # (S, C, 4)

    if tri:
        # fractional single-round min-image, then cart via the basis
        # (matches ops.pbc.min_image semantics)
        f = cd[..., :3] - c_b[:, None, :]
        f = f - jnp.round(f)
        d = cellmul(f, basis)
    else:
        d = cd[..., :3] - c[:, None, :]  # (S, C, 3)
        d = d - box * jnp.round(d / box)
    # p_i = sum_j R_ij d_j, expanded (K=3 einsums are pathological on TPU)
    d0, d1, d2 = d[..., 0], d[..., 1], d[..., 2]
    p = jnp.stack(
        [
            R[:, 0, 0, None] * d0 + R[:, 0, 1, None] * d1 + R[:, 0, 2, None] * d2,
            R[:, 1, 0, None] * d0 + R[:, 1, 1, None] * d1 + R[:, 1, 2, None] * d2,
            R[:, 2, 0, None] * d0 + R[:, 2, 1, None] * d1 + R[:, 2, 2, None] * d2,
        ],
        axis=-1,
    )
    w = cd[..., 3] * ok.astype(jnp.float32)
    origin = jnp.full((3,), -extent, jnp.float32)
    voxel_w = 2.0 * extent / dims
    voxel = jnp.full((3,), voxel_w, jnp.float32)
    pf = p.reshape(-1, 3)
    wf = w.reshape(-1)
    pf, wf = _compact_support(pf, wf, extent, voxel_w, compact_cap)
    return splat_trilinear(pf, wf, (dims, dims, dims), origin, voxel)


def _compact_support(pf, wf, extent, voxel_w, compact_cap):
    """Pre-splat compaction: pack slots whose tent support touches the
    grid (|p|∞ < extent + ½ voxel — the dense splat zeroes everything
    else anyway) into `compact_cap` static slots.

    src[j] = index of the (j+1)-th masked slot, via a two-level rank
    select: per-128-lane-row cumsum + block prefix, then broadcast
    compare-COUNTS at both levels (jnp.searchsorted's binary search
    costs ~4× this on the tunneled backend — tools/exp_compact.py);
    overflow beyond the total clamps with weight forced to 0
    (Poisson-capped, see sdf_compact_capacity). No-op when the cap
    doesn't cut the slot count."""
    n_slots = pf.shape[0]
    if compact_cap is None or compact_cap >= n_slots:
        return pf, wf
    sup = extent + 0.5 * voxel_w
    m = (wf > 0.0) & (jnp.max(jnp.abs(pf), axis=-1) < sup)
    npad = -(-n_slots // 128) * 128
    # In-block lane prefix via an MXU triangle matmul on only the
    # gathered rows (see sdf_accumulate_pairs: a full lane-axis cumsum
    # materializes nb×128 ints just to feed an M-row gather; the 0/1
    # mask is bf16-exact with f32 accumulation).
    mbf = jnp.pad(
        m.astype(jnp.bfloat16), (0, npad - n_slots)
    ).reshape(-1, 128)
    blk = jnp.cumsum(jnp.sum(mbf.astype(jnp.float32), axis=1))  # (nb,)
    j1 = jnp.arange(1, compact_cap + 1, dtype=jnp.float32)
    b = jnp.sum((blk[None, :] < j1[:, None]).astype(jnp.int32), axis=1)
    b = jnp.minimum(b, blk.shape[0] - 1)
    tri = jnp.asarray(
        np.triu(np.ones((128, 128), np.float32)), jnp.bfloat16
    )
    rows = jax.lax.dot_general(
        mbf[b], tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (M, 128) inclusive lane prefix
    r = j1 - (blk[b] - rows[:, -1])  # rank within block, 1-based
    lane = jnp.sum((rows < r[:, None]).astype(jnp.int32), axis=1)
    src = jnp.minimum(b * 128 + jnp.minimum(lane, 127), n_slots - 1)
    keep = j1 <= blk[-1]
    return pf[src], jnp.where(keep, wf[src], 0.0)


def sdf_accumulate_pairs(
    x: jnp.ndarray,
    target_w: jnp.ndarray,
    struct_idx: jnp.ndarray,
    struct_w: jnp.ndarray,
    ref_centered: jnp.ndarray,
    extent: float,
    dims: int,
    basis: jnp.ndarray,
    inv_basis: jnp.ndarray,
    idx_t: jnp.ndarray,  # (n_t,) static target indices
    pair_cap: int,  # per-structure candidate capacity
    compact_cap: "int | None" = None,  # global pre-splat compaction
) -> jnp.ndarray:
    """Sort-free SDF for FEW structures over MANY targets.

    The cell-list route pays an O(n_t log² n_t) argsort to bin ALL
    targets, then reads back only the ~0.1% inside the structures'
    coverage balls (config #4: a 10.6 ms 667k-atom sort to find ~12k
    candidates). With few structures the direct (S, n_t) bounding-sphere
    test is pure fused VPU work (~0.6 ms at 64×667k at the measured
    compare rate) and feeds a per-structure two-level rank-select
    compaction (the ops/sdf.py pre-splat pattern, vectorized over S)
    straight into the splat — no cell list at all. The compiler routes
    here when S·n_t is small enough that the pair test beats the sort
    (docs/PERF.md r5); the cell-list route remains for many-structure
    selections.

    Coverage: any target mapping into the ±extent cube (+½-voxel tent
    support) lies within √3·(extent+½ voxel) of the structure COM in
    minimum-image metric — same ball the cell-list stencil covers.
    Per-structure candidates beyond `pair_cap` drop farthest-ordered-
    by-index (capacity sized host-side with a Poisson tail + frame-0
    measured floor, the same semantics as the cell capacities).
    """
    from viamd_tpu.ops.density import splat_trilinear
    from viamd_tpu.ops.pbc import min_image

    xt = x[idx_t]
    twt = target_w[idx_t]
    n_t = xt.shape[0]
    S = struct_idx.shape[0]
    if n_t == 0 or S == 0:
        return jnp.zeros((dims, dims, dims), jnp.float32)
    R, c = sdf_reference_frames(
        x, struct_idx, struct_w, ref_centered, basis, inv_basis
    )
    voxel_w = 2.0 * extent / dims
    sup = 1.7320508 * (extent + 0.5 * voxel_w) + 1e-4

    # (S, n_t) min-image distance² WITHOUT materializing (S, n_t, 3):
    # per-axis cart diffs → fractional rounds → corrected diffs, all
    # fused elementwise (zero basis → inv=0 → round(0)=0 → identity)
    dk = [xt[:, k][None, :] - c[:, k][:, None] for k in range(3)]
    f = [
        dk[0] * inv_basis[0, a] + dk[1] * inv_basis[1, a]
        + dk[2] * inv_basis[2, a]
        for a in range(3)
    ]
    r = [jnp.round(fa) for fa in f]
    d2 = jnp.zeros((S, n_t), jnp.float32)
    for a in range(3):
        corr = r[0] * basis[0, a] + r[1] * basis[1, a] + r[2] * basis[2, a]
        da = dk[a] - corr
        d2 = d2 + da * da
    m = (twt[None, :] > 0.0) & (d2 < sup * sup)  # (S, n_t)

    # per-structure rank select: src[s, j] = index of the (j+1)-th
    # masked target (two-level: block prefix + in-block lane prefix,
    # then broadcast compare-counts — jnp.searchsorted's binary search
    # is gather-bound and ~4× slower on this backend). The in-block
    # lane prefix is an MXU upper-triangle matmul on ONLY the gathered
    # mask rows — a full (S, nb, 128) lane-axis cumsum would have to
    # materialize 17 MB just to feed a 24k-row gather, and measured
    # 0.53 ms/frame slower at the headline config (tools/exp_sdfpairs.py
    # stages). The 0/1 mask rides bf16 (exact: integer counts ≤ 128 ≪
    # bf16's 256 integer range) with f32 MXU accumulation.
    C = pair_cap
    npad = -(-n_t // 128) * 128
    mbf = jnp.pad(
        m.astype(jnp.bfloat16), ((0, 0), (0, npad - n_t))
    ).reshape(S, -1, 128)
    bs = jnp.sum(mbf.astype(jnp.float32), axis=2)  # (S, nb) block sums
    blk = jnp.cumsum(bs, axis=1)  # (S, nb) inclusive (exact f32 ints)
    nb = blk.shape[1]
    j1 = jnp.arange(1, C + 1, dtype=jnp.float32)
    b = jnp.sum(
        (blk[:, None, :] < j1[None, :, None]).astype(jnp.int32), axis=2
    )  # (S, C) block holding the j-th hit
    b = jnp.minimum(b, nb - 1)
    srow = (
        jax.lax.broadcasted_iota(jnp.int32, (S, C), 0) * nb + b
    ).reshape(-1)
    rows_m = mbf.reshape(S * nb, 128)[srow]  # (S·C, 128) bf16
    tri = jnp.asarray(
        np.triu(np.ones((128, 128), np.float32)), jnp.bfloat16
    )  # tri[k, l] = 1 for k ≤ l ⇒ (row @ tri)[l] = inclusive prefix
    rows = jax.lax.dot_general(
        rows_m, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(S, C, 128)
    blkb = blk.reshape(-1)[srow].reshape(S, C)
    r_in = j1[None, :] - (blkb - rows[:, :, 127])  # rank within block
    lane = jnp.sum((rows < r_in[:, :, None]).astype(jnp.int32), axis=2)
    src = jnp.minimum(b * 128 + jnp.minimum(lane, 127), n_t - 1)
    keep = j1[None, :] <= blk[:, -1][:, None]

    xt4 = jnp.concatenate([xt, twt[:, None]], 1)
    cd = xt4[src]  # (S, C, 4) — S·C row gather
    w = jnp.where(keep, cd[..., 3], 0.0)
    dd = cd[..., :3] - c[:, None, :]
    dd = min_image(dd, basis, inv_basis)
    d0, d1, d2_ = dd[..., 0], dd[..., 1], dd[..., 2]
    p = jnp.stack(
        [
            R[:, 0, 0, None] * d0 + R[:, 0, 1, None] * d1
            + R[:, 0, 2, None] * d2_,
            R[:, 1, 0, None] * d0 + R[:, 1, 1, None] * d1
            + R[:, 1, 2, None] * d2_,
            R[:, 2, 0, None] * d0 + R[:, 2, 1, None] * d1
            + R[:, 2, 2, None] * d2_,
        ],
        axis=-1,
    )
    origin = jnp.full((3,), -extent, jnp.float32)
    voxel = jnp.full((3,), voxel_w, jnp.float32)
    pf, wf = _compact_support(
        p.reshape(-1, 3), w.reshape(-1), extent, voxel_w, compact_cap
    )
    return splat_trilinear(pf, wf, (dims, dims, dims), origin, voxel)


def sdf_pair_capacity(
    n_structures: int,
    n_targets: int,
    box: "np.ndarray",
    extent: float,
    dims: int,
    tail: float = 5.0,
    per_struct_count: "int | None" = None,
) -> int:
    """Host-side per-structure candidate capacity for the pairs route.

    Uniform floor: expected in-ball count = bulk target density ×
    coverage-ball volume; `per_struct_count` (frame-0 measured MAX
    in-ball count over structures) floors clustered selections with
    1.5× + tail·√count drift margin. Snapped to 128 lanes.
    """
    import math

    b = np.asarray(box, np.float64)
    vol = float(np.prod(b))
    voxel_w = 2.0 * extent / dims
    sup = 1.7320508 * (extent + 0.5 * voxel_w)
    lam = (
        n_targets / max(vol, 1e-30) * (4.0 / 3.0) * math.pi * sup**3
        if vol > 0
        else float(n_targets)
    )
    cap = int(math.ceil(lam + tail * math.sqrt(max(lam, 1.0)) + 8.0))
    if per_struct_count is not None:
        cnt = int(per_struct_count)
        cap = max(
            cap,
            int(math.ceil(1.5 * cnt + tail * math.sqrt(max(cnt, 1.0)))),
        )
    cap = min(cap, max(int(n_targets), 1))
    return -(-cap // 128) * 128


def sdf_frame0_ball_count(
    target_xyz: "np.ndarray",  # (n_t, 3) frame-0 target coords
    x0: "np.ndarray",
    struct_idx: "np.ndarray",
    struct_w: "np.ndarray",
    box: "np.ndarray",
    extent: float,
    dims: int,
    basis: "np.ndarray | None" = None,
) -> int:
    """Frame-0 measured MAX per-structure in-coverage-ball target count
    (host NumPy, chunked over structures) — sizes sdf_pair_capacity for
    clustered target selections."""
    w = np.asarray(struct_w, np.float64)
    idx = np.asarray(struct_idx)
    xs = np.asarray(x0, np.float64)[idx]  # (S, K, 3)
    com = (xs * w[..., None]).sum(1) / np.maximum(
        w.sum(1, keepdims=True), 1e-30
    )
    voxel_w = 2.0 * extent / dims
    sup = 1.7320508 * (extent + 0.5 * voxel_w) + 1e-4
    t = np.asarray(target_xyz, np.float64)
    if basis is not None:
        B = np.asarray(basis, np.float64)
        inv = np.linalg.inv(B)
    best = 0
    for s0 in range(0, com.shape[0], 8):
        d = t[None, :, :] - com[s0 : s0 + 8, None, :]
        if basis is not None:
            f = d @ inv
            f -= np.round(f)
            d = f @ B
        else:
            b = np.asarray(box, np.float64)
            if np.all(b > 0):
                d -= b * np.round(d / b)
        cnt = (np.sum(d * d, axis=-1) < sup * sup).sum(axis=1)
        best = max(best, int(cnt.max()) if cnt.size else 0)
    return best


def sdf_compact_capacity(
    n_structures: int,
    n_targets: int,
    box: "np.ndarray",
    extent: float,
    dims: int,
    tail: float = 5.0,
    support_count: "int | None" = None,
) -> int:
    """Host-side sizing of the pre-splat compaction capacity.

    Uniform floor: expected in-support count = S · bulk target density ·
    support-cube volume; one GLOBAL cap (unlike the per-cell caps) so
    relative fluctuation is tiny — a 5σ tail puts the whole-frame
    overflow probability ~3e-7 while still cutting the headline slot
    count ~25×.

    The bulk-density assumption UNDERESTIMATES clustered targets (e.g.
    `sdf(ref, within(6, ref), 6)` concentrates every target near the
    structures), so when `support_count` — the frame-0 MEASURED
    in-support point count from sdf_frame0_support_count — is given,
    the capacity is also floored by 1.5× it + tail·√count margin for
    frame-to-frame variation. Snapped up to 512; the kernel disables
    compaction entirely when the cap reaches the slot count, so a
    pathological estimate degrades to the exact uncompacted path.
    """
    import math

    b = np.asarray(box, np.float64)
    vol = float(np.prod(b))
    side = 2.0 * extent + 2.0 * extent / dims  # cube + tent support
    lam = n_structures * n_targets / max(vol, 1e-30) * side**3
    cap = int(math.ceil(lam + tail * math.sqrt(max(lam, 1.0))))
    if support_count is not None:
        cnt = int(support_count)
        data_cap = int(
            math.ceil(1.5 * cnt + tail * math.sqrt(max(cnt, 1.0)))
        )
        cap = max(cap, data_cap)
    return -(-cap // 512) * 512


def make_sdf_stencil_triclinic(
    extent: float, basis: "np.ndarray", dims: tuple
) -> "np.ndarray":
    """Pruned FRAC-space cell-offset stencil covering the √3·extent ball
    for a triclinic cell. Reach per frac axis i: ceil(D·|inv[:,i]|·dims_i)
    + 1; pruning uses the per-axis lower bound |cart(f)| ≥ |f_i|·spacing_i
    (spacing = lattice-plane distance), which is safe for any skew."""
    b = np.asarray(basis, np.float64)
    inv = np.linalg.inv(b)
    spacing = 1.0 / np.linalg.norm(inv, axis=0)
    D = 1.7320508 * extent
    dims = np.asarray(dims, np.int64)
    rc = np.ceil(D / spacing * dims).astype(int) + 1
    offs = []
    for i in range(-rc[0], rc[0] + 1):
        for j in range(-rc[1], rc[1] + 1):
            for k in range(-rc[2], rc[2] + 1):
                dmin = max(
                    max(abs(o) - 1, 0) / dims[ax] * spacing[ax]
                    for ax, o in enumerate((i, j, k))
                )
                if dmin <= D:
                    offs.append((i, j, k))
    return np.asarray(offs, np.int32)


def sdf_frame0_support_count(
    target_xyz: "np.ndarray",  # (n_t, 3) frame-0 target coords
    x0: "np.ndarray",  # (n, 3) frame-0 coords
    struct_idx: "np.ndarray",  # (S, K)
    struct_w: "np.ndarray",  # (S, K)
    ref_centered: "np.ndarray",  # (S, K, 3)
    box: "np.ndarray",
    extent: float,
    dims: int,
    basis: "np.ndarray | None" = None,
) -> int:
    """Exact frame-0 count of (structure, target) pairs inside the
    ±(extent + ½·voxel) support cube — host-side NumPy Kabsch, used to
    size the compaction capacity for clustered target selections.

    The rotation-convention ambiguity is resolved defensively: both
    R and Rᵀ orientations are counted and the larger taken (a capacity
    bound only needs to be ≥ the true count). `basis` switches the
    min-image to the triclinic fractional round.
    """
    b = np.asarray(box, np.float64)
    if basis is not None:
        Bm = np.asarray(basis, np.float64)
        Bi = np.linalg.inv(Bm)

        def _mimg(d):
            f = d @ Bi
            f -= np.round(f)
            return f @ Bm
    else:

        def _mimg(d):
            return d - b * np.round(d / b)
    t = np.asarray(target_xyz, np.float64)
    if not len(t):
        return 0
    sup = extent + extent / dims
    total = 0
    for s in range(struct_idx.shape[0]):
        ix = np.asarray(struct_idx[s])
        ws = np.asarray(struct_w[s], np.float64)
        P = np.asarray(x0, np.float64)[ix]
        # deperiodize about the first atom, then weighted center
        P = P[0] + _mimg(P - P[0])
        c = (P * ws[:, None]).sum(0) / max(ws.sum(), 1e-30)
        Pc = (P - c) * (ws[:, None] > 0)
        ref = np.asarray(ref_centered[s], np.float64)
        H = (Pc * ws[:, None]).T @ ref
        U, _, Vt = np.linalg.svd(H)
        Rm = (U @ Vt).T
        if np.linalg.det(Rm) < 0:
            U[:, -1] *= -1
            Rm = (U @ Vt).T
        d = _mimg(t - c)
        for R_ in (Rm, Rm.T):
            cnt = int(
                np.sum(np.max(np.abs(d @ R_.T), axis=1) < sup)
            )
            if R_ is Rm:
                cnt_a = cnt
            else:
                total += max(cnt_a, cnt)
    return total


def make_sdf_stencil(extent: float, cell_w: np.ndarray) -> "np.ndarray":
    """Host-side pruned cell-offset stencil covering the √3·extent ball."""
    w = float(np.min(cell_w))
    D = 1.7320508 * extent
    rc = int(np.ceil(D / w)) + 1
    offs = []
    for i in range(-rc, rc + 1):
        for j in range(-rc, rc + 1):
            for k in range(-rc, rc + 1):
                md = sum(max(abs(o) - 1, 0) ** 2 for o in (i, j, k))
                if md * w * w <= D * D:
                    offs.append((i, j, k))
    return np.asarray(offs, np.int32)


def sdf_frames(
    coords: jnp.ndarray,  # (F, n, 3)
    target_w: jnp.ndarray,
    struct_idx: jnp.ndarray,
    struct_w: jnp.ndarray,
    ref_centered: jnp.ndarray,
    extent: float,
    dims: int,
    basis: jnp.ndarray,  # (3,3) or (F,3,3)
    inv_basis: jnp.ndarray,
) -> jnp.ndarray:
    """SDF grid accumulated over a frame batch."""
    if basis.ndim == 2:
        basis = jnp.broadcast_to(basis, (coords.shape[0], 3, 3))
        inv_basis = jnp.broadcast_to(inv_basis, (coords.shape[0], 3, 3))
    per_frame = jax.vmap(
        lambda xf, b, ib: sdf_accumulate(
            xf, target_w, struct_idx, struct_w, ref_centered,
            extent, dims, b, ib,
        )
    )(coords, basis, inv_basis)
    return jnp.sum(per_frame, axis=0)


def make_structure_inputs(
    indices_per_structure: list,
    masses: "jnp.ndarray | None",
    ref_coords: jnp.ndarray,  # (n, 3) topology/frame-0 coords
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Host-side packing: list of index arrays → padded (S,K) inputs.

    Returns (struct_idx, struct_w, ref_centered) with K = max structure size.
    Padding entries reuse index 0 with weight 0 (gather-safe).
    """
    import numpy as np

    S = len(indices_per_structure)
    K = max(len(ix) for ix in indices_per_structure)
    idx = np.zeros((S, K), np.int32)
    w = np.zeros((S, K), np.float32)
    for s, ix in enumerate(indices_per_structure):
        idx[s, : len(ix)] = ix
        if masses is not None:
            w[s, : len(ix)] = np.asarray(masses)[ix]
        else:
            w[s, : len(ix)] = 1.0
    ref = np.asarray(ref_coords, np.float32)[idx]  # (S,K,3)
    wsum = np.maximum(w.sum(axis=1, keepdims=True), 1e-30)
    centers = (ref * w[..., None]).sum(axis=1, keepdims=True) / wsum[..., None]
    ref_centered = (ref - centers) * (w[..., None] > 0)
    return idx, w, ref_centered
