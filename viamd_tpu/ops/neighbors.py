"""Cell-list spatial binning for cutoff-limited pair kernels (jittable).

The reference's analysis kernels iterate all pairs on the CPU with SIMD
(md_util.h); at this framework's design scale (100k–100M atoms,
/root/reference/src/main.cpp:1134-1138) cutoff kernels need O(n·k) candidate
generation. This is the TPU formulation of a classic MD cell list with
fully static shapes:

1. atoms hash to cells of width ≥ cutoff/2 (orthorhombic fast path);
2. one argsort over cell ids orders atoms by cell (TPU bitonic sort);
3. the (ncells, K) slot table is a pure GATHER from the sorted order —
   no scatter anywhere;
4. per-atom candidates = the 5³ neighbor-cell stencil's slots, shaped
   (n, 125·K) — consumed tile-by-tile by RDF/SDF/within kernels with the
   distance→mask→histogram chain fused by XLA.

Overcapacity cells drop their tail atoms; `capacity` is sized host-side
from density with ~3× headroom and overflow is detectable via `n_dropped`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CellList:
    order: Any  # (n,) int32 atom order sorted by cell
    cell_of_atom: Any  # (n,) int32 cell id per (unsorted) atom
    starts: Any  # (ncells+1,) int32 offsets into sorted order
    table: Any  # (ncells, K) int32 atom indices (undefined where invalid)
    valid: Any  # (ncells, K) bool
    n_dropped: Any  # () int32 atoms beyond capacity
    dims: tuple = dataclasses.field(metadata=dict(static=True), default=(1, 1, 1))
    capacity: int = dataclasses.field(metadata=dict(static=True), default=0)


def choose_grid(box: np.ndarray, cutoff: float, n_atoms: int) -> tuple:
    """Host-side sizing: (dims (3,), capacity). Cell width ≥ cutoff/2."""
    box = np.asarray(box, np.float64)
    target = max(cutoff / 2.0, 1e-3)
    dims = np.maximum(np.floor(box / target).astype(int), 1)
    dims = np.minimum(dims, 128)  # cap table size
    ncells = int(dims.prod())
    mean = n_atoms / ncells
    capacity = int(np.ceil(max(mean * 3.0, 4.0)))
    return tuple(int(d) for d in dims), capacity


def choose_grid_r(
    box: np.ndarray, cutoff: float, n_atoms: int, radius: int = 1,
    tail: float = 4.5,
) -> tuple:
    """Host-side sizing with Poisson-tail capacity: (dims, capacity).

    Cell width ≥ cutoff/radius (radius = stencil reach in cells). Capacity
    λ + 4.5√λ + 2 covers the Poisson occupancy tail to ~+4.5σ — at high
    per-cell occupancy (radius=1 → λ ≈ 30+ at liquid density) this is far
    tighter than the 3λ rule and roughly doubles pair-slot fill in the
    cell-pair kernels, while keeping the overflow-drop probability at the
    same (negligible) level as the 3λ rule had at λ ≈ 4.
    """
    box = np.asarray(box, np.float64)
    target = max(cutoff / max(radius, 1), 1e-3)
    dims = np.maximum(np.floor(box / target).astype(int), 1)
    dims = np.minimum(dims, 128)
    ncells = int(dims.prod())
    lam = n_atoms / ncells
    capacity = int(np.ceil(lam + tail * np.sqrt(lam) + 2.0))
    return tuple(int(d) for d in dims), capacity


def choose_grid_triclinic(
    basis: np.ndarray, cutoff: float, n_atoms: int, radius: int = 1,
    tail: float = 4.5,
) -> tuple:
    """Host-side sizing for a TRICLINIC cell grid: (dims, capacity).

    Cells are uniform in FRACTIONAL space; the stencil-coverage
    condition uses the lattice-plane spacings: two points within
    `cutoff` differ in fractional axis i by at most cutoff·|inv[:, i]|,
    so radius-r coverage needs dims_i ≤ r·spacing_i/cutoff with
    spacing_i = 1/|inv[:, i]| (the perpendicular width of the cell
    along axis i). Same Poisson-tail capacity as choose_grid_r.
    """
    b = np.asarray(basis, np.float64)
    inv = np.linalg.inv(b)
    spacing = 1.0 / np.linalg.norm(inv, axis=0)  # (3,)
    dims = np.maximum(
        np.floor(radius * spacing / max(cutoff, 1e-6)).astype(int), 1
    )
    dims = np.minimum(dims, 128)
    ncells = int(dims.prod())
    lam = n_atoms / ncells
    capacity = int(np.ceil(lam + tail * np.sqrt(lam) + 2.0))
    return tuple(int(d) for d in dims), capacity


@partial(jax.jit, static_argnames=("dims", "capacity"))
def build_cell_list(
    x: jnp.ndarray, box: jnp.ndarray, dims: tuple, capacity: int
) -> CellList:
    """Bin atoms of one frame into a cell grid.

    Orthorhombic: `box` is the (3,) extents. Triclinic callers convert to
    FRACTIONAL coords first (ops.pbc.cellmul with the inverse basis) and
    pass box=ones — the grid is uniform in fractional space."""
    n = x.shape[0]
    dx, dy, dz = dims
    dims_arr = jnp.array(dims, jnp.int32)
    frac = x / box  # box: (3,) extents (ones in fractional mode)
    frac = frac - jnp.floor(frac)  # wrap into [0,1)
    c3 = jnp.clip((frac * dims_arr).astype(jnp.int32), 0, dims_arr - 1)
    cid = (c3[:, 0] * dy + c3[:, 1]) * dz + c3[:, 2]
    ncells = dx * dy * dz
    cell_bits = int(np.ceil(np.log2(max(ncells + 1, 2))))
    idx_bits = max(int(np.ceil(np.log2(max(n, 2)))), 1)
    groups = _grouped_sort_groups(n, cell_bits, idx_bits)
    if idx_bits + cell_bits + 1 <= 31:
        # pack (cell id, atom idx) into one int32: a single-operand sort is
        # ~2× an argsort's key+payload co-sort, and the atom index tiebreak
        # makes the order fully deterministic
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        packed = jnp.sort((cid << idx_bits) | iota)
        order = (packed & ((1 << idx_bits) - 1)).astype(jnp.int32)
        cid_sorted = (packed >> idx_bits).astype(jnp.int32)
    elif groups is not None:
        return _build_cell_list_grouped(
            cid, n, ncells, dims, capacity, groups)
    else:
        order = jnp.argsort(cid).astype(jnp.int32)
        cid_sorted = cid[order]
    cells = jax.lax.broadcasted_iota(jnp.int32, (ncells + 1, 1), 0)[:, 0]
    starts = jnp.searchsorted(cid_sorted, cells, side="left").astype(jnp.int32)
    # slot table: gather sorted atoms at starts[c] + k
    slot = jax.lax.broadcasted_iota(jnp.int32, (ncells, capacity), 1)
    pos = starts[:-1][:, None] + slot
    count = (starts[1:] - starts[:-1])[:, None]
    valid = slot < count
    pos_c = jnp.minimum(pos, n - 1)
    table = order[pos_c]
    dropped = jnp.sum(jnp.maximum(starts[1:] - starts[:-1] - capacity, 0))
    return CellList(
        order=order,
        cell_of_atom=cid,
        starts=starts,
        table=table,
        valid=valid,
        n_dropped=dropped,
        dims=dims,
        capacity=capacity,
    )


def _grouped_sort_groups(n: int, cell_bits: int, idx_bits: int,
                         max_groups: int = 64):
    """Pick the group count for the grouped packed sort: smallest power of
    two G with ceil(log2(n/G)) + cell_bits + 1 <= 31, or None if that
    needs more than `max_groups` (the per-group-starts table and the
    G-way ownership select stop paying past ~64 groups — huge single-chip
    systems keep the argsort fallback; 100M-atom scale is the slab-sharded
    multi-chip path).

    OFF BY DEFAULT (opt in with VIAMD_TPU_GROUPED_SORT=1): measured on
    the v5e (tools/exp_groupsort.py, docs/PERF.md round-3/5 ledger), the
    batched (G, n/G) single-operand sort alone is 4.4-5.6x faster than
    the argsort it replaces (1.7 vs 9.5 ms at 333k / 4.2 vs 17.4 at
    667k). The r5 G-way compare-select table build removed the 3-gather
    overhead (grouped build 23.4 -> 16.9 ms at 333k), but the Gx
    per-group boundary searchsorted alone (+9/+23/+34 ms at
    333k/667k-rdf/667k-sdf grids — log2(m) chained (G, ncells)-row
    gather steps) still exceeds the whole argsort build (11.6/19.3/20.5
    ms full builds, r5 re-measure) — the build stays gather-bound, not
    sort-bound, on this backend. A spatial-slab two-pass variant (coarse
    cx sort, per-slab fine sort, starts by reshape) prices out the same
    way: its two extra (~n)-row gathers at the measured ~1.9e8 rows/s
    (tools/exp_gather2.py) cost more than the sort savings."""
    import os

    if os.environ.get("VIAMD_TPU_GROUPED_SORT", "0") != "1":
        return None
    g = 1
    while g <= max_groups:
        m = -(-n // g)
        mbits = max(int(np.ceil(np.log2(max(m, 2)))), 1)
        if mbits + cell_bits + 1 <= 31:
            return g if g > 1 else None  # g==1 is the plain packed path
        g *= 2
    return None


def _build_cell_list_grouped(
    cid, n: int, ncells: int, dims: tuple, capacity: int, G: int
) -> CellList:
    """Large-n cell binning without the 2-operand argsort: split atoms into
    G index-groups (a free reshape), pack (cid << mbits | local_idx) into
    int32 per group, and batch-sort (G, m) — ~3x fewer effective sort
    passes than argsort at 1M atoms (single operand x log²(n/G) vs
    2 x log²(n)).  The (ncells, capacity) slot table is then built
    directly from the grouped sorts via a G-way column-ownership
    compare-CDF (group g owns columns [prefix[c,g], prefix[c,g+1]) of
    cell c's row), so no globally-sorted order is ever materialized
    (order=None; consumers address candidates through table/valid/starts
    — ops/sdf.py, ops/pallas_rdf.py).  Deterministic (group-major within
    each cell) but not index-stable; downstream histograms/splats are
    order-independent."""
    m = -(-n // G)
    mbits = max(int(np.ceil(np.log2(max(m, 2)))), 1)
    pad = G * m - n
    # pad keys sort to the tail of the last group (cid = ncells > all)
    key = (cid << mbits) | (
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0] % m
    )
    key = jnp.pad(key, (0, pad), constant_values=(ncells << mbits))
    skey = jnp.sort(key.reshape(G, m), axis=1)
    local = (skey & ((1 << mbits) - 1)).astype(jnp.int32)
    # concatenated grouped order: global atom index per (g, r)
    goff = jax.lax.broadcasted_iota(jnp.int32, (G, m), 0) * m
    order_g = (local + goff).reshape(-1)  # (G*m,) — NOT globally sorted
    # per-group cell boundaries: (G, ncells+1)
    cells = jax.lax.broadcasted_iota(jnp.int32, (ncells + 1, 1), 0)[:, 0]
    starts_g = jax.vmap(
        lambda row: jnp.searchsorted(row, cells << mbits, side="left")
    )(skey).astype(jnp.int32)
    counts_g = starts_g[:, 1:] - starts_g[:, :-1]  # (G, ncells)
    # prefix[c, g] = columns of cell c's table row owned by groups < g
    prefix = jnp.concatenate(
        [jnp.zeros((1, ncells), jnp.int32), jnp.cumsum(counts_g, axis=0)],
        axis=0,
    ).T  # (ncells, G+1)
    count = prefix[:, -1]  # (ncells,) total per cell
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(count).astype(jnp.int32)]
    )
    slot = jax.lax.broadcasted_iota(jnp.int32, (ncells, capacity), 1)
    # ownership: g_own(c, k) = #{g : prefix[c, g+1] <= k}
    g_own = jnp.sum(
        (prefix[:, 1:G + 1][:, None, :] <= slot[:, :, None]).astype(
            jnp.int32),
        axis=2,
    )
    g_own = jnp.minimum(g_own, G - 1)
    # Select own_prefix/own_start by a G-way compare-select instead of the
    # r3 flat-index gathers: each gather charged ncells·capacity ROWS
    # (~2.2 ms apiece at config-#4 scale — gathers are row-priced on this
    # backend), while G compare+selects per slot are pure VPU and fuse
    # into the surrounding elementwise graph. comb folds the group's
    # whole src contribution (g·m + starts_g − prefix) into ONE selected
    # value so only a single select chain is needed.
    goffs = jax.lax.broadcasted_iota(jnp.int32, (G, ncells), 0) * m
    comb = (goffs + starts_g[:, :-1] - prefix.T[:-1]).T  # (ncells, G)
    own_comb = jnp.zeros((ncells, capacity), jnp.int32)
    for g in range(G):
        own_comb = jnp.where(g_own == g, comb[:, g : g + 1], own_comb)
    src = own_comb + slot
    valid = slot < count[:, None]
    table = order_g[jnp.clip(src, 0, G * m - 1)]
    dropped = jnp.sum(jnp.maximum(count - capacity, 0))
    return CellList(
        order=None,
        cell_of_atom=cid,
        starts=starts,
        table=table,
        valid=valid,
        n_dropped=dropped,
        dims=dims,
        capacity=capacity,
    )


def _stencil_offsets(radius: int = 2) -> np.ndarray:
    r = radius
    return np.array(
        [
            (i, j, k)
            for i in range(-r, r + 1)
            for j in range(-r, r + 1)
            for k in range(-r, r + 1)
        ],
        np.int32,
    )


def candidate_cells(
    cl: CellList, cell_ids3: jnp.ndarray, radius: int = 2
) -> jnp.ndarray:
    """(Q, S) wrapped neighbor-cell ids for query cells given as (Q,3)."""
    dx, dy, dz = cl.dims
    offs = jnp.asarray(_stencil_offsets(radius))  # (S,3)
    c = cell_ids3[:, None, :] + offs[None, :, :]
    c = jnp.mod(c, jnp.array(cl.dims, jnp.int32))
    return (c[..., 0] * dy + c[..., 1]) * dz + c[..., 2]


def cell3_of_points(
    pts: jnp.ndarray, box: jnp.ndarray, dims: tuple
) -> jnp.ndarray:
    dims_arr = jnp.array(dims, jnp.int32)
    frac = pts / box
    frac = frac - jnp.floor(frac)
    return jnp.clip((frac * dims_arr).astype(jnp.int32), 0, dims_arr - 1)


def gather_candidates(
    cl: CellList, pts: jnp.ndarray, box: jnp.ndarray, radius: int = 2
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For query points (Q,3): (Q, S·K) candidate atom indices + validity."""
    c3 = cell3_of_points(pts, box, cl.dims)
    cells = candidate_cells(cl, c3, radius)  # (Q,S)
    idx = cl.table[cells]  # (Q,S,K)
    ok = cl.valid[cells]
    Q = pts.shape[0]
    return idx.reshape(Q, -1), ok.reshape(Q, -1)
