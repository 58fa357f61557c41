"""Kernel unit tests against NumPy references (SURVEY.md §4 strategy)."""

import numpy as np
import jax.numpy as jnp
import pytest

from viamd_tpu.ops import pbc, com, geometry, covariance, histogram, rdf
from viamd_tpu.ops import density, rmsd as rmsd_ops, interpolate, backbone


def ortho_cell(L=10.0):
    basis = jnp.eye(3) * L
    inv = jnp.eye(3) / L
    return basis.astype(jnp.float32), inv.astype(jnp.float32)


def no_cell():
    z = jnp.zeros((3, 3), jnp.float32)
    return z, z


class TestPBC:
    def test_min_image_ortho(self):
        basis, inv = ortho_cell(10.0)
        d = jnp.array([[6.0, -7.0, 0.2]])
        out = np.asarray(pbc.min_image(d, basis, inv))
        np.testing.assert_allclose(out[0], [-4.0, 3.0, 0.2], atol=1e-5)

    def test_min_image_nopbc(self):
        basis, inv = no_cell()
        d = jnp.array([[6.0, -7.0, 0.2]])
        out = np.asarray(pbc.min_image(d, basis, inv))
        np.testing.assert_allclose(out[0], [6.0, -7.0, 0.2], atol=1e-6)

    def test_min_image_triclinic(self):
        from viamd_tpu.core.unitcell import UnitCell

        c = UnitCell.from_lengths_angles(10, 10, 10, 90, 90, 60)
        basis = jnp.asarray(c.basis)
        inv = jnp.asarray(c.inv_basis)
        rng = np.random.RandomState(3)
        pts = rng.uniform(-5, 5, (50, 3)).astype(np.float32)
        out_fast = np.asarray(pbc.min_image(jnp.asarray(pts), basis, inv))
        out_exact = np.asarray(pbc.min_image_exact(jnp.asarray(pts), basis, inv))
        B = np.asarray(c.basis)
        shifts = np.array(
            [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]
        ) @ B
        invB = np.linalg.inv(B)
        for p, of, oe in zip(pts, out_fast, out_exact):
            best = min(np.linalg.norm(p + s) for s in shifts)
            # exact variant finds the true minimum image
            assert abs(np.linalg.norm(oe) - best) < 1e-3
            # fast variant is lattice-equivalent to the input (whole shifts)
            frac_shift = (of - p) @ invB
            np.testing.assert_allclose(
                frac_shift, np.round(frac_shift), atol=1e-3
            )

    def test_wrap(self):
        basis, inv = ortho_cell(10.0)
        x = jnp.array([[12.5, -0.5, 3.0]])
        out = np.asarray(pbc.wrap(x, basis, inv))
        np.testing.assert_allclose(out[0], [2.5, 9.5, 3.0], atol=1e-5)

    def test_inv_basis_of(self):
        b = jnp.eye(3) * 5.0
        np.testing.assert_allclose(
            np.asarray(pbc.inv_basis_of(b)), np.eye(3) / 5, atol=1e-6
        )
        z = jnp.zeros((3, 3))
        np.testing.assert_allclose(np.asarray(pbc.inv_basis_of(z)), 0.0)

    def test_unwrap_frames(self):
        basis, inv = ortho_cell(10.0)
        # atom crossing the boundary: 9.8 → 0.1 should unwrap to 10.1
        coords = jnp.array([[[9.8, 5, 5]], [[0.1, 5, 5]], [[0.4, 5, 5]]])
        out = np.asarray(pbc.unwrap_frames(coords, basis, inv))
        np.testing.assert_allclose(out[:, 0, 0], [9.8, 10.1, 10.4], atol=1e-5)


class TestCOM:
    def test_aperiodic_weighted(self):
        basis, inv = no_cell()
        x = jnp.array([[0.0, 0, 0], [2.0, 0, 0]])
        w = jnp.array([1.0, 3.0])
        out = np.asarray(com.com(x, w, basis, inv))
        np.testing.assert_allclose(out, [1.5, 0, 0], atol=1e-6)

    def test_periodic_straddle(self):
        # two atoms straddling the boundary: COM must be near the boundary,
        # not the box center
        basis, inv = ortho_cell(10.0)
        x = jnp.array([[9.6, 1, 1], [0.4, 1, 1]])
        w = jnp.ones(2)
        out = np.asarray(com.com(x, w, basis, inv))
        assert out[0] < 0.5 or out[0] > 9.5

    def test_segments(self):
        basis, inv = ortho_cell(10.0)
        x = jnp.array([[1.0, 1, 1], [2.0, 1, 1], [5.0, 5, 5], [6.0, 5, 5]])
        w = jnp.ones(4)
        seg = jnp.array([0, 0, 1, 1])
        out = np.asarray(com.com_segments(x, w, seg, 2, basis, inv))
        np.testing.assert_allclose(out[0], [1.5, 1, 1], atol=1e-4)
        np.testing.assert_allclose(out[1], [5.5, 5, 5], atol=1e-4)


class TestEigen:
    def test_vs_numpy(self):
        rng = np.random.RandomState(0)
        for _ in range(20):
            M = rng.randn(3, 3)
            A = (M + M.T).astype(np.float32)
            vals, vecs = covariance.eigh3x3(jnp.asarray(A))
            vals, vecs = np.asarray(vals), np.asarray(vecs)
            ref = np.sort(np.linalg.eigvalsh(A))[::-1]
            np.testing.assert_allclose(vals, ref, atol=1e-4 * max(1, abs(ref).max()))
            for k in range(3):
                v = vecs[:, k]
                np.testing.assert_allclose(
                    A @ v, vals[k] * v, atol=2e-3 * max(1, abs(ref).max())
                )

    def test_batched(self):
        rng = np.random.RandomState(1)
        M = rng.randn(7, 3, 3).astype(np.float32)
        A = M + np.swapaxes(M, -1, -2)
        vals, vecs = covariance.eigh3x3(jnp.asarray(A))
        assert vals.shape == (7, 3) and vecs.shape == (7, 3, 3)
        assert (np.diff(np.asarray(vals), axis=-1) <= 1e-4).all()

    def test_degenerate_sphere(self):
        vals, vecs = covariance.eigh3x3(jnp.eye(3) * 2.0)
        np.testing.assert_allclose(np.asarray(vals), [2, 2, 2], atol=1e-5)
        # eigenvectors orthonormal
        V = np.asarray(vecs)
        np.testing.assert_allclose(V.T @ V, np.eye(3), atol=1e-4)


class TestShapeWeights:
    def _weights(self, pts):
        basis, inv = no_cell()
        w = jnp.ones(pts.shape[0])
        return np.asarray(
            covariance.shape_weights(jnp.asarray(pts, jnp.float32), w, basis, inv)
        )

    def test_linear(self):
        pts = np.stack([np.linspace(0, 10, 50), np.zeros(50), np.zeros(50)], 1)
        lin, pla, iso = self._weights(pts)
        assert lin > 0.95 and iso < 0.05

    def test_planar(self):
        rng = np.random.RandomState(0)
        pts = np.stack(
            [rng.uniform(-5, 5, 500), rng.uniform(-5, 5, 500), np.zeros(500)], 1
        )
        lin, pla, iso = self._weights(pts)
        assert pla > 0.6 and iso < 0.05

    def test_isotropic(self):
        rng = np.random.RandomState(0)
        pts = rng.normal(size=(2000, 3))
        lin, pla, iso = self._weights(pts)
        assert iso > 0.8
        np.testing.assert_allclose(lin + pla + iso, 1.0, atol=1e-5)


class TestGeometry:
    def test_distance_pbc(self):
        basis, inv = ortho_cell(10.0)
        x = jnp.array([[0.5, 0, 0], [9.5, 0, 0], [3.0, 4.0, 0]])
        d = np.asarray(
            geometry.distance(x, jnp.array([0]), jnp.array([1]), basis, inv)
        )
        np.testing.assert_allclose(d, [1.0], atol=1e-5)

    def test_angle(self):
        basis, inv = no_cell()
        x = jnp.array([[1.0, 0, 0], [0.0, 0, 0], [0.0, 1.0, 0]])
        a = np.asarray(
            geometry.angle(
                x, jnp.array([0]), jnp.array([1]), jnp.array([2]), basis, inv
            )
        )
        np.testing.assert_allclose(a, [np.pi / 2], atol=1e-5)

    def test_dihedral_signs(self):
        basis, inv = no_cell()
        # classic test: trans (180°) and +90° configurations
        x_trans = jnp.array(
            [[0.0, 1, 0], [0, 0, 0], [1, 0, 0], [1, -1, 0]]
        )
        d = np.asarray(
            geometry.dihedral(
                x_trans,
                jnp.array([0]), jnp.array([1]), jnp.array([2]), jnp.array([3]),
                basis, inv,
            )
        )
        np.testing.assert_allclose(np.abs(d), [np.pi], atol=1e-4)
        x_90 = jnp.array([[0.0, 1, 0], [0, 0, 0], [1, 0, 0], [1, 0, 1]])
        d = np.asarray(
            geometry.dihedral(
                x_90,
                jnp.array([0]), jnp.array([1]), jnp.array([2]), jnp.array([3]),
                basis, inv,
            )
        )
        np.testing.assert_allclose(np.abs(d), [np.pi / 2], atol=1e-4)

    def test_distance_min_max(self):
        basis, inv = no_cell()
        x = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [5.0, 0, 0]])
        ma = jnp.array([1.0, 0, 0])
        mb = jnp.array([0.0, 1, 1])
        dmin, dmax = geometry.distance_min_max(x, ma, mb, basis, inv)
        np.testing.assert_allclose(float(dmin), 1.0, atol=1e-5)
        np.testing.assert_allclose(float(dmax), 5.0, atol=1e-5)


class TestHistogram:
    def test_cdf_vs_numpy(self):
        rng = np.random.RandomState(0)
        v = rng.uniform(0, 10, 5000).astype(np.float32)
        w = rng.uniform(0, 1, 5000).astype(np.float32)
        h = np.asarray(histogram.histogram_cdf(jnp.asarray(v), jnp.asarray(w), 32, 0.0, 10.0))
        ref, _ = np.histogram(v, bins=32, range=(0, 10), weights=w)
        np.testing.assert_allclose(h, ref, rtol=1e-3, atol=1e-2)

    def test_bins(self):
        ids = jnp.array([0, 1, 1, 3, -1, 7])
        w = jnp.ones(6)
        h = np.asarray(histogram.histogram_bins(ids, w, 4))
        np.testing.assert_allclose(h, [1, 2, 0, 1])

    def test_segment(self):
        ids = jnp.array([5, 5, 2, 0, 5])
        w = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])
        h = np.asarray(histogram.histogram_segment(ids, w, 6))
        np.testing.assert_allclose(h, [4, 0, 3, 0, 0, 8])

    def test_resample(self):
        h = jnp.array([1.0, 3.0, 5.0, 7.0])
        h2 = np.asarray(histogram.resample_histogram(h, 2))
        np.testing.assert_allclose(h2, [4, 12], atol=1e-5)
        np.testing.assert_allclose(np.asarray(histogram.resample_histogram(h, 8)).sum(), 16, atol=1e-4)


class TestRDF:
    def test_vs_bruteforce(self):
        rng = np.random.RandomState(2)
        L = 8.0
        x = rng.uniform(0, L, (40, 3)).astype(np.float32)
        wa = (rng.rand(40) < 0.5).astype(np.float32)
        wb = (rng.rand(40) < 0.5).astype(np.float32)
        basis, inv = ortho_cell(L)
        nbins, rmax = 16, 4.0
        h = np.asarray(
            rdf.pair_dist_histogram(
                jnp.asarray(x), jnp.asarray(wa), jnp.asarray(wb),
                basis, inv, nbins, rmax, tile=16,
            )
        )
        # brute force
        ref = np.zeros(nbins)
        for i in range(40):
            for j in range(40):
                if i == j or wa[i] == 0 or wb[j] == 0:
                    continue
                d = x[i] - x[j]
                d -= L * np.round(d / L)
                dist = np.linalg.norm(d)
                if dist < rmax:
                    ref[int(dist / rmax * nbins)] += 1
        np.testing.assert_allclose(h, ref, atol=1e-2)

    def test_scatter_matches_dense(self):
        """Host-backend scatter-add variant == the compare-CDF dense path
        (the compiler routes non-TPU backends through it, incl. triclinic
        cells and uneven tiling)."""
        rng = np.random.RandomState(9)
        from viamd_tpu.core.unitcell import UnitCell

        for trial, (n, cellargs) in enumerate(
            [(40, (8, 8, 8, 90, 90, 90)), (150, (12, 10, 9, 90, 90, 60))]
        ):
            c = UnitCell.from_lengths_angles(*cellargs)
            B = np.asarray(c.basis, np.float32)
            x = (rng.uniform(0, 1, (n, 3)) @ B).astype(np.float32)
            wa = (rng.rand(n) < 0.5).astype(np.float32)
            wb = (rng.rand(n) < 0.7).astype(np.float32)
            basis = jnp.asarray(B)
            inv = jnp.asarray(np.linalg.inv(B.astype(np.float64)), jnp.float32)
            args = (
                jnp.asarray(x), jnp.asarray(wa), jnp.asarray(wb),
                basis, inv, 16, 4.0,
            )
            dense = np.asarray(rdf.pair_dist_histogram(*args, tile=64))
            got = np.asarray(rdf.pair_dist_histogram_scatter(*args, tile=64))
            np.testing.assert_allclose(got, dense, atol=1e-2)
            # selection-compacted variant (the config-#1 CPU fast path):
            # overlapping selections (wa∩wb ≠ ∅) must keep self-pair
            # exclusion and weights through the gather
            idx_a = jnp.asarray(np.nonzero(wa)[0].astype(np.int32))
            idx_b = jnp.asarray(np.nonzero(wb)[0].astype(np.int32))
            got_idx = np.asarray(
                rdf.pair_dist_histogram_scatter_idx(
                    jnp.asarray(x), idx_a, idx_b,
                    jnp.asarray(wa[np.asarray(idx_a)]),
                    jnp.asarray(wb[np.asarray(idx_b)]),
                    basis, inv, 16, 4.0, tile=64,
                )
            )
            np.testing.assert_allclose(got_idx, dense, atol=1e-2)

    def test_celllist_matches_dense(self):
        from viamd_tpu.ops.neighbors import choose_grid

        rng = np.random.RandomState(5)
        L = 30.0
        n = 300
        x = rng.uniform(0, L, (n, 3)).astype(np.float32)
        wa = (rng.rand(n) < 0.6).astype(np.float32)
        wb = (rng.rand(n) < 0.6).astype(np.float32)
        basis, inv = ortho_cell(L)
        nbins, rmax = 24, 6.0
        dense = np.asarray(
            rdf.pair_dist_histogram(
                jnp.asarray(x), jnp.asarray(wa), jnp.asarray(wb),
                basis, inv, nbins, rmax, tile=64,
            )
        )
        idx_a = np.nonzero(wa)[0].astype(np.int32)
        idx_b = np.nonzero(wb)[0].astype(np.int32)
        dims, cap_a = choose_grid(np.array([L, L, L]), rmax, idx_a.size)
        _, cap_b = choose_grid(np.array([L, L, L]), rmax, idx_b.size)
        cl_hist = np.asarray(
            rdf.pair_dist_histogram_cl(
                jnp.asarray(x), jnp.asarray(idx_a), jnp.asarray(idx_b),
                jnp.asarray([L, L, L], jnp.float32), nbins, rmax,
                dims, cap_a, cap_b, block=16,
            )
        )
        np.testing.assert_allclose(cl_hist, dense, atol=1e-2)

    def test_ideal_gas_gr(self):
        # uniform random points → g(r) ≈ 1
        rng = np.random.RandomState(0)
        L = 20.0
        n = 400
        x = rng.uniform(0, L, (5, n, 3)).astype(np.float32)
        basis, inv = ortho_cell(L)
        w = jnp.ones(n)
        h = rdf.rdf_frames(jnp.asarray(x), w, w, basis, inv, 20, 8.0, tile=128)
        g = np.asarray(
            rdf.rdf_normalize(h, float(n), float(n), L**3, 8.0, 5)
        )
        # skip first bins (poor statistics); mean should be ~1
        assert abs(np.mean(g[5:]) - 1.0) < 0.15


class TestDensity:
    def test_splat_conserves_mass(self):
        rng = np.random.RandomState(0)
        pts = rng.uniform(1, 7, (100, 3)).astype(np.float32)
        w = rng.uniform(0, 2, 100).astype(np.float32)
        grid = np.asarray(
            density.splat_trilinear(
                jnp.asarray(pts), jnp.asarray(w), (8, 8, 8),
                jnp.zeros(3), jnp.ones(3),
            )
        )
        np.testing.assert_allclose(grid.sum(), w.sum(), rtol=1e-4)

    def test_splat_location(self):
        pts = jnp.array([[2.5, 3.5, 4.5]])  # exactly at voxel center (2,3,4)
        grid = np.asarray(
            density.splat_trilinear(
                pts, jnp.ones(1), (8, 8, 8), jnp.zeros(3), jnp.ones(3)
            )
        )
        assert grid[2, 3, 4] == pytest.approx(1.0, abs=1e-5)

    def test_out_of_grid_dropped(self):
        pts = jnp.array([[-5.0, 0, 0], [100.0, 0, 0]])
        grid = np.asarray(
            density.splat_trilinear(
                pts, jnp.ones(2), (8, 8, 8), jnp.zeros(3), jnp.ones(3)
            )
        )
        assert grid.sum() == pytest.approx(0.0, abs=1e-6)

    def test_blur_preserves_mass(self):
        g = jnp.zeros((16, 16, 16)).at[8, 8, 8].set(5.0)
        out = np.asarray(density.gaussian_blur_3d(g, 1.5))
        np.testing.assert_allclose(out.sum(), 5.0, rtol=1e-3)
        assert out[8, 8, 8] < 5.0


class TestSDF:
    def test_celllist_matches_dense(self):
        from viamd_tpu.ops import sdf as sdf_ops
        from viamd_tpu.ops.neighbors import choose_grid

        rng = np.random.RandomState(4)
        L = 24.0
        n = 600
        x = rng.uniform(0, L, (n, 3)).astype(np.float32)
        # 4 structures of 5 atoms each
        structs = [np.arange(i * 5, i * 5 + 5, dtype=np.int32) for i in range(4)]
        masses = np.ones(n, np.float32)
        idx, w, refc = sdf_ops.make_structure_inputs(structs, masses, x)
        tw = (rng.rand(n) < 0.5).astype(np.float32)
        extent, dims = 5.0, 16
        basis = jnp.eye(3) * L
        inv = jnp.eye(3) / L
        dense = np.asarray(
            sdf_ops.sdf_accumulate(
                jnp.asarray(x), jnp.asarray(tw),
                jnp.asarray(idx), jnp.asarray(w), jnp.asarray(refc),
                extent, dims, basis, inv,
            )
        )
        box = np.array([L, L, L])
        cl_dims, cl_cap = choose_grid(box, 1.7320508 * extent, n)
        stencil = sdf_ops.make_sdf_stencil(extent, box / np.array(cl_dims))
        span = int(stencil.max() - stencil.min()) + 1
        if span > min(cl_dims):
            pytest.skip("box too small for pruned stencil")
        cl = np.asarray(
            sdf_ops.sdf_accumulate_cl(
                jnp.asarray(x), jnp.asarray(tw),
                jnp.asarray(idx), jnp.asarray(w), jnp.asarray(refc),
                extent, dims, jnp.asarray(box, jnp.float32),
                cl_dims, cl_cap, stencil,
            )
        )
        np.testing.assert_allclose(cl, dense, atol=1e-3, rtol=1e-3)
        # target-only cell list (idx_t) on a radius-1 grid: same result
        from viamd_tpu.ops.neighbors import choose_grid_r

        idx_t = np.nonzero(tw)[0].astype(np.int32)
        dims_r1, cap_r1 = choose_grid_r(
            box, 1.7320508 * extent, idx_t.size, radius=1
        )
        stencil1 = sdf_ops.make_sdf_stencil(extent, box / np.array(dims_r1))
        span1 = int(stencil1.max() - stencil1.min()) + 1
        if span1 <= min(dims_r1):
            cl_t = np.asarray(
                sdf_ops.sdf_accumulate_cl(
                    jnp.asarray(x), jnp.asarray(tw),
                    jnp.asarray(idx), jnp.asarray(w), jnp.asarray(refc),
                    extent, dims, jnp.asarray(box, jnp.float32),
                    dims_r1, cap_r1, stencil1, idx_t=jnp.asarray(idx_t),
                )
            )
            np.testing.assert_allclose(cl_t, dense, atol=1e-3, rtol=1e-3)
            # pre-splat compaction: identical when the cap fits all points
            cap = sdf_ops.sdf_compact_capacity(
                len(structs), int(idx_t.size), box, extent, dims
            )
            cl_c = np.asarray(
                sdf_ops.sdf_accumulate_cl(
                    jnp.asarray(x), jnp.asarray(tw),
                    jnp.asarray(idx), jnp.asarray(w), jnp.asarray(refc),
                    extent, dims, jnp.asarray(box, jnp.float32),
                    dims_r1, cap_r1, stencil1, idx_t=jnp.asarray(idx_t),
                    compact_cap=cap,
                )
            )
            np.testing.assert_allclose(cl_c, dense, atol=1e-3, rtol=1e-3)
            # tiny cap still runs (drops points — documented semantics)
            cl_s = np.asarray(
                sdf_ops.sdf_accumulate_cl(
                    jnp.asarray(x), jnp.asarray(tw),
                    jnp.asarray(idx), jnp.asarray(w), jnp.asarray(refc),
                    extent, dims, jnp.asarray(box, jnp.float32),
                    dims_r1, cap_r1, stencil1, idx_t=jnp.asarray(idx_t),
                    compact_cap=8,
                )
            )
            assert 0.0 < cl_s.sum() <= cl_c.sum() + 1e-3

    def test_pairs_matches_dense(self):
        """Sort-free (S, n_t) bounding-sphere pairs route
        (sdf_accumulate_pairs — the few-structure large-system fast
        path, no cell list at all) == the dense path, orthorhombic and
        triclinic, incl. capacity-drop semantics."""
        from viamd_tpu.core.unitcell import UnitCell
        from viamd_tpu.ops import sdf as sdf_ops

        rng = np.random.RandomState(11)
        L = 24.0
        n = 600
        extent, dims = 5.0, 16
        cells = [
            UnitCell.from_lengths_angles(L, L, L, 90, 90, 90),
            UnitCell.from_lengths_angles(L, L, L, 90, 90, 60),
        ]
        for cell in cells:
            B = np.asarray(cell.basis, np.float32)
            x = (rng.uniform(0, 1, (n, 3)) @ B).astype(np.float32)
            structs = [
                np.arange(i * 5, i * 5 + 5, dtype=np.int32) for i in range(4)
            ]
            idx, w, refc = sdf_ops.make_structure_inputs(
                structs, np.ones(n, np.float32), x
            )
            tw = (rng.rand(n) < 0.5).astype(np.float32)
            idx_t = np.nonzero(tw)[0].astype(np.int32)
            basis = jnp.asarray(B)
            inv = jnp.asarray(
                np.linalg.inv(B.astype(np.float64)), jnp.float32
            )
            dense = np.asarray(
                sdf_ops.sdf_accumulate(
                    jnp.asarray(x), jnp.asarray(tw),
                    jnp.asarray(idx), jnp.asarray(w), jnp.asarray(refc),
                    extent, dims, basis, inv,
                )
            )
            cnt0 = sdf_ops.sdf_frame0_ball_count(
                x[idx_t], x, np.asarray(idx), np.asarray(w),
                np.diag(B).copy(), extent, dims,
                basis=None if cell.is_orthorhombic else B,
            )
            cap = sdf_ops.sdf_pair_capacity(
                len(structs), int(idx_t.size), np.diag(B).copy(),
                extent, dims, per_struct_count=cnt0,
            )
            got = np.asarray(
                sdf_ops.sdf_accumulate_pairs(
                    jnp.asarray(x), jnp.asarray(tw),
                    jnp.asarray(idx), jnp.asarray(w), jnp.asarray(refc),
                    extent, dims, basis, inv,
                    jnp.asarray(idx_t), cap,
                )
            )
            np.testing.assert_allclose(got, dense, atol=1e-3, rtol=1e-3)
            # with the global pre-splat compaction (the shipped config)
            ccap = sdf_ops.sdf_compact_capacity(
                len(structs), int(idx_t.size), np.diag(B).copy(),
                extent, dims,
                support_count=sdf_ops.sdf_frame0_support_count(
                    x[idx_t], x, np.asarray(idx), np.asarray(w),
                    np.asarray(refc), np.diag(B).copy(), extent, dims,
                    basis=None if cell.is_orthorhombic else B,
                ),
            )
            got_c = np.asarray(
                sdf_ops.sdf_accumulate_pairs(
                    jnp.asarray(x), jnp.asarray(tw),
                    jnp.asarray(idx), jnp.asarray(w), jnp.asarray(refc),
                    extent, dims, basis, inv,
                    jnp.asarray(idx_t), cap, compact_cap=ccap,
                )
            )
            np.testing.assert_allclose(got_c, dense, atol=1e-3, rtol=1e-3)
            # tiny capacity still runs; drops points (documented semantics)
            small = np.asarray(
                sdf_ops.sdf_accumulate_pairs(
                    jnp.asarray(x), jnp.asarray(tw),
                    jnp.asarray(idx), jnp.asarray(w), jnp.asarray(refc),
                    extent, dims, basis, inv,
                    jnp.asarray(idx_t), 16,
                )
            )
            assert 0.0 < small.sum() <= got.sum() + 1e-3

    def test_pairs_rank_select_saturated_blocks(self):
        """The MXU-triangle rank select (in-block prefix = 0/1 mask row
        @ upper-triangular ones, bf16 operands / f32 accumulation) is
        exact even when whole 128-lane blocks saturate (counts == 128,
        near bf16's 256-integer ceiling): a dense system where EVERY
        target is inside every structure's ball must match the dense
        path bit-for-bit in slot selection."""
        from viamd_tpu.ops import sdf as sdf_ops

        rng = np.random.RandomState(5)
        L = 8.0  # tiny box: every pairwise min-image distance < sup
        n = 640  # 5 full 128-lane blocks, all saturated
        extent, dims = 8.0, 8
        x = rng.uniform(0, L, (n, 3)).astype(np.float32)
        structs = [np.arange(i * 4, i * 4 + 4, dtype=np.int32)
                   for i in range(3)]
        idx, w, refc = sdf_ops.make_structure_inputs(
            structs, np.ones(n, np.float32), x
        )
        tw = np.ones(n, np.float32)
        idx_t = np.arange(n, dtype=np.int32)
        basis = jnp.diag(jnp.full(3, L, jnp.float32))
        inv = jnp.diag(jnp.full(3, 1.0 / L, jnp.float32))
        dense = np.asarray(
            sdf_ops.sdf_accumulate(
                jnp.asarray(x), jnp.asarray(tw), jnp.asarray(idx),
                jnp.asarray(w), jnp.asarray(refc), extent, dims, basis, inv,
            )
        )
        got = np.asarray(
            sdf_ops.sdf_accumulate_pairs(
                jnp.asarray(x), jnp.asarray(tw), jnp.asarray(idx),
                jnp.asarray(w), jnp.asarray(refc), extent, dims, basis,
                inv, jnp.asarray(idx_t), n,  # cap == n: nothing dropped
            )
        )
        np.testing.assert_allclose(got, dense, atol=1e-3, rtol=1e-3)
        assert got.sum() > 0

    def test_celllist_triclinic_matches_dense(self):
        """Fractional-space SDF cell list on a 60° triclinic cell: must
        match the dense (all-pairs) path exactly — skewed cells
        previously fell back to the dense path only."""
        from viamd_tpu.core.unitcell import UnitCell
        from viamd_tpu.ops import sdf as sdf_ops
        from viamd_tpu.ops.neighbors import choose_grid_triclinic

        cell = UnitCell.from_lengths_angles(26, 26, 26, 90, 90, 60)
        B = np.asarray(cell.basis, np.float32)
        rng = np.random.RandomState(7)
        n = 700
        x = (rng.uniform(0, 1, (n, 3)) @ B).astype(np.float32)
        structs = [np.arange(i * 5, i * 5 + 5, dtype=np.int32) for i in range(4)]
        idx, w, refc = sdf_ops.make_structure_inputs(
            structs, np.ones(n, np.float32), x
        )
        tw = (rng.rand(n) < 0.5).astype(np.float32)
        idx_t = np.nonzero(tw)[0].astype(np.int32)
        extent, dims = 4.0, 16
        dense = np.asarray(
            sdf_ops.sdf_accumulate(
                jnp.asarray(x), jnp.asarray(tw), jnp.asarray(idx),
                jnp.asarray(w), jnp.asarray(refc), extent, dims,
                jnp.asarray(B),
                jnp.asarray(np.linalg.inv(B), np.float32),
            )
        )
        cl_dims, cl_cap = choose_grid_triclinic(
            B, 1.7320508 * extent, idx_t.size, radius=1
        )
        stencil = sdf_ops.make_sdf_stencil_triclinic(extent, B, cl_dims)
        if int(stencil.max() - stencil.min()) + 1 > min(cl_dims):
            pytest.skip("box too small for the triclinic stencil")
        got = np.asarray(
            sdf_ops.sdf_accumulate_cl(
                jnp.asarray(x), jnp.asarray(tw), jnp.asarray(idx),
                jnp.asarray(w), jnp.asarray(refc), extent, dims,
                jnp.asarray(np.diag(B).copy()), cl_dims, cl_cap, stencil,
                idx_t=jnp.asarray(idx_t), basis=jnp.asarray(B),
            )
        )
        np.testing.assert_allclose(got, dense, atol=1e-3, rtol=1e-3)
        # with compaction too
        support0 = sdf_ops.sdf_frame0_support_count(
            x[idx_t], x, idx, w, refc,
            np.full(3, abs(np.linalg.det(B)) ** (1 / 3)), extent, dims,
            basis=B,
        )
        cap = sdf_ops.sdf_compact_capacity(
            len(structs), int(idx_t.size),
            np.full(3, abs(np.linalg.det(B)) ** (1 / 3)), extent, dims,
            support_count=support0,
        )
        got_c = np.asarray(
            sdf_ops.sdf_accumulate_cl(
                jnp.asarray(x), jnp.asarray(tw), jnp.asarray(idx),
                jnp.asarray(w), jnp.asarray(refc), extent, dims,
                jnp.asarray(np.diag(B).copy()), cl_dims, cl_cap, stencil,
                idx_t=jnp.asarray(idx_t), basis=jnp.asarray(B),
                compact_cap=cap,
            )
        )
        np.testing.assert_allclose(got_c, dense, atol=1e-3, rtol=1e-3)

    def test_compact_capacity_clustered_targets(self):
        """Targets concentrated around the structures (the within(r, ref)
        pattern) far exceed bulk density — the data-aware capacity must
        cover them exactly, where the uniform-only estimate drops mass."""
        from viamd_tpu.ops import sdf as sdf_ops
        from viamd_tpu.ops.neighbors import choose_grid_r

        rng = np.random.RandomState(11)
        L = 60.0
        S, K = 8, 5
        extent, dims = 5.0, 16
        # well-separated structure sites
        sites = rng.uniform(8, L - 8, (S, 3)).astype(np.float32)
        xs = (sites[:, None, :] + rng.randn(S, K, 3) * 0.8).astype(
            np.float32
        )
        # 2,400 targets clustered within 4 Å of the sites + 200 bulk
        per = 300
        clus = (
            np.repeat(sites, per, axis=0)
            + rng.randn(S * per, 3).astype(np.float32) * 1.8
        )
        bulk = rng.uniform(0, L, (200, 3)).astype(np.float32)
        x = np.concatenate([xs.reshape(-1, 3), clus, bulk]).astype(
            np.float32
        )
        n = x.shape[0]
        structs = [
            np.arange(i * K, (i + 1) * K, dtype=np.int32) for i in range(S)
        ]
        idx, w, refc = sdf_ops.make_structure_inputs(
            structs, np.ones(n, np.float32), x
        )
        tw = np.zeros(n, np.float32)
        tw[S * K :] = 1.0
        idx_t = np.nonzero(tw)[0].astype(np.int32)
        box = np.array([L, L, L])
        basis = jnp.eye(3) * L
        inv = jnp.eye(3) / L
        dense = np.asarray(
            sdf_ops.sdf_accumulate(
                jnp.asarray(x), jnp.asarray(tw), jnp.asarray(idx),
                jnp.asarray(w), jnp.asarray(refc), extent, dims, basis, inv,
            )
        )
        cap_u = sdf_ops.sdf_compact_capacity(
            S, int(idx_t.size), box, extent, dims
        )
        support0 = sdf_ops.sdf_frame0_support_count(
            x[idx_t], x, idx, w, refc, box, extent, dims
        )
        cap_c = sdf_ops.sdf_compact_capacity(
            S, int(idx_t.size), box, extent, dims,
            support_count=support0,
        )
        assert cap_c > cap_u  # the uniform floor alone undercounts here
        dims_c, cap_rc = choose_grid_r(
            box, 1.7320508 * extent, idx_t.size, radius=1
        )
        # the Poisson cell cap ALSO assumes uniform density — floor it by
        # the measured max cell occupancy (mirrors the compiler's sizing)
        xt = x[idx_t]
        c3 = np.minimum(
            np.floor(np.mod(xt / box, 1.0) * np.array(dims_c)).astype(int),
            np.array(dims_c) - 1,
        )
        flat = (c3[:, 0] * dims_c[1] + c3[:, 1]) * dims_c[2] + c3[:, 2]
        occ0 = int(np.bincount(flat).max())
        assert occ0 > cap_rc  # uniform Poisson cap would drop the cluster
        cap_data = int(1.5 * occ0) + 8
        stencil = sdf_ops.make_sdf_stencil(extent, box / np.array(dims_c))
        assert int(stencil.max() - stencil.min()) + 1 <= min(dims_c)

        def run(cap, cl_cap):
            return np.asarray(
                sdf_ops.sdf_accumulate_cl(
                    jnp.asarray(x), jnp.asarray(tw), jnp.asarray(idx),
                    jnp.asarray(w), jnp.asarray(refc), extent, dims,
                    jnp.asarray(box, jnp.float32), dims_c, cl_cap,
                    stencil, idx_t=jnp.asarray(idx_t), compact_cap=cap,
                )
            )

        exact = run(cap_c, cap_data)
        np.testing.assert_allclose(exact, dense, atol=1e-3, rtol=1e-3)
        # regression guards: either uniform-only estimate drops mass
        if cap_u < cap_c:
            lossy = run(cap_u, cap_data)
            assert lossy.sum() < dense.sum() - 1.0
        lossy_cl = run(cap_c, cap_rc)
        assert lossy_cl.sum() < dense.sum() - 1.0


class TestKabschRMSD:
    def test_recover_rotation(self):
        rng = np.random.RandomState(0)
        p = rng.randn(30, 3).astype(np.float32)
        p -= p.mean(0)
        # known rotation: 40° about z
        th = np.radians(40)
        R_true = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
            np.float32,
        )
        q = p @ R_true.T
        R = np.asarray(
            rmsd_ops.kabsch_rotation(jnp.asarray(p), jnp.asarray(q), jnp.ones(30))
        )
        np.testing.assert_allclose(R, R_true, atol=1e-4)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-4)

    def test_rmsd_zero_after_align(self):
        rng = np.random.RandomState(1)
        p = rng.randn(20, 3).astype(np.float32)
        th = np.radians(25)
        R = np.array(
            [[1, 0, 0], [0, np.cos(th), -np.sin(th)], [0, np.sin(th), np.cos(th)]],
            np.float32,
        )
        q = (p - p.mean(0)) @ R.T + 5.0
        val = float(
            rmsd_ops.rmsd(jnp.asarray(p), jnp.asarray(q), jnp.ones(20), align=True)
        )
        assert val < 1e-3
        val_noalign = float(
            rmsd_ops.rmsd(jnp.asarray(p), jnp.asarray(q), jnp.ones(20), align=False)
        )
        assert val_noalign > 0.1


class TestInterpolate:
    def test_linear_endpoints(self):
        basis, inv = ortho_cell(10.0)
        x0 = jnp.array([[9.9, 0, 0]])
        x1 = jnp.array([[0.3, 0, 0]])  # crossed the boundary
        mid = np.asarray(interpolate.interpolate_linear(x0, x1, 0.5, basis, inv))
        np.testing.assert_allclose(mid[0, 0], 10.1, atol=1e-4)
        at0 = np.asarray(interpolate.interpolate_linear(x0, x1, 0.0, basis, inv))
        np.testing.assert_allclose(at0, np.asarray(x0), atol=1e-6)

    def test_cubic_endpoints(self):
        basis, inv = no_cell()
        f = [jnp.full((1, 3), v) for v in (0.0, 1.0, 2.0, 3.0)]
        at0 = np.asarray(
            interpolate.interpolate_cubic(f[0], f[1], f[2], f[3], 0.0, basis, inv)
        )
        at1 = np.asarray(
            interpolate.interpolate_cubic(f[0], f[1], f[2], f[3], 1.0, basis, inv)
        )
        np.testing.assert_allclose(at0, 1.0, atol=1e-5)
        np.testing.assert_allclose(at1, 2.0, atol=1e-5)


class TestBackbone:
    def test_phi_psi_helix(self, ala_system):
        s = ala_system
        bb = s.backbone
        vp, vn = backbone.make_backbone_validity(bb.ranges, bb.count)
        basis = jnp.zeros((3, 3))
        phi, psi = backbone.backbone_angles(
            jnp.asarray(s.coords()),
            jnp.asarray(bb.atom_n), jnp.asarray(bb.atom_ca), jnp.asarray(bb.atom_c),
            jnp.asarray(vp), jnp.asarray(vn), basis, basis,
        )
        assert phi.shape == (4,)
        # first residue has no prev → phi 0; last has no next → psi 0
        assert float(phi[0]) == 0.0
        assert float(psi[-1]) == 0.0
        assert np.isfinite(np.asarray(phi)).all()

    def test_ss_classification(self):
        deg = np.pi / 180
        phi = jnp.array([-60 * deg, -120 * deg, 100 * deg])
        psi = jnp.array([-45 * deg, 130 * deg, 100 * deg])
        ss = np.asarray(
            backbone.secondary_structure(phi, psi, jnp.array([True] * 3))
        )
        assert ss[0, 1] > 0.5  # helix
        assert ss[1, 2] > 0.5  # sheet
        assert ss[2, 0] > 0.5  # coil
        np.testing.assert_allclose(ss.sum(-1), 1.0, atol=1e-5)

    def test_denoise(self):
        F = 9
        ss = np.zeros((F, 2, 3), np.float32)
        ss[:, :, 1] = 1.0  # all helix
        ss[4, 0] = [1, 0, 0]  # one flicker frame
        out = np.asarray(backbone.ss_denoise_temporal(jnp.asarray(ss), window=5))
        assert out[4, 0, 1] > 0.5  # majority restores helix


class TestPallasRDF:
    def test_mxu_bin_mode_matches_block(self):
        """Two-level one-hot MXU binning (bin_mode='mxu') is bit-identical
        to the unrolled block loop — symmetric and A≠B, radius 1 and 2,
        and with widths-based offset classes collapsed."""
        from viamd_tpu.ops import pallas_rdf
        from viamd_tpu.ops.neighbors import choose_grid, choose_grid_r

        rng = np.random.RandomState(7)
        L, n = 26.0, 500
        x = rng.uniform(0, L, (n, 3)).astype(np.float32)
        ia = jnp.asarray(np.arange(0, n, 2, dtype=np.int32))
        ib = jnp.asarray(np.arange(1, n, 3, dtype=np.int32))
        boxj = jnp.asarray([L, L, L], jnp.float32)
        nbins, rmax = 128, 5.0
        cases = []
        dims1, cap1 = choose_grid_r(np.array([L] * 3), rmax, n, radius=1)
        dims2, cap2 = choose_grid(np.array([L] * 3), rmax, n)
        cases.append(dict(dims=dims1, cap_a=cap1, cap_b=cap1, radius=1,
                          symmetric=True))
        cases.append(dict(dims=dims1, cap_a=cap1, cap_b=cap1, radius=1,
                          symmetric=False))
        cases.append(dict(dims=dims2, cap_a=cap2, cap_b=cap2, radius=2,
                          symmetric=False,
                          widths=tuple(L / d for d in dims2)))
        for kw in cases:
            sym = kw["symmetric"]
            a, b = (ia, ia) if sym else (ia, ib)
            h_blk = np.asarray(pallas_rdf.pair_dist_histogram_pl(
                jnp.asarray(x), a, b, boxj, nbins, rmax,
                interpret=True, **kw))
            h_mxu = np.asarray(pallas_rdf.pair_dist_histogram_pl(
                jnp.asarray(x), a, b, boxj, nbins, rmax,
                interpret=True, bin_mode="mxu", **kw))
            np.testing.assert_array_equal(h_blk, h_mxu)
            assert h_mxu.sum() > 0

    def test_mxu_merged_sweep_matches_per_pass(self, monkeypatch):
        """VIAMD_TPU_RDF_MERGED=1 (all A passes in one grid sweep) is
        bit-identical to the default per-pass mxu launches. Merged is OFF
        by default — measured ~0.25 ms/frame slower end-to-end
        (docs/PERF.md r4) — but stays covered for A/B."""
        import jax

        from viamd_tpu.ops import pallas_rdf
        from viamd_tpu.ops.neighbors import choose_grid_r

        rng = np.random.RandomState(3)
        L, n = 24.0, 600  # small cells force cap_a > ka → several passes
        x = rng.uniform(0, L, (n, 3)).astype(np.float32)
        ia = jnp.asarray(np.arange(n, dtype=np.int32))
        boxj = jnp.asarray([L, L, L], jnp.float32)
        dims, cap = choose_grid_r(np.array([L] * 3), 5.0, n, radius=1)
        kw = dict(dims=dims, cap_a=cap, cap_b=cap, radius=1,
                  symmetric=True, interpret=True, bin_mode="mxu")
        h_pass = np.asarray(pallas_rdf.pair_dist_histogram_pl(
            jnp.asarray(x), ia, ia, boxj, 128, 5.0, **kw))
        monkeypatch.setenv("VIAMD_TPU_RDF_MERGED", "1")
        jax.clear_caches()  # env is read at trace time
        try:
            h_merged = np.asarray(pallas_rdf.pair_dist_histogram_pl(
                jnp.asarray(x), ia, ia, boxj, 128, 5.0, **kw))
        finally:
            jax.clear_caches()
        np.testing.assert_array_equal(h_pass, h_merged)
        assert h_merged.sum() > 0

    def test_multipass_and_radius1_interpret(self):
        from viamd_tpu.ops import pallas_rdf
        from viamd_tpu.ops.neighbors import choose_grid

        rng = np.random.RandomState(12)
        L, n = 25.0, 400
        x = rng.uniform(0, L, (n, 3)).astype(np.float32)
        wa = np.ones(n, np.float32)
        wb = np.ones(n, np.float32)
        basis, inv = ortho_cell(L)
        nbins, rmax = 128, 5.0
        dense = np.asarray(
            rdf.pair_dist_histogram(
                jnp.asarray(x), jnp.asarray(wa), jnp.asarray(wb),
                basis, inv, nbins, rmax, tile=64,
            )
        )
        idx = jnp.asarray(np.arange(n, dtype=np.int32))
        boxj = jnp.asarray([L, L, L], jnp.float32)
        # radius=2 grid with cap_a > 16 → multi-pass
        dims2, cap2 = choose_grid(np.array([L] * 3), rmax, n)
        h2 = np.asarray(
            pallas_rdf.pair_dist_histogram_pl(
                jnp.asarray(x), idx, idx, boxj, nbins, rmax,
                dims2, cap2, cap2, radius=2, interpret=True,
            )
        )
        np.testing.assert_allclose(h2, dense, atol=1e-2)
        # radius=1 grid (cells ≥ rmax wide)
        dims1, cap1 = choose_grid(np.array([L] * 3), 2 * rmax, n)
        assert min(dims1) >= 3
        h1 = np.asarray(
            pallas_rdf.pair_dist_histogram_pl(
                jnp.asarray(x), idx, idx, boxj, nbins, rmax,
                dims1, cap1, cap1, radius=1, interpret=True,
            )
        )
        np.testing.assert_allclose(h1, dense, atol=1e-2)
        # symmetric half-stencil mode (same selection): exact match
        hs = np.asarray(
            pallas_rdf.pair_dist_histogram_pl(
                jnp.asarray(x), idx, idx, boxj, nbins, rmax,
                dims2, cap2, cap2, radius=2, symmetric=True, interpret=True,
            )
        )
        np.testing.assert_allclose(hs, dense, atol=1e-2)
        # distance-class bin-range skipping (static widths): exact match
        widths = tuple(float(L) / d for d in dims2)
        hw = np.asarray(
            pallas_rdf.pair_dist_histogram_pl(
                jnp.asarray(x), idx, idx, boxj, nbins, rmax,
                dims2, cap2, cap2, radius=2, symmetric=True,
                widths=widths, interpret=True,
            )
        )
        np.testing.assert_allclose(hw, dense, atol=1e-2)
        hw1 = np.asarray(
            pallas_rdf.pair_dist_histogram_pl(
                jnp.asarray(x), idx, idx, boxj, nbins, rmax,
                dims1, cap1, cap1, radius=1, symmetric=True,
                widths=tuple(float(L) / d for d in dims1), interpret=True,
            )
        )
        np.testing.assert_allclose(hw1, dense, atol=1e-2)
        # slab streaming (the 100M-atom memory-bound path): exact match,
        # including a slab width that does not divide the grid
        for sr in (3, 4):
            hslab = np.asarray(
                pallas_rdf.pair_dist_histogram_pl(
                    jnp.asarray(x), idx, idx, boxj, nbins, rmax,
                    dims1, cap1, cap1, radius=1, symmetric=True,
                    widths=tuple(float(L) / d for d in dims1),
                    interpret=True, slab_rows=sr,
                )
            )
            np.testing.assert_allclose(hslab, dense, atol=1e-2)
    def test_fori_slab_mode_matches_dense(self):
        """fori-loop slab mode (>4 slabs — the 100M design-scale path:
        one dynamic halo-windowed slab body instead of an unrolled
        sweep; r5): must match the dense reference exactly, including
        the clamped+row-masked tail slab."""
        from viamd_tpu.ops import pallas_rdf
        from viamd_tpu.ops.neighbors import choose_grid_r

        rng = np.random.RandomState(21)
        L, n = 24.0, 1500
        rmax, nbins = 1.5, 128
        x = rng.uniform(0, L, (n, 3)).astype(np.float32)
        wa = np.ones(n, np.float32)
        basis, inv = ortho_cell(L)
        dense = np.asarray(
            rdf.pair_dist_histogram(
                jnp.asarray(x), jnp.asarray(wa), jnp.asarray(wa),
                basis, inv, nbins, rmax, tile=64,
            )
        )
        idx = jnp.asarray(np.arange(n, dtype=np.int32))
        boxj = jnp.asarray([L, L, L], jnp.float32)
        dims, cap = choose_grid_r(np.array([L] * 3), rmax, n, radius=1)
        assert dims[0] >= 13  # ceil(dx/3) > 4 → the fori path
        for sr in (3, 5):  # 16/3 → 6 slabs (clamped tail), 16/5 → 4→...
            h = np.asarray(
                pallas_rdf.pair_dist_histogram_pl(
                    jnp.asarray(x), idx, idx, boxj, nbins, rmax,
                    dims, cap, cap, radius=1, symmetric=True,
                    interpret=True, slab_rows=sr,
                )
            )
            np.testing.assert_allclose(h, dense, atol=1e-2)

    def test_out_of_box_atoms_match_dense(self):
        """Atoms outside [0, L) — negative, beyond L, exactly at L — must
        bin identically to the dense min-image reference: the kernel wraps
        coordinates into the primary box before building tables so stored
        coords agree with their frac-floored cell index (r3 advisor bug:
        unwrapped atoms produced box-magnitude displacements that silently
        dropped near-boundary pairs)."""
        from viamd_tpu.ops import pallas_rdf
        from viamd_tpu.ops.neighbors import choose_grid

        rng = np.random.RandomState(3)
        L, n = 25.0, 300
        x = rng.uniform(0, L, (n, 3)).astype(np.float32)
        # perturb: a block shifted -L, a block shifted +L, one exactly at L
        x[:40, 0] -= L
        x[40:80, 1] += L
        x[80, :] = L
        x[81, 2] = -0.25  # slightly negative
        wa = np.ones(n, np.float32)
        basis, inv = ortho_cell(L)
        nbins, rmax = 128, 5.0
        dense = np.asarray(
            rdf.pair_dist_histogram(
                jnp.asarray(x), jnp.asarray(wa), jnp.asarray(wa),
                basis, inv, nbins, rmax, tile=64,
            )
        )
        idx = jnp.asarray(np.arange(n, dtype=np.int32))
        boxj = jnp.asarray([L, L, L], jnp.float32)
        dims2, cap2 = choose_grid(np.array([L] * 3), rmax, n)
        h = np.asarray(
            pallas_rdf.pair_dist_histogram_pl(
                jnp.asarray(x), idx, idx, boxj, nbins, rmax,
                dims2, cap2, cap2, radius=2, symmetric=True,
                interpret=True,
            )
        )
        np.testing.assert_allclose(h, dense, atol=1e-2)
        # triclinic path: fractional coords outside [0,1) wrap the same way
        tbasis = np.array(
            [[L, 0, 0], [L * 0.3, L, 0], [L * 0.1, L * 0.2, L]],
            np.float32,
        )
        tinv = np.linalg.inv(tbasis).astype(np.float32)
        xt = x @ tbasis / L  # spread into the sheared cell, keep out-of-box
        dense_t = np.asarray(
            rdf.pair_dist_histogram(
                jnp.asarray(xt), jnp.asarray(wa), jnp.asarray(wa),
                jnp.asarray(tbasis), jnp.asarray(tinv), nbins, rmax,
                tile=64,
            )
        )
        from viamd_tpu.ops.neighbors import choose_grid_triclinic

        dims_t, cap_t = choose_grid_triclinic(tbasis, rmax, n, radius=1)
        assert min(dims_t) >= 3
        ht = np.asarray(
            pallas_rdf.pair_dist_histogram_pl(
                jnp.asarray(xt), idx, idx, boxj, nbins, rmax,
                dims_t, cap_t, cap_t, radius=1, symmetric=True,
                interpret=True, basis=jnp.asarray(tbasis),
            )
        )
        np.testing.assert_allclose(ht, dense_t, atol=1e-2)

    def test_triclinic_matches_dense(self):
        """Fractional-space cell binning + in-kernel fractional
        min-image: triclinic boxes (the rhombic-dodecahedron /
        truncated-octahedron production cells) must match the dense
        path exactly — previously they fell back to O(n²)."""
        from viamd_tpu.core.unitcell import UnitCell
        from viamd_tpu.ops import pallas_rdf
        from viamd_tpu.ops.neighbors import choose_grid_triclinic

        c = UnitCell.from_lengths_angles(30, 28, 26, 80, 95, 60)
        # rigidly rotate the basis too: the kernel must not assume any
        # axis alignment (all 9 basis entries nonzero)
        th = 0.37
        R = np.array(
            [
                [np.cos(th), np.sin(th), 0],
                [-np.sin(th), np.cos(th), 0],
                [0, 0, 1],
            ]
        ) @ np.array(
            [
                [1, 0, 0],
                [0, np.cos(0.21), np.sin(0.21)],
                [0, -np.sin(0.21), np.cos(0.21)],
            ]
        )
        B = (np.asarray(c.basis, np.float64) @ R).astype(np.float32)
        inv = np.asarray(np.linalg.inv(B.astype(np.float64)), np.float32)
        rng = np.random.RandomState(5)
        n = 500
        x = (rng.uniform(0, 1, (n, 3)) @ B).astype(np.float32)
        rmax = 5.0
        wa = np.ones(n, np.float32)
        wb = (rng.rand(n) < 0.6).astype(np.float32)
        idx_a = jnp.asarray(np.arange(n, dtype=np.int32))
        idx_b = jnp.asarray(np.nonzero(wb)[0].astype(np.int32))
        dense_s = np.asarray(
            rdf.pair_dist_histogram(
                jnp.asarray(x), jnp.asarray(wa), jnp.asarray(wa),
                jnp.asarray(B), jnp.asarray(inv), 128, rmax, tile=64,
            )
        )
        dense_ab = np.asarray(
            rdf.pair_dist_histogram(
                jnp.asarray(x), jnp.asarray(wa), jnp.asarray(wb),
                jnp.asarray(B), jnp.asarray(inv), 128, rmax, tile=64,
            )
        )
        boxd = jnp.asarray(np.diag(B).copy())
        for radius in (1, 2):
            dims, cap = choose_grid_triclinic(B, rmax, n, radius=radius)
            if min(dims) < 2 * radius + 1:
                continue
            hs = np.asarray(
                pallas_rdf.pair_dist_histogram_pl(
                    jnp.asarray(x), idx_a, idx_a, boxd, 128, rmax,
                    dims, cap, cap, radius=radius, symmetric=True,
                    interpret=True, basis=jnp.asarray(B),
                )
            )
            np.testing.assert_allclose(hs, dense_s, atol=1e-2)
        dims, cap = choose_grid_triclinic(B, rmax, n, radius=1)
        _, cap_b = choose_grid_triclinic(B, rmax, int(idx_b.size), radius=1)
        hab = np.asarray(
            pallas_rdf.pair_dist_histogram_pl(
                jnp.asarray(x), idx_a, idx_b, boxd, 128, rmax,
                dims, cap, cap_b, radius=1, symmetric=False,
                interpret=True, basis=jnp.asarray(B),
            )
        )
        np.testing.assert_allclose(hab, dense_ab, atol=1e-2)
        # XLA cell-list basis mode (pair_dist_histogram_cl): the non-Pallas
        # backend route for skewed cells — same fractional binning +
        # single-round min-image, must also match dense exactly
        hx = np.asarray(
            rdf.pair_dist_histogram_cl(
                jnp.asarray(x), idx_a, idx_a, boxd, 128, rmax,
                dims, cap, cap, radius=1,
                basis=jnp.asarray(B), inv_basis=jnp.asarray(inv),
            )
        )
        np.testing.assert_allclose(hx, dense_s, atol=1e-2)
        hx_ab = np.asarray(
            rdf.pair_dist_histogram_cl(
                jnp.asarray(x), idx_a, idx_b, boxd, 128, rmax,
                dims, cap, cap_b, radius=1,
                basis=jnp.asarray(B), inv_basis=jnp.asarray(inv),
            )
        )
        np.testing.assert_allclose(hx_ab, dense_ab, atol=1e-2)

    def test_slab_sharded_matches_dense(self):
        """Multi-chip slab sharding (pair_dist_histogram_pl_sharded): each
        of the 8 virtual devices builds only its window of B planes (the
        100M-atom memory wall sharded over the atom mesh axis) — the
        psummed histogram must equal the dense path, in symmetric and
        A≠B modes, including an uneven rows/devices split."""
        import jax
        from jax.sharding import Mesh

        from viamd_tpu.ops import pallas_rdf
        from viamd_tpu.ops.neighbors import choose_grid_r

        rng = np.random.RandomState(11)
        L = 44.0
        n = 900
        x = rng.uniform(0, L, (n, 3)).astype(np.float32)
        rmax = 4.0
        basis, inv = ortho_cell(L)
        wa = np.ones(n, np.float32)
        wb = (rng.rand(n) < 0.5).astype(np.float32)
        idx_a = jnp.asarray(np.arange(n, dtype=np.int32))
        idx_b = jnp.asarray(np.nonzero(wb)[0].astype(np.int32))
        box = jnp.asarray(np.full(3, L, np.float32))
        mesh = Mesh(np.array(jax.devices()[:8]), ("atoms",))
        # dims[0]=11 rows over 8 devices: w_sh = max(ceil(11/8), 3) = 3
        # rows/device — devices 0-3 cover all rows, devices 4-7 are fully
        # masked, device 3's window clamps (the uneven-tail case)
        dims, cap = choose_grid_r(
            np.full(3, L), rmax, n, radius=1
        )
        assert dims[0] % 8 != 0  # the test must cover the uneven split
        dense_s = np.asarray(
            rdf.pair_dist_histogram(
                jnp.asarray(x), jnp.asarray(wa), jnp.asarray(wa),
                basis, inv, 128, rmax, tile=64,
            )
        )
        got_s = np.asarray(
            pallas_rdf.pair_dist_histogram_pl_sharded(
                jnp.asarray(x), idx_a, idx_a, box, 128, rmax,
                dims, cap, cap, mesh, radius=1, symmetric=True,
                interpret=True,
            )
        )
        np.testing.assert_allclose(got_s, dense_s, atol=1e-2)
        dense_ab = np.asarray(
            rdf.pair_dist_histogram(
                jnp.asarray(x), jnp.asarray(wa), jnp.asarray(wb),
                basis, inv, 128, rmax, tile=64,
            )
        )
        _, cap_b = choose_grid_r(np.full(3, L), rmax, int(idx_b.size), radius=1)
        got_ab = np.asarray(
            pallas_rdf.pair_dist_histogram_pl_sharded(
                jnp.asarray(x), idx_a, idx_b, box, 128, rmax,
                dims, cap, cap_b, mesh, radius=1, symmetric=False,
                interpret=True,
            )
        )
        np.testing.assert_allclose(got_ab, dense_ab, atol=1e-2)

    def test_fuzz_matches_dense(self):
        """Randomized configs: box shapes, selection sparsity, radii,
        symmetric mode — pallas (interpret) vs dense must agree exactly."""
        from viamd_tpu.ops import pallas_rdf
        from viamd_tpu.ops.neighbors import choose_grid_r

        for seed in (3, 17, 99):
            rng = np.random.RandomState(seed)
            L = float(rng.uniform(18.0, 40.0))
            n = int(rng.randint(150, 500))
            rmax = float(rng.uniform(3.0, 6.0))
            x = rng.uniform(0, L, (n, 3)).astype(np.float32)
            wa = (rng.rand(n) < rng.uniform(0.2, 1.0)).astype(np.float32)
            sym = bool(rng.rand() < 0.5)
            wb = wa if sym else (rng.rand(n) < 0.5).astype(np.float32)
            if wa.sum() == 0 or wb.sum() == 0:
                continue
            basis, inv = ortho_cell(L)
            dense = np.asarray(
                rdf.pair_dist_histogram(
                    jnp.asarray(x), jnp.asarray(wa), jnp.asarray(wb),
                    basis, inv, 128, rmax, tile=64,
                )
            )
            idx_a = np.nonzero(wa)[0].astype(np.int32)
            idx_b = np.nonzero(wb)[0].astype(np.int32)
            radius = int(rng.choice([1, 2]))
            dims, cap_a = choose_grid_r(
                np.array([L] * 3), rmax, idx_a.size, radius=radius
            )
            _, cap_b = choose_grid_r(
                np.array([L] * 3), rmax, idx_b.size, radius=radius
            )
            cap_a += 8  # fuzz configs are tiny: kill Poisson-drop noise
            cap_b += 8
            if min(dims) < (3 if radius == 1 else 5):
                continue
            h = np.asarray(
                pallas_rdf.pair_dist_histogram_pl(
                    jnp.asarray(x), jnp.asarray(idx_a), jnp.asarray(idx_b),
                    jnp.asarray([L, L, L], jnp.float32), 128, rmax,
                    dims, cap_a, cap_b, radius=radius, symmetric=sym,
                    widths=tuple(L / d for d in dims), interpret=True,
                )
            )
            np.testing.assert_allclose(
                h, dense, atol=1e-2,
                err_msg=f"seed={seed} radius={radius} sym={sym}",
            )

    def test_matches_dense_interpret(self):
        from viamd_tpu.ops import pallas_rdf
        from viamd_tpu.ops.neighbors import choose_grid

        rng = np.random.RandomState(9)
        L = 30.0
        n = 200
        x = rng.uniform(0, L, (n, 3)).astype(np.float32)
        wa = (rng.rand(n) < 0.6).astype(np.float32)
        wb = (rng.rand(n) < 0.6).astype(np.float32)
        basis, inv = ortho_cell(L)
        nbins, rmax = 128, 6.0
        dense = np.asarray(
            rdf.pair_dist_histogram(
                jnp.asarray(x), jnp.asarray(wa), jnp.asarray(wb),
                basis, inv, nbins, rmax, tile=64,
            )
        )
        idx_a = np.nonzero(wa)[0].astype(np.int32)
        idx_b = np.nonzero(wb)[0].astype(np.int32)
        dims, cap_a = choose_grid(np.array([L, L, L]), rmax, idx_a.size)
        _, cap_b = choose_grid(np.array([L, L, L]), rmax, idx_b.size)
        h = np.asarray(
            pallas_rdf.pair_dist_histogram_pl(
                jnp.asarray(x), jnp.asarray(idx_a), jnp.asarray(idx_b),
                jnp.asarray([L, L, L], jnp.float32), nbins, rmax,
                dims, cap_a, cap_b, interpret=True,
            )
        )
        np.testing.assert_allclose(h, dense, atol=1e-2)

    def test_disjoint_selections_no_id_route(self):
        """DISJOINT selections take the all-no-id kernel route (validity
        via coordinate sentinels, zero id planes — need_ids resolves
        False); forcing need_ids=True must give the identical histogram."""
        from viamd_tpu.ops import pallas_rdf
        from viamd_tpu.ops.neighbors import choose_grid

        rng = np.random.RandomState(21)
        L, n = 30.0, 240
        x = rng.uniform(0, L, (n, 3)).astype(np.float32)
        wa = np.zeros(n, np.float32)
        wb = np.zeros(n, np.float32)
        wa[: n // 2] = 1.0  # first half vs second half: no shared atoms
        wb[n // 2 :] = 1.0
        basis, inv = ortho_cell(L)
        nbins, rmax = 128, 6.0
        dense = np.asarray(
            rdf.pair_dist_histogram(
                jnp.asarray(x), jnp.asarray(wa), jnp.asarray(wb),
                basis, inv, nbins, rmax, tile=64,
            )
        )
        idx_a = np.nonzero(wa)[0].astype(np.int32)
        idx_b = np.nonzero(wb)[0].astype(np.int32)
        dims, cap_a = choose_grid(np.array([L] * 3), rmax, idx_a.size)
        _, cap_b = choose_grid(np.array([L] * 3), rmax, idx_b.size)
        kw = dict(
            nbins=nbins, r_max=rmax, dims=dims, cap_a=cap_a + 8,
            cap_b=cap_b + 8, interpret=True,
        )
        args = (
            jnp.asarray(x), jnp.asarray(idx_a), jnp.asarray(idx_b),
            jnp.asarray([L, L, L], jnp.float32),
        )
        h_auto = np.asarray(
            pallas_rdf.pair_dist_histogram_pl(*args, **kw)
        )
        h_ids = np.asarray(
            pallas_rdf.pair_dist_histogram_pl(*args, need_ids=True, **kw)
        )
        np.testing.assert_allclose(h_auto, dense, atol=1e-2)
        np.testing.assert_array_equal(h_auto, h_ids)
        # both bin modes agree on the no-id route too
        h_mxu = np.asarray(
            pallas_rdf.pair_dist_histogram_pl(
                *args, bin_mode="mxu", **kw
            )
        )
        np.testing.assert_array_equal(h_auto, h_mxu)


class TestGTO:
    def test_overlap_matrix_analytic(self):
        """Analytic contracted-GTO overlap (ops.gto.overlap_matrix, the
        md_vlx_scf_overlap_matrix_data stand-in): normalized diagonals,
        closed-form s–s value, and an s–p cross term vs grid quadrature."""
        from viamd_tpu.io.vlx import Shell
        from viamd_tpu.ops import gto

        a, b, d = 0.7, 0.7, 1.4
        shells = [
            Shell(np.array([0, 0, 0], np.float32), 0,
                  np.array([a], np.float32), np.array([1.0], np.float32)),
            Shell(np.array([d, 0, 0], np.float32), 0,
                  np.array([b], np.float32), np.array([1.0], np.float32)),
            Shell(np.zeros(3, np.float32), 1,
                  np.array([0.9], np.float32), np.array([1.0], np.float32)),
            Shell(np.zeros(3, np.float32), 2,
                  np.array([1.3], np.float32), np.array([1.0], np.float32)),
        ]
        S = gto.overlap_matrix(shells)
        assert S.shape == (11, 11)  # 1+1+3+6 cartesians
        np.testing.assert_allclose(np.diag(S), 1.0, atol=1e-6)
        np.testing.assert_allclose(
            S[0, 1], np.exp(-a * b / (a + b) * d * d), atol=1e-6
        )
        assert abs(S[0, 2]) < 1e-12  # s–p on the same... different centers
        # s(center 0) – px(center d): odd symmetry along x only partially
        # cancels; compare against dense grid quadrature
        g = np.linspace(-10, 10, 161)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        dv = (g[1] - g[0]) ** 3
        f1 = gto.normalization(a, 0, 0, 0) * np.exp(
            -a * (X**2 + Y**2 + Z**2)
        )
        f2 = gto.normalization(0.9, 1, 0, 0) * X * np.exp(
            -0.9 * (X**2 + Y**2 + Z**2)
        )
        sp_same_center = (f1 * f2).sum() * dv  # exactly 0 by symmetry
        assert abs(sp_same_center) < 1e-9
        x2 = X - d
        f3 = gto.normalization(b, 0, 0, 0) * np.exp(
            -b * (x2**2 + Y**2 + Z**2)
        )
        num = (f3 * f2).sum() * dv
        np.testing.assert_allclose(S[1, 2], num, atol=1e-4)

    def test_s_orbital_normalized(self):
        """Normalized 1s gaussian: ∫ψ² dV = 1 (grid quadrature)."""
        from viamd_tpu.ops import gto

        alpha = 0.8
        N = gto.normalization(alpha, 0, 0, 0)
        D = 48
        ext = 6.0
        vox = 2 * ext / D
        grid = gto.eval_gto_grid(
            jnp.zeros((1, 3)), jnp.asarray([alpha]), jnp.asarray([N]),
            jnp.zeros((1, 3), jnp.int32),
            jnp.asarray([-ext] * 3), jnp.asarray([vox] * 3), (D, D, D),
        )
        integral = float(np.sum(np.asarray(grid) ** 2) * vox**3)
        assert abs(integral - 1.0) < 0.01

    def test_p_orbital_antisymmetric(self):
        from viamd_tpu.ops import gto

        pts = jnp.asarray([[1.0, 0, 0], [-1.0, 0, 0], [0, 1.0, 0]])
        val = np.asarray(
            gto.eval_gto(
                pts, jnp.zeros((1, 3)), jnp.asarray([0.5]), jnp.asarray([1.0]),
                jnp.asarray([[1, 0, 0]], jnp.int32),
            )
        )
        assert val[0] > 0 and abs(val[0] + val[1]) < 1e-6  # px odd in x
        assert abs(val[2]) < 1e-9  # zero on the nodal plane

    def test_mo_matmul_matches_sum(self):
        from viamd_tpu.ops import gto

        rng = np.random.RandomState(0)
        K = 12
        centers = jnp.asarray(rng.randn(K, 3).astype(np.float32))
        alphas = jnp.asarray(rng.uniform(0.3, 2.0, K).astype(np.float32))
        lmn = jnp.asarray(rng.randint(0, 2, (K, 3)), jnp.int32)
        C = rng.randn(K, 3).astype(np.float32)
        pts = jnp.asarray(rng.randn(20, 3).astype(np.float32))
        multi = np.asarray(
            gto.eval_gto(pts, centers, alphas, jnp.asarray(C), lmn)
        )
        for m in range(3):
            single = np.asarray(
                gto.eval_gto(pts, centers, alphas, jnp.asarray(C[:, m]), lmn)
            )
            np.testing.assert_allclose(multi[:, m], single, rtol=1e-4, atol=1e-5)

    def test_density_positive(self):
        from viamd_tpu.ops import gto

        rng = np.random.RandomState(1)
        K, M = 6, 2
        rho = np.asarray(
            gto.density_grid(
                jnp.asarray(rng.randn(K, 3).astype(np.float32)),
                jnp.asarray(rng.uniform(0.5, 1.5, K).astype(np.float32)),
                jnp.asarray(rng.randn(K, M).astype(np.float32)),
                jnp.zeros((K, 3), jnp.int32),
                jnp.asarray([-4.0] * 3), jnp.asarray([0.5] * 3), (16, 16, 16),
            )
        )
        assert (rho >= 0).all()
        assert rho.sum() > 0


class TestTopology:
    def test_critical_points_two_blobs(self):
        from viamd_tpu.ops import topo

        D = 24
        ax = np.arange(D) + 0.5
        X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
        # off-half-grid centers so maxima land on single voxels (no plateaus)
        g = np.exp(-((X - 8.2) ** 2 + (Y - 12.1) ** 2 + (Z - 11.8) ** 2) / 16.0)
        g += np.exp(-((X - 16.3) ** 2 + (Y - 12.1) ** 2 + (Z - 11.8) ** 2) / 16.0)
        pts = topo.critical_points(g.astype(np.float32), min_value=1e-3)
        maxima = [p for p in pts if p.kind == "max"]
        assert len(maxima) == 2
        centers = sorted(p.index[0] for p in maxima)
        assert abs(centers[0] - 8) <= 1 and abs(centers[1] - 16) <= 1
        edges = topo.bond_graph(pts, g, threshold_frac=0.1)
        assert len(edges) == 1  # the two blobs connect

    def test_recenter(self):
        import jax.numpy as jnp

        from viamd_tpu.ops.pbc import inv_basis_of, recenter_frame

        L = 10.0
        basis = jnp.eye(3) * L
        # two-atom molecule straddling the boundary; selection = atom 0
        x = jnp.asarray([[9.8, 5, 5], [0.2, 5, 5], [3.0, 3, 3]])
        w = jnp.asarray([1.0, 0.0, 0.0])
        seg = jnp.asarray([0, 0, 1])
        out = np.asarray(
            recenter_frame(x, w, seg, 2, basis, inv_basis_of(basis))
        )
        # selection atom ends at the box center
        np.testing.assert_allclose(out[0], [5, 5, 5], atol=1e-4)
        # its molecule partner stays adjacent (not wrapped away)
        assert abs(np.linalg.norm(out[1] - out[0]) - 0.4) < 1e-3


class TestAtomSharding:
    def test_atom_sharded_matches_dense(self):
        import jax

        from viamd_tpu.parallel import frames_mesh

        devs = jax.devices()
        assert len(devs) == 8
        import jax.sharding as shd

        mesh = shd.Mesh(np.array(devs), ("atoms",))
        rng = np.random.RandomState(11)
        L, n = 20.0, 300
        x = jnp.asarray(rng.uniform(0, L, (n, 3)).astype(np.float32))
        wa = jnp.asarray((rng.rand(n) < 0.5).astype(np.float32))
        wb = jnp.asarray((rng.rand(n) < 0.5).astype(np.float32))
        basis, inv = ortho_cell(L)
        dense = np.asarray(
            rdf.pair_dist_histogram(x, wa, wb, basis, inv, 16, 6.0, tile=64)
        )
        sharded = np.asarray(
            rdf.pair_dist_histogram_atom_sharded(
                x, wa, wb, basis, inv, 16, 6.0, mesh, tile=64
            )
        )
        np.testing.assert_allclose(sharded, dense, atol=1e-2)


class TestPBCInvariants:
    """Property tests (SURVEY §4): analysis results must be invariant to
    lattice translations and whole-box wraps of the input coordinates."""

    def _rand_sys(self, seed, n=200, L=24.0):
        rng = np.random.RandomState(seed)
        x = rng.uniform(0, L, (n, 3)).astype(np.float32)
        return x, L

    def test_rdf_translation_invariant(self):
        from viamd_tpu.ops import rdf as rdf_ops

        x, L = self._rand_sys(11)
        basis, inv = ortho_cell(L)
        wa = np.zeros(len(x), np.float32)
        wa[::2] = 1
        wb = np.zeros(len(x), np.float32)
        wb[1::2] = 1
        h0 = np.asarray(rdf_ops.pair_dist_histogram(
            jnp.asarray(x), jnp.asarray(wa), jnp.asarray(wb),
            basis, inv, 64, 6.0, tile=64))
        rng = np.random.RandomState(12)
        for _ in range(3):
            shift = rng.uniform(-2 * L, 2 * L, 3).astype(np.float32)
            xs = (x + shift) % L  # translate + wrap
            h1 = np.asarray(rdf_ops.pair_dist_histogram(
                jnp.asarray(xs), jnp.asarray(wa), jnp.asarray(wb),
                basis, inv, 64, 6.0, tile=64))
            np.testing.assert_allclose(h1, h0, atol=1e-2)

    def test_pallas_rdf_translation_invariant(self):
        from viamd_tpu.ops import pallas_rdf
        from viamd_tpu.ops.neighbors import choose_grid_r

        x, L = self._rand_sys(13, n=400)
        idx = np.arange(0, len(x), 2, dtype=np.int32)
        r_max = 5.0
        dims, cap = choose_grid_r(np.array([L] * 3), r_max, idx.size, radius=1)
        cap += 8
        box = jnp.asarray([L, L, L], jnp.float32)

        def hist(xx):
            return np.asarray(pallas_rdf.pair_dist_histogram_pl(
                jnp.asarray(xx), jnp.asarray(idx), jnp.asarray(idx), box,
                128, r_max, dims, cap, cap, radius=1, symmetric=True,
                widths=tuple(L / d for d in dims), interpret=True))

        h0 = hist(x)
        rng = np.random.RandomState(14)
        shift = rng.uniform(-L, L, 3).astype(np.float32)
        np.testing.assert_allclose(hist((x + shift) % L), h0, atol=1e-2)

    def test_com_wrap_invariant(self):
        from viamd_tpu.ops import com as com_ops
        from viamd_tpu.ops.pbc import min_image

        x, L = self._rand_sys(15, n=40)
        basis, inv = ortho_cell(L)
        # cluster the atoms so the COM is well-defined under PBC
        x = (x * 0.1 + L * 0.7).astype(np.float32) % L
        w = np.ones(len(x), np.float32)
        c0 = np.asarray(com_ops.com(
            jnp.asarray(x), jnp.asarray(w), basis, inv))
        shift = np.array([L * 0.4, -L * 0.8, L * 1.3], np.float32)
        c1 = np.asarray(com_ops.com(
            jnp.asarray((x + shift) % L), jnp.asarray(w), basis, inv))
        # COMs must agree up to the same lattice translation (min-image 0)
        d = np.asarray(min_image(
            jnp.asarray((c1 - (c0 + shift)) % L)[None], basis, inv))[0]
        assert np.linalg.norm(d) < 1e-2

    def test_shape_weights_rigid_motion_invariant(self):
        from viamd_tpu.ops import covariance as cov_ops

        rng = np.random.RandomState(16)
        x = rng.normal(size=(60, 3)).astype(np.float32) * [3.0, 1.5, 0.5]
        w = np.ones(60, np.float32)

        big = ortho_cell(1e6)  # effectively aperiodic

        def weights(xx):
            return np.asarray(
                cov_ops.shape_weights(jnp.asarray(xx), jnp.asarray(w), *big)
            )

        w0 = weights(x)
        # random rotation + translation
        q = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        w1 = weights(x @ q.T + np.float32(7.5))
        np.testing.assert_allclose(w1, w0, atol=1e-4)


class TestSnapCapacity:
    """B-capacity lane snapping (ops/rdf.snap_capacity)."""

    def test_snaps_when_tail_clears(self):
        from viamd_tpu.ops.rdf import snap_capacity

        # the 100k bench config: λ=33.3, S=14, cap 62 → 54 (768 lanes)
        assert snap_capacity(62, 33.334, 14) == 54

    def test_keeps_when_tail_too_tight(self):
        from viamd_tpu.ops.rdf import snap_capacity

        # tiny λ: next lane multiple down would cut into the bulk
        assert snap_capacity(10, 4.2, 14) == 10  # 140→128 ⇒ 9 < 4.2+3.5·2.05

    def test_exact_multiple_unchanged(self):
        from viamd_tpu.ops.rdf import snap_capacity

        assert snap_capacity(32, 20.0, 4) == 32  # 128 lanes exactly

    def test_empty_selection_keeps_capacity(self):
        from viamd_tpu.ops.rdf import snap_capacity

        # lam=0 (no B atoms): snapping to 0 lanes would break the kernel
        assert snap_capacity(2, 0.0, 14) == 2


class TestKabschDegenerate:
    def test_collinear_returns_proper_rotation(self):
        import jax.numpy as jnp

        from viamd_tpu.ops.rmsd import kabsch_rotation

        # rank-1 H: two atoms on an axis — must still be a det+1 rotation
        p = jnp.asarray(np.array([[0, 0, -1], [0, 0, 1]], np.float32))
        q = jnp.asarray(np.array([[-1, 0, 0], [1, 0, 0]], np.float32))
        w = jnp.ones(2, jnp.float32)
        R = np.asarray(kabsch_rotation(p, q, w))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R) - 1.0) < 1e-5
        # and it actually aligns the axis
        np.testing.assert_allclose(
            np.asarray(p) @ R.T, np.asarray(q), atol=1e-5
        )


class TestGroupedCellList:
    """Large-n grouped packed sort (ops/neighbors._build_cell_list_grouped):
    when (cell_bits + idx_bits + 1) > 31 the cell list batch-sorts G index
    groups of int32-packable keys instead of the 2-operand argsort and
    builds the slot table via a G-way ownership select (VERDICT r2 #9 —
    the 1M-atom sort growth term, reference design point
    /root/reference/src/main.cpp:1134-1138)."""

    def _cl_pair(self, n=5003, G=8, seed=0):
        import viamd_tpu.ops.neighbors as nb

        rng = np.random.RandomState(seed)
        box = np.array([20.0, 18.0, 25.0], np.float32)
        x = (rng.rand(n, 3) * box).astype(np.float32)
        dims, cap = nb.choose_grid_r(box, 5.0, n)
        cl = nb.build_cell_list(jnp.asarray(x), jnp.asarray(box), dims, cap)
        dims_arr = jnp.array(dims, jnp.int32)
        frac = jnp.asarray(x) / jnp.asarray(box)
        frac = frac - jnp.floor(frac)
        c3 = jnp.clip((frac * dims_arr).astype(jnp.int32), 0, dims_arr - 1)
        cid = (c3[:, 0] * dims[1] + c3[:, 1]) * dims[2] + c3[:, 2]
        clg = nb._build_cell_list_grouped(
            cid, n, int(np.prod(dims)), dims, cap, G
        )
        return cl, clg, int(np.prod(dims))

    def test_grouped_equals_sorted(self):
        for G in (2, 16, 64):
            cl, clg, ncells = self._cl_pair(G=G)
            np.testing.assert_array_equal(
                np.asarray(cl.starts), np.asarray(clg.starts)
            )
            np.testing.assert_array_equal(
                np.asarray(cl.valid), np.asarray(clg.valid)
            )
            assert int(clg.n_dropped) == int(cl.n_dropped)
            assert clg.order is None
            t0, v = np.asarray(cl.table), np.asarray(cl.valid)
            t1 = np.asarray(clg.table)
            for c in range(ncells):
                assert set(t0[c][v[c]]) == set(t1[c][v[c]]), (G, c)

    def test_group_count_selection(self, monkeypatch):
        from viamd_tpu.ops.neighbors import _grouped_sort_groups

        # off by default (measured net-negative on the v5e — see
        # docs/PERF.md round-3 ledger)
        assert _grouped_sort_groups(1_000_002, 14, 20) is None
        monkeypatch.setenv("VIAMD_TPU_GROUPED_SORT", "1")
        # fits in one packed sort → no grouping
        assert _grouped_sort_groups(100_000, 10, 17) is None
        # 1M atoms, 14 cell bits → 16 groups
        assert _grouped_sort_groups(1_000_002, 14, 20) == 16
        # too many groups needed → argsort fallback
        assert _grouped_sort_groups(100_000_000, 21, 27) is None

    def test_rdf_sdf_through_grouped_path(self, monkeypatch):
        # force grouping at small n and check the full kernels agree with
        # the single-sort path bit-for-bit (histograms/splats are
        # order-independent sums)
        import viamd_tpu.ops.neighbors as nb
        from viamd_tpu.ops import sdf as sdf_ops
        from viamd_tpu.ops.neighbors import choose_grid

        rng = np.random.RandomState(3)
        L = 24.0
        box = np.array([L, L, L])
        n = 4001
        x = (rng.rand(n, 3) * L).astype(np.float32)
        wa = (rng.rand(n) < 0.5).astype(np.float32)
        wb = (rng.rand(n) < 0.5).astype(np.float32)
        idx_a = np.nonzero(wa)[0].astype(np.int32)
        idx_b = np.nonzero(wb)[0].astype(np.int32)
        nbins, rmax = 16, 5.0
        dims, cap_a = choose_grid(box, rmax, idx_a.size)
        _, cap_b = choose_grid(box, rmax, idx_b.size)
        rdf_args = (
            jnp.asarray(x), jnp.asarray(idx_a), jnp.asarray(idx_b),
            jnp.asarray(box, jnp.float32), nbins, rmax, dims, cap_a, cap_b,
        )
        structs = [
            np.arange(i * 5, i * 5 + 5, dtype=np.int32) for i in range(4)
        ]
        sidx, sw, refc = sdf_ops.make_structure_inputs(
            structs, np.ones(n, np.float32), x
        )
        tw = (rng.rand(n) < 0.5).astype(np.float32)
        extent, gdims = 5.0, 16
        cl_dims, cl_cap = choose_grid(box, 1.7320508 * extent, n)
        stencil = sdf_ops.make_sdf_stencil(extent, box / np.array(cl_dims))
        span = int(stencil.max() - stencil.min()) + 1
        if span > min(cl_dims):
            pytest.skip("box too small for pruned stencil")
        sdf_args = (
            jnp.asarray(x), jnp.asarray(tw), jnp.asarray(sidx),
            jnp.asarray(sw), jnp.asarray(refc), extent, gdims,
            jnp.asarray(box, jnp.float32), cl_dims, cl_cap, stencil,
        )
        ref_hist = np.asarray(rdf.pair_dist_histogram_cl(*rdf_args))
        ref_sdf = np.asarray(sdf_ops.sdf_accumulate_cl(*sdf_args))
        monkeypatch.setattr(
            nb, "_grouped_sort_groups",
            lambda n_, cb, ib, max_groups=64: 8,
        )
        # build_cell_list is jitted: drop cached traces so the grouped
        # branch really re-traces (otherwise this test is vacuous)
        import jax

        jax.clear_caches()
        got_hist = np.asarray(rdf.pair_dist_histogram_cl(*rdf_args))
        got_sdf = np.asarray(sdf_ops.sdf_accumulate_cl(*sdf_args))
        np.testing.assert_allclose(got_hist, ref_hist, rtol=1e-6)
        np.testing.assert_allclose(got_sdf, ref_sdf, atol=1e-4, rtol=1e-4)
