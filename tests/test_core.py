"""Core data-model tests: bitfields, unit cells, elements, system build."""

import numpy as np
import pytest

from viamd_tpu.core.bitfield import Bitfield
from viamd_tpu.core.unitcell import UnitCell
from viamd_tpu.core import elements as E


class TestBitfield:
    def test_roundtrip_bools(self):
        rng = np.random.RandomState(0)
        mask = rng.rand(1000) < 0.3
        bf = Bitfield.from_bools(mask)
        assert bf.popcount() == mask.sum()
        np.testing.assert_array_equal(bf.to_bools(), mask)

    def test_indices(self):
        bf = Bitfield.from_indices(100, [0, 5, 63, 64, 99])
        assert bf.popcount() == 5
        np.testing.assert_array_equal(bf.indices(), [0, 5, 63, 64, 99])
        assert bf.test_bit(63) and bf.test_bit(64)
        assert not bf.test_bit(62)

    def test_algebra(self):
        a = Bitfield.from_indices(130, [1, 2, 3, 128])
        b = Bitfield.from_indices(130, [2, 3, 4, 129])
        assert sorted((a & b).indices().tolist()) == [2, 3]
        assert sorted((a | b).indices().tolist()) == [1, 2, 3, 4, 128, 129]
        assert sorted(a.andnot(b).indices().tolist()) == [1, 128]
        inv = ~a
        assert inv.popcount() == 130 - 4
        assert (~Bitfield(130)).popcount() == 130

    def test_range_full(self):
        bf = Bitfield.from_range(200, 10, 150)
        assert bf.popcount() == 140
        assert Bitfield.full(77).popcount() == 77

    def test_base64_roundtrip(self):
        rng = np.random.RandomState(1)
        bf = Bitfield.from_bools(rng.rand(513) < 0.5)
        bf2 = Bitfield.from_base64(bf.to_base64())
        assert bf == bf2

    def test_first_set(self):
        assert Bitfield.from_indices(100, [77]).first_set() == 77
        assert Bitfield(100).first_set() == -1


class TestUnitCell:
    def test_ortho(self):
        c = UnitCell.orthorhombic(10, 20, 30)
        assert c.is_orthorhombic and c.is_periodic
        np.testing.assert_allclose(c.extent(), [10, 20, 30])
        assert abs(c.volume() - 6000) < 1e-3
        np.testing.assert_allclose(
            np.asarray(c.basis) @ np.asarray(c.inv_basis), np.eye(3), atol=1e-6
        )

    def test_none(self):
        c = UnitCell.none()
        assert not c.is_periodic

    def test_triclinic_roundtrip(self):
        c = UnitCell.from_lengths_angles(10, 12, 14, 80, 95, 100)
        a, b, cc, al, be, ga = c.lengths_angles()
        np.testing.assert_allclose(
            [a, b, cc, al, be, ga], [10, 12, 14, 80, 95, 100], rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(c.basis) @ np.asarray(c.inv_basis), np.eye(3), atol=1e-5
        )

    def test_pytree(self):
        import jax

        c = UnitCell.orthorhombic(5, 5, 5)
        leaves, treedef = jax.tree_util.tree_flatten(c)
        c2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert c2.kind == c.kind


class TestElements:
    def test_symbols(self):
        assert E.symbol_to_z("C") == 6
        assert E.symbol_to_z("ca") == 20
        assert E.symbol_to_z("Fe") == 26
        assert E.symbol_to_z("Xx") == 0

    def test_infer_biomolecular(self):
        assert E.infer_element("CA", "ALA") == 6  # alpha carbon, not calcium
        assert E.infer_element("HG11", "VAL") == 1  # hydrogen, not mercury
        assert E.infer_element("OW", "SOL") == 8
        assert E.infer_element("FE", "HEM") == 26
        assert E.infer_element("CL", "CL-") == 17

    def test_tables(self):
        assert abs(E.MASSES[6] - 12.011) < 1e-3
        assert abs(E.VDW_RADII[1] - 1.10) < 1e-6
        assert E.NUM_ELEMENTS == 119


class TestSystemBuild:
    def test_ala(self, ala_system):
        s = ala_system
        assert s.natoms == 20
        assert s.nres == 4
        assert s.nchains == 1
        assert s.res_names[s.res_name_id[0]] == "ALA"
        # elements inferred/parsed
        assert s.element[0] == 7  # N
        assert s.element[1] == 6  # CA
        assert s.mass[0] > 14.0
        # backbone detected: 4 residues with N/CA/C/O
        assert s.backbone is not None
        assert s.backbone.count == 4
        assert len(s.backbone.ranges) == 1
        # bonds inferred within residues (N-CA, CA-C, C-O at least)
        assert s.nbonds >= 8

    def test_water(self, water):
        s, traj = water
        assert s.natoms == 192
        assert s.nres == 64
        from viamd_tpu.core.system import FLAG_WATER

        assert (s.flags & FLAG_WATER).all()
        assert traj.num_frames == 5
        # O-H bonds inferred: 2 per water
        assert s.nbonds == 128

    def test_bonds_triclinic_wraparound(self):
        """A molecule straddling a 60° triclinic boundary: the PBC image
        of its partner atom is <1 Å away while the unwrapped distance is
        ~a full cell — previously triclinic cells were treated as
        aperiodic and the bond was missed."""
        from viamd_tpu.core.unitcell import UnitCell
        from viamd_tpu.ops.bonds import infer_covalent_bonds

        cell = UnitCell.from_lengths_angles(20, 20, 20, 90, 90, 60)
        B = np.asarray(cell.basis, np.float64)
        # O at the origin corner, H displaced by -0.96 Å along the SKEWED
        # a axis then wrapped by +a: cartesian distance is huge, fractional
        # min-image distance is 0.96
        a = B[0]
        o = np.array([0.05, 0.05, 0.05]) @ B
        h = o - 0.96 * a / np.linalg.norm(a) + a
        coords = np.stack([o, h])
        z = np.array([8, 1])
        pairs = infer_covalent_bonds(coords, z, cell)
        assert pairs.shape == (1, 2)
        # large enough that the cell-list (non-brute) path runs: tile the
        # same pair through a 5000-atom lattice and re-check the wrap bond
        rng = np.random.RandomState(3)
        frac = rng.uniform(0.1, 0.9, (5000, 3))  # interior, no extra wraps
        bulk = frac @ B
        coords2 = np.concatenate([coords, bulk])
        z2 = np.concatenate([z, np.full(5000, 2)])  # He: no bonds
        pairs2 = infer_covalent_bonds(coords2, z2, cell)
        assert [0, 1] in pairs2.tolist()

    def test_bonds_small_periodic_cell_large_system(self):
        """Periodic cell too small for the wrap stencil + >4096 atoms:
        must fall back to the aperiodic cell list (all non-wrap bonds),
        NOT return zero bonds."""
        from viamd_tpu.core.unitcell import UnitCell
        from viamd_tpu.ops.bonds import infer_covalent_bonds

        rng = np.random.RandomState(1)
        n_pairs = 2500  # 5000 atoms > the brute-force cap
        centers = rng.uniform(5, 45, (n_pairs, 3))
        h = centers + np.array([0.96, 0, 0])
        coords = np.empty((2 * n_pairs, 3), np.float32)
        coords[0::2] = centers
        coords[1::2] = h
        z = np.tile([8, 1], n_pairs)
        # a 50 Å cell with one tiny axis: < 3 bins along z
        cell = UnitCell.orthorhombic(50, 50, 4.0)
        pairs = infer_covalent_bonds(coords, z, cell)
        assert pairs.shape[0] >= n_pairs * 0.95  # O-H bonds found

    def test_grow_by_radius_triclinic(self):
        from viamd_tpu.core.bitfield import Bitfield
        from viamd_tpu.core.selection_utils import grow_by_radius
        from viamd_tpu.core.unitcell import UnitCell

        cell = UnitCell.from_lengths_angles(20, 20, 20, 90, 90, 60)
        B = np.asarray(cell.basis, np.float64)
        a = B[0]
        p0 = np.array([0.02, 0.5, 0.5]) @ B
        near_img = p0 + a - 1.2 * a / np.linalg.norm(a)  # 1.2 Å via wrap
        far = np.array([0.5, 0.5, 0.5]) @ B
        coords = np.stack([p0, near_img, far])
        m = Bitfield.from_bools(np.array([True, False, False]))
        g = grow_by_radius(m, coords, 2.0, cell)
        assert g.to_bools().tolist() == [True, True, False]


class TestLogging:
    def test_sinks_and_dedup(self):
        from viamd_tpu.core import vlog

        got = []
        sink = vlog.register_sink(lambda lvl, msg: got.append((lvl, msg)))
        try:
            vlog.info("hello")
            vlog.info("hello")  # deduped within the window
            vlog.error("boom", dedup=False)
            vlog.error("boom", dedup=False)
        finally:
            vlog.unregister_sink(sink)
        assert got == [
            (vlog.INFO, "hello"),
            (vlog.ERROR, "boom"),
            (vlog.ERROR, "boom"),
        ]


class TestTracing:
    def test_sections_nest(self):
        from viamd_tpu.core.tracing import Tracer

        tr = Tracer()
        with tr.section("outer"):
            with tr.section("inner"):
                pass
            with tr.section("inner"):
                pass
        stats = tr.stats()
        assert stats["outer"].calls == 1
        assert stats["outer/inner"].calls == 2
        assert "outer/inner" in tr.report()
