"""I/O loader tests: PDB (system + trajectory + roundtrip), GRO, XYZ."""

import numpy as np

from tests.conftest import make_ala_pdb


class TestPDB:
    def test_single_model(self):
        from viamd_tpu.io.pdb import parse_pdb

        sys, traj = parse_pdb(make_ala_pdb(4))
        assert traj is None
        assert sys.natoms == 20
        assert sys.cell.is_orthorhombic
        np.testing.assert_allclose(sys.cell.extent(), [40, 40, 40])

    def test_multi_model(self):
        from viamd_tpu.io.pdb import parse_pdb

        sys, traj = parse_pdb(make_ala_pdb(4, n_models=10))
        assert traj is not None
        assert traj.num_frames == 10
        assert traj.num_atoms == 20
        xyz0, cell = traj.load_frame(0)
        np.testing.assert_allclose(xyz0[:, 0], sys.x, atol=1e-3)
        batch, cells = traj.load_frames([0, 3, 7])
        assert batch.shape == (3, 20, 3)

    def test_write_roundtrip(self):
        from viamd_tpu.io.pdb import parse_pdb, write_pdb

        sys, _ = parse_pdb(make_ala_pdb(4))
        text = write_pdb(sys)
        sys2, _ = parse_pdb(text)
        assert sys2.natoms == sys.natoms
        np.testing.assert_allclose(sys2.x, sys.x, atol=1e-3)
        assert sys2.res_names[sys2.res_name_id[0]] == "ALA"
        np.testing.assert_array_equal(sys2.element, sys.element)

    def test_write_subset(self):
        from viamd_tpu.io.pdb import parse_pdb, write_pdb
        from viamd_tpu.core.bitfield import Bitfield

        sys, _ = parse_pdb(make_ala_pdb(4))
        mask = Bitfield.from_range(sys.natoms, 0, 5)
        sys2, _ = parse_pdb(write_pdb(sys, mask=mask))
        assert sys2.natoms == 5


class TestGRO:
    def test_parse(self):
        from viamd_tpu.io.gro import parse_gro

        text = (
            "Test box\n"
            "    6\n"
            "    1SOL     OW    1   0.230   0.628   0.113\n"
            "    1SOL    HW1    2   0.260   0.732   0.115\n"
            "    1SOL    HW2    3   0.137   0.626   0.150\n"
            "    2SOL     OW    4   1.275   0.932   0.569\n"
            "    2SOL    HW1    5   1.337   0.943   0.650\n"
            "    2SOL    HW2    6   1.326   0.898   0.490\n"
            "   1.82060   1.82060   1.82060\n"
        )
        sys = parse_gro(text)
        assert sys.natoms == 6
        assert sys.nres == 2
        # nm→Å conversion
        np.testing.assert_allclose(sys.x[0], 2.30, atol=1e-3)
        np.testing.assert_allclose(sys.cell.extent(), [18.206] * 3, rtol=1e-5)
        assert sys.element[0] == 8
        assert sys.nbonds == 4  # two O-H per water


class TestXYZ:
    def test_plain(self):
        from viamd_tpu.io.xyz import parse_xyz

        text = "3\nwater\nO 0.0 0.0 0.0\nH 0.96 0.0 0.0\nH -0.24 0.93 0.0\n"
        sys, traj = parse_xyz(text)
        assert traj is None
        assert sys.natoms == 3
        assert sys.element.tolist() == [8, 1, 1]

    def test_multiframe(self):
        from viamd_tpu.io.xyz import parse_xyz

        frame = "2\ncomment\nC 0.0 0.0 0.0\nO 1.2 0.0 0.0\n"
        frame2 = "2\ncomment\nC 0.0 0.0 0.1\nO 1.2 0.0 0.1\n"
        sys, traj = parse_xyz(frame + frame2)
        assert traj is not None
        assert traj.num_frames == 2
        np.testing.assert_allclose(traj.load_frame(1)[0][0, 2], 0.1, atol=1e-6)

    def test_lattice(self):
        from viamd_tpu.io.xyz import parse_xyz

        text = '2\nLattice="10 0 0 0 10 0 0 0 10"\nC 0 0 0\nO 1.2 0 0\n'
        sys, _ = parse_xyz(text)
        assert sys.cell.is_orthorhombic

    def test_tinker_arc(self):
        from viamd_tpu.io.xyz import parse_xyz

        text = (
            "3 water\n"
            "1 O 0.000 0.000 0.000 1 2 3\n"
            "2 H 0.960 0.000 0.000 2 1\n"
            "3 H -0.240 0.930 0.000 2 1\n"
        )
        sys, _ = parse_xyz(text)
        assert sys.natoms == 3
        assert sys.nbonds >= 2


class TestLoaderDispatch:
    def test_flags(self):
        from viamd_tpu.io.loader import loader_for_path, LoaderFlags

        name, flags = loader_for_path("foo.pdb")
        assert flags & LoaderFlags.SYSTEM and flags & LoaderFlags.TRAJECTORY
        name, flags = loader_for_path("foo.gro")
        assert flags & LoaderFlags.SYSTEM and not (flags & LoaderFlags.TRAJECTORY)
        name, flags = loader_for_path("foo.xtc")
        assert flags & LoaderFlags.TRAJECTORY
        name, flags = loader_for_path("foo.unknown")
        assert flags & LoaderFlags.REQUIRES_DIALOGUE

    def test_load_file_pdb(self, tmp_path):
        from viamd_tpu.io import load_file

        p = tmp_path / "ala.pdb"
        p.write_text(make_ala_pdb(4, n_models=3))
        res = load_file(str(p))
        assert res.system is not None and res.system.natoms == 20
        assert res.trajectory is not None and res.trajectory.num_frames == 3
