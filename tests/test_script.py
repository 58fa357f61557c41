"""Script language tests: parser, selections, compile, full eval pipeline."""

import numpy as np
import jax
import pytest

from tests.conftest import make_ala_pdb
from viamd_tpu.script import parser as P
from viamd_tpu.script.parser import ScriptError
from viamd_tpu.script import compile_script, evaluate_filter
from viamd_tpu.eval import evaluate


class TestParser:
    def test_default_script_parses(self):
        src = (
            's1 = resname("ALA")[2:8];\n'
            "d1 = distance(10,30);\n"
            'a1 = angle(2,1,3) in resname("ALA");\n'
            "r = rdf(element('C'), element('H'), 10.0);\n"
            "v = sdf(s1, element('H'), 10.0);\n"
            "{lin,plan,iso} = shape_weights(all);\n"
        )
        stmts = P.parse(src)
        assert len(stmts) == 6
        assert stmts[0].targets == ["s1"]
        assert stmts[5].targets == ["lin", "plan", "iso"]
        assert isinstance(stmts[2].expr, P.InExpr)
        assert isinstance(stmts[0].expr, P.Subscript)

    def test_comments_and_ranges(self):
        stmts = P.parse("# comment\nr = resid(2:8); // trailing\n")
        assert len(stmts) == 1
        call = stmts[0].expr
        assert isinstance(call, P.Call)
        assert isinstance(call.args[0], P.RangeLit)

    def test_open_ranges(self):
        stmts = P.parse("a = atom(5:); b = atom(:10);")
        r1 = stmts[0].expr.args[0]
        r2 = stmts[1].expr.args[0]
        assert r1.end is None and r1.beg is not None
        assert r2.beg is None and r2.end is not None

    def test_errors_have_location(self):
        with pytest.raises(ScriptError) as ei:
            P.parse("d = distance(1,")
        assert ei.value.line >= 1

    def test_out_keyword_reserved(self):
        # reference keyword vocabulary (TextEditor.cpp:3313): `out` is a
        # keyword with no grammar — reserved here with a positioned error
        # (docs/LANGUAGE.md "Keyword parity").
        for src in ("out = distance(1,2);", "d = out(1);"):
            with pytest.raises(ScriptError, match="out"):
                P.parse(src)

    def test_anonymous_expression(self):
        stmts = P.parse("distance(1,2);")
        assert stmts[0].targets[0].startswith("$")


class TestSelections:
    def test_filter_basic(self, ala_system):
        mask, dyn = evaluate_filter("element('C')", ala_system)
        # 3 carbons per residue (CA, C, CB) × 4 residues
        assert mask.popcount() == 12
        assert not dyn

    def test_filter_logic(self, ala_system):
        m1, _ = evaluate_filter("element('C') and backbone", ala_system)
        assert m1.popcount() == 8  # CA + C per residue
        m2, _ = evaluate_filter("element('C') or element('N')", ala_system)
        assert m2.popcount() == 16
        m3, _ = evaluate_filter("not element('H')", ala_system)
        assert m3.popcount() == ala_system.natoms  # fixture has no H

    def test_filter_name_resname(self, ala_system):
        m, _ = evaluate_filter('name("CA")', ala_system)
        assert m.popcount() == 4
        m, _ = evaluate_filter('resname("ALA")', ala_system)
        assert m.popcount() == 20
        m, _ = evaluate_filter('resname("GLY")', ala_system)
        assert m.popcount() == 0

    def test_filter_resid_residue(self, ala_system):
        m, _ = evaluate_filter("resid(2)", ala_system)
        assert m.popcount() == 5
        m, _ = evaluate_filter("residue(1:2)", ala_system)
        assert m.popcount() == 10

    def test_filter_within_dynamic(self, ala_system):
        m, dyn = evaluate_filter("within(2.0, name('CA'))", ala_system)
        assert dyn
        assert m.popcount() >= 4  # at least the CAs themselves

    def test_filter_within_negative_wrap(self, water):
        # np.mod(-1e-16, L) == L exactly; the KD-tree boxsize path must
        # clamp wrapped coords into [0, L) or scipy raises ValueError
        s, _ = water
        s.x[0] = -1e-16
        m, dyn = evaluate_filter("within(2.0, element('O'))", s)
        assert dyn
        assert m.popcount() >= 1

    def test_plural_structure_builtins(self, ala_system):
        # atoms()/residues()/chains() — reference identifier list,
        # ext/ImGuiColorTextEdit/TextEditor.cpp:3320
        m, _ = evaluate_filter("atoms(1:3)", ala_system)
        assert m.popcount() == 3
        # selection form promotes to whole residues
        m1, _ = evaluate_filter("name('CA')", ala_system)
        m2, _ = evaluate_filter("residues(name('CA'))", ala_system)
        assert m2.popcount() > m1.popcount()
        mall, _ = evaluate_filter("residues()", ala_system)
        assert mall.popcount() == ala_system.natoms
        mc, _ = evaluate_filter("chains(atom(1))", ala_system)
        assert mc.popcount() >= 1

    def test_reference_identifier_list_covered(self):
        # programmatic diff vs the full VIAMD language identifier list
        # (ext/ImGuiColorTextEdit/TextEditor.cpp:3317-3331) so language-
        # surface regressions are impossible
        import re
        from pathlib import Path

        from viamd_tpu.script.compiler import BUILTINS, NULLARY

        ref = Path(
            "/root/reference/ext/ImGuiColorTextEdit/TextEditor.cpp"
        )
        if not ref.exists():
            pytest.skip("reference checkout not available")
        text = ref.read_text(errors="replace")
        # line 60 calls VIAMD(); the definition (line 3306) precedes the
        # identifier table — slice from the last occurrence
        viamd = text[text.rindex("LanguageDefinition::VIAMD()"):]
        block = viamd[
            viamd.index("identifiers[]"): viamd.index("};", viamd.index("identifiers[]"))
        ]
        idents = set(re.findall(r'"([A-Za-z_][A-Za-z0-9_]*)"', block))
        assert len(idents) > 30, idents  # sanity: parsed the real list
        known = set(BUILTINS) | set(NULLARY)
        missing = idents - known
        assert not missing, f"script builtins missing vs reference: {sorted(missing)}"

    def test_filter_wildcard(self, ala_system):
        m, _ = evaluate_filter("name('C*')", ala_system)
        assert m.popcount() == 12

    def test_filter_water_flag(self, water):
        s, _ = water
        m, _ = evaluate_filter("water", s)
        assert m.popcount() == s.natoms

    def test_bad_filter_raises(self, ala_system):
        with pytest.raises(ScriptError):
            evaluate_filter("bogus('X')", ala_system)
        with pytest.raises(ScriptError):
            evaluate_filter("distance(1,2)", ala_system)  # not a selection


class TestCompile:
    def test_default_script_compiles(self, ala_traj_system):
        sys, traj = ala_traj_system
        src = (
            's1 = resname("ALA")[2:4];\n'
            "d1 = distance(1,6);\n"
            'a1 = angle(2,1,3) in resname("ALA");\n'
            "r = rdf(element('C'), element('O'), 8.0);\n"
            "v = sdf(s1, element('O'), 6.0);\n"
            "{lin,plan,iso} = shape_weights(all);\n"
        )
        cs = compile_script(src, sys)
        names = [p.name for p in cs.properties]
        assert set(names) == {"d1", "a1", "r", "v", "lin", "plan", "iso"}
        assert cs.property("d1").kind == "temporal"
        assert cs.property("a1").dim == 4  # one per ALA residue
        assert cs.property("r").kind == "distribution"
        assert cs.property("v").kind == "volume"
        assert "s1" in cs.selections
        assert cs.selections["s1"].n_structures == 3  # residues 2..4

    def test_rdf_triclinic_compiler_route(self, monkeypatch):
        """The compiler's triclinic Pallas RDF branch (normally TPU-only)
        driven in interpret mode via VIAMD_TPU_PALLAS_INTERPRET: must
        match the non-Pallas compile of the same script (which on CPU now
        routes through the XLA triclinic cell list — its parity against
        the dense path is pinned kernel-level in
        test_ops.py::test_triclinic_matches_dense)."""
        import jax.numpy as jnp

        from tests.conftest import make_water_box
        from viamd_tpu.core.unitcell import UnitCell
        from viamd_tpu.ops import pbc as pbc_ops

        import dataclasses

        sys_, _ = make_water_box(n_waters=1500, box=36.0, n_frames=1)
        cell = UnitCell.from_lengths_angles(36, 36, 36, 90, 90, 60)
        B = np.asarray(cell.basis, np.float32)
        # re-wrap the cubic coords into the skewed cell (fractional mod)
        frac = np.mod(sys_.coords().astype(np.float64) / 36.0, 1.0)
        coords = (frac @ B).astype(np.float32)
        sys_ = dataclasses.replace(
            sys_, x=coords[:, 0], y=coords[:, 1], z=coords[:, 2], cell=cell
        )
        src = "r = rdf(element('O'), element('O'), 6.0);\n"
        x = jnp.asarray(coords)
        basis = jnp.asarray(B)
        inv = pbc_ops.inv_basis_of(basis)

        cs_dense = compile_script(src, sys_)
        _, a_dense = cs_dense.frame_fn(x, basis, inv)

        monkeypatch.setenv("VIAMD_TPU_PALLAS_INTERPRET", "1")
        cs_pl = compile_script(src, sys_)
        _, a_pl = cs_pl.frame_fn(x, basis, inv)
        np.testing.assert_allclose(
            np.asarray(a_pl["r"]), np.asarray(a_dense["r"]), atol=1e-2
        )

    def test_rdf_ortho_compiler_route(self, monkeypatch):
        """The compiler's orthorhombic Pallas RDF branch (TPU-only) in
        interpret mode vs the dense compile — exercises the full routing
        (snap_capacity, offset classes, slab budget) at compiler level."""
        import jax.numpy as jnp

        from tests.conftest import make_water_box
        from viamd_tpu.ops import pbc as pbc_ops

        sys_, _ = make_water_box(n_waters=1500, box=36.0, n_frames=1)
        src = "r = rdf(element('O'), element('O'), 6.0);\n"
        x = jnp.asarray(sys_.coords())
        basis = jnp.asarray(np.asarray(sys_.cell.basis, np.float32))
        inv = pbc_ops.inv_basis_of(basis)
        cs_dense = compile_script(src, sys_)
        _, a_dense = cs_dense.frame_fn(x, basis, inv)
        monkeypatch.setenv("VIAMD_TPU_PALLAS_INTERPRET", "1")
        cs_pl = compile_script(src, sys_)
        _, a_pl = cs_pl.frame_fn(x, basis, inv)
        np.testing.assert_allclose(
            np.asarray(a_pl["r"]), np.asarray(a_dense["r"]), atol=1e-2
        )

    def test_rdf_atom_sharded_compile(self, monkeypatch):
        """compile_script(atom_shard=...) → the RDF kernel slab-shards
        over the atoms mesh axis and psums inside the frame graph; traced
        under a shard_map it must match the meshless dense compile."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh
        from jax.sharding import PartitionSpec as PS

        from tests.conftest import make_water_box
        from viamd_tpu.ops import pbc as pbc_ops

        sys_, _ = make_water_box(n_waters=1500, box=36.0, n_frames=1)
        src = "r = rdf(element('O'), element('O'), 6.0);\n"
        x = jnp.asarray(sys_.coords())
        basis = jnp.asarray(np.asarray(sys_.cell.basis, np.float32))
        inv = pbc_ops.inv_basis_of(basis)
        cs_dense = compile_script(src, sys_)
        _, a_dense = cs_dense.frame_fn(x, basis, inv)

        monkeypatch.setenv("VIAMD_TPU_PALLAS_INTERPRET", "1")
        mesh = Mesh(np.array(jax.devices()[:4]), ("atoms",))
        cs_tp = compile_script(src, sys_, atom_shard=("atoms", 4))

        def run(x_, b_, i_):
            _, a = cs_tp.frame_fn(x_, b_, i_)
            return a

        a_tp = jax.shard_map(
            run, mesh=mesh, in_specs=(PS(), PS(), PS()), out_specs=PS(),
            check_vma=False,
        )(x, basis, inv)
        np.testing.assert_allclose(
            np.asarray(a_tp["r"]), np.asarray(a_dense["r"]), atol=1e-2
        )

    def test_empty_selection_rejected(self, water):
        """Geometric reductions over a statically-empty selection must be
        located compile errors (min over nothing = inf, shape weights of
        nothing = garbage) — found by the round-2 fuzz campaign."""
        sys_, _ = water
        import pytest

        from viamd_tpu.script.parser import ScriptError

        for src in [
            "p = distance_min(name('CA'), backbone);",
            "p = distance_max(not chains, water);",
            "p = distance_pair(name('CA'), water);",
            "p = rmsd(name('CA'));",
            "p = shape_weights(name('CA'));",
            "p = com(resname('ALA'));",
            "p = plane(name('CA'));",
        ]:
            with pytest.raises(ScriptError, match="no atoms"):
                compile_script(src, sys_)
        # but zero-result accumulations stay valid (count/rdf of empty)
        cs = compile_script(
            "p = count(resname('ALA'));\n"
            "r = rdf(element('O'), resname('ALA'), 4.0);\n",
            sys_,
        )
        assert [p.name for p in cs.properties] == ["p", "r"]

    def test_sdf_vis_follows_reassignment(self, ala_traj_system):
        """vis.sdf payload is attached to the property SPEC: reassigning a
        volume property must not leave the stale first record paired with
        the name (positional pairing bug)."""
        sys, _ = ala_traj_system
        cs = compile_script(
            "v = sdf(residue(1:2), element('O'), 2.0);\n"
            "v = sdf(residue(3:4), element('O'), 4.0);\n",
            sys,
        )
        rec = cs.property("v").spec.vis
        assert rec["extent"] == 4.0
        assert len(rec["structures"]) == 2
        # both calls still appear in the call-ordered visualization list
        assert len(cs.visualization["sdf"]) == 2
        # the NAME-keyed mirror (used for checkpoint-restored results,
        # where spec.vis is dropped) must also resolve to the live record
        # even when call order and property order diverge
        cs2 = compile_script(
            "v = sdf(residue(1:2), element('O'), 4.0);\n"
            "v = sdf(residue(3:4), element('O'), 5.0);\n"
            "u = sdf(residue(1:4), element('O'), 6.0);\n",
            sys,
        )
        by_name = cs2.visualization["sdf_by_name"]
        assert by_name["v"]["extent"] == 5.0
        assert by_name["u"]["extent"] == 6.0

    def test_compile_errors(self, ala_system):
        with pytest.raises(ScriptError):
            compile_script("d = distance(1, 99999);", ala_system)
        with pytest.raises(ScriptError):
            compile_script("d = nonsense(1);", ala_system)
        with pytest.raises(ScriptError):
            compile_script("{a,b} = distance(1,2);", ala_system)

    def test_math_and_arithmetic(self, ala_system):
        cs = compile_script(
            "d = distance(1,6); e = sqrt(d * d); f = d + 1.0;", ala_system
        )
        assert {p.name for p in cs.properties} == {"d", "e", "f"}

    def test_injected_identifiers(self, ala_system):
        from viamd_tpu.core.bitfield import Bitfield

        stored = Bitfield.from_range(ala_system.natoms, 0, 5)
        cs = compile_script(
            "c = count(mysel);", ala_system, identifiers={"mysel": stored}
        )
        assert cs.property("c").kind == "temporal"


class TestEvaluate:
    def test_full_pipeline(self, ala_traj_system):
        sys, traj = ala_traj_system
        src = (
            "d1 = distance(1,6);\n"
            'a1 = angle(2,1,3) in resname("ALA");\n'
            "r = rdf(element('C'), element('O'), 8.0);\n"
            "{lin,plan,iso} = shape_weights(all);\n"
        )
        cs = compile_script(src, sys)
        res = evaluate(cs, traj, chunk=4)
        F = traj.num_frames
        assert res.n_frames_done == F
        assert res.temporal["d1"].shape == (F, 1)
        assert res.temporal["a1"].shape == (F, 4)
        assert np.isfinite(res.temporal["d1"]).all()
        # distance should match direct computation on frame 0
        xyz0, cell = traj.load_frame(0)
        d0 = np.linalg.norm(xyz0[0] - xyz0[5])
        np.testing.assert_allclose(res.temporal["d1"][0, 0], d0, rtol=1e-4)
        assert res.distributions["r"].shape == (128,)
        assert res.distributions["r"].sum() > 0
        assert res.frame_mask.popcount() == F
        agg = res.aggregate("a1")
        assert agg["mean"].shape == (F,)

    def test_frame_window(self, ala_traj_system):
        sys, traj = ala_traj_system
        cs = compile_script("d1 = distance(1,6);", sys)
        res = evaluate(cs, traj, frame_range=range(2, 7), chunk=2)
        assert res.n_frames_done == 5
        assert res.frame_mask.popcount() == 5
        assert res.frame_mask.test_bit(2) and not res.frame_mask.test_bit(0)

    def test_interrupt(self, ala_traj_system):
        sys, traj = ala_traj_system
        cs = compile_script("d1 = distance(1,6);", sys)
        calls = []

        def interrupt():
            calls.append(1)
            return len(calls) > 1

        res = evaluate(cs, traj, chunk=2, interrupt=interrupt)
        assert res.interrupted
        assert 0 < res.n_frames_done < traj.num_frames

    def test_progress(self, ala_traj_system):
        sys, traj = ala_traj_system
        cs = compile_script("d1 = distance(1,6);", sys)
        fractions = []
        evaluate(cs, traj, chunk=4, progress=fractions.append)
        assert fractions[-1] == 1.0
        assert all(b >= a for a, b in zip(fractions, fractions[1:]))

    def test_sdf_volume(self, water):
        sys, traj = water
        src = "v = sdf(residue(1:8), element('H'), 4.0);"
        cs = compile_script(src, sys)
        res = evaluate(cs, traj, chunk=5)
        assert res.volumes["v"].shape == (64, 64, 64)
        vol = res.normalized_volume("v")
        assert np.isfinite(vol).all()
        assert vol.sum() > 0

    def test_sdf_pairs_compiler_route(self):
        """Large periodic system + few structures → the compiler routes
        sdf through the sort-free pairs path (sdf_accumulate_pairs);
        the routed compile must match the dense all-pairs oracle."""
        import jax.numpy as jnp

        from tests.conftest import make_water_box
        from viamd_tpu.ops import pbc as pbc_ops
        from viamd_tpu.ops import sdf as sdf_ops

        sys_, _ = make_water_box(n_waters=3000, box=45.0, n_frames=1)
        assert sys_.natoms >= 8192
        src = "v = sdf(residue(1:16), element('H'), 4.0);\n"
        x = jnp.asarray(sys_.coords())
        basis = jnp.asarray(np.asarray(sys_.cell.basis, np.float32))
        inv = pbc_ops.inv_basis_of(basis)

        cs_pairs = compile_script(src, sys_)
        _, a_pairs = cs_pairs.frame_fn(x, basis, inv)

        el = np.asarray(sys_.element)
        idx_t = np.nonzero(el == 1)[0].astype(np.int32)
        res = np.asarray(sys_.atom_res_idx)
        structs = [
            np.nonzero(res == i)[0].astype(np.int32) for i in range(16)
        ]
        idx, w, refc = sdf_ops.make_structure_inputs(
            structs, np.asarray(sys_.mass), np.asarray(sys_.coords())
        )
        tw = np.zeros(sys_.natoms, np.float32)
        tw[idx_t] = 1.0
        dense = np.asarray(
            sdf_ops.sdf_accumulate(
                x, jnp.asarray(tw), jnp.asarray(idx), jnp.asarray(w),
                jnp.asarray(refc), 4.0, 64, basis, inv,
            )
        )
        np.testing.assert_allclose(
            np.asarray(a_pairs["v"]), dense, atol=1e-3, rtol=1e-3
        )

    def test_rdf_normalization(self, water):
        sys, traj = water
        cs = compile_script(
            "r = rdf(element('O'), element('O'), 9.0);", sys
        )
        res = evaluate(cs, traj)
        g = res.normalized_distribution("r", sys.cell.volume())
        assert np.isfinite(g).all()

    def test_mesh_sharded_eval(self, ala_traj_system):
        sys, traj = ala_traj_system
        devs = jax.devices()
        assert len(devs) == 8, "conftest must provide 8 virtual CPU devices"
        mesh = jax.sharding.Mesh(np.array(devs), ("frames",))
        cs = compile_script(
            "d1 = distance(1,6); r = rdf(element('C'), element('O'), 8.0);", sys
        )
        res_sharded = evaluate(cs, traj, chunk=8, mesh=mesh)
        res_single = evaluate(cs, traj, chunk=8)
        np.testing.assert_allclose(
            res_sharded.temporal["d1"], res_single.temporal["d1"], rtol=1e-5
        )
        np.testing.assert_allclose(
            res_sharded.distributions["r"],
            res_single.distributions["r"],
            rtol=1e-4,
        )


    def test_mesh_fused_device_resident(self):
        # the sharded FUSED path (device-resident stack sharded over the
        # frames axis, one dispatch per global chunk, psum'd accumulators)
        # must agree with the meshless fused path bit-for-bit in temporal
        # ordering and accumulators (VERDICT r4 #1)
        from viamd_tpu.datagen import water_box_device
        from viamd_tpu.eval import Evaluator
        from viamd_tpu.script.compiler import compile_script

        devs = jax.devices()
        mesh = jax.sharding.Mesh(np.array(devs), ("frames",))
        sys, traj = water_box_device(40, n_frames=16, seed=5)
        cs = compile_script(
            "c = count(element('O'));\n"
            "d = distance(1, 4);\n"
            "r = rdf(element('O'), element('O'), 6.0);",
            sys,
        )
        ev_m = Evaluator(cs, traj, chunk=16, mesh=mesh)
        assert getattr(ev_m, "_mesh_fused_fn", None) is not None
        res_m = ev_m.run()
        res_s = Evaluator(cs, traj, chunk=16).run()
        assert res_m.n_frames_done == 16
        np.testing.assert_array_equal(res_m.frame_indices, np.arange(16))
        np.testing.assert_allclose(
            res_m.temporal["d"], res_s.temporal["d"], rtol=1e-5
        )
        np.testing.assert_allclose(
            res_m.distributions["r"], res_s.distributions["r"], rtol=1e-4
        )
        # multiple chunks per device (chunk < F) exercises the carry
        ev_m2 = Evaluator(cs, traj, chunk=8, mesh=mesh)
        res_m2 = ev_m2.run()
        np.testing.assert_allclose(
            res_m2.temporal["d"], res_s.temporal["d"], rtol=1e-5
        )
        np.testing.assert_allclose(
            res_m2.distributions["r"], res_s.distributions["r"], rtol=1e-4
        )
        # partial frame range falls back and still works
        res_p = Evaluator(cs, traj, chunk=8, mesh=mesh).run(
            frame_range=range(8)
        )
        np.testing.assert_allclose(
            res_p.temporal["d"], res_s.temporal["d"][:8], rtol=1e-5
        )


class TestCheckpointResume:
    def test_interrupt_checkpoint_resume(self, ala_traj_system, tmp_path):
        from viamd_tpu.eval.engine import (
            Evaluator, load_checkpoint, save_checkpoint,
        )
        from viamd_tpu.script import compile_script

        sys, traj = ala_traj_system
        cs = compile_script(
            "d1 = distance(1,6); r = rdf(element('C'), element('O'), 8.0);",
            sys,
        )
        ev = Evaluator(cs, traj, chunk=2)
        # full reference
        ref = ev.run()
        # partial run (first 4 frames), checkpoint, reload, resume
        part = ev.run(frame_range=range(4))
        p = str(tmp_path / "ckpt.npz")
        save_checkpoint(part, p)
        loaded = load_checkpoint(p)
        assert loaded.n_frames_done == 4
        assert loaded.frame_mask.popcount() == 4
        full = ev.run(resume_from=loaded)
        assert full.n_frames_done == traj.num_frames
        np.testing.assert_allclose(full.temporal["d1"], ref.temporal["d1"], rtol=1e-5)
        np.testing.assert_allclose(
            full.distributions["r"], ref.distributions["r"], rtol=1e-4
        )
        np.testing.assert_array_equal(full.frame_indices, ref.frame_indices)


class TestFusedResume:
    def test_resume_on_device_trajectory(self, ala_traj_system):
        """The fused one-dispatch chunk path must honor resume_from with
        the arbitrary (non-contiguous) index sets it produces."""
        from viamd_tpu.eval.engine import Evaluator
        from viamd_tpu.io.trajectory import DeviceTrajectory
        from viamd_tpu.script import compile_script

        sys, traj = ala_traj_system
        dtraj = DeviceTrajectory(traj)
        cs = compile_script(
            "d1 = distance(1,6); r = rdf(element('C'), element('O'), 8.0);",
            sys,
        )
        ev = Evaluator(cs, dtraj, chunk=3, batch_mode="unroll")
        assert ev._fused_fn is not None  # the path under test
        ref = ev.run()
        # resume over a scattered remainder (frames 0,2,5 done)
        part = ev.run(frame_range=[0, 2, 5])
        full = ev.run(resume_from=part)
        assert full.n_frames_done == dtraj.num_frames
        np.testing.assert_allclose(
            np.sort(np.asarray(full.frame_indices)),
            np.arange(dtraj.num_frames),
        )
        np.testing.assert_allclose(
            np.asarray(full.distributions["r"]),
            np.asarray(ref.distributions["r"]), rtol=1e-4,
        )


class TestFusedSlicePath:
    def test_contiguous_chunks_use_slice_variant(self, ala_traj_system):
        """Full in-order chunks route to the dynamic_slice window (no
        (B,n)-row gather); tails and scattered index sets fall back to the
        gather variant — and both agree with the host batch path."""
        from viamd_tpu.eval.engine import Evaluator
        from viamd_tpu.io.trajectory import DeviceTrajectory
        from viamd_tpu.script import compile_script

        sys, traj = ala_traj_system
        dtraj = DeviceTrajectory(traj)
        cs = compile_script(
            "d1 = distance(1,6); r = rdf(element('C'), element('O'), 8.0);",
            sys,
        )
        ref = Evaluator(cs, traj, chunk=4, batch_mode="unroll").run()
        # 10 frames, chunk 4 → two full contiguous chunks + a tail of 2
        ev = Evaluator(cs, dtraj, chunk=4, batch_mode="unroll")
        res = ev.run()
        assert set(ev._fused_variants) == {"slice", "gather"}
        np.testing.assert_allclose(
            res.temporal["d1"], ref.temporal["d1"], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(res.distributions["r"]),
            np.asarray(ref.distributions["r"]), rtol=1e-4,
        )
        # scattered frames never touch the slice variant
        ev2 = Evaluator(cs, dtraj, chunk=3, batch_mode="unroll")
        ev2.run(frame_range=[0, 2, 4])
        assert set(ev2._fused_variants) == {"gather"}


class TestVisualization:
    def test_vis_payload(self, ala_traj_system):
        from viamd_tpu.script import compile_script

        sys, traj = ala_traj_system
        cs = compile_script(
            'd1 = distance(1,6);\na1 = angle(2,1,3) in resname("ALA");', sys
        )
        assert cs.visualization["lines"] == [(0, 5)]
        assert len(cs.visualization["angles"]) == 4  # one per ALA residue


class TestDynamicProperties:
    """Per-frame dynamic selections INSIDE property evaluation — the
    is_dynamic re-evaluation of viamd.cpp:1510 carried into temporal
    properties (VERDICT r4 missing #1)."""

    def _eval(self, src, sys, traj):
        from viamd_tpu.eval import Evaluator
        from viamd_tpu.script.compiler import compile_script

        cs = compile_script(src, sys)
        ev = Evaluator(cs, traj)
        return cs, ev.run()

    def test_count_within_varies_and_matches_numpy(self, water):
        sys, traj = water
        # shells around the first water's oxygen: membership changes frame
        # to frame as coordinates jitter
        cs, res = self._eval(
            "c = count(within(3.5, residue(1)));", sys, traj
        )
        vals = np.asarray(res.temporal["c"]).reshape(-1)
        box = np.asarray(sys.cell.extent(), np.float64)
        tgt = np.arange(3)  # residue 1 = first 3 atoms
        expect = []
        for f in range(traj.num_frames):
            x, _ = traj.load_frame(f)
            d = x[:, None, :] - x[None, tgt, :]
            d -= np.round(d / box) * box
            dist = np.sqrt((d**2).sum(-1)).min(axis=1)
            expect.append(float((dist <= 3.5).sum()))
        np.testing.assert_allclose(vals, expect, rtol=0, atol=0.01)
        assert len(set(expect)) > 1, "fixture should vary across frames"
        # and NOT a repeat of the reference-frame count
        assert not np.allclose(vals, vals[0] * np.ones_like(vals))

    def test_axis_range_count_per_frame(self, water):
        sys, traj = water
        cs, res = self._eval("c = count(x(0.0:10.0));", sys, traj)
        vals = np.asarray(res.temporal["c"]).reshape(-1)
        expect = [
            float((traj.load_frame(f)[0][:, 0] >= 0.0).sum()
                  - (traj.load_frame(f)[0][:, 0] > 10.0).sum())
            for f in range(traj.num_frames)
        ]
        np.testing.assert_allclose(vals, expect, atol=0.01)

    def test_boolean_combination_dynamic(self, water):
        sys, traj = water
        cs, res = self._eval(
            "c = count(within(3.5, residue(1)) and element('O'));",
            sys, traj,
        )
        vals = np.asarray(res.temporal["c"]).reshape(-1)
        box = np.asarray(sys.cell.extent(), np.float64)
        ok_o = np.asarray(sys.element) == 8
        expect = []
        for f in range(traj.num_frames):
            x, _ = traj.load_frame(f)
            d = x[:, None, :] - x[None, :3, :]
            d -= np.round(d / box) * box
            dist = np.sqrt((d**2).sum(-1)).min(axis=1)
            expect.append(float(((dist <= 3.5) & ok_o).sum()))
        np.testing.assert_allclose(vals, expect, atol=0.01)

    def test_com_and_distance_min_dynamic(self, water):
        sys, traj = water
        cs, res = self._eval(
            "d = distance_min(within(3.0, residue(1)), residue(2));",
            sys, traj,
        )
        vals = np.asarray(res.temporal["d"]).reshape(-1)
        box = np.asarray(sys.cell.extent(), np.float64)
        expect = []
        for f in range(traj.num_frames):
            x, _ = traj.load_frame(f)
            d = x[:, None, :] - x[None, :3, :]
            d -= np.round(d / box) * box
            sel = np.sqrt((d**2).sum(-1)).min(axis=1) <= 3.0
            da = x[sel][:, None, :] - x[None, 3:6, :]
            da -= np.round(da / box) * box
            expect.append(float(np.sqrt((da**2).sum(-1)).min()))
        np.testing.assert_allclose(vals, expect, rtol=1e-4)

    def test_rdf_dynamic_matches_static_when_equivalent(self, water):
        # x-range covering the whole box == all: the dynamic rdf path must
        # agree with the static one after normalization
        sys, traj = water
        from viamd_tpu.eval import Evaluator
        from viamd_tpu.script.compiler import compile_script

        vol = float(np.prod(sys.cell.extent()))
        cs_d = compile_script(
            "r = rdf(x(-100.0:100.0), element('O'), 6.0);", sys
        )
        cs_s = compile_script("r = rdf(all, element('O'), 6.0);", sys)
        g_d = Evaluator(cs_d, traj).run().normalized_distribution("r", vol)
        g_s = Evaluator(cs_s, traj).run().normalized_distribution("r", vol)
        np.testing.assert_allclose(g_d, g_s, rtol=1e-3, atol=1e-4)

    def test_count_within_aperiodic_fallback(self):
        # aperiodic system: the within() host fallback must stay pure
        # NumPy (a jnp op inside the probe trace would be staged as a
        # tracer) and the per-frame device mask must agree with brute force
        from viamd_tpu.app.session import Session

        s = Session()
        s.load_demo(n_res=8, n_frames=6)
        s.set_script("c = count(within(4.0, residue(1)));")
        assert s.compile_script(), s.script_errors
        c = np.asarray(s.evaluate().temporal["c"]).reshape(-1)
        tgt = np.arange(
            int(s.system.res_offsets[0]), int(s.system.res_offsets[1])
        )
        for f in range(s.num_frames):
            x, _ = s.trajectory.load_frame(f)
            dist = np.sqrt(
                ((x[:, None, :] - x[None, tgt, :]) ** 2).sum(-1)
            ).min(1)
            np.testing.assert_allclose(c[f], float((dist <= 4.0).sum()),
                                       atol=0.01)

    def test_dynamic_context_is_typed_error(self, ala_system):
        from viamd_tpu.script.compiler import compile_script
        from viamd_tpu.script.parser import ScriptError

        with pytest.raises(ScriptError, match="static"):
            compile_script(
                "a = com(all) in within(5.0, resname('ALA'));", ala_system
            )

    def test_static_consumer_still_warns(self, ala_system):
        from viamd_tpu.script.compiler import compile_script

        cs = compile_script(
            "r = rmsd(within(5.0, resname('ALA')));", ala_system
        )
        assert any("reference frame" in w for w in cs.warnings)


class TestDynamicFilter:
    def test_within_tracks_coords(self, ala_system):
        from viamd_tpu.script import evaluate_filter

        m1, dyn = evaluate_filter("within(2.0, atom(1))", ala_system)
        assert dyn
        # move everything far from atom 1 → only atom 1 remains within
        far = ala_system.coords().copy()
        far[1:] += 100.0
        m2, _ = evaluate_filter(
            "within(2.0, atom(1))", ala_system, coords=far
        )
        assert m2.popcount() == 1
        assert m1.popcount() > 1


class TestBatchModes:
    """All Evaluator batch modes must agree bit-for-bit on results."""

    def test_modes_agree(self, ala_traj_system):
        from viamd_tpu.eval import Evaluator

        sys, traj = ala_traj_system
        src = (
            "d1 = distance(1, 6);\n"
            "r = rdf(element('C'), element('O'), 8.0);\n"
        )
        cs = compile_script(src, sys)
        ref = None
        # device-resident trajectory triggers the one-dispatch fused chunk
        # path — it must agree with every host-trajectory batch mode
        from viamd_tpu.io.trajectory import DeviceTrajectory

        dtraj = DeviceTrajectory(traj)
        for mode, tr in (
            ("dispatch", traj), ("vmap", traj), ("map", traj),
            ("unroll", traj), ("unroll", dtraj), ("vmap", dtraj),
        ):
            res = Evaluator(cs, tr, chunk=4, batch_mode=mode).run()
            ck = res.force()
            assert np.isfinite(ck), mode
            t = res.temporal["d1"]
            r = np.asarray(res.distributions["r"])
            assert t.shape == (traj.num_frames, 1), mode
            if ref is None:
                ref = (t, r)
            else:
                np.testing.assert_allclose(t, ref[0], rtol=1e-5)
                np.testing.assert_allclose(r, ref[1], rtol=1e-4)

    def test_device_trajectory_and_datagen(self):
        from viamd_tpu.datagen import water_box_device
        from viamd_tpu.eval import Evaluator

        sys, traj = water_box_device(40, n_frames=6, seed=2)
        assert traj.num_frames == 6 and traj.num_atoms == 120
        assert traj.stage_fence() != 0.0
        # contiguous + gather load paths
        c, b = traj.load_frames([1, 2, 3])
        assert c.shape == (3, 120, 3) and b.shape == (3, 3, 3)
        c2, _ = traj.load_frames([0, 4])
        assert c2.shape == (2, 120, 3)
        xk, bk = traj.device_frame(5)
        assert xk.shape == (120, 3) and bk.shape == (3, 3)
        src = "r = rdf(element('O'), element('H'), 5.0);\n"
        cs = compile_script(src, sys)
        res = Evaluator(cs, traj, chunk=4, batch_mode="unroll").run()
        assert res.n_frames_done == 6
        assert np.asarray(res.distributions["r"]).sum() > 0


class TestWeightedRebin:
    """downsample_histogram parity (/root/reference/src/main.cpp:232-250,
    display re-binning honoring per-property weights at main.cpp:1508)."""

    @staticmethod
    def _reference_downsample(src_bins, num_dst, src_weights=None):
        """Direct numpy transcription of the reference C loop."""
        num_src = len(src_bins)
        factor = max(1, num_src // num_dst)
        dst = np.zeros(num_dst, np.float64)
        for j in range(num_dst):
            b = 0.0
            w = 0.0
            for i in range(factor):
                si = j * factor + i
                b += float(src_bins[si])
                w += float(src_weights[si]) if src_weights is not None else 1.0
            dst[j] = b / w if w else 0.0
        return dst.astype(np.float32)

    def _result(self):
        from viamd_tpu.datagen import water_box
        from viamd_tpu.eval import Evaluator

        sys, traj = water_box(40, n_frames=2, seed=5)
        cs = compile_script("r = rdf(element('O'), element('H'), 5.0);\n", sys)
        return Evaluator(cs, traj, chunk=2).run()

    def test_unweighted_matches_reference(self):
        res = self._result()
        got = res.rebin("r", 32)
        want = self._reference_downsample(
            np.asarray(res.distributions["r"]), 32
        )
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_weighted_matches_reference(self):
        res = self._result()
        src = np.asarray(res.distributions["r"])
        rng = np.random.RandomState(3)
        w = rng.uniform(0.5, 4.0, src.shape[0]).astype(np.float32)
        w[5:9] = 0.0  # zero-weight bins divide to 0, not inf
        res.set_distribution_weights("r", w)
        got = res.rebin("r", 16)
        want = self._reference_downsample(src, 16, w)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        with np.testing.assert_raises(KeyError):
            res.set_distribution_weights("nope", w)
        with np.testing.assert_raises(ValueError):
            res.rebin("r", 4096)
