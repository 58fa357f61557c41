"""Script-compiler fuzz tests: arbitrary input must either compile or
raise a located ScriptError — never crash with an internal exception.

Mirrors the reference's resilience contract: the script editor recompiles
on every keystroke (debounced, /root/reference/src/main.cpp:68), so the
md_script front-end sees arbitrarily malformed sources continuously and
must always produce typed errors with source ranges
(/root/reference/src/main.cpp:868-930), not crashes.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import make_ala_pdb
from viamd_tpu.script import compile_script
from viamd_tpu.script.parser import ScriptError


@pytest.fixture(scope="module")
def sys_small():
    from viamd_tpu.io.pdb import parse_pdb

    sys_, _ = parse_pdb(make_ala_pdb(4))
    return sys_


LITERALS = [
    "1", "0", "-3", "2.5", "10.0", "1:4", "2:", ":3", "'C'", '"ALA"',
    "all", "protein", "water", "x", "y1", "s1", "not_defined",
]
FUNCS = [
    "distance", "angle", "dihedral", "rdf", "sdf", "resname", "resid",
    "element", "atom", "residue", "chain", "within", "com", "count",
    "shape_weights", "rmsd", "atoms", "residues", "chains", "type",
    "label", "import", "bogus_fn",
]
OPS = ["+", "-", "*", "/", " and ", " or ", " in ", "==", "<", ">"]


def _rand_expr(rng, depth=0):
    r = rng.rand()
    if depth > 3 or r < 0.3:
        return rng.choice(LITERALS)
    if r < 0.65:
        fn = rng.choice(FUNCS)
        nargs = rng.randint(0, 4)
        args = ", ".join(_rand_expr(rng, depth + 1) for _ in range(nargs))
        e = f"{fn}({args})"
    else:
        e = (
            _rand_expr(rng, depth + 1)
            + rng.choice(OPS)
            + _rand_expr(rng, depth + 1)
        )
    if rng.rand() < 0.15:
        e = f"({e})"
    if rng.rand() < 0.1:
        e = f"{e}[{rng.randint(0, 5)}:{rng.randint(1, 9)}]"
    if rng.rand() < 0.1:
        e = f"-{e}"
    return e


def _rand_script(rng):
    lines = []
    for i in range(rng.randint(1, 5)):
        tgt = (
            f"v{i}"
            if rng.rand() < 0.8
            else "{" + ",".join(f"t{i}_{k}" for k in range(3)) + "}"
        )
        lines.append(f"{tgt} = {_rand_expr(rng)};")
    return "\n".join(lines)


def _mutate(rng, src):
    """Random corruption: delete/insert/duplicate characters."""
    s = list(src)
    for _ in range(rng.randint(1, 6)):
        if not s:
            break
        k = rng.randint(0, len(s))
        op = rng.rand()
        if op < 0.4 and len(s) > 1:
            del s[k % len(s)]
        elif op < 0.7:
            s.insert(k % len(s), rng.choice(list("(){};,:=+-*/'\"@#$ ")))
        else:
            s.insert(k % len(s), s[k % len(s)])
    return "".join(s)


class TestScriptFuzz:
    def test_generated_scripts_never_crash(self, sys_small):
        rng = np.random.RandomState(0)
        compiled = errors = 0
        for _ in range(150):
            src = _rand_script(rng)
            try:
                compile_script(src, sys_small)
                compiled += 1
            except ScriptError as e:
                assert e.line >= 1 and e.col >= 0
                errors += 1
        # the generator is biased toward plausible scripts: both outcomes
        # must actually occur for the test to mean anything
        assert compiled > 0 and errors > 0

    def test_mutated_scripts_never_crash(self, sys_small):
        rng = np.random.RandomState(1)
        base = (
            's1 = resname("ALA")[2:8];\n'
            "d1 = distance(10,30);\n"
            "r = rdf(element('C'), element('H'), 10.0);\n"
            "{lin,plan,iso} = shape_weights(all);\n"
        )
        for _ in range(200):
            src = _mutate(rng, base)
            try:
                compile_script(src, sys_small)
            except ScriptError as e:
                assert e.line >= 1

    def test_garbage_bytes_never_crash(self, sys_small):
        rng = np.random.RandomState(2)
        alphabet = list(
            "abz019(){}[];,:=+-*/<>!&|^%~.'\"\\\n\t @#$?"
        )
        for _ in range(200):
            n = rng.randint(1, 80)
            src = "".join(rng.choice(alphabet) for _ in range(n))
            try:
                compile_script(src, sys_small)
            except ScriptError:
                pass

    def test_filterlang_fuzz_never_crashes(self, sys_small):
        """The display-filter front-end (md_filter analog) sees arbitrary
        text from the representation filter box every keystroke
        (update_representation, viamd.cpp:1316/1510) — same contract:
        a Bitfield or a located ScriptError, never an internal crash."""
        from viamd_tpu.core.bitfield import Bitfield
        from viamd_tpu.script.filterlang import evaluate_filter

        rng = np.random.RandomState(3)
        frags = [
            "protein", "water", "all", "not", "and", "or", "within(",
            "resname(", "element(", "atom(", "x(", "5.0", "'ALA'", "1:4",
            ")", "(", ",", ";", "s1", "{", "]", "..", "9e99", "-",
        ]
        ok = err = 0
        for _ in range(300):
            n = rng.randint(1, 10)
            src = " ".join(rng.choice(frags) for _ in range(n))
            try:
                mask, dyn = evaluate_filter(src, sys_small, {})
                assert isinstance(mask, Bitfield)
                assert isinstance(dyn, bool)
                ok += 1
            except ScriptError:
                err += 1
        assert ok > 0 and err > 0
