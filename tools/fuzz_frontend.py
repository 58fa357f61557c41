#!/usr/bin/env python
"""Extended fuzz campaign: compiler + filterlang + kernel parity.

Not part of the test suite — a one-off hardening sweep. Any non-ScriptError
exception or parity mismatch prints a REPRO block.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from conftest import make_ala_pdb, make_water_box  # noqa: E402
from viamd_tpu.io.pdb import parse_pdb  # noqa: E402
from viamd_tpu.script import compile_script  # noqa: E402
from viamd_tpu.script.filterlang import evaluate_filter  # noqa: E402
from viamd_tpu.script.parser import ScriptError  # noqa: E402

sys_small, _ = parse_pdb(make_ala_pdb(6, n_models=2))
sys_water, _ = make_water_box(n_waters=27, box=12.0, n_frames=1)

rng = np.random.RandomState(int(sys.argv[1]) if len(sys.argv) > 1 else 0)

FRAGS = [
    "all", "protein", "water", "backbone", "sidechain", "ion", "nucleic",
    "hetero", "not", "and", "or", "in", "within(", "resname(", "resid(",
    "residue(", "chain(", "atom(", "element(", "name(", "type(", "label(",
    "x(", "y(", "z(", "atoms", "residues", "chains",
    "distance(", "distance_min(", "distance_max(", "distance_pair(",
    "angle(", "dihedral(", "rmsd(", "rdf(", "sdf(", "com(", "plane(",
    "count(", "shape_weights(", "sqrt(", "abs(", "min(", "max(",
    "vec3(", "dot(", "cross(", "import(",
    ")", "(", ",", ";", "=", "{", "}", "[", "]", ":", "'C'", '"ALA"',
    "'H'", "1", "2", "3.5", "10.0", "-1", "0", "1:4", "2:", ":8", "s1",
    "d1", "qq", "+", "-", "*", "/", "==", "<", "\n",
]

n_err = n_ok = n_crash = 0
for i in range(4000):
    k = rng.randint(1, 14)
    toks = [FRAGS[rng.randint(len(FRAGS))] for _ in range(k)]
    src = ("s1 = all;\n" if rng.rand() < 0.3 else "") + " ".join(toks)
    target = sys_small if rng.rand() < 0.7 else sys_water
    try:
        compile_script(src, target)
        n_ok += 1
    except ScriptError:
        n_err += 1
    except Exception as e:  # noqa: BLE001
        n_crash += 1
        print("=== COMPILER CRASH ===")
        print(repr(src))
        print(f"{type(e).__name__}: {e}")
        if n_crash > 8:
            break

print(f"compiler: ok={n_ok} scripterr={n_err} CRASH={n_crash}", flush=True)

fn_err = fn_ok = fn_crash = 0
for i in range(3000):
    k = rng.randint(1, 10)
    toks = [FRAGS[rng.randint(len(FRAGS))] for _ in range(k)]
    src = " ".join(toks)
    target = sys_small if rng.rand() < 0.7 else sys_water
    try:
        evaluate_filter(src, target, {})
        fn_ok += 1
    except ScriptError:
        fn_err += 1
    except Exception as e:  # noqa: BLE001
        fn_crash += 1
        print("=== FILTER CRASH ===")
        print(repr(src))
        print(f"{type(e).__name__}: {e}")
        if fn_crash > 8:
            break

print(f"filter: ok={fn_ok} scripterr={fn_err} CRASH={fn_crash}", flush=True)
