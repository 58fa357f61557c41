#!/usr/bin/env python
"""Grammar-directed fuzz: well-formed random scripts compiled AND evaluated
on a real frame (ortho + triclinic systems). Flags crashes, non-finite
outputs, and eval-time exceptions."""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from conftest import make_ala_pdb, make_water_box  # noqa: E402
from viamd_tpu.io.pdb import parse_pdb  # noqa: E402
from viamd_tpu.ops import pbc as pbc_ops  # noqa: E402
from viamd_tpu.script import compile_script  # noqa: E402
from viamd_tpu.script.parser import ScriptError  # noqa: E402

rng = np.random.RandomState(int(sys.argv[1]) if len(sys.argv) > 1 else 0)

sys_ala, _ = parse_pdb(make_ala_pdb(6, n_models=2))
sys_water, _ = make_water_box(n_waters=27, box=12.0, n_frames=1)

import dataclasses  # noqa: E402

from viamd_tpu.core.unitcell import UnitCell  # noqa: E402

cell_t = UnitCell.from_lengths_angles(12, 12, 12, 90, 95, 60)
Bt = np.asarray(cell_t.basis, np.float64)
frac = np.mod(sys_water.coords().astype(np.float64) / 12.0, 1.0)
wc = (frac @ Bt).astype(np.float32)
sys_tri = dataclasses.replace(
    sys_water, x=wc[:, 0], y=wc[:, 1], z=wc[:, 2], cell=cell_t
)

SYSTEMS = [sys_ala, sys_water, sys_tri]


def rsel(depth=0):
    r = rng.rand()
    atoms = ["all", "protein", "water", "backbone", "element('C')",
             "element('O')", "element('H')", "name('CA')", "resname('ALA')",
             "resname('SOL')", "residue(1:3)", "atom(1:9)", "resid(1:5)",
             "atoms", "residues", "chains", "x(0:8)", "within(3.0, atom(1))"]
    if depth > 2 or r < 0.6:
        return atoms[rng.randint(len(atoms))]
    ops = ["{} and {}", "{} or {}", "not {}", "({})[1:2]"]
    op = ops[rng.randint(len(ops))]
    if op.count("{}") == 2:
        return op.format(rsel(depth + 1), rsel(depth + 1))
    return op.format(rsel(depth + 1))


def rexpr():
    r = rng.rand()
    choices = [
        lambda: f"distance({rng.randint(1, 10)}, {rng.randint(1, 10)})",
        lambda: f"distance(com({rsel()}), com({rsel()}))",
        lambda: f"distance_min({rsel()}, {rsel()})",
        lambda: f"distance_max({rsel()}, {rsel()})",
        lambda: (
            f"angle({rng.randint(1, 8)}, {rng.randint(1, 8)}, "
            f"{rng.randint(1, 8)})"
        ),
        lambda: "dihedral(1, 2, 3, 4)",
        lambda: f"rmsd({rsel()})",
        lambda: f"rdf({rsel()}, {rsel()}, {rng.uniform(2, 6):.1f})",
        lambda: f"sdf({rsel()}, {rsel()}, {rng.uniform(2, 5):.1f})",
        lambda: f"com({rsel()})",
        lambda: f"count({rsel()})",
        lambda: f"shape_weights({rsel()})",
        lambda: f"sqrt(abs(distance(1, {rng.randint(2, 9)})))",
        lambda: f"plane({rsel()})",
    ]
    return choices[rng.randint(len(choices))]()


n_ok = n_err = n_crash = n_evalfail = 0
for i in range(700):
    stmts = []
    for k in range(rng.randint(1, 4)):
        if rng.rand() < 0.25:
            stmts.append(f"s{k} = {rsel()};")
        elif rng.rand() < 0.12:
            stmts.append(f"{{a{k}, b{k}, c{k}}} = shape_weights({rsel()});")
        else:
            stmts.append(f"p{k} = {rexpr()};")
    src = "\n".join(stmts)
    target = SYSTEMS[rng.randint(3)]
    try:
        cs = compile_script(src, target)
        n_ok += 1
    except ScriptError:
        n_err += 1
        continue
    except Exception as e:  # noqa: BLE001
        n_crash += 1
        print("=== COMPILE CRASH ===")
        print(src)
        print(f"{type(e).__name__}: {e}")
        if n_crash > 5:
            break
        continue
    # evaluate one frame
    try:
        x = jnp.asarray(target.coords())
        b = jnp.asarray(np.asarray(target.cell.basis, np.float32))
        t, a = jax.jit(
            lambda x_, b_: cs.frame_fn(x_, b_, pbc_ops.inv_basis_of(b_))
        )(x, b)
        for name, v in {**t, **a}.items():
            if not np.isfinite(np.asarray(v)).all():
                n_evalfail += 1
                print("=== NON-FINITE ===")
                print(src)
                print(name)
                break
    except Exception as e:  # noqa: BLE001
        n_evalfail += 1
        print("=== EVAL CRASH ===")
        print(src)
        print(f"{type(e).__name__}: {e}")
        if n_evalfail > 5:
            break

print(
    f"eval-fuzz: compiled={n_ok} scripterr={n_err} "
    f"CRASH={n_crash} EVALFAIL={n_evalfail}",
    flush=True,
)
