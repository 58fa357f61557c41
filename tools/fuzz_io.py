#!/usr/bin/env python
"""IO loader fuzz: corrupt/truncated/garbage files through load_file.
Loaders must raise clean errors (ValueError/OSError/EOFError/KeyError...)
— never segfault, hang, or leak internal tracebacks like IndexError from
deep NumPy slicing (those are fine-ish but we count them)."""
import os
import sys
import tempfile
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from conftest import make_ala_pdb  # noqa: E402
from viamd_tpu.io import load_file  # noqa: E402
from viamd_tpu.io.pdb import parse_pdb  # noqa: E402

rng = np.random.RandomState(int(sys.argv[1]) if len(sys.argv) > 1 else 0)

# seed corpus: valid files of each text format + binary xtc/trr/dcd
corpus = {}
pdb_txt = make_ala_pdb(4, n_models=2)
corpus[".pdb"] = pdb_txt.encode()

sys_, traj_ = parse_pdb(pdb_txt)
with tempfile.TemporaryDirectory() as td:
    from viamd_tpu.io.dcd import write_dcd
    from viamd_tpu.io.trr import write_trr
    from viamd_tpu.io.xtc import write_xtc

    coords = np.stack([sys_.coords(), sys_.coords() + 0.1])
    for ext, writer in ((".xtc", write_xtc), (".trr", write_trr),
                        (".dcd", write_dcd)):
        p = os.path.join(td, "t" + ext)
        try:
            writer(p, coords, cell=sys_.cell)
        except TypeError:
            writer(p, coords)
        corpus[ext] = open(p, "rb").read()


    # extended corpus: mmCIF, LAMMPS data+trj, .vtraj cache, .edr, .via
    corpus[".cif"] = (
        "data_test\nloop_\n_atom_site.group_PDB\n_atom_site.id\n"
        "_atom_site.type_symbol\n_atom_site.label_atom_id\n"
        "_atom_site.label_comp_id\n_atom_site.label_asym_id\n"
        "_atom_site.label_seq_id\n_atom_site.Cartn_x\n_atom_site.Cartn_y\n"
        "_atom_site.Cartn_z\nATOM 1 N N ALA A 1 1.0 2.0 3.0\n"
        "ATOM 2 C CA ALA A 1 2.0 2.0 3.0\n"
    ).encode()
    corpus[".data"] = (
        "LAMMPS data\n\n2 atoms\n1 atom types\n\n0 10 xlo xhi\n"
        "0 10 ylo yhi\n0 10 zlo zhi\n\nMasses\n\n1 15.999\n\n"
        "Atoms # atomic\n\n1 1 1.0 2.0 3.0\n2 1 4.0 5.0 6.0\n"
    ).encode()
    from viamd_tpu.io.cache import write_cache
    pv = os.path.join(td, "c.vtraj")
    cells_ = np.tile(np.eye(3, dtype=np.float32) * 20, (2, 1, 1))
    write_cache(
        pv,
        ((coords[k].astype(np.float32), cells_[k]) for k in range(2)),
        coords.shape[1], 2,
    )
    corpus[".vtraj"] = open(pv, "rb").read()
    from viamd_tpu.io.edr import write_edr
    pe = os.path.join(td, "e.edr")
    write_edr(pe, ["Potential", "Kinetic"],
              np.arange(4, dtype=np.float64),
              np.random.RandomState(0).rand(4, 2))
    corpus[".edr"] = open(pe, "rb").read()
    gro = ["ala", "3"]
    gro += [f"{1:5d}{'SOL':<5s}{'OW':>5s}{i+1:5d}{0.1*i:8.3f}{0.2:8.3f}{0.3:8.3f}"
            for i in range(3)]
    gro.append("   2.0   2.0   2.0")
    corpus[".gro"] = ("\n".join(gro) + "\n").encode()
    corpus[".xyz"] = b"3\ncomment\nC 0 0 0\nH 1 0 0\nH 0 1 0\n"

    import struct

    n_loaded = n_err = n_ugly = 0
    ugly_kinds = {}
    for i in range(1200):
        ext = list(corpus)[rng.randint(len(corpus))]
        data = bytearray(corpus[ext])
        mode = rng.randint(4)
        if mode == 0 and len(data) > 4:  # truncate
            data = data[: rng.randint(1, len(data))]
        elif mode == 1:  # byte flips
            for _ in range(rng.randint(1, 30)):
                data[rng.randint(len(data))] = rng.randint(256)
        elif mode == 2:  # random garbage
            data = bytearray(rng.bytes(rng.randint(1, 4000)))
        else:  # splice two chunks
            k = rng.randint(1, len(data))
            data = data[k:] + data[:k]
        p = os.path.join(td, f"f{i}{ext}")
        open(p, "wb").write(bytes(data))
        try:
            if ext == ".edr":
                from viamd_tpu.io.edr import read_edr
                read_edr(p)
            else:
                res = load_file(p)
            n_loaded += 1
        except (ValueError, OSError, EOFError, KeyError,
                struct.error, UnicodeDecodeError, StopIteration) as e:
            n_err += 1
        except Exception as e:  # noqa: BLE001
            n_ugly += 1
            k = f"{ext}:{type(e).__name__}"
            if k not in ugly_kinds:
                ugly_kinds[k] = (p, str(e)[:120])
                print(f"=== UGLY {k}: {e}")
                traceback.print_exc(limit=3)
        finally:
            os.unlink(p)

    print(f"io fuzz: loaded={n_loaded} clean_err={n_err} ugly={n_ugly}")
    for k, (p, m) in ugly_kinds.items():
        print(" ", k, m)
