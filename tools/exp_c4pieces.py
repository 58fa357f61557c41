#!/usr/bin/env python
"""Probe: config-#4 (1M atoms) per-property frame cost through the REAL
compiler path (bin_mode env-controlled, default mxu like production).

Pieces: rdf / sdf / shape / all-three, each compiled by compile_script and
timed as a jitted fori_loop(K) with null subtraction (CLAUDE.md timing
discipline). This supersedes the r3 exp_1m RDF-only split, which measured
the non-production bin_mode="block" kernel.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 16
N_WATERS = 333_334

SCRIPTS = {
    "rdf": "r = rdf(element('O'), element('O'), 10.0);\n",
    "sdf": "v = sdf(residue(1:64), element('H'), 5.0);\n",
    "shape": "{lin, plan, iso} = shape_weights(all);\n",
    "all3": (
        "r = rdf(element('O'), element('O'), 10.0);\n"
        "v = sdf(residue(1:64), element('H'), 5.0);\n"
        "{lin, plan, iso} = shape_weights(all);\n"
    ),
}


def main():
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops import pbc as pbc_ops
    from viamd_tpu.script.compiler import compile_script

    sys_, traj = water_box_device(N_WATERS, n_frames=1, seed=3)
    traj.stage_fence()
    x, _ = traj.device_frame(0)
    basis = jnp.asarray(np.asarray(sys_.cell.basis, np.float32))
    inv = pbc_ops.inv_basis_of(basis)

    def loop(frame_fn):
        @jax.jit
        def many(x0):
            def step(i, carry):
                xi = x0 + carry * 1e-30
                t, a = frame_fn(xi, basis, inv)
                leaves = jax.tree.leaves((t, a))
                return sum(jnp.sum(l).astype(jnp.float32) for l in leaves)

            return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))

        return many

    null = loop(lambda xi, b, i: ({}, {"s": jnp.sum(xi[:1, :1])}))
    float(null(x))
    t0 = time.time()
    float(null(x))
    t_null = (time.time() - t0) / K
    print(f"null {t_null*1e3:8.3f} ms/iter", flush=True)

    for name, src in SCRIPTS.items():
        cs = compile_script(src, sys_)
        f = loop(cs.frame_fn)
        float(f(x))  # compile + drain
        best = None
        for _ in range(3):
            t0 = time.time()
            float(f(x))
            dt = (time.time() - t0) / K
            best = dt if best is None else min(best, dt)
        print(
            f"{name:6s} {best*1e3:8.3f} ms/iter   "
            f"({(best - t_null)*1e3:.3f} net)",
            flush=True,
        )


if __name__ == "__main__":
    main()
