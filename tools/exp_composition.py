#!/usr/bin/env python
"""Composition-penalty experiment at the headline bench config (real TPU).

docs/PERF.md records that the fused rdf+sdf+shape frame graph costs ~2 ms
more than the pieces measured alone (XLA scheduling). This measures, at
100k atoms with the SHIPPED compiler routing:

  a) each property compiled alone (3 separate frame graphs)
  b) the full fused frame graph (the bench configuration)
  c) (b) with VIAMD_TPU_PROP_BARRIER=1 (optimization_barrier between
     property subgraphs — forces XLA to schedule them as sequential
     islands instead of interleaving)

Timing discipline per CLAUDE.md: one jitted fori_loop of K iterations with
carry-perturbed input, scalar-readback fenced, null loop subtracted.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 32
N_WATERS = 33_334

SRCS = {
    "rdf": "r = rdf(element('O'), element('O'), 10.0);\n",
    "sdf": "v = sdf(residue(1:64), element('H'), 5.0);\n",
    "shape": "{lin, plan, iso} = shape_weights(all);\n",
}
FULL = "".join(SRCS.values())


def loop_time(frame_fn, x, basis, inv):
    def step(i, carry):
        xi = x + carry * 1e-30
        t, a = frame_fn(xi, basis, inv)
        s = sum(jnp.sum(v) for v in t.values()) + sum(
            jnp.sum(v) for v in a.values()
        )
        return s * 0.0 + carry * 0.0 + s

    f = jax.jit(lambda: jax.lax.fori_loop(0, K, step, jnp.float32(0.0)))
    float(f())  # compile + warm
    t0 = time.time()
    s = float(f())
    dt = time.time() - t0
    return dt / K * 1000, s


def null_time(x):
    def step(i, carry):
        return jnp.sum(x[0] * 0.0) + carry

    f = jax.jit(lambda: jax.lax.fori_loop(0, K, step, jnp.float32(0.0)))
    float(f())
    t0 = time.time()
    float(f())
    return (time.time() - t0) / K * 1000


def main():
    global N_WATERS
    if len(sys.argv) > 1:
        N_WATERS = int(sys.argv[1])
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.ops.pbc import inv_basis_of
    from viamd_tpu.script import compile_script

    sys_, traj = water_box_device(N_WATERS, n_frames=2, seed=3)
    x, b = traj.device_frame(0)
    inv = inv_basis_of(b)
    null = null_time(x)
    print(f"null loop: {null:.3f} ms", flush=True)

    total_alone = 0.0
    for name, src in SRCS.items():
        cs = compile_script(src, sys_)
        ms, chk = loop_time(cs.frame_fn, x, b, inv)
        print(f"{name:8s} alone: {ms - null:7.3f} ms  (chk {chk:.1f})",
              flush=True)
        total_alone += ms - null

    cs = compile_script(FULL, sys_)
    ms, chk = loop_time(cs.frame_fn, x, b, inv)
    print(f"fused        : {ms - null:7.3f} ms  (chk {chk:.1f})", flush=True)
    print(f"pieces sum   : {total_alone:7.3f} ms  → penalty "
          f"{ms - null - total_alone:+.3f} ms", flush=True)

    os.environ["VIAMD_TPU_PROP_BARRIER"] = "1"
    cs_b = compile_script(FULL, sys_)
    ms_b, chk_b = loop_time(cs_b.frame_fn, x, b, inv)
    print(f"fused+barrier: {ms_b - null:7.3f} ms  (chk {chk_b:.1f})",
          flush=True)


if __name__ == "__main__":
    main()
