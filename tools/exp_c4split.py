"""Stage split of config #4 (1M atoms) inside the REAL bench harness.

Runs the config4 pipeline with script subsets so each stage's marginal
cost is a same-harness difference, not a standalone K-loop estimate
(CLAUDE.md: cross-harness composition is misleading).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from viamd_tpu.datagen import water_box_device  # noqa: E402
from viamd_tpu.eval import Evaluator  # noqa: E402
from viamd_tpu.script import compile_script  # noqa: E402

RDF = "r = rdf(element('O'), element('O'), 10.0);\n"
SDF = "v = sdf(residue(1:64), element('H'), 5.0);\n"
SHP = "{lin, plan, iso} = shape_weights(all);\n"

VARIANTS = [
    ("full", RDF + SDF + SHP),
    ("rdf_only", RDF),
    ("sdf_only", SDF),
    ("rdf_sdf", RDF + SDF),
]


def main():
    sys_, traj = water_box_device(333_334, n_frames=32, seed=3)
    out = {}
    for label, src in VARIANTS:
        compiled = compile_script(src, sys_)
        ev = Evaluator(compiled, traj, chunk=16, batch_mode="unroll")
        t0 = time.time()
        ev.run(frame_range=range(16)).force()
        traj.stage_fence()
        warm = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            res = ev.run()
            res.force()
            times.append(time.time() - t0)
        ms = min(times) / res.n_frames_done * 1000
        out[label] = ms
        print(
            f"{label:10s} {ms:7.2f} ms/frame  warmup={warm:.0f}s "
            f"runs={'/'.join(f'{t:.2f}' for t in times)}",
            flush=True,
        )
    if "full" in out and "rdf_only" in out:
        print(
            f"marginal: sdf={out.get('rdf_sdf', 0) - out['rdf_only']:.2f} "
            f"shape={out['full'] - out.get('rdf_sdf', 0):.2f} "
            f"rdf_alone={out['rdf_only']:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
