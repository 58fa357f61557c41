#!/usr/bin/env python
"""BASELINE.md benchmark configurations #2, #4, #5 on the real TPU.

  #2  ubiquitin-scale (~20k atoms): SDF with internal-reference-frame
      alignment, frames/s.
  #4  1M-atom system: PBC neighbor-grid RDF (Pallas cell-list kernel),
      frames/s for the full RDF+SDF+shape pipeline.
  #5  sustained long sweep: full multi-property pipeline (shape-space +
      temporal props + RDF) over thousands of device-resident frames,
      steady-state frames/s.

Timing discipline per CLAUDE.md: enqueue the whole workload, fence ONCE
via EvalResult.force(). Results recorded in docs/PERF.md.

Usage: python tools/bench_configs.py [2|4|5 ...]   (default: all)
"""

from __future__ import annotations

import json
import sys
import time


def setup():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run_pipeline(n_waters, n_frames, src, chunk=64, label=""):
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.eval import Evaluator
    from viamd_tpu.script import compile_script

    sys_, traj = water_box_device(n_waters, n_frames=n_frames, seed=3)
    compiled = compile_script(src, sys_)
    ev = Evaluator(compiled, traj, chunk=chunk, batch_mode="unroll")
    t0 = time.time()
    ev.run(frame_range=range(chunk)).force()
    traj.stage_fence()
    warm = time.time() - t0
    t0 = time.time()
    res = ev.run()
    res.force()
    dt = time.time() - t0
    fps = res.n_frames_done / dt
    print(
        f"{label}: {fps:.2f} frames/s  ({res.n_frames_done} frames, "
        f"{sys_.natoms} atoms, warmup {warm:.1f}s, run {dt:.2f}s)",
        flush=True,
    )
    return fps


def config2():
    # ubiquitin in water ≈ 20k atoms; 64 reference structures with
    # internal-reference-frame alignment (the SDF hot path)
    return run_pipeline(
        6667, 256,
        "v = sdf(residue(1:64), element('H'), 5.0);\n",
        label="config2_sdf_20k",
    )


def config4():
    # 1M-atom membrane-scale box: the Pallas cell-list RDF + SDF + shape
    return run_pipeline(
        333_334, 32,
        "r = rdf(element('O'), element('O'), 10.0);\n"
        "v = sdf(residue(1:64), element('H'), 5.0);\n"
        "{lin, plan, iso} = shape_weights(all);\n",
        chunk=16,
        label="config4_full_1M",
    )


def config5():
    # sustained multi-thousand-frame sweep: multi-property pipeline
    return run_pipeline(
        6667, 8192,
        "d1 = distance(1, 4);\n"
        "a1 = angle(1, 2, 3);\n"
        "r = rdf(element('O'), element('O'), 10.0);\n"
        "{lin, plan, iso} = shape_weights(all);\n",
        chunk=128,
        label="config5_sustained_8192f_20k",
    )


def main():
    setup()
    which = sys.argv[1:] or ["2", "4", "5"]
    out = {}
    for w in which:
        out[f"config{w}"] = {"2": config2, "4": config4, "5": config5}[w]()
    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
