#!/usr/bin/env python
"""BASELINE.md benchmark configurations on the real TPU (#1 on CPU).

  #1  1ALA-500-style (CPU): the reference's default-dataset regime — a
      small alanine trajectory, distance + RDF script, 500 frames. MUST
      run alone (it pins the CPU platform before backend init).
  #2  ubiquitin-scale (~20k atoms): SDF with internal-reference-frame
      alignment, frames/s.
  #3  solvent density volume (grid scatter-add via the SDF volume prop)
      + a headless 1080p ray-marched render through the public
      DensityVolume path (device render time: tools/profile_render.py).
  #4  1M-atom system: PBC neighbor-grid RDF (Pallas cell-list kernel),
      frames/s for the full RDF+SDF+shape pipeline.
  #5  sustained long sweep: full multi-property pipeline (shape-space +
      temporal props + RDF) over thousands of device-resident frames,
      steady-state frames/s.

Timing discipline per CLAUDE.md: enqueue the whole workload, fence ONCE
via EvalResult.force(). Results recorded in docs/PERF.md.

Usage: python tools/bench_configs.py [1|2|3|4|5 ...]   (default: 2 4 5)
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


def config1():
    # the reference default-dataset regime (1ALA-500.pdb + default
    # script, main.cpp:513-530) on CPU: tiny frames, vmap batching
    import time

    from viamd_tpu.datagen import polyala_helix
    from viamd_tpu.eval import Evaluator
    from viamd_tpu.script import compile_script

    sys_, traj = polyala_helix(n_res=64, n_frames=500)
    compiled = compile_script(
        "d1 = distance(10, 30);\n"
        "r = rdf(element('C'), element('H'), 10.0);\n",
        sys_,
    )
    ev = Evaluator(compiled, traj, chunk=50, batch_mode="vmap")
    ev.run(frame_range=range(50)).force()  # warm
    t0 = time.time()
    res = ev.run()
    res.force()
    dt = time.time() - t0
    fps = res.n_frames_done / dt
    print(
        f"config1_1ala500_cpu: {fps:.2f} frames/s ({res.n_frames_done} "
        f"frames, {sys_.natoms} atoms, run {dt:.2f}s)",
        flush=True,
    )
    return fps


def config3():
    # solvent density volume accumulated over frames, then a headless
    # 1080p render through the public Session → DensityVolume path
    import time

    import numpy as np

    from viamd_tpu.app.session import Session
    from viamd_tpu.datagen import water_box_device

    sys_, traj = water_box_device(33_334, n_frames=64, seed=3)
    ses = Session()
    ses.system = sys_
    ses.set_trajectory(traj)
    ses.set_script(
        "v = sdf(residue(1:64), element('O'), 8.0);\n"
    )
    from viamd_tpu.eval import Evaluator

    compiled = ses.compiled
    ev = Evaluator(compiled, traj, chunk=32, batch_mode="unroll")
    ev.run(frame_range=range(32)).force()
    traj.stage_fence()
    t0 = time.time()
    res = ev.run()
    res.force()
    dt = time.time() - t0
    fps = res.n_frames_done / dt
    ses.eval_result = res
    from viamd_tpu.components.density_volume import DensityVolumeComponent

    dv = DensityVolumeComponent(ses)
    dv.set_isosurfaces([0.25, 0.6])
    t0 = time.time()
    img, depth = dv.render("v", width=1920, height=1080)
    trender = time.time() - t0
    assert np.isfinite(np.asarray(img)).all()
    print(
        f"config3_densvol: eval {fps:.2f} frames/s; 1080p render+readback "
        f"{trender*1000:.0f} ms (device-only figure: tools/profile_render.py)",
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
    which = sys.argv[1:] or ["2", "4", "5"]
    if "1" in which:
        # config1 is the CPU regime — pin the platform before backend init
        import jax

        jax.config.update("jax_platforms", "cpu")
        if which != ["1"]:
            raise SystemExit("config 1 (CPU) must run alone")
    setup()
    out = {}
    fns = {
        "1": config1, "2": config2, "3": config3, "4": config4,
        "5": config5,
    }
    for w in which:
        out[f"config{w}"] = fns[w]()
    print(json.dumps({k: round(v, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
