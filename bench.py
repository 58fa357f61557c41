#!/usr/bin/env python
"""Benchmark: the BASELINE.json headline metric on real TPU hardware.

Config (BASELINE.md configs #3/#4 composite): a 100k-atom periodic water box;
the analysis script runs RDF (O–O, 10 Å cutoff, Pallas cell-list kernel), SDF
(64 reference structures, internal-reference-frame alignment, trilinear
density volume), and whole-system shape weights per frame — the
RDF+SDF+density pipeline of the north star ("≥5k frames/s RDF+SDF analysis
@ 100k atoms on v5p-8"). This script runs on whatever jax.devices() offers
(the driver: one real chip) and reports frames/second.

Timing discipline for the tunneled backend (see CLAUDE.md):
- block_until_ready() does NOT fence — the only reliable fence is a scalar
  readback; the timed region ends with ONE fused checksum (EvalResult.force).
- Each executable launch costs ~35 ms tunnel RTT, so frames batch into
  large per-launch chunks (Evaluator batch_mode="unroll").
- The trajectory is synthesized ON DEVICE (datagen.water_box_device): bulk
  host→device moves at ~1-2 MB/s through the tunnel and must never appear
  in (or queue behind) the timed region.

Prints one JSON line PER BASELINE.md config (1/2/4/5 as
`baseline_config_*` metrics, each guarded so a failure emits value 0
instead of killing the run), then the headline metric LAST:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N/5000}
Set VIAMD_TPU_BENCH_HEADLINE_ONLY=1 to skip the extra configs.
"""

from __future__ import annotations

import json
import sys
import time

N_WATERS = 33_334  # 100,002 atoms
N_FRAMES = 128
CHUNK = 64  # frames per fused launch (CHUNK=128 measured 117.7 vs 119.9 f/s)
BASELINE_FRAMES_PER_S = 5000.0


def _emit(metric: str, value: float, **extra) -> None:
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": "frames/s",
                "vs_baseline": round(value / BASELINE_FRAMES_PER_S, 5),
                **extra,
            }
        ),
        flush=True,
    )


def _run_config1_cpu_subprocess() -> None:
    """Config #1 is the reference's CPU regime; it must pin the CPU
    platform before backend init, so it runs in its own process."""
    import os
    import re
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo
    try:
        proc = subprocess.run(
            [sys.executable, "tools/bench_configs.py", "1"],
            cwd=repo, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True, timeout=1200,
        )
        m = re.search(
            r"config1_1ala500_cpu: ([0-9.]+) frames/s", proc.stdout
        )
        if proc.returncode == 0 and m:
            _emit("baseline_config1_1ala500_distance_rdf_cpu",
                  float(m.group(1)), note="CPU regime per BASELINE.md")
            return
        err = proc.stdout[-300:]
    except Exception as e:
        err = repr(e)
    _emit("baseline_config1_1ala500_distance_rdf_cpu", 0.0, error=err)


def _run_extra_tpu_configs() -> None:
    """BASELINE configs #2/#4/#5 in-process on the same device, human
    chatter redirected to stderr; each guarded individually."""
    import contextlib
    import importlib.util
    import os

    repo = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "bench_configs", os.path.join(repo, "tools", "bench_configs.py")
    )
    bc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bc)
    jobs = [
        ("baseline_config2_sdf_alignment_20k_atoms", bc.config2),
        ("baseline_config4_full_pipeline_1M_atoms", bc.config4),
        ("baseline_config5_sustained_8192_frames_20k_atoms", bc.config5),
    ]
    for metric, fn in jobs:
        try:
            with contextlib.redirect_stdout(sys.stderr):
                fps = fn()
            _emit(metric, fps)
        except Exception as e:
            _emit(metric, 0.0, error=repr(e)[:300])


def main() -> None:
    import jax

    # persistent compile cache: the tunneled-TPU XLA compiles are slow
    # (minutes); cache hits bring bench warmup to seconds on reruns
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import os

    if os.environ.get("VIAMD_TPU_BENCH_HEADLINE_ONLY", "") != "1":
        _run_config1_cpu_subprocess()
        _run_extra_tpu_configs()

    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.eval import Evaluator
    from viamd_tpu.script import compile_script

    t0 = time.time()
    sys_, traj = water_box_device(N_WATERS, n_frames=N_FRAMES, seed=3)
    t_gen = time.time() - t0

    src = (
        "r = rdf(element('O'), element('O'), 10.0);\n"
        "v = sdf(residue(1:64), element('H'), 5.0);\n"
        "{lin, plan, iso} = shape_weights(all);\n"
    )
    t0 = time.time()
    compiled = compile_script(src, sys_)
    t_compile = time.time() - t0

    ev = Evaluator(compiled, traj, chunk=CHUNK, batch_mode="unroll")
    # warmup: compile the chunk executable and drain one chunk + the frame
    # generation to completion (fenced) so the timed region measures steady
    # state only
    t0 = time.time()
    ev.run(frame_range=range(CHUNK)).force()
    traj.stage_fence()
    t_warm = time.time() - t0

    # min-of-3 timed repeats: the 128-frame region is ~0.5 s and the
    # tunnel adds ±15% run-to-run jitter (docs/PERF.md); the minimum time
    # is the steady-state device figure
    times = []
    for _ in range(3):
        t0 = time.time()
        res = ev.run()
        checksum = res.force()  # the ONLY fence that actually waits
        times.append(time.time() - t0)
        assert checksum != 0.0
    elapsed = min(times)
    fps = res.n_frames_done / elapsed

    # post-timing sanity: results must be real
    assert res.n_frames_done == N_FRAMES, res.n_frames_done
    import numpy as np

    r_sum = float(np.sum(res.distributions["r"]))
    v_sum = float(np.sum(res.volumes["v"]))
    lin = res.temporal["lin"]
    assert r_sum > 0 and v_sum > 0, (r_sum, v_sum)
    assert np.isfinite(lin).all()

    print(
        f"# rdf-sum={r_sum:.0f} sdf-sum={v_sum:.0f} "
        f"gen={t_gen:.1f}s script-compile={t_compile:.1f}s "
        f"warmup={t_warm:.1f}s "
        f"runs={'/'.join(f'{t:.2f}' for t in times)}s "
        f"frames={res.n_frames_done} atoms={sys_.natoms} "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "rdf_sdf_shape_analysis_frames_per_sec_100k_atoms",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FRAMES_PER_S, 5),
            }
        )
    )


def _watchdog(seconds: float):
    """Hard-exit with a parseable JSON line if the run wedges.

    The tunneled backend can hang indefinitely at device init when the
    relay is wedged (observed r2: hours-long outage after concurrent
    TPU processes); a hung bench is worse than a failed one — emit the
    one-line JSON with value 0 and exit nonzero so the driver records a
    clean failure instead of stalling.
    """
    import os
    import threading

    done = threading.Event()

    def fire():
        if not done.wait(seconds):
            print(
                json.dumps(
                    {
                        "metric": (
                            "rdf_sdf_shape_analysis_frames_per_sec_100k_atoms"
                        ),
                        "value": 0.0,
                        "unit": "frames/s",
                        "vs_baseline": 0.0,
                        "error": f"wedged: no completion in {seconds:.0f}s "
                        "(TPU tunnel unavailable?)",
                    }
                ),
                flush=True,
            )
            os._exit(3)

    threading.Thread(target=fire, daemon=True).start()
    return done


if __name__ == "__main__":
    _done = _watchdog(float(__import__("os").environ.get(
        "VIAMD_TPU_BENCH_TIMEOUT", "7200"
    )))
    main()
    _done.set()
