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
instead of killing the run), the two render north-star lines
(`render_*_ms_per_frame`, unit ms/frame, vs_baseline = 16/ms per north
star #2), then the headline metric LAST:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N/5000}
Set VIAMD_TPU_BENCH_HEADLINE_ONLY=1 to skip the extra configs.
"""

from __future__ import annotations

import json
import sys
import time

N_WATERS = 33_334  # 100,002 atoms
# The metric is the STEADY-STATE frames/s of the north star ("≥5k f/s
# RDF+SDF @ 100k atoms"); the timed region carries one fixed fence cost
# (a checksum dispatch + scalar readback, ~31 ms RTT each on the
# tunneled backend) regardless of length, so the window must be long
# enough to amortize it (measured: 128 frames → ~0.43 s region with
# ~0.06-0.09 s of fence; 384 frames amortizes the same fence 3×).
N_FRAMES = int(__import__("os").environ.get("VIAMD_TPU_BENCH_FRAMES",
                                            "384"))
# frames per fused launch. The r1-era A/B (CHUNK=128: 117.7 vs 119.9 f/s)
# predates the r3-r5 kernel work; at ~3 ms/frame the ~31 ms tunnel RTT
# per dispatch is ~10% of the run, so fewer launches now matter —
# override for A/Bs with VIAMD_TPU_BENCH_CHUNK.
CHUNK = int(__import__("os").environ.get("VIAMD_TPU_BENCH_CHUNK", "64"))
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


def _emit_ms(metric: str, ms: float, **extra) -> None:
    """North star #2 is `< 16 ms/frame`; vs_baseline = 16/ms so ≥1 beats it."""
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(ms, 3),
                "unit": "ms/frame",
                "vs_baseline": round(16.0 / ms, 3) if ms > 0 else 0.0,
                **extra,
            }
        ),
        flush=True,
    )


def _run_render_north_star() -> None:
    """BASELINE.md north star #2: 1080p volume render < 16 ms/frame, plus
    the 1080p/100k-atom molecule raster — device time via one jitted
    fori_loop of K frames with a null-loop RTT subtraction (CLAUDE.md:
    separate dispatches measure tunnel RTT, block_until_ready doesn't
    fence; only the scalar readback does)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    K = 32

    def loop_ms(many, *args) -> float:
        r = many(*args)
        float(r)  # force compile + drain the queue
        t0 = time.time()
        float(many(*args))
        return (time.time() - t0) / K * 1000.0

    # null loop: the per-dispatch RTT + readback floor to subtract
    @jax.jit
    def null(g):
        return jax.lax.fori_loop(0, K, lambda i, c: c + g[0] * 0, 0.0)

    null_ms = loop_ms(null, jnp.zeros((8,), jnp.float32))

    # --- 1080p shear-warp volume render (DVR + 2 isos, 128^3 grid, the
    # shipped density_volume path at >=256x256) ---
    try:
        from viamd_tpu.render import shearwarp as sw
        from viamd_tpu.render.camera import look_at, perspective
        from viamd_tpu.render.colormap import transfer_function
        from viamd_tpu.render.volume import VolumeRenderSettings, _Frozen

        D = 128
        zz, yy, xx = np.meshgrid(
            *([np.linspace(-1, 1, D)] * 3), indexing="ij"
        )
        grid = jnp.asarray(
            np.exp(-3 * (xx**2 + yy**2 + zz**2))
            + 0.5 * np.exp(-8 * ((xx - 0.4) ** 2 + yy**2 + zz**2)),
            jnp.float32,
        )
        tf = jnp.asarray(transfer_function("viridis", 256, alpha_scale=0.6))
        model = np.eye(4, dtype=np.float32)
        view = np.asarray(
            look_at(np.array([2.2, 1.4, 2.6]), np.zeros(3),
                    np.array([0, 1, 0.0])), np.float32)
        proj = np.asarray(
            perspective(np.radians(45.0), 1920 / 1080, 0.1, 50.0),
            np.float32)
        st = VolumeRenderSettings(
            width=1920, height=1080, enable_dvr=True, enable_iso=True,
            iso_values=(0.25, 0.6),
            iso_colors=((0.9, 0.4, 0.2, 0.6), (0.2, 0.5, 0.9, 0.8)),
            value_range=(0.0, 1.5), jitter=True,
        )
        frozen = _Frozen(st)
        inv_view = np.linalg.inv(view)
        inv_model = np.linalg.inv(model)
        eye_m = (
            inv_model[:3, :3] @ inv_view[:3, 3] + inv_model[:3, 3]
        ).astype(np.float32)
        fwd_m = inv_model[:3, :3] @ (-inv_view[:3, 2])
        axis = int(np.argmax(np.abs(fwd_m)))
        flip = bool(fwd_m[axis] < 0)

        @jax.jit
        def vol_many(g, t):
            def body(i, carry):
                img, _ = sw._shearwarp_impl(
                    g, t, jnp.asarray(model), jnp.asarray(view),
                    jnp.asarray(proj), i, frozen, axis, flip, 2 * D,
                    jnp.asarray(eye_m), True,
                )
                return carry + img[0, 0, 0] + img[540, 960, 0] * 1e-6

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        ms = max(loop_ms(vol_many, grid, tf) - null_ms, 0.0)
        _emit_ms("render_volume_1080p_dvr_iso_ms_per_frame", ms,
                 note="shear-warp 128^3 DVR+2iso, device time")
    except Exception as e:
        _emit_ms("render_volume_1080p_dvr_iso_ms_per_frame", 0.0,
                 error=repr(e)[:300])

    # --- 1080p molecule raster, 100k-atom spacefill (Pallas halo-row
    # kernel on TPU via engine="auto") ---
    try:
        from viamd_tpu.datagen import water_box_device
        from viamd_tpu.render.camera import look_at, perspective
        from viamd_tpu.render.raster import RasterSettings, _raster_impl

        sys_, traj = water_box_device(33_334, n_frames=1, seed=3)
        traj.stage_fence()
        x, _ = traj.device_frame(0)
        rad = jnp.asarray(sys_.radius)
        col = jnp.tile(
            jnp.asarray([0.8, 0.2, 0.2, 1.0], jnp.float32),
            (x.shape[0], 1))
        box = np.asarray(sys_.cell.extent())
        view = jnp.asarray(
            look_at(box * 0.5 + np.array([0, 0, box[2] * 1.6]),
                    box * 0.5, np.array([0, 1, 0.0])), jnp.float32)
        proj = jnp.asarray(
            perspective(np.radians(45.0), 1920 / 1080, 1.0, 500.0),
            jnp.float32)
        rst = RasterSettings(width=1920, height=1080, rep="spacefill")
        bonds = jnp.zeros((0, 12), jnp.float32)

        @jax.jit
        def ras_many(xx, rr, cc, vv, pp):
            def body(i, carry):
                xp = xx + carry * 1e-30
                # expanded (n,3)x(3,3): tiny-K matmuls are pathological
                cen = jnp.stack(
                    [
                        xp[:, 0] * vv[j, 0] + xp[:, 1] * vv[j, 1]
                        + xp[:, 2] * vv[j, 2] + vv[j, 3]
                        for j in range(3)
                    ],
                    axis=1,
                )
                img, depth, pick = _raster_impl(cen, rr, cc, bonds, pp, rst)
                return carry + img[0, 0, 0] + img[540, 960, 0] * 1e-6

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        ms = max(loop_ms(ras_many, x, rad, col, view, proj) - null_ms, 0.0)
        _emit_ms("render_raster_1080p_100k_atoms_ms_per_frame", ms,
                 note="spacefill impostor raster, device time")
    except Exception as e:
        _emit_ms("render_raster_1080p_100k_atoms_ms_per_frame", 0.0,
                 error=repr(e)[:300])


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
        _run_render_north_star()

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
