"""Mesh(1) vs meshless headline config on the real TPU (VERDICT r4 #1).

Runs the bench.py headline workload (100k-atom rdf+sdf+shape, 128 frames)
through Evaluator(mesh=1-device frames mesh) and meshless, and prints both
steady-state figures. Acceptance: mesh within 10% of meshless.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_mesh1.py
"""

import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from viamd_tpu.datagen import water_box_device  # noqa: E402
from viamd_tpu.eval import Evaluator  # noqa: E402
from viamd_tpu.script import compile_script  # noqa: E402

N_WATERS = 33_334
N_FRAMES = 128
CHUNK = 64

SRC = (
    "r = rdf(element('O'), element('O'), 10.0);\n"
    "v = sdf(residue(1:64), element('H'), 5.0);\n"
    "{lin, plan, iso} = shape_weights(all);\n"
)


def bench(ev, label):
    t0 = time.time()
    ev.run(frame_range=range(CHUNK)).force() if label == "meshless" else None
    # warmup full sweep for both (mesh path falls back on partial ranges)
    ev.run().force()
    warm = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        res = ev.run()
        cs = res.force()
        times.append(time.time() - t0)
        assert cs != 0.0
    fps = res.n_frames_done / min(times)
    print(
        f"{label}: {fps:.1f} f/s  warmup={warm:.1f}s "
        f"runs={'/'.join(f'{t:.2f}' for t in times)}s",
        file=sys.stderr, flush=True,
    )
    return fps, res


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    sys_, traj = water_box_device(N_WATERS, n_frames=N_FRAMES, seed=3)
    compiled = compile_script(SRC, sys_)

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("frames",))
    ev_mesh = Evaluator(compiled, traj, chunk=CHUNK, mesh=mesh)
    kind = (
        "mesh-fused"
        if getattr(ev_mesh, "_mesh_fused_fn", None) is not None
        else "batch"
    )
    print(f"mesh evaluator path: {kind}", file=sys.stderr, flush=True)

    ev_plain = Evaluator(compiled, traj, chunk=CHUNK, batch_mode="unroll")
    fps_plain, res_plain = bench(ev_plain, "meshless")
    fps_mesh, res_mesh = bench(ev_mesh, "mesh(1)")

    np.testing.assert_allclose(
        np.asarray(res_mesh.distributions["r"]),
        np.asarray(res_plain.distributions["r"]),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res_mesh.temporal["lin"]),
        np.asarray(res_plain.temporal["lin"]),
        rtol=1e-4,
    )
    ratio = fps_mesh / fps_plain
    print(
        f"RESULT meshless={fps_plain:.1f} mesh1={fps_mesh:.1f} "
        f"ratio={ratio:.3f} ({'PASS' if ratio >= 0.9 else 'FAIL'} at 10%)",
        flush=True,
    )


if __name__ == "__main__":
    main()
