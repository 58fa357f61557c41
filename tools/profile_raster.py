#!/usr/bin/env python
"""TPU timing of the molecule raster (device-resident, RTT-free harness)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 32


def main():
    from viamd_tpu.datagen import water_box_device
    from viamd_tpu.render.raster import _raster_impl, RasterSettings
    from viamd_tpu.render.camera import look_at, perspective

    sys_, traj = water_box_device(33334, n_frames=1, seed=3)
    traj.stage_fence()
    x, _ = traj.device_frame(0)
    rad = jnp.asarray(sys_.radius)
    col = jnp.tile(jnp.asarray([0.8, 0.2, 0.2, 1.0], jnp.float32), (x.shape[0], 1))
    box = np.asarray(sys_.cell.extent())
    eye = box * 0.5 + np.array([0, 0, box[2] * 1.6])
    view = jnp.asarray(
        look_at(eye, box * 0.5, np.array([0, 1, 0.0])), jnp.float32
    )
    proj = jnp.asarray(
        perspective(np.radians(45.0), 1920 / 1080, 1.0, 500.0), jnp.float32
    )
    st = RasterSettings(width=1920, height=1080, rep="spacefill")
    bonds = jnp.zeros((0, 12), jnp.float32)

    @jax.jit
    def many(xx, rr, cc, vv, pp):
        def body(i, carry):
            xp = xx + carry * 1e-30
            # expanded (n,3)x(3,3): tiny-K matmuls are pathological here
            cen = jnp.stack(
                [
                    xp[:, 0] * vv[0, 0] + xp[:, 1] * vv[0, 1]
                    + xp[:, 2] * vv[0, 2] + vv[0, 3],
                    xp[:, 0] * vv[1, 0] + xp[:, 1] * vv[1, 1]
                    + xp[:, 2] * vv[1, 2] + vv[1, 3],
                    xp[:, 0] * vv[2, 0] + xp[:, 1] * vv[2, 1]
                    + xp[:, 2] * vv[2, 2] + vv[2, 3],
                ],
                axis=1,
            )
            img, depth, pick = _raster_impl(cen, rr, cc, bonds, pp, st)
            return carry + img[0, 0, 0] + img[540, 960, 0] * 1e-6

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    r = many(x, rad, col, view, proj)
    float(r)
    t0 = time.time()
    r = many(x, rad, col, view, proj)
    float(r)
    dt = time.time() - t0
    print(f"raster 1080p 100k device-resident: {dt/K*1000:.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
