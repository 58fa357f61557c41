#!/usr/bin/env python
"""TPU timing of the shear-warp volume renderer at the 1080p/128^3 config.

K frames render inside ONE jitted fori_loop (per-dispatch tunnel RTT is
~31 ms on this backend, so multi-dispatch timing loops measure RTT).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 8


def main():
    from viamd_tpu.render.volume import VolumeRenderSettings, _Frozen
    from viamd_tpu.render import shearwarp as sw
    from viamd_tpu.render.colormap import transfer_function
    from viamd_tpu.render.camera import look_at, perspective

    D = 128
    zz, yy, xx = np.meshgrid(*([np.linspace(-1, 1, D)] * 3), indexing="ij")
    r2 = xx**2 + yy**2 + zz**2
    grid = jnp.asarray(
        np.exp(-3 * r2) + 0.5 * np.exp(-8 * ((xx - 0.4) ** 2 + yy**2 + zz**2)),
        jnp.float32,
    )
    tf256 = jnp.asarray(transfer_function("viridis", 256, alpha_scale=0.6))
    idx = np.linspace(0, 255, 33).round().astype(int)
    tf33 = jnp.asarray(np.asarray(tf256)[idx])

    model = np.eye(4, dtype=np.float32)
    view = np.asarray(
        look_at(np.array([2.2, 1.4, 2.6]), np.zeros(3), np.array([0, 1, 0.0])),
        np.float32,
    )
    proj = np.asarray(perspective(np.radians(45.0), 1920 / 1080, 0.1, 50.0), np.float32)

    # host prologue (mirrors render_volume_shearwarp)
    inv_view = np.linalg.inv(view)
    eye_w = inv_view[:3, 3]
    inv_model = np.linalg.inv(model)
    eye_m = (inv_model[:3, :3] @ eye_w + inv_model[:3, 3]).astype(np.float32)
    fwd_m = inv_model[:3, :3] @ (-inv_view[:3, 2])
    axis = int(np.argmax(np.abs(fwd_m)))
    flip = bool(fwd_m[axis] < 0)
    assert not (-0.05 <= eye_m[axis] <= 1.05)
    di = 2 * D

    def mk(dvr, iso):
        return VolumeRenderSettings(
            width=1920, height=1080, enable_dvr=dvr, enable_iso=iso,
            iso_values=(0.25, 0.6) if iso else (),
            iso_colors=((0.9, 0.4, 0.2, 0.6), (0.2, 0.5, 0.9, 0.8))
            if iso else (),
            value_range=(0.0, 1.5), jitter=True,
        )

    def timed(name, st, tf):
        frozen = _Frozen(st)

        @jax.jit
        def many(g, t):
            def body(i, carry):
                img, depth = sw._shearwarp_impl(
                    g, t, jnp.asarray(model), jnp.asarray(view),
                    jnp.asarray(proj), i, frozen, axis, flip, di,
                    jnp.asarray(eye_m), True,
                )
                return carry + img[0, 0, 0] + img[540, 960, 0] * 1e-6

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        r = many(grid, tf)
        float(r)
        t0 = time.time()
        r = many(grid, tf)
        float(r)
        dt = time.time() - t0
        print(f"{name:28s} {dt/K*1000:8.2f} ms/frame", flush=True)

    @jax.jit
    def null(g):
        return jax.lax.fori_loop(0, K, lambda i, c: c + g[0, 0, 0] * 0, 0.0)

    r = null(grid); float(r)
    t0 = time.time(); r = null(grid); float(r)
    print(f"{'null':28s} {(time.time()-t0)/K*1000:8.2f} ms/frame", flush=True)

    for name, tf, dvr, iso in [
        ("dvr+iso ntf=256 (shipped)", tf256, True, True),
        ("dvr+iso ntf=33", tf33, True, True),
        ("iso only", tf256, False, True),
        ("dvr only ntf=256", tf256, True, False),
    ]:
        timed(name, mk(dvr, iso), tf)


if __name__ == "__main__":
    main()
