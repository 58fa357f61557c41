"""Renderer tests: camera math + volume ray-marcher golden properties."""

import numpy as np
import pytest

from viamd_tpu.render import camera as C
from viamd_tpu.render import volume as V


class TestCamera:
    def test_look_at_inverts(self):
        cam = C.Camera(
            eye=np.array([5.0, 4, 3]), center=np.zeros(3),
            up=np.array([0.0, 1, 0]),
        )
        vm = cam.view_matrix()
        eye_h = np.array([5.0, 4, 3, 1])
        v = vm @ eye_h
        np.testing.assert_allclose(v[:3], 0, atol=1e-5)  # eye → origin
        # center maps to -Z axis
        c = vm @ np.array([0.0, 0, 0, 1])
        assert c[2] < 0 and abs(c[0]) < 1e-5 and abs(c[1]) < 1e-5

    def test_perspective_depth_range(self):
        p = C.perspective(np.radians(45), 1.0, 0.1, 100.0)
        near = p @ np.array([0, 0, -0.1, 1])
        far = p @ np.array([0, 0, -100.0, 1])
        np.testing.assert_allclose(near[2] / near[3], -1, atol=1e-4)
        np.testing.assert_allclose(far[2] / far[3], 1, atol=1e-4)

    def test_optimal_view_contains_box(self):
        cam = C.compute_optimal_view([0, 0, 0], [10, 10, 10])
        assert cam.distance() > 8.66  # beyond bounding radius

    def test_halton(self):
        seq = C.taa_jitter_sequence(8)
        assert seq.shape == (8, 2)
        assert (np.abs(seq) <= 0.5).all()
        assert len(np.unique(seq[:, 0])) == 8

    def test_trackball_preserves_distance(self):
        cam = C.Camera(
            eye=np.array([5.0, 0, 0]), center=np.zeros(3),
            up=np.array([0.0, 1, 0]),
        )
        cam2 = C.trackball_rotate(cam, 0.1, 0.05)
        np.testing.assert_allclose(cam2.distance(), cam.distance(), rtol=1e-5)


def _sphere_grid(D=32, radius=0.3):
    ax = (np.arange(D) + 0.5) / D - 0.5
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    r = np.sqrt(X**2 + Y**2 + Z**2)
    return np.clip(1.0 - r / radius, 0.0, 1.0).astype(np.float32)


class TestVolumeRender:
    def _render(self, grid, **kw):
        cam = C.Camera(
            eye=np.array([0.0, 0.0, 3.0]), center=np.zeros(3),
            up=np.array([0.0, 1, 0]), znear=0.1, zfar=10.0,
        )
        model = V.model_matrix_from_extent(0.5)  # unit cube about origin
        tf = np.zeros((64, 4), np.float32)
        tf[:, 0] = 1.0  # red
        tf[:, 3] = np.linspace(0, 0.9, 64)  # ramp opacity
        settings = V.VolumeRenderSettings(
            width=48, height=48, jitter=False, **kw
        )
        img, depth = V.render_volume(
            grid, tf, model, cam.view_matrix(),
            cam.proj_matrix(48, 48), settings,
        )
        return np.asarray(img), np.asarray(depth)

    def test_dvr_sphere(self):
        img, depth = self._render(_sphere_grid())
        assert np.isfinite(img).all()
        # center pixel hits the dense sphere: opaque and red
        c = img[24, 24]
        assert c[3] > 0.5
        assert c[0] > c[1] and c[0] > c[2]
        # corner pixel misses: transparent
        assert img[0, 0, 3] < 1e-3
        # depth finite at center, inf at corner
        assert np.isfinite(depth[24, 24])
        assert np.isinf(depth[0, 0])

    def test_iso_surface(self):
        img, depth = self._render(
            _sphere_grid(),
            enable_dvr=False,
            enable_iso=True,
            iso_values=(0.5,),
            iso_colors=((0.2, 0.9, 0.2, 1.0),),
        )
        c = img[24, 24]
        assert c[3] > 0.5
        assert c[1] > c[0]  # green surface
        assert img[0, 0, 3] < 1e-3

    def test_empty_volume_transparent(self):
        img, _ = self._render(np.zeros((16, 16, 16), np.float32))
        assert np.abs(img[..., 3]).max() < 1e-4

    def test_ray_box(self):
        import jax.numpy as jnp

        o = jnp.array([[0.5, 0.5, -1.0], [2.0, 2.0, -1.0]])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        t0, t1 = V.ray_box(o, d)
        assert float(t1[0]) > float(t0[0])  # ray 0 hits
        assert float(t1[1]) < float(t0[1])  # ray 1 misses
