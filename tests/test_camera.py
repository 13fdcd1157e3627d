"""Camera math: pinhole basis and thin-lens DoF geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops import camera as camera_ops
from raytracer_tpu.scene.presets import demo_camera
from raytracer_tpu.scene.types import Camera


def test_shoot_center_ray_is_toward():
    cam = demo_camera()
    o, d = camera_ops.shoot(cam, jnp.zeros((1, 2)))
    toward = np.asarray(cam.toward) / np.linalg.norm(np.asarray(cam.toward))
    np.testing.assert_allclose(np.asarray(d[0]), toward, atol=1e-6)
    # origin = center + toward * near (near=-0.1: slightly behind center)
    np.testing.assert_allclose(
        np.asarray(o[0]), np.asarray(cam.center) + toward * -0.1, atol=1e-6
    )


def test_shoot_fov_mapping():
    """Reference quirk pinned: dir = clip_x*x + clip_y*y + toward with
    x/y scaled by tan(fovy/2) (src/main.rs:89-91), while the driver's clip
    coords span +-0.5 (src/main.rs:1094-1095) — so the nominal fovy maps
    to a vertical half-angle of atan(tan(fovy/2) * 0.5) at the image edge,
    NOT fovy/2."""
    cam = Camera.create(fovy_deg=90.0, center=(0, 0, 0), toward=(0, 0, -1),
                        up=(0, 1, 0), near=0.0)
    clip = jnp.asarray([[0.0, 0.5], [0.0, -0.5], [0.5, 0.0]], jnp.float32)
    _, d = camera_ops.shoot(cam, clip)
    d = np.asarray(d)
    e = np.array([0.0, 0.5, -1.0])
    e /= np.linalg.norm(e)
    np.testing.assert_allclose(d[0], e, atol=1e-6)
    np.testing.assert_allclose(d[1], e * [1, -1, 1], atol=1e-6)
    np.testing.assert_allclose(d[2], [e[1], 0, e[2]], atol=1e-6)


def test_shoot_focus_keeps_focal_point_fixed():
    """The thin-lens sample pivots around the focal point: origin + t*dir
    passes through (pinhole origin + focus * pinhole dir) for every lens
    offset (src/main.rs:101-127 geometry)."""
    cam = demo_camera()
    clip = jnp.asarray(np.random.default_rng(0).uniform(-0.4, 0.4, (64, 2)),
                       jnp.float32)
    o0, d0 = camera_ops.shoot(cam, clip)
    offsets = jnp.asarray(
        np.random.default_rng(1).normal(0, 0.04, (64, 2)), jnp.float32
    )
    o1, d1 = camera_ops.shoot_focus(cam, clip, offsets, focus=3.0)
    focal = np.asarray(o0) + 3.0 * np.asarray(d0)
    # line (o1, d1) passes through focal: cross((focal-o1), d1) ~ 0
    rel = focal - np.asarray(o1)
    cr = np.cross(rel, np.asarray(d1))
    assert np.abs(cr).max() < 1e-3
    # zero offset degenerates to the pinhole ray
    o2, d2 = camera_ops.shoot_focus(cam, clip, jnp.zeros((64, 2)), focus=3.0)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d0), atol=1e-5)
