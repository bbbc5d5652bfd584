"""Camera matrix parity tests (Camera.cpp:8-45, glm conventions)."""
import numpy as np

from rtm_tpu.models.camera import (Camera, inv_look_at, look_at,
                                   perspective_fov)


def test_perspective_inverse_roundtrip():
    p = perspective_fov(np.radians(45.0), 640.0, 480.0, 0.1, 1.0)
    cam = Camera()
    ip = cam.inv_projection(640, 480)
    np.testing.assert_allclose(p @ ip, np.eye(4), atol=1e-12)


def test_perspective_structure():
    """glm::perspectiveFov structure: cot fov/2, aspect, RH z in [-1,1]."""
    fov = np.radians(60.0)
    p = perspective_fov(fov, 800.0, 600.0, 0.5, 10.0)
    h = 1.0 / np.tan(fov / 2)
    assert np.isclose(p[1, 1], h)
    assert np.isclose(p[0, 0], h * 600.0 / 800.0)
    assert np.isclose(p[3, 2], -1.0)
    assert np.isclose(p[2, 2], -(10.0 + 0.5) / (10.0 - 0.5))


def test_look_at_inverse_closed_form():
    eye = np.array([1.0, 2.0, 3.0])
    center = np.array([0.0, 0.5, -1.0])
    up = np.array([0.0, 1.0, 0.0])
    v = look_at(eye, center, up)
    iv = inv_look_at(eye, center, up)
    np.testing.assert_allclose(v @ iv, np.eye(4), atol=1e-12)


def test_default_camera_state():
    """Defaults: pos (0,1,5), dir (0,0,-1), fov 45, near .1, far 1 —
    RayTracing.cpp:27 + Camera.cpp:8-22."""
    c = Camera()
    assert c.fov == 45.0 and c.near == 0.1 and c.far == 1.0
    np.testing.assert_array_equal(c.position, [0, 1, 5])
    np.testing.assert_array_equal(c.direction, [0, 0, -1])
    iv = c.inv_view()
    # right/up columns (consumed by ray-gen, shader:684-685)
    np.testing.assert_allclose(iv[:3, 0], [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(iv[:3, 1], [0, 1, 0], atol=1e-12)
    np.testing.assert_allclose(iv[:3, 3], [0, 1, 5], atol=1e-12)


def test_center_ray_points_forward():
    from rtm_tpu.config import RenderConfig
    from rtm_tpu.ops.trace_ref import camera_ray_basis

    cfg = RenderConfig(width=64, height=64, max_bounces=1)
    cam = Camera()
    spec = cam.spec(cfg.width, cfg.height)
    fp, right, up, pos = camera_ray_basis(spec, cfg)
    fp = np.asarray(fp).reshape(64, 64, 3)
    center = fp[32, 32] - np.asarray(pos)
    d = center / np.linalg.norm(center)
    assert d[2] < -0.9  # looks down -z


def test_orbit_parity():
    """Perf-harness orbit: pos = 2*(cos a, 0, sin a), dir = -pos
    (RayTracing.cpp:608-612)."""
    c = Camera()
    c.orbit(90.0)
    np.testing.assert_allclose(c.position, [0, 0, 2], atol=1e-12)
    np.testing.assert_allclose(c.direction, [0, 0, -2], atol=1e-12)
