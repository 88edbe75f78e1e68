"""Camera/mat4 math vs reference formulas (matrix.js:106-163, camera.js)."""

import math

import numpy as np

from nbody3d_tpu.utils import mathlib
from nbody3d_tpu.utils.camera import (
    DEFAULT_FOV,
    DEFAULT_RADIUS,
    MAX_FOV,
    MIN_FOV,
    Camera,
)


def test_perspective_matches_reference_formula():
    fovy, aspect, near, far = math.radians(60), 16 / 9, 0.1, 1e5
    m = mathlib.perspective(fovy, aspect, near, far)
    f = 1.0 / math.tan(fovy / 2)
    nf = 1.0 / (near - far)
    assert np.isclose(m[0, 0], f / aspect)
    assert np.isclose(m[1, 1], f)
    assert np.isclose(m[2, 2], (far + near) * nf)
    assert np.isclose(m[2, 3], 2 * far * near * nf)
    assert m[3, 2] == -1.0
    assert m[3, 3] == 0.0


def test_look_at_properties():
    eye = np.array([1.0, 2.0, 3.0])
    center = np.array([0.0, 0.0, 0.0])
    up = np.array([0.0, 1.0, 0.0])
    v = mathlib.look_at(eye, center, up)
    # eye maps to origin
    p = v @ np.array([*eye, 1.0])
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-6)
    # center maps to -z axis at distance |eye-center|
    c = v @ np.array([*center, 1.0])
    np.testing.assert_allclose(c[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(c[1], 0.0, atol=1e-6)
    assert c[2] < 0
    np.testing.assert_allclose(-c[2], np.linalg.norm(eye), rtol=1e-6)


def test_column_major_roundtrip():
    m = np.arange(16, dtype=np.float32).reshape(4, 4)
    np.testing.assert_array_equal(mathlib.from_column_major(mathlib.to_column_major(m)), m)
    # reference layout: translation of look_at sits at flat indices 12..14
    # (matrix.js:157-159)
    v = mathlib.look_at(np.array([1.0, 2, 3]), np.zeros(3), np.array([0.0, 1, 0]))
    flat = mathlib.to_column_major(v)
    np.testing.assert_allclose(flat[12:15], v[:3, 3], rtol=1e-6)


def test_camera_position_spherical():
    """camera.js:65-69."""
    c = Camera(target=np.array([1.0, 0, 0]), radius=2.0)
    c.azimuth = math.pi / 2
    c.elevation = 0.0
    np.testing.assert_allclose(c.position, [3.0, 0, 0], atol=1e-12)
    c.azimuth = 0.0
    np.testing.assert_allclose(c.position, [1.0, 0, 2.0], atol=1e-12)
    c.elevation = math.pi / 4
    np.testing.assert_allclose(
        c.position, [1.0, 2 * math.sin(math.pi / 4), 2 * math.cos(math.pi / 4)], atol=1e-12
    )


def test_orbit_clamps_elevation():
    c = Camera()
    c.orbit(0, 1e9)
    assert c.elevation <= math.pi / 2 - 0.01 + 1e-12
    c.orbit(0, -1e9)
    assert c.elevation >= -(math.pi / 2 - 0.01) - 1e-12


def test_zoom_multiplicative_and_clamped():
    c = Camera()
    r0 = c.radius
    c.zoom(0.1)
    assert np.isclose(c.radius, r0 * 1.1)
    c.zoom(-2.0)  # (delta+1) negative -> clamped to near
    assert c.radius == c.near


def test_fov_clamped():
    c = Camera()
    c.adj_fov(100.0)
    assert c.fov == MAX_FOV
    c.adj_fov(-100.0)
    assert c.fov == MIN_FOV


def test_dolly_zoom_preserves_subject_size():
    """camera.js:112-117: tan(fov/2) * radius invariant."""
    c = Camera()
    k0 = math.tan(c.fov / 2) * c.radius
    c.adj_fov_without_zoom(0.3)
    assert np.isclose(math.tan(c.fov / 2) * c.radius, k0)


def test_pan_moves_target_in_view_plane():
    c = Camera()
    t0 = c.target.copy()
    d0 = c.view_dir.copy()
    c.pan(10.0, 5.0)
    delta = c.target - t0
    # pan displacement is perpendicular to the view direction
    assert abs(np.dot(delta, d0)) < 1e-12 + 1e-9 * np.linalg.norm(delta)


def test_reset_modifier_semantics():
    """camera.js:119-128."""
    c = Camera()
    c.orbit(100, 50)
    c.zoom(0.5)
    c.adj_fov(0.2)
    az, el, r = c.azimuth, c.elevation, c.radius
    c.reset(ctrl=True)  # fov only
    assert c.fov == DEFAULT_FOV and c.radius == r and c.azimuth == az
    c.reset(alt=True)  # fov + radius
    assert c.radius == DEFAULT_RADIUS and c.azimuth == az and c.elevation == el
    c.reset()  # everything
    assert c.azimuth == 0.0 and c.elevation == 0.0


def test_camera_dict_roundtrip():
    c = Camera(target=np.array([1.0, 2, 3]), radius=7.0)
    c.orbit(12, -8)
    d = c.to_dict()
    assert set(d) == {
        "target", "position", "radius", "azimuth", "elevation", "fov", "near", "far",
    }
    c2 = Camera.from_dict(d)
    np.testing.assert_allclose(c2.position, c.position, rtol=1e-12)
    assert c2.radius == c.radius and c2.azimuth == c.azimuth
