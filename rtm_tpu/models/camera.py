"""Camera model.

Parity with ``RT::Camera`` (ref: Engine/src/Engine/Render/Camera.{h,cpp}):
  * perspective from glm::perspectiveFov(radians(fov), W, H, near, far),
    right-handed, clip z in [-1,1] (no GLM_FORCE defines in the reference);
    the *inverse* matrix is what ships to the kernel (Camera.cpp:25-30).
  * view from glm::lookAt(position, position+direction, (0,1,0)); inverse
    shipped (Camera.cpp:32-36).
  * defaults: fov 45, near 0.1, far 1.0 (RayTracing.cpp:27), position (0,1,5),
    direction (0,0,-1), focusDistance 1, defocusStrength 0, blurStrength 0
    (Camera.cpp:8-22).

The device-side consumption (ray generation, shader:684-706) reads
invView column 0/1 as the right/up vectors, so CameraSpec stores logical
(row-major numpy) matrices where column extraction matches GLSL `m[0].xyz`.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class CameraSpec:
    """Device-ready camera uniform (ref Camera::Spec, Camera.h:11-21)."""

    inv_projection: jax.Array  # (4,4) f32
    inv_view: jax.Array        # (4,4) f32
    position: jax.Array        # (3,) f32
    focus_distance: jax.Array  # () f32
    defocus_strength: jax.Array  # () f32
    blur_strength: jax.Array   # () f32


def perspective_fov(fov_rad: float, width: float, height: float,
                    near: float, far: float) -> np.ndarray:
    """glm::perspectiveFov (RH, negative-one clip). Returns (4,4) row-major."""
    h = np.cos(0.5 * fov_rad) / np.sin(0.5 * fov_rad)
    w = h * height / width
    m = np.zeros((4, 4), dtype=np.float64)
    m[0, 0] = w
    m[1, 1] = h
    m[2, 2] = -(far + near) / (far - near)
    m[2, 3] = -(2.0 * far * near) / (far - near)
    m[3, 2] = -1.0
    return m


def look_at(eye: np.ndarray, center: np.ndarray, up: np.ndarray) -> np.ndarray:
    """glm::lookAt (RH). Returns (4,4) row-major view matrix."""
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float64)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def inv_look_at(eye: np.ndarray, center: np.ndarray, up: np.ndarray) -> np.ndarray:
    """Closed-form inverse of look_at: columns = (right, up, -forward, eye)."""
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float64)
    m[:3, 0] = s
    m[:3, 1] = u
    m[:3, 2] = -f
    m[:3, 3] = eye
    return m


@dataclass
class Camera:
    """Host-side camera state (mutable, like the reference's RT::Camera)."""

    fov: float = 45.0
    near: float = 0.1
    far: float = 1.0
    position: np.ndarray = field(default_factory=lambda: np.array([0.0, 1.0, 5.0]))
    direction: np.ndarray = field(default_factory=lambda: np.array([0.0, 0.0, -1.0]))
    focus_distance: float = 1.0
    defocus_strength: float = 0.0
    blur_strength: float = 0.0

    UP = np.array([0.0, 1.0, 0.0])

    def inv_projection(self, width: int, height: int) -> np.ndarray:
        proj = perspective_fov(np.radians(self.fov), float(width), float(height),
                               self.near, self.far)
        return np.linalg.inv(proj)

    def inv_view(self) -> np.ndarray:
        return inv_look_at(np.asarray(self.position, np.float64),
                           np.asarray(self.position, np.float64) + np.asarray(self.direction, np.float64),
                           self.UP)

    def spec(self, width: int, height: int) -> CameraSpec:
        return CameraSpec(
            inv_projection=jnp.asarray(self.inv_projection(width, height), jnp.float32),
            inv_view=jnp.asarray(self.inv_view(), jnp.float32),
            position=jnp.asarray(self.position, jnp.float32),
            focus_distance=jnp.float32(self.focus_distance),
            defocus_strength=jnp.float32(self.defocus_strength),
            blur_strength=jnp.float32(self.blur_strength),
        )

    # -- interactive-controller parity helpers (RayTracing.cpp:522-595) -----
    def move(self, forward: float = 0.0, right: float = 0.0, up: float = 0.0,
             dt: float = 1.0, speed: float = 1.0) -> None:
        fwd = np.asarray(self.direction, np.float64)
        r = np.cross(fwd, self.UP)
        self.position = (np.asarray(self.position, np.float64)
                         + (forward * fwd + right * r + up * self.UP) * speed * dt)

    def orbit(self, angle_deg: float, radius: float = 2.0) -> None:
        """Perf-harness orbit (ref RayTracing.cpp:608-612): pos on r-circle in
        the XZ plane, looking at the origin."""
        a = np.radians(angle_deg)
        self.position = radius * np.array([np.cos(a), 0.0, np.sin(a)])
        self.direction = -self.position

    def replace(self, **kw) -> "Camera":
        return dataclasses.replace(self, **kw)
