"""Meshes and instances.

Parity with ``RT::Triangle/Mesh/MeshInstance`` (ref:
Engine/src/Engine/Render/Mesh.{h,cpp}).  A mesh is a triangle soup (A,B,C +
per-vertex UV) plus an AABB volume; an instance is a TRS transform referencing
a mesh by id.  The model matrix composes translate @ rotX @ rotY @ rotZ @
scale with rotations in **degrees** applied in X,Y,Z order (Mesh.cpp:44-63);
the kernel consumes the inverse (world-to-local).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# Host triangle layout: structured array views are overkill; a mesh is simply
#   verts: (T, 3, 3) float32  (A,B,C rows)
#   uvs:   (T, 3, 2) float32  (uvA,uvB,uvC rows)


@dataclass
class Triangle:
    a: tuple
    b: tuple
    c: tuple
    uva: tuple = (0.0, 0.0)
    uvb: tuple = (0.0, 0.0)
    uvc: tuple = (0.0, 0.0)


def triangles_to_array(tris: list[Triangle]) -> tuple[np.ndarray, np.ndarray]:
    verts = np.array([[t.a, t.b, t.c] for t in tris], np.float32).reshape(-1, 3, 3)
    uvs = np.array([[t.uva, t.uvb, t.uvc] for t in tris], np.float32).reshape(-1, 3, 2)
    return verts, uvs


def mesh_volume(verts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """AABB over all vertices (ref Mesh ctor, Mesh.cpp:10-26)."""
    flat = verts.reshape(-1, 3)
    return flat.min(axis=0), flat.max(axis=0)


@dataclass
class Mesh:
    verts: np.ndarray                      # (T,3,3) f32, local space
    uvs: np.ndarray                        # (T,3,2) f32
    volume_min: np.ndarray = field(default=None)
    volume_max: np.ndarray = field(default=None)

    def __post_init__(self):
        self.verts = np.asarray(self.verts, np.float32).reshape(-1, 3, 3)
        if self.uvs is None:
            self.uvs = np.zeros((len(self.verts), 3, 2), np.float32)
        self.uvs = np.asarray(self.uvs, np.float32).reshape(-1, 3, 2)
        if self.volume_min is None or self.volume_max is None:
            self.volume_min, self.volume_max = mesh_volume(self.verts)

    @staticmethod
    def from_triangles(tris: list[Triangle]) -> "Mesh":
        verts, uvs = triangles_to_array(tris)
        return Mesh(verts, uvs)

    @staticmethod
    def load(path) -> "Mesh":
        from ..io.mesh_loader import load_mesh
        return load_mesh(path)

    @property
    def num_triangles(self) -> int:
        return self.verts.shape[0]


def _rotate(m: np.ndarray, angle_rad: float, axis: np.ndarray) -> np.ndarray:
    """glm::rotate(m, angle, axis): m @ R."""
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    t = (1.0 - c) * axis
    r = np.eye(4)
    r[:3, :3] = np.array([
        [c + t[0] * axis[0], t[1] * axis[0] - s * axis[2], t[2] * axis[0] + s * axis[1]],
        [t[0] * axis[1] + s * axis[2], c + t[1] * axis[1], t[2] * axis[1] - s * axis[0]],
        [t[0] * axis[2] - s * axis[1], t[1] * axis[2] + s * axis[0], c + t[2] * axis[2]],
    ])
    return m @ r


@dataclass
class MeshInstance:
    mesh_id: int
    position: np.ndarray = field(default_factory=lambda: np.zeros(3))
    scale: np.ndarray = field(default_factory=lambda: np.ones(3))
    rotation: np.ndarray = field(default_factory=lambda: np.zeros(3))  # degrees, XYZ order
    material_id: int = 0

    def model_matrix(self) -> np.ndarray:
        """translate -> rotateX -> rotateY -> rotateZ -> scale (Mesh.cpp:44-63)."""
        m = np.eye(4)
        m[:3, 3] = np.asarray(self.position, np.float64)
        rot = np.radians(np.asarray(self.rotation, np.float64))
        m = _rotate(m, rot[0], np.array([1.0, 0.0, 0.0]))
        m = _rotate(m, rot[1], np.array([0.0, 1.0, 0.0]))
        m = _rotate(m, rot[2], np.array([0.0, 0.0, 1.0]))
        m = m @ np.diag([*np.asarray(self.scale, np.float64), 1.0])
        return m

    def inv_model_matrix(self) -> np.ndarray:
        return np.linalg.inv(self.model_matrix())
