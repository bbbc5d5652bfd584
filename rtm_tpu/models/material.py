"""Material model.

Parity with ``RT::Material`` (ref: Engine/src/Engine/Render/Scene.h:10-21,
GLSL mirror RayTracing.shader:43-52).  Field semantics preserved exactly,
including the reference's *inverted* roughness convention: in scatter
(shader:626-635) the out direction is ``mix(diffuseDir, specularDir,
Roughness)`` so roughness 0 => fully diffuse, 1 => fully specular.  A
material with refraction_ratio > 1 takes the dielectric path (shader:639).
texture_id == -1 means "use albedo"; >= 0 samples the texture array and then
the emission term uses albedo*EmissionPower, skipping EmissionColor — a
reference quirk we reproduce (shader:575-580).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Material:
    """Host-side single material (ctor argument order matches the reference
    aggregate init: albedo, emissionColor, roughness, metallic, emissionPower,
    refractionRatio, textureId)."""

    albedo: tuple = (1.0, 1.0, 1.0)
    emission_color: tuple = (1.0, 1.0, 1.0)
    roughness: float = 0.0
    metallic: float = 0.0
    emission_power: float = 0.0
    refraction_ratio: float = 1.0
    texture_id: int = -1


@jax.tree_util.register_dataclass
@dataclass
class Materials:
    """Device SoA material table, shape (M, ...)."""

    albedo: jax.Array           # (M,3) f32
    emission_color: jax.Array   # (M,3) f32
    roughness: jax.Array        # (M,)  f32
    metallic: jax.Array         # (M,)  f32
    emission_power: jax.Array   # (M,)  f32
    refraction_ratio: jax.Array  # (M,) f32
    texture_id: jax.Array       # (M,)  i32

    @staticmethod
    def from_list(mats: list[Material]) -> "Materials":
        if not mats:
            mats = [Material()]  # never-empty table (ref allocs >=1 byte)
        return Materials(
            albedo=jnp.asarray(np.array([m.albedo for m in mats], np.float32)),
            emission_color=jnp.asarray(np.array([m.emission_color for m in mats], np.float32)),
            roughness=jnp.asarray(np.array([m.roughness for m in mats], np.float32)),
            metallic=jnp.asarray(np.array([m.metallic for m in mats], np.float32)),
            emission_power=jnp.asarray(np.array([m.emission_power for m in mats], np.float32)),
            refraction_ratio=jnp.asarray(np.array([m.refraction_ratio for m in mats], np.float32)),
            texture_id=jnp.asarray(np.array([m.texture_id for m in mats], np.int32)),
        )

    @property
    def count(self) -> int:
        return self.albedo.shape[0]
