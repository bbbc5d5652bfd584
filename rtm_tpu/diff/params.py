"""Differentiable scene parameterization.

The reference has no gradients at all — this subsystem is the new surface the
TPU build adds (BASELINE.md: pixel gradients w.r.t. material albedo /
roughness / emission and geometry sphere center / radius / vertex params).

Design: `TracerScene` is already a pytree, but it mixes float leaves with
integer ids and *derived* geometry (shader-normals, local-space arrays
precomputed by build_tracer_scene).  `SceneParams` is the minimal pytree of
independent differentiable parameters; `apply_params` rebuilds a consistent
TracerScene from them **inside the traced function**, so gradients flow
through every derived quantity (triangle normals included).

Differentiation strategy (SURVEY.md Phase 4): hit *topology* (which
primitive the argmin picks) is detached — gradients flow through the hit
distance, normal, and shading of the chosen primitive.  This yields exact
gradients everywhere except at visibility silhouettes, validated against
finite differences in tests/test_grad.py.

Note: the vertex-parameter path rebuilds the local-space UV-quirk arrays
assuming identity instance transforms (tri_la = A etc.) when vertices are
optimized; scenes built with non-identity instances keep exact parity until
you opt into vertex optimization.
"""
from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp

from ..models.scene import TracerScene


@jax.tree_util.register_dataclass
@dataclass
class SceneParams:
    """All-float pytree of optimizable scene parameters."""

    albedo: jax.Array            # (M,3)
    emission_color: jax.Array    # (M,3)
    emission_power: jax.Array    # (M,)
    roughness: jax.Array         # (M,)
    metallic: jax.Array          # (M,)
    sph_pos: jax.Array           # (S,3)
    sph_radius: jax.Array        # (S,)
    tri_verts: jax.Array         # (T,3,3) world-space A,B,C


def extract_params(scene: TracerScene) -> SceneParams:
    return SceneParams(
        albedo=scene.materials.albedo,
        emission_color=scene.materials.emission_color,
        emission_power=scene.materials.emission_power,
        roughness=scene.materials.roughness,
        metallic=scene.materials.metallic,
        sph_pos=scene.sph_pos,
        sph_radius=scene.sph_radius,
        tri_verts=jnp.stack([scene.tri_wa, scene.tri_wb, scene.tri_wc], axis=1),
    )


def apply_params(scene: TracerScene, p: SceneParams,
                 rebuild_tri_geometry: bool = True) -> TracerScene:
    """Rebuild a consistent TracerScene from parameters (traced, jnp).

    rebuild_tri_geometry: when True (vertex optimization), triangle normals
    and the local-space UV-quirk arrays are recomputed from the world
    vertices through each triangle's stored world->local instance
    transform (scene.tri_inv_model), so optimizing vertices of an
    instanced scene (e.g. scene 3's rotated/scaled dragon) keeps exact
    UV parity; when False, only materials/spheres update and triangle
    data keeps its build-time parity values.
    """
    mats = replace(scene.materials,
                   albedo=p.albedo, emission_color=p.emission_color,
                   emission_power=p.emission_power, roughness=p.roughness,
                   metallic=p.metallic)
    out = replace(scene, materials=mats, sph_pos=p.sph_pos,
                  sph_radius=p.sph_radius)
    if rebuild_tri_geometry and scene.num_triangles > 0:
        a = p.tri_verts[:, 0]
        b = p.tri_verts[:, 1]
        c = p.tri_verts[:, 2]
        ab = b - a
        ac = c - a
        # shader-normal parity: cross on LOCAL vertices mapped through the
        # model matrix (NOT inverse-transpose, shader:252-255).  local
        # edges = R_w2l @ world edges, and model = R_w2l^-1, so the
        # shader normal is R_w2l^-1 @ cross(R_w2l ab, R_w2l ac).
        rot = scene.tri_inv_model[:, :, :3]              # (T,3,3)
        off = scene.tri_inv_model[:, :, 3]               # (T,3)
        la = jnp.einsum("tij,tj->ti", rot, a) + off
        lab = jnp.einsum("tij,tj->ti", rot, ab)
        lac = jnp.einsum("tij,tj->ti", rot, ac)
        n_local = jnp.cross(lab, lac)
        # model rotation = inv(rot): solve instead of transpose so
        # non-orthogonal (scaled) instances stay exact
        n = jnp.linalg.solve(rot, n_local[..., None])[..., 0]
        norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
        n = n / jnp.maximum(norm, 1e-30)
        out = replace(out, tri_wa=a, tri_wb=b, tri_wc=c,
                      tri_la=la, tri_lab=lab, tri_lac=lac, tri_normal=n)
    return out
