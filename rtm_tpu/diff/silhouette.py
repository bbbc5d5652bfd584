"""Silhouette-aware gradients: soft primary visibility.

The renderer's hit topology is detached (argmin indices), so geometry
gradients are exact for *interior* shading terms but ZERO at visibility
silhouettes — moving a sphere's edge across a pixel is a step function
(SURVEY.md Phase 4 hard part #4; the round-1 grad tests deliberately
tested interior-only configurations).

This module adds the standard soft-visibility treatment (SoftRas-style
sigmoid coverage) for the PRIMARY hit, where silhouette terms dominate
inverse-rendering objectives:

    margin  m = signed distance-to-silhouette proxy of the winning
                primitive (sphere: (r^2 - p^2)/r^2 with p the ray's
                perpendicular miss distance; triangle: min barycentric
                coordinate of the hit point),
    alpha   = sigmoid(m / tau),
    img     = alpha * img_hard + (1 - alpha) * img_deoccluded.

Both margins are smooth functions of the geometry parameters, so
jax.grad picks up the edge term that the detached argmin drops; as
tau -> 0 the soft image converges to the hard render.

The blend target is the DE-OCCLUDED radiance: the same ray re-traced
from just past the winning primitive's exit point (a sphere's far root /
a triangle's far side) through the full multi-bounce pipeline — so
object-over-object silhouettes blend toward the occluded object's
actual shaded radiance, and object-over-sky edges reduce to the sky
term naturally (round-2 review item 6: the former sky-only blend biased
occluder edges by O(alpha * (C_occluded - C_sky))).

Use: diff.render_loss(..., soft_tau=0.01) or render_soft_primary directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..models.camera import CameraSpec
from ..models.scene import TracerScene
from ..ops import rng
from ..ops.intersect import FLT_MAX, dot3, nearest_sphere, normalize
from ..ops.trace_ref import _gather, camera_ray_basis, render_pixels


def primary_soft_alpha(scene: TracerScene, origin, direction, tau: float,
                       with_exit: bool = False):
    """Soft coverage of each ray's primary hit: (N,) in (0, 1).

    Interior rays saturate to ~1; rays crossing a silhouette get a smooth
    transition of width ~tau in margin units.  Fully differentiable in
    sphere centers/radii and triangle vertices.

    with_exit: additionally return the winner's EXIT distance (far sphere
    root / just past the triangle) — where the de-occluded re-trace
    starts — and a hit mask.
    """
    n = origin.shape[0]
    alpha = jnp.ones((n,), jnp.float32)

    if scene.num_spheres > 0:
        t_s, i_s = nearest_sphere(origin, direction, scene.sph_pos,
                                  scene.sph_radius)
        si = jnp.clip(i_s, 0, scene.num_spheres - 1)
        c = _gather(scene.sph_pos, si)
        r = _gather(scene.sph_radius, si)
        oc = origin - c
        # perpendicular miss distance^2 of the (unit-direction) ray
        along = dot3(oc, direction)
        p2 = dot3(oc, oc) - along * along
        m_sph = (r * r - p2) / jnp.maximum(r * r, 1e-12)
        a_sph = jnp.where(i_s >= 0,
                          jax.nn.sigmoid(m_sph / tau), 1.0)
        # far root: where a ray passing "through" the sphere exits it.
        # clamp away from 0: sqrt'(0) = inf would leak NaN into reverse
        # mode through the miss-ray lanes despite the downstream mask.
        # Mask miss lanes (i_s < 0) to 0 here: -along of a garbage winner
        # is unbounded and would poison the min/max blend below (advisor r3)
        disc = jnp.sqrt(jnp.maximum(r * r - p2, 1e-12))
        t_exit_s = jnp.where(i_s >= 0, -along + disc, 0.0)
    else:
        t_s = jnp.full((n,), jnp.inf)
        a_sph = jnp.ones((n,), jnp.float32)
        t_exit_s = jnp.zeros((n,), jnp.float32)

    if scene.num_triangles > 0:
        from ..ops.intersect import TriFeatures, nearest_triangle
        feats = TriFeatures.build(scene.tri_wa, scene.tri_wb, scene.tri_wc)
        t_t, i_t = nearest_triangle(origin, direction, feats)
        ti = jnp.clip(i_t, 0, scene.num_triangles - 1)
        a = _gather(scene.tri_wa, ti)
        b = _gather(scene.tri_wb, ti)
        cc = _gather(scene.tri_wc, ti)
        nvec = jnp.cross(b - a, cc - a)
        det = -dot3(direction, nvec)
        inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
        ao = origin - a
        dao = jnp.cross(ao, direction)
        u = dot3(cc - a, dao) * inv_det
        v = -dot3(b - a, dao) * inv_det
        w = 1.0 - u - v
        m_tri = jnp.minimum(jnp.minimum(u, v), w)       # <0 outside
        a_tri = jnp.where(i_t >= 0,
                          jax.nn.sigmoid(m_tri / tau), 1.0)
        # thin primitive; mask miss lanes (t_t == FLT_MAX, not inf): an
        # unmasked FLT_MAX exit makes o_behind ~3.4e38*direction — an
        # overflow/NaN hazard in reverse mode (advisor r3)
        t_exit_t = jnp.where(i_t >= 0, t_t, 0.0)
    else:
        t_t = jnp.full((n,), jnp.inf)
        a_tri = jnp.ones((n,), jnp.float32)
        t_exit_t = jnp.zeros((n,), jnp.float32)

    # the winner's margin is the one that matters
    use_tri = t_t < t_s
    alpha = jnp.where(use_tri, a_tri, a_sph)
    if not with_exit:
        return alpha
    # misses are encoded FLT_MAX (3.4e38) by nearest_sphere/nearest_triangle,
    # NOT inf — an inf compare never fired, so every sky pixel re-traced a
    # full bounce loop from a garbage origin (advisor r3, medium)
    hit = jnp.minimum(t_t, t_s) < FLT_MAX
    t_exit = jnp.where(use_tri, t_exit_t, t_exit_s)
    t_exit = jnp.where(hit, jnp.maximum(t_exit, 0.0), 0.0)
    return alpha, t_exit, hit


def render_soft_primary(scene: TracerScene, cam: CameraSpec, x, y,
                        frame_index, cfg: RenderConfig, tau: float = 0.01,
                        chunk: int = 512, backend: str = "xla",
                        remat: bool = False):
    """Hard multi-bounce render blended with soft primary coverage.

    Returns (N, 3); equals render_pixels as tau -> 0, but differentiable
    through primary silhouettes.
    """
    img = render_pixels(scene, cam, x, y, frame_index, cfg, chunk=chunk,
                        backend=backend, remat=remat)

    focus_point, right, up, position = camera_ray_basis(cam, cfg, x, y)
    # primary-ray direction of the FIRST sample, no jitter (the coverage
    # factor is a per-pixel geometric weight, not a stochastic estimate)
    direction = normalize(focus_point - position[None, :])
    origin = jnp.broadcast_to(position[None, :], direction.shape)
    alpha, t_exit, hit = primary_soft_alpha(scene, origin, direction, tau,
                                            with_exit=True)

    # de-occluded radiance: the same ray re-traced from just past the
    # winner's exit, full multi-bounce — misses reduce to the sky term
    eps = jnp.float32(1e-3)
    o_behind = origin + (t_exit + eps)[:, None] * direction
    o_behind = jnp.where(hit[:, None], o_behind, origin)
    occ = _trace_radiance(scene, cfg, o_behind, direction,
                          rng.pixel_seed(x, y, cfg.width, 1,
                                         jnp.asarray(frame_index,
                                                     jnp.uint32)),
                          chunk=chunk)
    return alpha[:, None] * img + (1.0 - alpha[:, None]) * occ


def _trace_radiance(scene: TracerScene, cfg: RenderConfig, o, d, seed,
                    chunk: int = 512):
    """Full bounce loop from explicit start rays (the de-occlusion
    re-trace): bounce_payload + shade_bounce, reference semantics."""
    from ..ops.intersect import TriFeatures
    from ..ops.trace_ref import bounce_payload, shade_bounce
    n = o.shape[0]
    feats = TriFeatures.build(scene.tri_wa, scene.tri_wb, scene.tri_wc)
    draw_env = jnp.float32(1.0 if cfg.draw_environment else 0.0)
    color = jnp.zeros((n, 3), jnp.float32)
    contrib = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    sd = seed
    for b in range(cfg.max_bounces):
        sd = sd + jnp.uint32(b)
        p = bounce_payload(scene, feats, o, d, chunk=chunk)
        o, d, sd, color, contrib, alive = shade_bounce(
            scene, cfg, draw_env, o, d, sd, color, contrib, alive, p)
    return color
