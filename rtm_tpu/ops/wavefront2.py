"""Sorted-wavefront renderer: slim Pallas sweep + XLA shading per bounce.

The production fast path (backend="wavefront2").  Design, refined from the
round-1 fused kernels (ops/pallas/megakernel.py, ops/pallas/wavefront.py):

  * Only the nearest-triangle cluster sweep — the VPU-shaped all-pairs
    part — runs in Pallas (ops/pallas/sweep_kernel.py).  Everything else
    in a bounce (winner attribute fetch, texture/sky sampling, scatter,
    PCG RNG) is gather/elementwise work that XLA runs at full speed
    through flat-table row gathers; inside Mosaic the same fetch costs a
    one-hot MXU matmul per bounce (no per-lane gather on TPU vectors).
  * Between bounces, the ray stream is re-sorted by a locality key
    (Morton cell of origin x direction octant, dead rays last), so the
    rays sharing a kernel tile agree on which SAH treelet clusters matter
    and the tile-uniform cull approaches per-ray effectiveness — the
    standard GPU wavefront decomposition (Laine et al., HPG 2013)
    re-shaped for TPU.  Whole tiles of terminated rays skip every cluster.
  * The kernel returns only the argmin index (hit topology, detached);
    the hit distance is recomputed differentiably in XLA from the winning
    triangle's plane equation, so jax.grad flows through this renderer —
    it is both the fastest forward path and the production autodiff path
    (set sort_from high to skip sorting in gradient passes if the
    gather-transpose scatters dominate).

Bounce semantics are the scan renderer's exactly (ops/trace_ref.py:
shade_bounce / bounce_payload — shader:510-649,663-666 parity, bit-exact
PCG streams); sorting only permutes lanes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..models.camera import CameraSpec
from ..models.scene import TracerScene
from . import rng
from .intersect import FLT_MAX
from .pallas.megakernel import (build_mega_pack, slot_to_xy, slots_to_image,
                                use_block8)
from .pallas.sweep_kernel import DEFAULT_RAY_TILE, sweep_call
from .trace_ref import (_triangle_t_from_idx, bounce_payload,
                        camera_ray_basis, shade_bounce)


def _scene_bounds(scene: TracerScene):
    """World AABB for the sort-key grid (traced; tiny)."""
    los, his = [], []
    if scene.num_triangles > 0:
        v = jnp.concatenate([scene.tri_wa, scene.tri_wb, scene.tri_wc], 0)
        los.append(v.min(axis=0))
        his.append(v.max(axis=0))
    if scene.num_spheres > 0:
        r = scene.sph_radius[:, None]
        los.append((scene.sph_pos - r).min(axis=0))
        his.append((scene.sph_pos + r).max(axis=0))
    if not los:
        return jnp.zeros((3,)), jnp.ones((3,))
    lo = functools.reduce(jnp.minimum, los)
    hi = functools.reduce(jnp.maximum, his)
    return lo, hi


def _sort_perm(o, d, alive, lo, hi):
    """Locality permutation over (N,3)/(N,) ray state: Morton(origin cell,
    4 bits/axis) x direction octant; dead rays to the end."""
    n = o.shape[0]
    ext = jnp.maximum(hi - lo, 1e-6)
    cell = jnp.clip(((o - lo[None, :]) / ext[None, :] * 16.0)
                    .astype(jnp.int32), 0, 15)                # (N,3)
    m = jnp.zeros((n,), jnp.int32)
    for bit in range(4):
        for ax in range(3):
            m = m | (((cell[:, ax] >> bit) & 1) << (3 * bit + ax))
    octant = ((d[:, 0] > 0).astype(jnp.int32)
              | ((d[:, 1] > 0).astype(jnp.int32) << 1)
              | ((d[:, 2] > 0).astype(jnp.int32) << 2))
    key = (m << 3) | octant
    key = jnp.where(alive, key, jnp.int32(2 ** 30))
    iota = jax.lax.iota(jnp.int32, n)
    _, perm = jax.lax.sort((key, iota), num_keys=1)
    return perm


def render_rays_wavefront2(scene: TracerScene, cam: CameraSpec, frame_index,
                           cfg: RenderConfig, pixel_offset, n_rays: int,
                           ray_tile: int = DEFAULT_RAY_TILE,
                           cull: bool = True, sort_from: int = 1,
                           interpret: bool = False,
                           debug_passes: bool = False):
    """Trace row-major pixels [pixel_offset, pixel_offset + n_rays).

    Returns (n_rays, 3) radiance averaged over cfg.max_frames samples —
    same contract as render_rays_megakernel.  sort_from: first bounce
    before which the stream is re-sorted (camera rays are already
    coherent; a value >= max_bounces disables sorting entirely, e.g. for
    gradient passes).  debug_passes: additionally return the summed
    cluster-pass count per pixel (the cull heatmap, ref debug
    visualizations RayTracing.shader:345-374).
    """
    w = cfg.width
    n = n_rays
    r = ray_tile
    n_pad = -(-n // r) * r
    frames = cfg.max_frames
    draw_env = jnp.float32(1.0 if cfg.draw_environment else 0.0)

    pack = build_mega_pack(scene)
    have_tris = pack.n_clusters > 0
    lo, hi = _scene_bounds(scene)
    frame_index = jnp.asarray(frame_index, jnp.uint32)

    lin = jnp.arange(n_pad, dtype=jnp.int32) + jnp.asarray(pixel_offset,
                                                           jnp.int32)
    if use_block8(w, cfg.height):
        # slots walk 8x8 pixel blocks: a 512-ray kernel tile is a 64x8
        # strip instead of a full image row, so the tile-uniform cluster
        # cull sees coherent camera rays (see megakernel.py slot_to_xy)
        x, y = slot_to_xy(lin, w)
    else:
        x = lin % w
        y = lin // w
    in_range = jax.lax.iota(jnp.int32, n_pad) < n
    focus_point, right, up, position = camera_ray_basis(cam, cfg, x, y)
    res = jnp.array([cfg.width, cfg.height], jnp.float32)

    out_color = jnp.zeros((n_pad, 3), jnp.float32)
    out_passes = jnp.zeros((n_pad,), jnp.int32)
    for frame in range(1, frames + 1):
        # camera jitters: bit-exact reference stream (shader:695-706)
        seed = rng.pixel_seed(x, y, w, frame, frame_index)
        focus_jitter, seed = rng.random_circle_point(seed)
        focus_jitter = focus_jitter / res * cam.defocus_strength
        dev_jitter, seed = rng.random_circle_point(seed)
        dev_jitter = dev_jitter / res * cam.blur_strength
        dev_focus = (focus_point
                     + dev_jitter[:, :1] * right[None, :]
                     + dev_jitter[:, 1:2] * up[None, :])
        o = (position[None, :]
             + focus_jitter[:, :1] * right[None, :]
             + focus_jitter[:, 1:2] * up[None, :])
        delta = dev_focus - o
        d = delta / jnp.linalg.norm(delta, axis=-1, keepdims=True)

        sd = seed
        color = jnp.zeros((n_pad, 3), jnp.float32)
        contrib = jnp.ones((n_pad, 3), jnp.float32)
        alive = in_range
        pix = jax.lax.iota(jnp.int32, n_pad)
        passes = jnp.zeros((n_pad,), jnp.int32)

        for b in range(cfg.max_bounces):
            if b >= sort_from:
                perm = _sort_perm(o, d, alive, lo, hi)
                o = jnp.take(o, perm, axis=0)
                d = jnp.take(d, perm, axis=0)
                sd = jnp.take(sd, perm)
                color = jnp.take(color, perm, axis=0)
                contrib = jnp.take(contrib, perm, axis=0)
                alive = jnp.take(alive, perm)
                pix = jnp.take(pix, perm)
                passes = jnp.take(passes, perm)

            sd = sd + jnp.uint32(b)                          # shader:659
            if have_tris:
                state8 = jnp.concatenate(
                    [o.T, d.T, alive[None, :].astype(jnp.float32),
                     jnp.zeros((1, n_pad), jnp.float32)], axis=0)
                # the sweep is an argmin oracle: detach it from autodiff
                # (topology-detached gradients, SURVEY.md Phase 4)
                t_a, i_pad, npass = sweep_call(
                    pack, jax.lax.stop_gradient(state8), ray_tile=r,
                    cull=cull, interpret=interpret)
                i_real = jnp.where(i_pad >= 0,
                                   jnp.take(pack.padded_to_real,
                                            jnp.maximum(i_pad, 0)),
                                   jnp.int32(-1))
                t_t = _triangle_t_from_idx(scene, o, d, i_real)
                tri_hit = (t_t, i_real)
                passes = passes + npass
            else:
                tri_hit = (jnp.full((n_pad,), FLT_MAX),
                           jnp.full((n_pad,), -1, jnp.int32))
            p = bounce_payload(scene, None, o, d, 0, tri_hit=tri_hit)
            o, d, sd, color, contrib, alive = shade_bounce(
                scene, cfg, draw_env, o, d, sd, color, contrib, alive, p)

        out_color = out_color.at[pix].add(color)
        out_passes = out_passes.at[pix].add(passes)

    img = out_color[:n] / jnp.float32(frames)                # shader:711
    if debug_passes:
        return img, out_passes[:n]
    return img


def render_wavefront2(scene: TracerScene, cam: CameraSpec, frame_index,
                      cfg: RenderConfig, ray_tile: int = DEFAULT_RAY_TILE,
                      cull: bool = True, sort_from: int = 1,
                      interpret: bool = False):
    """Full-frame sorted-wavefront dispatch.  Returns (H, W, 3) f32 — same
    contract as render_megakernel / render_dispatch."""
    color = render_rays_wavefront2(
        scene, cam, frame_index, cfg, pixel_offset=jnp.int32(0),
        n_rays=cfg.width * cfg.height, ray_tile=ray_tile, cull=cull,
        sort_from=sort_from, interpret=interpret)
    if use_block8(cfg.width, cfg.height):
        return slots_to_image(color, cfg.width, cfg.height)
    return color.reshape(cfg.height, cfg.width, 3)
