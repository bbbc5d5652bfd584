"""Sorted-wavefront (slim Pallas sweep + XLA shading) vs the XLA oracle.

wavefront2 shares the XLA shading code with the reference scan renderer, so
the only divergence source is the sweep kernel's approx-reciprocal hit
ORDERING (the distance itself is recovered exactly from the winner's plane
equation): images must match to f32 tolerance with a tiny outlier
allowance for flipped nearest-hit ties.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
from rtm_tpu.ops.trace_ref import render_dispatch
from rtm_tpu.ops.wavefront2 import render_rays_wavefront2, render_wavefront2


def _compare(sid, res=24, bounces=4, frames=1, outlier_frac=0.0,
             frame_index=1, **kw):
    scene = build_tracer_scene(load_scene(sid))
    cam = Camera().spec(res, res)
    cfg = RenderConfig(width=res, height=res, max_bounces=bounces,
                       max_frames=frames, draw_environment=True)
    ref = np.asarray(render_dispatch(scene, cam, jnp.uint32(frame_index),
                                     cfg, backend="xla"))
    wf = np.asarray(render_wavefront2(scene, cam, jnp.uint32(frame_index),
                                      cfg, interpret=True, **kw))
    assert np.isfinite(wf).all()
    d = np.abs(ref - wf)
    frac_bad = float((d.max(axis=-1) > 1e-3).mean())
    assert frac_bad <= outlier_frac, (frac_bad, float(d.max()))
    np.testing.assert_allclose(wf.mean(), ref.mean(), rtol=2e-3)


def test_scene1_spheres():
    _compare(1, bounces=4)


def test_scene3_cornell_sorted_every_bounce():
    _compare(3, bounces=4, outlier_frac=0.003, sort_from=0)


def test_scene3_unsorted_matches():
    # sorting must be a pure lane permutation: disabling it gives the
    # same image (this is the configuration gradient passes use)
    _compare(3, bounces=4, outlier_frac=0.003, sort_from=99)


def test_scene2_textured_multiframe():
    _compare(2, bounces=3, frames=2, outlier_frac=0.01)


def test_partial_ray_range():
    """Sharded-renderer contract: an arbitrary dispatch-slot band must
    equal the corresponding pixels of the full frame (slots walk 8x8
    pixel blocks — megakernel.slot_to_xy)."""
    from rtm_tpu.ops.pallas.megakernel import slot_to_xy

    scene = build_tracer_scene(load_scene(1))
    res = 16
    cam = Camera().spec(res, res)
    cfg = RenderConfig(width=res, height=res, max_bounces=3, max_frames=1,
                       draw_environment=True)
    full = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                      backend="xla")).reshape(-1, 3)
    band = np.asarray(render_rays_wavefront2(
        scene, cam, jnp.uint32(1), cfg, pixel_offset=jnp.int32(3 * res),
        n_rays=5 * res, interpret=True))
    slots = np.arange(3 * res, 8 * res)
    x, y = slot_to_xy(slots, res)
    np.testing.assert_allclose(band, full[y * res + x], atol=1e-3)


def test_debug_passes_heatmap():
    """The cluster-pass probe: finite, positive where geometry exists, and
    bounded by n_clusters * bounces."""
    from rtm_tpu.ops.pallas.megakernel import build_mega_pack

    scene = build_tracer_scene(load_scene(3))
    res = 16
    cam = Camera().spec(res, res)
    cfg = RenderConfig(width=res, height=res, max_bounces=3, max_frames=1,
                       draw_environment=True)
    img, passes = render_rays_wavefront2(
        scene, cam, jnp.uint32(1), cfg, pixel_offset=jnp.int32(0),
        n_rays=res * res, interpret=True, debug_passes=True)
    passes = np.asarray(passes)
    pack = build_mega_pack(scene)
    assert passes.shape == (res * res,)
    assert passes.min() >= 0
    assert passes.max() <= pack.n_clusters * cfg.max_bounces
    assert passes.max() > 0           # camera rays hit the Cornell box


def test_grad_flows_through_wavefront2():
    """The production fast path is differentiable: albedo gradients through
    the sorted-wavefront renderer match the XLA scan renderer's."""
    import jax

    from rtm_tpu.diff.params import apply_params, extract_params

    scene = build_tracer_scene(load_scene(3))
    res = 12
    cam = Camera().spec(res, res)
    cfg = RenderConfig(width=res, height=res, max_bounces=3, max_frames=1,
                       draw_environment=True)
    p0 = extract_params(scene)

    def loss_wf(p):
        full = apply_params(scene, p)
        img = render_wavefront2(full, cam, jnp.uint32(1), cfg,
                                interpret=True)
        return jnp.mean(img ** 2)

    def loss_xla(p):
        full = apply_params(scene, p)
        img = render_dispatch(full, cam, jnp.uint32(1), cfg, backend="xla")
        return jnp.mean(img ** 2)

    g_wf = jax.grad(loss_wf)(p0)
    g_x = jax.grad(loss_xla)(p0)
    np.testing.assert_allclose(np.asarray(g_wf.albedo),
                               np.asarray(g_x.albedo), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_wf.emission_power),
                               np.asarray(g_x.emission_power),
                               rtol=1e-3, atol=1e-5)
