"""Wavefront (sorted per-bounce Pallas) renderer vs the XLA oracle.

Same tolerance rationale as test_megakernel.py: the in-kernel RNG's
top-24-bit uint->float conversion can flip stochastic branches on rare
lanes.  Sorting only permutes lanes between bounces — per-ray arithmetic is
identical to the megakernel's — so images must match the XLA reference to
f32 tolerance with a small outlier allowance.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
from rtm_tpu.ops.trace_ref import render_dispatch


def _compare(sid, res=24, bounces=4, frames=1, outlier_frac=0.0,
             frame_index=1, **kw):
    from rtm_tpu.ops.pallas.wavefront import render_wavefront

    scene = build_tracer_scene(load_scene(sid))
    cam = Camera().spec(res, res)
    cfg = RenderConfig(width=res, height=res, max_bounces=bounces,
                       max_frames=frames, draw_environment=True)
    ref = np.asarray(render_dispatch(scene, cam, jnp.uint32(frame_index),
                                     cfg, backend="xla"))
    wf = np.asarray(render_wavefront(scene, cam, jnp.uint32(frame_index),
                                     cfg, interpret=True, **kw))
    assert np.isfinite(wf).all()
    d = np.abs(ref - wf)
    frac_bad = float((d.max(axis=-1) > 1e-3).mean())
    assert frac_bad <= outlier_frac, (frac_bad, float(d.max()))
    np.testing.assert_allclose(wf.mean(), ref.mean(), rtol=2e-3)


def test_scene1_spheres():
    _compare(1, bounces=4)


def test_scene3_cornell_sorted_every_bounce():
    # sort_from=0 exercises the permutation machinery on the camera bounce
    # too; the image must be invariant to lane order
    _compare(3, bounces=4, outlier_frac=0.003, sort_from=0)


def test_scene2_textured_multiframe():
    # dielectric + textured floor + spp=2: deferred texture/sky product
    # reconstruction across sorted bounces
    _compare(2, bounces=3, frames=2, outlier_frac=0.01)


def test_partial_ray_range():
    """The sharded-renderer contract: an arbitrary dispatch-slot band must
    equal the corresponding pixels of the full frame (slots walk 8x8
    pixel blocks — megakernel.slot_to_xy)."""
    from rtm_tpu.ops.pallas.megakernel import slot_to_xy
    from rtm_tpu.ops.pallas.wavefront import render_rays_wavefront

    scene = build_tracer_scene(load_scene(1))
    res = 16
    cam = Camera().spec(res, res)
    cfg = RenderConfig(width=res, height=res, max_bounces=3, max_frames=1,
                       draw_environment=True)
    full = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                      backend="xla")).reshape(-1, 3)
    band = np.asarray(render_rays_wavefront(
        scene, cam, jnp.uint32(1), cfg, pixel_offset=jnp.int32(3 * res),
        n_rays=5 * res, interpret=True))
    slots = np.arange(3 * res, 8 * res)
    x, y = slot_to_xy(slots, res)
    np.testing.assert_allclose(band, full[y * res + x], atol=1e-3)
