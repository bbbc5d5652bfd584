"""Megakernel (fused Pallas path tracer) vs the XLA reference renderer.

Runs in Pallas interpret mode on the CPU test mesh (conftest pins
JAX_PLATFORMS=cpu).  Tolerances: the in-kernel RNG uses a top-24-bit
uint->float conversion (|err| <= 6e-8 vs the shader's float(seed)/UINT_MAX,
see megakernel._rand), so a small fraction of lanes near branch thresholds
(dielectric reflect-vs-refract draws, near-tangent sphere hits) legitimately
diverge — stochastic-renderer golden practice: compare means tightly and
allow <=1% outlier pixels.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
from rtm_tpu.ops.trace_ref import render_dispatch


def _compare(sid, res=32, bounces=4, frames=1, outlier_frac=0.0,
             frame_index=1):
    scene = build_tracer_scene(load_scene(sid))
    cam = Camera().spec(res, res)
    cfg = RenderConfig(width=res, height=res, max_bounces=bounces,
                       max_frames=frames, draw_environment=True)
    ref = np.asarray(render_dispatch(scene, cam, jnp.uint32(frame_index),
                                     cfg, backend="xla"))
    mk = np.asarray(render_dispatch(scene, cam, jnp.uint32(frame_index),
                                    cfg, backend="megakernel_interpret"))
    assert np.isfinite(mk).all()
    d = np.abs(ref - mk)
    frac_bad = float((d.max(axis=-1) > 1e-3).mean())
    assert frac_bad <= outlier_frac, (frac_bad, float(d.max()))
    np.testing.assert_allclose(mk.mean(), ref.mean(), rtol=2e-3)
    return ref, mk


def test_scene1_spheres_exact():
    ref, mk = _compare(1, bounces=4)


def test_scene2_dielectric_textured():
    # glass sphere + textured ground: dielectric branch flips on the 6e-8
    # RNG difference -> allow 1% outlier pixels
    _compare(2, bounces=4, outlier_frac=0.01)


def test_scene3_cornell():
    # approximate-reciprocal sweep ordering can mispick between two nearly
    # coincident candidates on rare lanes (exact t is still used for the
    # winner) -> allow 0.3% outliers
    _compare(3, bounces=8, outlier_frac=0.003)


def test_scene4_dragon():
    _compare(4, bounces=4, outlier_frac=0.003)


def test_scene5_empty_sky():
    _compare(5, res=16, bounces=2)


def test_multi_sample_dispatch():
    # MaxFrames > 1: per-sample seed schedule + record blocks per frame
    _compare(3, res=24, bounces=3, frames=3)


def test_accumulation_frame_index():
    # frame_index enters the seed schedule (shader:697)
    r1, m1 = _compare(3, res=16, bounces=2, frame_index=1)
    r7, m7 = _compare(3, res=16, bounces=2, frame_index=7)
    assert np.abs(r1 - r7).max() > 1e-4      # different sample sets


def test_flat_shade_fallback():
    # MaxBounces==1 preview mode falls back to the XLA path (shader:566-571)
    scene = build_tracer_scene(load_scene(3))
    cam = Camera().spec(16, 16)
    cfg = RenderConfig(width=16, height=16, max_bounces=1, max_frames=1,
                       draw_environment=True)
    ref = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                     backend="xla"))
    mk = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                    backend="megakernel"))
    np.testing.assert_array_equal(ref, mk)


def test_no_cull_matches_cull():
    from rtm_tpu.ops.pallas.megakernel import render_megakernel
    scene = build_tracer_scene(load_scene(3))
    cam = Camera().spec(16, 16)
    cfg = RenderConfig(width=16, height=16, max_bounces=3, max_frames=1,
                       draw_environment=True)
    a = np.asarray(render_megakernel(scene, cam, jnp.uint32(1), cfg,
                                     cull=True, interpret=True))
    b = np.asarray(render_megakernel(scene, cam, jnp.uint32(1), cfg,
                                     cull=False, interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_odd_resolution_tail():
    # 24x20 = 480 pixels: exercises the padded final ray tile
    scene = build_tracer_scene(load_scene(1))
    cam = Camera().spec(24, 20)
    cfg = RenderConfig(width=24, height=20, max_bounces=3, max_frames=1,
                       draw_environment=True)
    ref = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                     backend="xla"))
    mk = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                    backend="megakernel_interpret"))
    assert mk.shape == (20, 24, 3)
    np.testing.assert_allclose(mk, ref, atol=1e-3)
