"""MXU brute-force kernel (ops/pallas/mxu_kernel.py) vs the XLA reference.

Interpret mode on CPU (conftest pins JAX_PLATFORMS=cpu).  Tolerances
follow test_megakernel.py: the in-kernel RNG's top-24-bit conversion and
the approx-reciprocal t ordering legitimately flip a small fraction of
stochastic branch draws, so compare means tightly and allow <=1% outlier
pixels.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
from rtm_tpu.ops.trace_ref import render_dispatch


def _compare(sid, res=32, bounces=4, frames=1, outlier_frac=0.01,
             frame_index=1):
    scene = build_tracer_scene(load_scene(sid))
    assert scene.mxu_meta is not None and scene.mxu_meta.supported
    cam = Camera().spec(res, res)
    cfg = RenderConfig(width=res, height=res, max_bounces=bounces,
                       max_frames=frames, draw_environment=True)
    ref = np.asarray(render_dispatch(scene, cam, jnp.uint32(frame_index),
                                     cfg, backend="xla"))
    mx = np.asarray(render_dispatch(scene, cam, jnp.uint32(frame_index),
                                    cfg, backend="mxu_interpret"))
    assert np.isfinite(mx).all()
    d = np.abs(ref - mx)
    frac_bad = float((d.max(axis=-1) > 1e-3).mean())
    assert frac_bad <= outlier_frac, (frac_bad, float(d.max()))
    np.testing.assert_allclose(mx.mean(), ref.mean(), rtol=3e-3)
    return ref, mx


def test_scene1_spheres():
    """Spheres only: no matmul path (have_tris=False)."""
    _compare(1, bounces=4)


def test_scene2_dielectric_textured():
    _compare(2, bounces=5)


def test_scene3_cornell_dragon():
    """The headline scene: 1756 triangles through 14 matmul chunks."""
    _compare(3, bounces=4)


def test_scene4_dragon():
    _compare(4, bounces=4)


def test_scene5_empty_sky():
    _compare(5, bounces=3)


def test_multi_sample_dispatch():
    """spp > 1: per-frame record/miss rows and the seed schedule."""
    _compare(2, frames=3, bounces=3)


def test_accumulation_frame_index():
    """frame_index changes the seed stream (shader:697)."""
    r1, _ = _compare(2, frame_index=1)
    r2, _ = _compare(2, frame_index=7)
    assert np.abs(r1 - r2).max() > 1e-4


def test_table_limit_fallback_dispatch():
    """A scene over MAX_TRIS must fall back (trav -> megakernel) inside
    render_dispatch rather than assert in the mxu driver."""
    from rtm_tpu.ops.pallas import mxu_kernel as mk

    import dataclasses

    scene = build_tracer_scene(load_scene(2))
    meta = scene.mxu_meta._replace(supported=False)
    scene2 = dataclasses.replace(scene, mxu_meta=meta)
    cfg = RenderConfig(width=16, height=16, max_bounces=3, max_frames=1,
                       draw_environment=True)
    cam = Camera().spec(16, 16)
    out = np.asarray(render_dispatch(scene2, cam, jnp.uint32(1), cfg,
                                     backend="mxu_interpret"))
    ref = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                     backend="xla"))
    assert np.isfinite(out).all()
    assert np.abs(out - ref).mean() < 5e-3
    with pytest.raises(AssertionError, match="unsupported"):
        mk.render_rays_mxu(scene2, cam, jnp.uint32(1), cfg,
                           pixel_offset=jnp.int32(0), n_rays=256,
                           interpret=True)


def test_odd_resolution_tail():
    """Non-multiple-of-1024 ray counts exercise the padded tail tile."""
    scene = build_tracer_scene(load_scene(2))
    cam = Camera().spec(24, 20)
    cfg = RenderConfig(width=24, height=20, max_bounces=3, max_frames=1,
                       draw_environment=True)
    ref = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                     backend="xla"))
    mx = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                    backend="mxu_interpret"))
    d = np.abs(ref - mx)
    assert float((d.max(axis=-1) > 1e-3).mean()) <= 0.01


def test_pair_rows_match_intersect_oracle():
    """Property test: the Pluecker pair rows reproduce the production M-T
    hit mask and t EXACTLY in f32 on random geometry (the on-chip matmul
    adds only the bf16x3 stacking, ~2^-17 relative)."""
    from rtm_tpu.ops.intersect import DET_EPS, TriFeatures, triangle_hits
    from rtm_tpu.ops.pallas.mxu_kernel import (K, Q, _morton3,
                                               build_mxu_tables)

    rng = np.random.default_rng(11)
    t = 200
    va = rng.uniform(-2, 2, (t, 3)).astype(np.float32)
    vb = (va + rng.uniform(-1, 1, (t, 3))).astype(np.float32)
    vc = (va + rng.uniform(-1, 1, (t, 3))).astype(np.float32)
    nsh = np.cross(vb - va, vc - va)
    tabs = build_mxu_tables(va, vb, vc, nsh, np.zeros(t, np.int64),
                            np.full(1, -1, np.int32), 1, 0)
    # the builder Morton-orders triangles for chunk culling: permute the
    # oracle arrays to the table order before the per-pair comparison
    order = np.argsort(
        _morton3(((va + vb + vc) / 3.0).astype(np.float64)), kind="stable")
    va, vb, vc = va[order], vb[order], vc[order]
    # un-stack the bf16x3 rows back to f32 (hi + lo halves)
    pair = np.asarray(tabs.arrays.pair, np.float32)
    rows = (pair[..., :K] + pair[..., 2 * K:3 * K]).reshape(
        tabs.meta.nc, Q, 128, K).transpose(0, 2, 1, 3).reshape(-1, Q, K)

    n_rays = 512
    o = rng.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    f = np.zeros((n_rays, K), np.float32)
    f[:, 0:3] = d
    f[:, 3:6] = np.cross(o, d)
    f[:, 6:9] = o
    f[:, 9] = 1.0

    s = np.einsum("tqk,nk->ntq", rows[:t], f)
    det = s[..., 0] + s[..., 1] + s[..., 2]
    m = np.minimum(np.minimum(s[..., 0], s[..., 1]),
                   np.minimum(s[..., 2], s[..., 3]))
    hit = (m >= 0.0) & (det > DET_EPS)

    feats = TriFeatures.build(jnp.asarray(va), jnp.asarray(vb),
                              jnp.asarray(vc))
    w = jnp.cross(jnp.asarray(o), jnp.asarray(d))
    t_ref = np.asarray(triangle_hits(jnp.asarray(o), jnp.asarray(d),
                                     feats, w))
    ref_hit = t_ref < 1e30
    # near-exact: the hi+lo reconstruction rounds once per coefficient
    agree = (hit == ref_hit).mean()
    assert agree > 0.9999, agree


def test_mxu_replay_image_matches_kernel():
    """render_mxu_replay (the differentiable record-replay path) must
    reproduce the kernel image: identical rays, recorded topology, same
    shading semantics — only argmin ulp-ties may differ (<0.5% pixels)."""
    import jax

    from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
    from rtm_tpu.ops.trace_ref import render_dispatch, render_mxu_replay

    cfg = RenderConfig(width=32, height=32, max_bounces=4, max_frames=1,
                       draw_environment=True)
    cam = Camera().spec(32, 32)
    scene = build_tracer_scene(load_scene(3))
    a = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                   backend="mxu_interpret"))
    b = np.asarray(render_mxu_replay(scene, cam, jnp.uint32(1), cfg,
                                     interpret=True))
    frac = (np.abs(a - b).max(axis=-1) > 1e-3).mean()
    assert frac < 0.005, f"{frac:.4f} of pixels differ beyond ulp-tie noise"


def _two_plane_scene(dt):
    """Two parallel emissive triangles facing the camera, separated by
    dt in hit distance, over a dark backdrop."""
    from rtm_tpu import (Material, Mesh, MeshInstance, Scene, Triangle,
                         build_tracer_scene)
    from rtm_tpu.models import scenes as builtin
    s = Scene(sky=builtin._procedural_sky())
    s.add_material(Material((0, 0, 0), (1, 0, 0), 0, 0, 4.0, 1.0, -1))
    s.add_material(Material((0, 0, 0), (0, 1, 0), 0, 0, 4.0, 1.0, -1))
    z0 = -2.0
    s.add_mesh(Mesh.from_triangles([
        Triangle((-3, -3, z0), (3, -3, z0), (0, 4, z0))]))
    s.add_mesh(Mesh.from_triangles([
        Triangle((-3, -3, z0 - dt), (3, -3, z0 - dt), (0, 4, z0 - dt))]))
    s.add_object(MeshInstance(mesh_id=0, material_id=0))
    s.add_object(MeshInstance(mesh_id=1, material_id=1))
    return build_tracer_scene(s)


def test_near_coincident_t_ordering_pin():
    """Advisor r4: the packed-t argmin orders approximately (~0.4%% in t),
    so two surfaces separated by less than that may resolve to either —
    pinned contract: the result is one of the two surfaces' radiances
    (never garbage), deterministic across dispatches."""
    from rtm_tpu import Camera, RenderConfig
    from rtm_tpu.ops.trace_ref import render_dispatch

    cfg = RenderConfig(width=16, height=16, max_bounces=2, max_frames=1,
                       draw_environment=True)
    cam = Camera().spec(16, 16)
    scene = _two_plane_scene(dt=2.0 * 0.002)     # 0.2% of t ~ 2.0
    a = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                   backend="mxu_interpret"))
    b = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                   backend="mxu_interpret"))
    np.testing.assert_array_equal(a, b)          # deterministic
    covered = a.max(axis=-1) > 1.0               # emissive plane pixels
    assert covered.mean() > 0.3
    red = a[..., 0] > 1.0
    green = a[..., 1] > 1.0
    # every covered pixel is exactly one of the two planes
    assert np.all(covered == (red ^ green))
    # and the winner is overwhelmingly the FRONT (red) plane; the
    # approx-ordering window only flips a minority of grazing pixels
    assert red[covered].mean() > 0.5


def test_grazing_winner_rejection():
    """Advisor r4: an edge-on sliver (det near eps) must never poison the
    frame — the ray-level fallback drops the failed winner to the
    sphere/miss result, finite everywhere, xla-parity except isolated
    grazing pixels."""
    from rtm_tpu import (Camera, Material, Mesh, MeshInstance, RenderConfig,
                         Scene, SphereDef, Triangle, build_tracer_scene)
    from rtm_tpu.models import scenes as builtin
    from rtm_tpu.ops.trace_ref import render_dispatch

    s = Scene(sky=builtin._procedural_sky())
    s.add_material(Material((0.8, 0.2, 0.2), (1, 1, 1), 0, 0, 0, 1.0, -1))
    s.add_material(Material((0.2, 0.8, 0.2), (1, 1, 1), 0, 0, 0.5, 1.0, -1))
    # sliver nearly parallel to the view rays (camera looks along -z)
    s.add_mesh(Mesh.from_triangles([
        Triangle((-0.5, -1.0, -1.0), (0.5, -1.0, -1.0),
                 (0.0, -1.0 + 1e-5, -9.0))]))
    s.add_object(MeshInstance(mesh_id=0, material_id=0))
    s.add_sphere(SphereDef((0, 0, -4.0), 1.2, 1))
    scene = build_tracer_scene(s)
    cfg = RenderConfig(width=16, height=16, max_bounces=3, max_frames=1,
                       draw_environment=True)
    cam = Camera().spec(16, 16)
    a = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                   backend="mxu_interpret"))
    x = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                   backend="xla"))
    assert np.isfinite(a).all()
    frac = (np.abs(a - x).max(axis=-1) > 1e-3).mean()
    assert frac < 0.05, f"{frac:.3f} of pixels diverge on grazing scene"
