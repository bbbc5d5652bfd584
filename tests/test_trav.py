"""Traversal-BVH structure invariants + skip-link traversal correctness
(accel/trav.py) — the acceleration structure of the per-lane kernel."""
from __future__ import annotations

import numpy as np
import pytest

from rtm_tpu.accel.trav import BIG, TravBVH, build_trav, traverse_ref
from rtm_tpu.models.scenes import load_scene


def _world_tris(scene):
    parts = []
    for inst in scene.objects:
        mesh = scene.meshes[inst.mesh_id]
        m = inst.model_matrix()
        v = mesh.verts.astype(np.float64)
        parts.append((v @ m[:3, :3].T + m[:3, 3]).astype(np.float32))
    return np.concatenate(parts) if parts else np.zeros((0, 3, 3), np.float32)


@pytest.fixture(scope="module")
def scene3_trav():
    verts = _world_tris(load_scene(3))
    trav = build_trav(verts, max_leaf_tris=16)
    return verts, trav


def test_structure_invariants(scene3_trav):
    verts, trav = scene3_trav
    t = len(verts)
    n = trav.num_nodes
    # slices tile [0, T) and are <= max size
    ss = sorted(trav.slices)
    assert ss[0][0] == 0 and ss[-1][1] == t
    assert all(a[1] == b[0] for a, b in zip(ss, ss[1:]))
    assert max(e - s for s, e in trav.slices) <= 16
    # skip links: strictly forward, within bounds, and DFS-consistent —
    # node n's subtree is exactly [n, skip[n])
    assert np.all(trav.skip > np.arange(n))
    assert np.all(trav.skip <= n)
    # every leaf box contains its triangles (in BVH order)
    v = verts[trav.order]
    for nid in range(n):
        li = trav.leaf_id[nid]
        if li >= 0:
            s, e = trav.slices[li]
            seg = v[s:e].reshape(-1, 3)
            assert np.all(seg.min(0) >= trav.lo[nid] - 1e-4)
            assert np.all(seg.max(0) <= trav.hi[nid] + 1e-4)
    # root box contains everything
    assert np.all(v.reshape(-1, 3).min(0) >= trav.lo[0] - 1e-4)
    assert np.all(v.reshape(-1, 3).max(0) <= trav.hi[0] + 1e-4)


def _brute(verts, o, d):
    """First-min-wins brute force in the same arithmetic as traverse_ref."""
    from rtm_tpu.ops.intersect import DET_EPS
    best, best_i = float(BIG), -1
    for ti, (a, b, c) in enumerate(verts):
        ab, ac = b - a, c - a
        nrm = np.cross(ab, ac)
        det = -np.dot(d, nrm)
        if det < DET_EPS:
            continue
        ao = o - a
        dao = np.cross(ao, d)
        u = np.dot(ac, dao)
        vv = -np.dot(ab, dao)
        tt = np.dot(ao, nrm)
        if u < 0 or vv < 0 or tt < 0 or det - u - vv < 0:
            continue
        tval = tt / det
        if tval < best:
            best, best_i = tval, ti
    return best, best_i


def test_traversal_matches_brute_force(scene3_trav):
    verts, trav = scene3_trav
    v = verts[trav.order].astype(np.float64)
    rng = np.random.default_rng(7)
    # rays from inside the Cornell box, random directions
    for _ in range(64):
        o = rng.uniform([-2.5, 0.5, -4.5], [2.5, 5.5, 0.5])
        d = rng.standard_normal(3)
        d /= np.linalg.norm(d)
        t_ref, i_ref = _brute(v, o, d)
        t_got, i_got, leaves, nodes = traverse_ref(trav, v, o, d)
        assert i_got == i_ref, (i_got, i_ref, t_got, t_ref)
        if i_ref >= 0:
            assert t_got == pytest.approx(t_ref, rel=1e-6)
        assert leaves <= trav.num_leaves
        assert nodes <= trav.num_nodes


def test_traversal_prunes(scene3_trav):
    """t-pruning: with a tight init_t the traversal visits fewer leaves."""
    verts, trav = scene3_trav
    v = verts[trav.order].astype(np.float64)
    o = np.array([0.0, 3.0, -1.0])
    d = np.array([0.1, -0.7, -0.7])
    d /= np.linalg.norm(d)
    t_full, i_full, leaves_full, _ = traverse_ref(trav, v, o, d)
    _, i_tight, leaves_tight, _ = traverse_ref(trav, v, o, d,
                                               init_t=t_full * 1.001)
    assert i_tight == i_full
    assert leaves_tight <= leaves_full


def test_trav_dead_lane_early_exit_correct():
    """Early exit (tile skips traversal once every lane terminated) must
    not change radiance: scene 2 rays escape to the sky quickly, so high
    bounce counts exercise the all-dead rounds."""
    import jax
    import jax.numpy as jnp

    from rtm_tpu import Camera, RenderConfig, build_tracer_scene
    from rtm_tpu.models.scenes import load_scene as load
    from rtm_tpu.ops.trace_ref import render_dispatch

    cfg = RenderConfig(width=32, height=32, max_bounces=8, max_frames=1,
                       draw_environment=True)
    scene = build_tracer_scene(load(2))
    cam = Camera().spec(32, 32)
    ref = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                     backend="xla"))
    got = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                     backend="trav_interpret"))
    d = np.abs(ref - got)
    assert d.mean() < 5e-3 and np.mean(d.max(-1) > 2e-2) < 0.01, (
        d.mean(), d.max())


# ---------------------------------------------------------------------------
# Round-4 coverage broadening (VERDICT r3 task 5): oracle matrix at
# megakernel parity — scenes 1-4, spp>1, table-limit fallback, and a
# property test of the conservative bf16 box packing.
# ---------------------------------------------------------------------------

def _compare_trav(sid, res=32, bounces=4, frames=1, outlier_frac=0.01,
                  frame_index=1):
    import jax.numpy as jnp

    from rtm_tpu import Camera, RenderConfig, build_tracer_scene
    from rtm_tpu.models.scenes import load_scene as load
    from rtm_tpu.ops.trace_ref import render_dispatch

    scene = build_tracer_scene(load(sid))
    cam = Camera().spec(res, res)
    cfg = RenderConfig(width=res, height=res, max_bounces=bounces,
                       max_frames=frames, draw_environment=True)
    ref = np.asarray(render_dispatch(scene, cam, jnp.uint32(frame_index),
                                     cfg, backend="xla"))
    tv = np.asarray(render_dispatch(scene, cam, jnp.uint32(frame_index),
                                    cfg, backend="trav_interpret"))
    assert np.isfinite(tv).all()
    d = np.abs(ref - tv)
    frac_bad = float((d.max(axis=-1) > 1e-3).mean())
    assert frac_bad <= outlier_frac, (frac_bad, float(d.max()))
    np.testing.assert_allclose(tv.mean(), ref.mean(), rtol=3e-3)


def test_trav_scene1_spheres_oracle():
    """Spheres only (no triangle tables): sphere tie semantics."""
    _compare_trav(1, bounces=4)


def test_trav_scene3_cornell_textured_oracle():
    """The headline scene through the trav textured-record branch."""
    _compare_trav(3, bounces=4)


def test_trav_scene4_dragon_oracle():
    _compare_trav(4, bounces=4)


def test_trav_multi_sample_oracle():
    """spp > 1: per-frame record rows + seed schedule through trav."""
    _compare_trav(2, frames=3, bounces=3)


def test_trav_table_limit_fallback_dispatch():
    """An unsupported scene must fall back to the megakernel inside
    render_dispatch rather than assert in the trav driver."""
    import dataclasses

    import jax.numpy as jnp

    from rtm_tpu import Camera, RenderConfig, build_tracer_scene
    from rtm_tpu.models.scenes import load_scene as load
    from rtm_tpu.ops.pallas import trav_kernel as tk
    from rtm_tpu.ops.trace_ref import render_dispatch

    scene = build_tracer_scene(load(2))
    meta = scene.trav_meta._replace(supported=False)
    scene2 = dataclasses.replace(scene, trav_meta=meta)
    cfg = RenderConfig(width=16, height=16, max_bounces=3, max_frames=1,
                       draw_environment=True)
    cam = Camera().spec(16, 16)
    out = np.asarray(render_dispatch(scene2, cam, jnp.uint32(1), cfg,
                                     backend="trav_interpret"))
    ref = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                     backend="xla"))
    assert np.isfinite(out).all()
    assert np.abs(out - ref).mean() < 5e-3
    with pytest.raises(AssertionError, match="unsupported"):
        tk.render_rays_trav(scene2, cam, jnp.uint32(1), cfg,
                            pixel_offset=jnp.int32(0), n_rays=256,
                            interpret=True)


def test_pack_box_bf16_conservative_property():
    """Random boxes across magnitudes: the packed bf16 (lo, hi) pair must
    CONTAIN the original box (lo' <= lo, hi' >= hi) and not be more than
    ~2% looser per axis."""
    from rtm_tpu.ops.pallas.trav_kernel import _pack_box_bf16

    rng = np.random.default_rng(3)
    for scale in (1e-3, 1.0, 1e3, 1e30):
        lo = rng.uniform(-scale, scale, (3, 257)).astype(np.float32)
        hi = lo + rng.uniform(0, scale, (3, 257)).astype(np.float32)
        packed = _pack_box_bf16(np.concatenate([lo, hi], axis=0))
        lo_b = (packed.view(np.uint32) << 16).view(np.float32)
        hi_b = (packed.view(np.uint32) & 0xFFFF0000).view(np.float32)
        assert (lo_b <= lo).all() and (hi_b >= hi).all()
        width = hi - lo
        slack = (lo - lo_b) + (hi_b - hi)
        assert (slack <= 0.05 * np.maximum(width, np.abs(lo) + np.abs(hi))
                + 1e-30).all()
