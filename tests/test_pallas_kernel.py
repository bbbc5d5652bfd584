"""Pallas intersection kernel tests (interpret mode on CPU).

The kernel must agree exactly with the XLA chunked sweep on picked indices
(same features, same acceptance test) — cull on and off.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rtm_tpu.ops.intersect import FLT_MAX, TriFeatures, nearest_triangle
from rtm_tpu.ops.pallas.intersect_kernel import (nearest_triangle_pallas,
                                                 pack_triangle_features)


def _random_tris(n, seed=0, spread=4.0):
    rs = np.random.RandomState(seed)
    a = (rs.rand(n, 3).astype(np.float32) - 0.5) * spread
    b = a + rs.randn(n, 3).astype(np.float32) * 0.5
    c = a + rs.randn(n, 3).astype(np.float32) * 0.5
    return jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)


def _random_rays(n, seed=1):
    rs = np.random.RandomState(seed)
    o = rs.randn(n, 3).astype(np.float32) * 3
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("cull", [False, True])
@pytest.mark.parametrize("ntris", [1, 100, 130, 256])
def test_matches_xla_sweep(cull, ntris):
    a, b, c = _random_tris(ntris)
    o, d = _random_rays(300)
    t_p, i_p = nearest_triangle_pallas(o, d, a, b, c, ray_tile=128,
                                       cull=cull, interpret=True)
    feats = TriFeatures.build(a, b, c)
    t_x, i_x = nearest_triangle(o, d, feats)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))
    hit = np.asarray(i_x) >= 0
    np.testing.assert_allclose(np.asarray(t_p)[hit], np.asarray(t_x)[hit],
                               rtol=1e-5, atol=1e-6)


def test_ray_padding_is_inert():
    """N not divisible by ray_tile: the padded filler rays must not affect
    real outputs."""
    a, b, c = _random_tris(64)
    o, d = _random_rays(77)
    t_p, i_p = nearest_triangle_pallas(o, d, a, b, c, ray_tile=64,
                                       cull=True, interpret=True)
    feats = TriFeatures.build(a, b, c)
    t_x, i_x = nearest_triangle(o, d, feats)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))


def test_pack_features_padding_degenerate():
    a, b, c = _random_tris(100)
    feats, lo, hi, n_clusters = pack_triangle_features(a, b, c)
    assert n_clusters == 1
    assert feats.shape == (16, 128)
    # padded triangle normals are zero -> can never pass det > eps
    np.testing.assert_array_equal(np.asarray(feats[0:3, 100:]), 0.0)
    # cluster box covers real triangles only
    verts = np.concatenate([np.asarray(x) for x in (a, b, c)])
    assert (np.asarray(lo)[0] <= verts.min(0) + 1e-6).all()
    assert (np.asarray(hi)[0] >= verts.max(0) - 1e-6).all()


def test_render_dispatch_pallas_backend(image_compare):
    """Full render through the pallas backend == xla backend."""
    import jax
    from rtm_tpu import (Camera, Material, Mesh, MeshInstance, RenderConfig,
                         Scene, SphereDef, Triangle, build_tracer_scene,
                         render_dispatch)
    from rtm_tpu.models import scenes as builtin

    s = Scene(sky=builtin._procedural_sky())
    s.add_material(Material((0.8, 0.4, 0.2), (1, 1, 1), 0, 0, 0, 1.0, -1))
    s.add_material(Material((1, 1, 1), (1, 1, 1), 0, 0, 2.0, 1.0, -1))
    s.add_sphere(SphereDef((0, 0, -2), 1.0, 0))
    s.add_mesh(Mesh.from_triangles([
        Triangle((-3, -0.5, -4), (3, -0.5, -4), (0, 3, -4)),
        Triangle((-4, -1, -6), (4, -1, -6), (0, -1, 2)),
    ]))
    s.add_object(MeshInstance(mesh_id=0, material_id=1))
    ts = build_tracer_scene(s)
    cfg = RenderConfig(width=32, height=24, max_bounces=3, draw_environment=True)
    cam = Camera().spec(cfg.width, cfg.height)
    img_x = np.asarray(render_dispatch(ts, cam, jnp.uint32(1), cfg, backend="xla"))
    img_p = np.asarray(render_dispatch(ts, cam, jnp.uint32(1), cfg,
                                       backend="pallas_interpret"))
    image_compare(img_p, img_x, tol=1e-3, frac_bad=0.01, mean_tol=1e-3)
