"""SAH BVH builder + traversal tests (SURVEY C24, shader:324-484)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rtm_tpu.accel.bvh import (BvhStats, build_bvh, build_bvh_scene,
                               _area, _build_python)
from rtm_tpu.io.assets import asset_path, have_reference_assets
from rtm_tpu.models.mesh import Mesh, MeshInstance, Triangle
from rtm_tpu.models.scene import Scene
from rtm_tpu.ops.bvh_traverse import BvhArrays, bounce_ray_bvh, bvh_traverse
from rtm_tpu.ops.intersect import FLT_MAX, TriFeatures, nearest_triangle


def _random_mesh(n=200, seed=0):
    rs = np.random.RandomState(seed)
    a = rs.rand(n, 3).astype(np.float32) * 10 - 5
    b = a + rs.randn(n, 3).astype(np.float32) * 0.5
    c = a + rs.randn(n, 3).astype(np.float32) * 0.5
    verts = np.stack([a, b, c], axis=1)
    return Mesh(verts, None)


def test_area_quirk():
    """Reference area() is *half* surface area, 0 for inverted boxes."""
    assert _area(np.zeros(3, np.float32), np.array([2, 3, 4], np.float32)) == \
        np.float32(2 * 3 + 3 * 4 + 2 * 4)
    assert _area(np.ones(3, np.float32), np.zeros(3, np.float32)) == 0.0


def test_build_invariants():
    mesh = _random_mesh(500)
    bvh = build_bvh(mesh, use_native=False)
    st = bvh.stats
    st.validate()
    assert st.tri_cnt == 500
    assert sorted(bvh.order.tolist()) == list(range(500))
    # leaf regions tile [0, T) exactly once
    leaves = bvh.buffer_region[bvh.buffer_region[:, 1] > 0]
    covered = np.zeros(500, bool)
    for lo, hi in leaves:
        assert not covered[lo:hi].any()
        covered[lo:hi] = True
    assert covered.all()
    # children contiguous, internal nodes reference in-range children
    internal = bvh.buffer_region[bvh.buffer_region[:, 1] == 0]
    assert (internal[:, 0] + 1 < bvh.num_nodes).all()


def test_leaf_boxes_contain_triangles():
    mesh = _random_mesh(300, seed=1)
    bvh = build_bvh(mesh, use_native=False)
    reordered = mesh.verts[bvh.order]
    for ni in range(bvh.num_nodes):
        lo, hi = bvh.buffer_region[ni]
        if hi == 0 or ni == 0:   # internal, or root (root box = volume)
            continue
        tris = reordered[lo:hi].reshape(-1, 3)
        if len(tris) == 0:
            continue
        assert (tris.min(0) >= bvh.box_min[ni] - 1e-4).all()
        assert (tris.max(0) <= bvh.box_max[ni] + 1e-4).all()


def test_single_triangle_leaf_root():
    mesh = Mesh.from_triangles([Triangle((0, 0, 0), (1, 0, 0), (0, 1, 0))])
    bvh = build_bvh(mesh, use_native=False)
    assert bvh.num_nodes == 1
    assert tuple(bvh.buffer_region[0]) == (0, 1)


def test_traversal_matches_brute_force():
    """BVH traversal == dense sweep on every ray (the builder's end-to-end
    correctness oracle)."""
    mesh = _random_mesh(256, seed=2)
    scene = Scene(meshes=[mesh], objects=[MeshInstance(mesh_id=0)])
    bs = build_bvh_scene(scene)
    arrays = BvhArrays.from_scene(bs)

    rs = np.random.RandomState(3)
    o = rs.randn(128, 3).astype(np.float32) * 8
    d = rs.randn(128, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    max_leaf = max(s.leaf_tris_max for s in bs.stats)
    t_bvh, i_bvh = bvh_traverse(arrays, jnp.uint32(0), jnp.uint32(0),
                                jnp.asarray(o), jnp.asarray(d),
                                max_leaf_tris=max_leaf)

    v = bs.tri_verts
    feats = TriFeatures.build(jnp.asarray(v[:, 0]), jnp.asarray(v[:, 1]),
                              jnp.asarray(v[:, 2]))
    t_dense, i_dense = nearest_triangle(jnp.asarray(o), jnp.asarray(d), feats)

    hit_bvh = np.asarray(i_bvh) >= 0
    hit_dense = np.asarray(i_dense) >= 0
    np.testing.assert_array_equal(hit_bvh, hit_dense)
    both = hit_bvh
    np.testing.assert_allclose(np.asarray(t_bvh)[both], np.asarray(t_dense)[both],
                               rtol=1e-5, atol=1e-5)
    # indices may differ only on exact distance ties
    mismatch = both & (np.asarray(i_bvh) != np.asarray(i_dense))
    assert np.allclose(np.asarray(t_bvh)[mismatch], np.asarray(t_dense)[mismatch])


def test_instanced_traversal_world_units():
    """Instance transforms: t stays in world units (direction not
    renormalized, shader:526-542)."""
    mesh = Mesh.from_triangles([Triangle((-1, -1, 0), (1, -1, 0), (0, 1, 0))])
    inst = MeshInstance(mesh_id=0, position=np.array([0.0, 0.0, -3.0]),
                        scale=np.array([2.0, 2.0, 2.0]))
    scene = Scene(meshes=[mesh], objects=[inst])
    bs = build_bvh_scene(scene)
    arrays = BvhArrays.from_scene(bs)
    o = jnp.asarray([[0.0, 0.0, 2.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, tri, ii = bounce_ray_bvh(arrays, o, d, max_leaf_tris=1)
    assert int(tri[0]) == 0 and int(ii[0]) == 0
    np.testing.assert_allclose(float(t[0]), 5.0, atol=1e-5)  # world distance


@pytest.mark.skipif(not have_reference_assets(), reason="reference assets absent")
def test_dragon_bvh():
    from rtm_tpu.io.mesh_loader import load_mesh
    mesh = load_mesh(asset_path("models", "tinyStanfordDragon.glb"))
    bvh = build_bvh(mesh, use_native=False)
    bvh.stats.validate()
    assert bvh.stats.leaf_cnt > 10
    assert bvh.stats.mean_tris < 32


def test_stats_math():
    s = BvhStats()
    s.measure(3, 5, 1.0)
    s.measure(5, 7, 2.0)
    assert s.leaf_cnt == 2
    assert s.leaf_depth_min == 3 and s.leaf_depth_max == 5
    assert s.mean_depth == 4.0 and s.mean_tris == 6.0
    assert s.sah == 3.0
