"""Native (C++/ctypes) BVH builder vs the NumPy reference builder.

Both implement the reference's binned SAH exactly (BVH.cpp:49-258); the
native build must be bit-identical — same node arrays, same triangle
permutation, same stats."""
from __future__ import annotations

import numpy as np
import pytest

from rtm_tpu.accel import bvh as bvh_mod
from rtm_tpu.accel.native import bvh_native
from rtm_tpu.models.mesh import Mesh
from rtm_tpu.models.scenes import _dragon_mesh

pytestmark = pytest.mark.skipif(
    not bvh_native.available(), reason="no native toolchain")


def _rand_mesh(n, seed=0):
    rng = np.random.default_rng(seed)
    verts = rng.standard_normal((n, 3, 3)).astype(np.float32)
    return Mesh(verts, None)


def _assert_same(mesh):
    py = bvh_mod._build_python(mesh)
    nat = bvh_native.build(mesh)
    assert nat is not None
    np.testing.assert_array_equal(nat.order, py.order)
    np.testing.assert_array_equal(nat.box_min, py.box_min)
    np.testing.assert_array_equal(nat.box_max, py.box_max)
    np.testing.assert_array_equal(nat.buffer_region, py.buffer_region)
    assert nat.stats.node_cnt == py.stats.node_cnt
    assert nat.stats.leaf_cnt == py.stats.leaf_cnt
    assert nat.stats.leaf_depth_max == py.stats.leaf_depth_max
    assert nat.stats.leaf_tris_sum == py.stats.leaf_tris_sum
    np.testing.assert_allclose(nat.stats.sah, py.stats.sah, rtol=1e-6)
    nat.stats.validate()


def test_single_triangle():
    _assert_same(_rand_mesh(1))


def test_small_random():
    _assert_same(_rand_mesh(33, seed=1))


def test_medium_random():
    _assert_same(_rand_mesh(500, seed=2))


def test_degenerate_identical_centroids():
    verts = np.tile(np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]],
                             np.float32), (8, 1, 1))
    _assert_same(Mesh(verts, None))


def test_dragon():
    _assert_same(_dragon_mesh())


def test_build_bvh_prefers_native():
    mesh = _rand_mesh(64, seed=3)
    out = bvh_mod.build_bvh(mesh, use_native=True)
    py = bvh_mod._build_python(mesh)
    np.testing.assert_array_equal(out.buffer_region, py.buffer_region)
