"""Intersection primitive tests vs closed-form cases and the f64 oracle."""
import jax.numpy as jnp
import numpy as np

import oracle
from rtm_tpu.ops.intersect import (FLT_MAX, TriFeatures, aabb_hit,
                                   nearest_sphere, nearest_triangle,
                                   sphere_hits)


def _r(*rows):
    return jnp.asarray(np.array(rows, np.float32))


class TestSphere:
    def test_head_on(self):
        t = sphere_hits(_r([0, 0, 5]), _r([0, 0, -1]), _r([0, 0, 0]), jnp.asarray([1.0]))
        np.testing.assert_allclose(np.asarray(t), [[4.0]], atol=1e-6)

    def test_behind(self):
        t = sphere_hits(_r([0, 0, 5]), _r([0, 0, 1]), _r([0, 0, 0]), jnp.asarray([1.0]))
        assert np.asarray(t)[0, 0] == FLT_MAX

    def test_miss(self):
        t = sphere_hits(_r([0, 5, 5]), _r([0, 0, -1]), _r([0, 0, 0]), jnp.asarray([1.0]))
        assert np.asarray(t)[0, 0] == FLT_MAX

    def test_inside_negative_root(self):
        """From inside, (-b - sqrt)/2a is negative -> reference reports miss
        (nearest-positive-root only takes the near root, shader:500-507)."""
        t = sphere_hits(_r([0, 0, 0]), _r([0, 0, -1]), _r([0, 0, 0]), jnp.asarray([1.0]))
        assert np.asarray(t)[0, 0] == FLT_MAX

    def test_nearest_first_wins_ties(self):
        o = _r([0, 0, 5])
        d = _r([0, 0, -1])
        centers = _r([0, 0, 0], [0, 0, 0])   # identical spheres
        t, i = nearest_sphere(o, d, centers, jnp.asarray([1.0, 1.0]))
        assert int(i[0]) == 0

    def test_matches_oracle_random(self):
        rs = np.random.RandomState(0)
        o = rs.randn(256, 3).astype(np.float32) * 2
        d = rs.randn(256, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        centers = rs.randn(8, 3).astype(np.float32)
        radii = rs.rand(8).astype(np.float32) + 0.2
        got = np.asarray(sphere_hits(jnp.asarray(o), jnp.asarray(d),
                                     jnp.asarray(centers), jnp.asarray(radii)))
        for s in range(8):
            want = oracle.sphere_hit(o, d, centers[s], radii[s])
            hit = want < FLT_MAX
            np.testing.assert_allclose(got[hit, s], want[hit], rtol=2e-3, atol=2e-4)
            # agreement on hit/miss classification away from grazing rays
            mism = (got[:, s] < FLT_MAX) != hit
            assert mism.mean() < 0.02


class TestTriangle:
    A = np.array([0, 0, 0], np.float32)
    B = np.array([1, 0, 0], np.float32)
    C = np.array([0, 1, 0], np.float32)

    def _feats(self, a=None, b=None, c=None):
        a = self.A if a is None else a
        b = self.B if b is None else b
        c = self.C if c is None else c
        return TriFeatures.build(jnp.asarray([a]), jnp.asarray([b]), jnp.asarray([c]))

    def test_front_hit(self):
        # triangle normal = +z; front face seen from +z side with ray dir -z
        t, i = nearest_triangle(_r([0.2, 0.2, 1.0]), _r([0, 0, -1]), self._feats())
        assert int(i[0]) == 0
        np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-6)

    def test_backface_culled(self):
        t, i = nearest_triangle(_r([0.2, 0.2, -1.0]), _r([0, 0, 1]), self._feats())
        assert int(i[0]) == -1

    def test_outside_barycentric(self):
        t, i = nearest_triangle(_r([0.9, 0.9, 1.0]), _r([0, 0, -1]), self._feats())
        assert int(i[0]) == -1

    def test_edge_inclusive(self):
        """u,v,w >= 0: edges and vertices hit (shader uses >= 0)."""
        t, i = nearest_triangle(_r([0.0, 0.0, 1.0]), _r([0, 0, -1]), self._feats())
        assert int(i[0]) == 0

    def test_first_wins_order(self):
        """Two coincident triangles: buffer order breaks the tie."""
        feats = TriFeatures.build(
            jnp.asarray([self.A, self.A]), jnp.asarray([self.B, self.B]),
            jnp.asarray([self.C, self.C]))
        t, i = nearest_triangle(_r([0.2, 0.2, 1.0]), _r([0, 0, -1]), feats)
        assert int(i[0]) == 0

    def test_chunking_consistency(self):
        rs = np.random.RandomState(1)
        a = rs.randn(300, 3).astype(np.float32)
        b = a + rs.rand(300, 3).astype(np.float32)
        c = a + rs.rand(300, 3).astype(np.float32)
        feats = TriFeatures.build(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
        o = rs.randn(64, 3).astype(np.float32) * 3
        d = rs.randn(64, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        t1, i1 = nearest_triangle(jnp.asarray(o), jnp.asarray(d), feats, chunk=64)
        t2, i2 = nearest_triangle(jnp.asarray(o), jnp.asarray(d), feats, chunk=512)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(t1)[np.asarray(i1) >= 0],
                                   np.asarray(t2)[np.asarray(i2) >= 0])

    def test_f32_sweep_vs_f64_oracle(self):
        """Tolerance study vs the reference's double-precision test
        (SURVEY.md hard part #2): classification flips must be rare and
        t errors small."""
        rs = np.random.RandomState(2)
        a = rs.randn(200, 3).astype(np.float32)
        b = a + rs.randn(200, 3).astype(np.float32) * 0.8
        c = a + rs.randn(200, 3).astype(np.float32) * 0.8
        feats = TriFeatures.build(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
        o = rs.randn(512, 3).astype(np.float32) * 3
        d = rs.randn(512, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        t32, i32 = nearest_triangle(jnp.asarray(o), jnp.asarray(d), feats)

        # f64 oracle brute force
        best_t = np.full(512, oracle.FLT_MAX)
        best_i = np.full(512, -1)
        for ti in range(200):
            t = oracle.triangle_hit(o, d, a[ti], b[ti], c[ti], np.float64)
            upd = t < best_t
            best_t = np.where(upd, t, best_t)
            best_i = np.where(upd, ti, best_i)

        agree = np.asarray(i32) == best_i
        assert agree.mean() > 0.99, f"picked-triangle agreement {agree.mean()}"
        both = agree & (best_i >= 0)
        rel = np.abs(np.asarray(t32)[both] - best_t[both]) / np.maximum(best_t[both], 1e-3)
        # statistical tolerance: random slivers are ill-conditioned in f32
        assert np.median(rel) < 1e-5, f"median rel err {np.median(rel)}"
        assert np.quantile(rel, 0.99) < 2e-2, f"p99 rel err {np.quantile(rel, 0.99)}"


class TestAabb:
    def test_hit_entry_distance(self):
        t = aabb_hit(jnp.asarray([0.0, 0, 5]), jnp.asarray([0.0, 0, -1]),
                     jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]))
        np.testing.assert_allclose(float(t), 4.0, atol=1e-6)

    def test_miss(self):
        t = aabb_hit(jnp.asarray([5.0, 5, 5]), jnp.asarray([0.0, 0, 1]),
                     jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]))
        assert float(t) == FLT_MAX

    def test_inside_negative_near(self):
        """Origin inside the box: tNear < 0 <= tFar -> returns tNear (the
        reference propagates the negative entry distance, shader:316-317)."""
        t = aabb_hit(jnp.asarray([0.0, 0, 0]), jnp.asarray([0.0, 0, -1]),
                     jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]))
        assert float(t) == -1.0
