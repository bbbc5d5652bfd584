"""PCG RNG bit-parity tests (shader:123-151 semantics)."""
import jax.numpy as jnp
import numpy as np

from rtm_tpu.ops import rng


def _pcg_ref(x: int) -> int:
    """Independent integer-arithmetic PCG mirror."""
    state = (x * 747796405 + 2891336453) % 2**32
    shift = (state >> 28) + 4
    word = (((state >> shift) ^ state) * 277803737) % 2**32
    return ((word >> 22) ^ word) % 2**32


def test_pcg_hash_bit_exact():
    seeds = [0, 1, 42, 735529, 2**31, 2**32 - 1, 123456789]
    got = rng.pcg_hash(jnp.asarray(seeds, jnp.uint32))
    want = [_pcg_ref(s) for s in seeds]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want, np.uint32))


def test_pcg_known_chain():
    # chain stability: hashing twice == hash(hash(x))
    s = jnp.uint32(12345)
    h1 = rng.pcg_hash(s)
    h2 = rng.pcg_hash(h1)
    assert int(h2) == _pcg_ref(_pcg_ref(12345))


def test_fast_random_range_and_state():
    seeds = jnp.arange(1000, dtype=jnp.uint32)
    vals, new_seeds = rng.fast_random(seeds)
    v = np.asarray(vals)
    assert (v >= 0).all() and (v <= 1).all()
    # new seed is the hash output itself (shader:132)
    np.testing.assert_array_equal(np.asarray(new_seeds),
                                  np.asarray(rng.pcg_hash(seeds)))
    # value = float(seed)/UINT_MAX in f32
    np.testing.assert_array_equal(
        v, np.asarray(new_seeds).astype(np.float32) / np.float32(4294967295.0))


def test_fast_random_np_matches_jnp():
    v_np, s_np = rng.fast_random_np(999)
    v_j, s_j = rng.fast_random(jnp.uint32(999))
    assert int(s_j) == s_np
    assert np.float32(v_j) == v_np


def test_random_circle_point_in_disk():
    seeds = jnp.arange(512, dtype=jnp.uint32) * jnp.uint32(7919)
    pts, _ = rng.random_circle_point(seeds)
    r = np.linalg.norm(np.asarray(pts), axis=-1)
    assert (r <= 1.0 + 1e-6).all()


def test_random_unit_sphere_is_cube_not_sphere():
    """The reference's 'unit sphere' is a [-1,1]^3 cube sample (shader:148-151)."""
    seeds = jnp.arange(2048, dtype=jnp.uint32)
    v, _ = rng.random_unit_sphere(seeds)
    v = np.asarray(v)
    assert (v >= -1).all() and (v <= 1).all()
    # some samples must lie outside the unit ball (cube corners)
    assert (np.linalg.norm(v, axis=-1) > 1.0).any()


def test_draw_count_parity():
    """circle point = 2 draws, unit sphere = 3 draws."""
    s0 = jnp.uint32(77)
    _, s_after = rng.random_circle_point(s0)
    expect = rng.pcg_hash(rng.pcg_hash(s0))
    assert int(s_after) == int(expect)
    _, s_after3 = rng.random_unit_sphere(s0)
    expect3 = rng.pcg_hash(rng.pcg_hash(rng.pcg_hash(s0)))
    assert int(s_after3) == int(expect3)


def test_pixel_seed():
    x = jnp.asarray([0, 5], jnp.int32)
    y = jnp.asarray([0, 3], jnp.int32)
    fi = jnp.uint32(7)
    s = rng.pixel_seed(x, y, 64, 2, fi)
    want = (np.array([0, 3 * 64 + 5], np.uint64) + np.uint64(2 * 7 * 735529)) % 2**32
    np.testing.assert_array_equal(np.asarray(s), want.astype(np.uint32))
