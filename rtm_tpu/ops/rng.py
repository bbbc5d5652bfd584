"""PCG-hash per-pixel RNG, bit-exact with the reference device kernel.

Reference semantics (RayTracing/assets/shaders/RayTracing.shader:123-151):

  uint PCGhash(uint s)   { state = s*747796405u + 2891336453u;
                           word = ((state >> ((state>>28)+4)) ^ state) * 277803737u;
                           return (word >> 22) ^ word; }
  float fastRandom(seed) { seed = PCGhash(seed); return float(seed)/4294967295.0; }
  vec3  fastRandom3      -> three sequential draws (x, y, z)
  vec2  randomCirclePoint-> angle = draw*2*PI; (cos,sin) * sqrt(draw)   [2 draws]
  vec3  randomUnitSpehere-> 2*fastRandom3 - 1  (NOT normalized!)        [3 draws]

Seed state threads through every draw; per-pixel seed init is
  seed = uint(y * Resolution.x + x) + frame * FrameIndex * 735529   (shader:697)
with uint32 wraparound, and `seed += bounce` at each bounce (shader:659).

All functions below are pure: they take a uint32 seed array and return
(value, new_seed) so they vectorize over any pixel-lane shape and work both in
plain jnp and inside Pallas kernels.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

UINT_MAX_F = np.float32(4294967295.0)
PI = np.float32(np.pi)
SEED_STRIDE = np.uint32(735529)  # shader:697 magic


def pcg_hash(seed):
    """uint32 -> uint32 PCG output hash (shader:123-128)."""
    seed = seed.astype(jnp.uint32)
    state = seed * jnp.uint32(747796405) + jnp.uint32(2891336453)
    shift = (state >> jnp.uint32(28)) + jnp.uint32(4)
    word = ((state >> shift) ^ state) * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def fast_random(seed):
    """(value in [0,1] f32, new_seed). shader:130-134."""
    seed = pcg_hash(seed)
    return seed.astype(jnp.float32) / UINT_MAX_F, seed


def fast_random3(seed):
    """((...,3) f32, new_seed): three sequential draws. shader:136-139."""
    x, seed = fast_random(seed)
    y, seed = fast_random(seed)
    z, seed = fast_random(seed)
    return jnp.stack([x, y, z], axis=-1), seed


def random_circle_point(seed):
    """((...,2) f32 point in unit disk, new_seed). shader:141-146."""
    r1, seed = fast_random(seed)
    angle = r1 * (jnp.float32(2.0) * PI)
    r2, seed = fast_random(seed)
    radius = jnp.sqrt(r2)
    return jnp.stack([jnp.cos(angle) * radius, jnp.sin(angle) * radius], axis=-1), seed


def random_unit_sphere(seed):
    """((...,3) f32 in [-1,1]^3 — intentionally NOT normalized (shader:148-151)."""
    v, seed = fast_random3(seed)
    return jnp.float32(2.0) * v - jnp.float32(1.0), seed


def pixel_seed(x, y, width, frame, frame_index):
    """Initial per-pixel seed (shader:697).

    The shader computes `uint(index.y * Resolution.x + index.x)` in float32
    (Resolution is a vec2) then casts; for resolutions where y*W+x < 2^24 the
    float round-trip is exact, so we compute in integers directly.
    `frame` is the 1-based sample index within the dispatch, `frame_index` the
    1-based accumulation frame counter.
    """
    lin = (y.astype(jnp.uint32) * jnp.uint32(width) + x.astype(jnp.uint32))
    return lin + jnp.uint32(frame) * frame_index.astype(jnp.uint32) * SEED_STRIDE


# ---------------------------------------------------------------------------
# NumPy scalar mirror (host-side golden values for tests)
# ---------------------------------------------------------------------------

def pcg_hash_np(seed: int) -> int:
    state = (seed * 747796405 + 2891336453) & 0xFFFFFFFF
    shift = ((state >> 28) + 4) & 0xFFFFFFFF
    word = (((state >> shift) ^ state) * 277803737) & 0xFFFFFFFF
    return ((word >> 22) ^ word) & 0xFFFFFFFF


def fast_random_np(seed: int):
    seed = pcg_hash_np(seed)
    return np.float32(np.float32(seed) / UINT_MAX_F), seed
