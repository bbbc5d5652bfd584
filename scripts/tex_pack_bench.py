"""Texture quad-table row-format A/B: the tap is latency-bound on random
rows, so fewer bytes/row only helps if the narrow format stays on XLA's
fast gather emitter.  Candidates:

  f32x12 (+pad 16)   current production: 48B rows (64 padded)
  u8x16              round-1 attempt: 16B rows — fell off the fast path
  i32x4              u8 texels bit-packed into 4 i32 lanes: 16B rows in a
                     32-bit dtype (the fast-path dtype), VPU shift/mask
                     unpack after the gather

Run: python scripts/tex_pack_bench.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rtm_jax_cache")

ROWS = 4096 * 4096
TAPS = 8 * 512 * 512


def bench(name, fn, *args, reps=10):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(np.asarray(out))        # tunnel-honest sync (block_until_ready
    t0 = time.perf_counter()          # can return early through axon)
    for _ in range(reps):
        out = f(*args)
    _ = float(np.asarray(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1e3:8.2f} ms   ({TAPS/dt/1e6:7.1f} Mtaps/s)",
          flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (TAPS,), 0, ROWS, dtype=jnp.int32)
    fx = jax.random.uniform(key, (TAPS, 1))
    fy = jax.random.uniform(key, (TAPS, 1))

    tab_f32 = jnp.zeros((ROWS, 16), jnp.float32)
    tab_f32_12 = jnp.zeros((ROWS, 12), jnp.float32)
    tab_i32 = jnp.zeros((ROWS, 4), jnp.int32)
    tab_u8 = jnp.zeros((ROWS, 16), jnp.uint8)

    def f32_tap(tab, idx, fx, fy):
        q = jnp.take(tab, idx, axis=0)
        top = q[:, 0:3] * (1.0 - fx) + q[:, 3:6] * fx
        bot = q[:, 6:9] * (1.0 - fx) + q[:, 9:12] * fx
        return (top * (1.0 - fy) + bot * fy).sum()

    def u8_tap(tab, idx, fx, fy):
        q = jnp.take(tab, idx, axis=0).astype(jnp.float32) / 255.0
        top = q[:, 0:3] * (1.0 - fx) + q[:, 3:6] * fx
        bot = q[:, 6:9] * (1.0 - fx) + q[:, 9:12] * fx
        return (top * (1.0 - fy) + bot * fy).sum()

    def i32_tap(tab, idx, fx, fy):
        q = jnp.take(tab, idx, axis=0)                      # (N,4) i32
        # each i32 packs one texel's (r,g,b) in bytes 0..2
        texels = []
        for c in range(4):
            w = q[:, c]
            r = (w & 0xFF).astype(jnp.float32)
            g = ((w >> 8) & 0xFF).astype(jnp.float32)
            b = ((w >> 16) & 0xFF).astype(jnp.float32)
            texels.append(jnp.stack([r, g, b], axis=-1) / 255.0)
        top = texels[0] * (1.0 - fx) + texels[1] * fx
        bot = texels[2] * (1.0 - fx) + texels[3] * fx
        return (top * (1.0 - fy) + bot * fy).sum()

    # index the 12 used lanes INSIDE the jit so the gather really reads
    # 64B-stride rows (an eager tab[:, :12] slice would materialize a
    # compact 48B-row copy and benchmark the f32x12 case twice)
    def f32x16_tap(tab, idx, fx, fy):
        q = jnp.take(tab, idx, axis=0)
        top = q[:, 0:3] * (1.0 - fx) + q[:, 3:6] * fx
        bot = q[:, 6:9] * (1.0 - fx) + q[:, 9:12] * fx
        return (top * (1.0 - fy) + bot * fy).sum()

    bench("f32x16 rows (64B)", f32x16_tap, tab_f32, idx, fx, fy)
    bench("f32x12 rows (48B)", f32_tap, tab_f32_12, idx, fx, fy)
    bench("i32x4 rows (16B, packed)", i32_tap, tab_i32, idx, fx, fy)
    bench("u8x16 rows (16B)", u8_tap, tab_u8, idx, fx, fy)


if __name__ == "__main__":
    main()
