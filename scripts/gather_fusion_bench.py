"""Confirm the XLA-TPU gather fusion cliff: a bare `take` is ~0.03 ms, but a
take FUSED into consumer elementwise ops (e.g. summed bilinear taps) was
measured at ~45 ms.  Tests optimization_barrier as the defusion fix.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("RTM_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["RTM_BENCH_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/tmp/rtm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
N = 262144
ROWS = 1 << 22
tbl = jnp.asarray(rng.random((ROWS, 12), np.float32))
tbl3 = jnp.asarray(rng.random((ROWS, 3), np.float32))
idx4 = jnp.asarray(rng.integers(0, ROWS, (4, N)), np.int32)
w = jnp.asarray(rng.random((N, 1), np.float32))


def timeit(name, fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:56s} {dt*1e3:9.3f} ms", flush=True)
    return dt


# 1. bare take, result returned directly (known fast)
timeit("bare take (N,12)", jax.jit(lambda i: jnp.take(tbl, i[0], axis=0)),
       idx4)

# 2. sum of 4 takes (the old micro_bench shape — suspected fused-slow)
timeit("4 takes + sum (fused?)",
       jax.jit(lambda i: sum(jnp.take(tbl3, i[k], axis=0) for k in range(4))),
       idx4)

# 3. same with optimization_barrier after each take
def barrier_sum(i):
    acc = 0.0
    for k in range(4):
        g = jnp.take(tbl3, i[k], axis=0)
        g = jax.lax.optimization_barrier(g)
        acc = acc + g
    return acc

timeit("4 takes + barrier + sum", jax.jit(barrier_sum), idx4)

# 4. realistic bilinear: take (N,12) then lerp math, fused vs barrier
def bilerp(i, bar):
    q = jnp.take(tbl, i[0], axis=0)
    if bar:
        q = jax.lax.optimization_barrier(q)
    top = q[:, 0:3] * (1.0 - w) + q[:, 3:6] * w
    bot = q[:, 6:9] * (1.0 - w) + q[:, 9:12] * w
    return top * (1.0 - w) + bot * w

timeit("quad take + lerp (fused?)", jax.jit(lambda i: bilerp(i, False)), idx4)
timeit("quad take + lerp + barrier", jax.jit(lambda i: bilerp(i, True)), idx4)

# 5. index math feeding the take (producer fusion) + barrier on indices too
def full(i, bar):
    ii = (i[0] * 7 + 3) % ROWS
    if bar:
        ii = jax.lax.optimization_barrier(ii)
    q = jnp.take(tbl, ii, axis=0)
    if bar:
        q = jax.lax.optimization_barrier(q)
    return q * w

timeit("idxmath + take + mul (fused?)", jax.jit(lambda i: full(i, False)),
       idx4)
timeit("idxmath + take + mul + barriers", jax.jit(lambda i: full(i, True)),
       idx4)

print("# done", flush=True)
