"""A/B the two gather regimes: 0.025ms (envelope bench) vs 6.5ms (fusion
bench) for the same (2^22,12) f32 take with 262144 indices.

Variables: (a) table as jit arg vs closed-over constant; (b) identical
index array every rep vs 20 distinct arrays (detects any result caching in
the axon tunnel); (c) donated/undonated.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rtm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
N = 262144
ROWS = 1 << 22
tbl = jnp.asarray(rng.random((ROWS, 12), np.float32))
idx_same = jnp.asarray(rng.integers(0, ROWS, (N,)), np.int32)
idx_many = [jnp.asarray(rng.integers(0, ROWS, (N,)), np.int32)
            for _ in range(20)]
jax.block_until_ready([tbl, idx_same] + idx_many)


def timeit(name, fn, argss, reps=20):
    out = jax.block_until_ready(fn(*argss[0]))
    t0 = time.perf_counter()
    for k in range(reps):
        out = fn(*argss[k % len(argss)])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:56s} {dt*1e3:9.3f} ms", flush=True)


take_arg = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
take_clo = jax.jit(lambda i: jnp.take(tbl, i, axis=0))

timeit("arg-table, same idx", take_arg, [(tbl, idx_same)])
timeit("arg-table, 20 distinct idx", take_arg,
       [(tbl, i) for i in idx_many])
timeit("closure-table, same idx", take_clo, [(idx_same,)])
timeit("closure-table, 20 distinct idx", take_clo,
       [(i,) for i in idx_many])
print("# done", flush=True)
