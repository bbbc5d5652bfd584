"""Round-2 microbenchmarks: the XLA-side primitive costs that decide the
texture/sort/compaction design (gather, scatter, sort, cumsum, cond-skip).

All at the headline frame scale: N = 512*512 rays, B = 8 bounces.
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

N = 512 * 512
NB = N * 8
rng = np.random.default_rng(0)


def timeit(name, fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.3f} ms", flush=True)
    return dt


TBL = 512 * 512                      # texture quad-table rows

tbl12_f32 = jnp.asarray(rng.random((TBL, 12), np.float32))
tbl12_bf16 = tbl12_f32.astype(jnp.bfloat16)
idx_n = jnp.asarray(rng.integers(0, TBL, (N,)), np.int32)
idx_nb = jnp.asarray(rng.integers(0, TBL, (NB,)), np.int32)
vals_n = jnp.asarray(rng.random((N, 3), np.float32))
keys_nb = jnp.asarray(rng.integers(0, 1 << 20, (NB,)), np.int32)
keys_n = jnp.asarray(rng.integers(0, 1 << 20, (N,)), np.int32)
bits_nb = jnp.asarray(rng.integers(0, 2, (NB,)), np.int32)

timeit("take (N,12) f32, N idx", jax.jit(
    lambda i: jnp.take(tbl12_f32, i, axis=0)), idx_n)
timeit("take (N,12) bf16, N idx", jax.jit(
    lambda i: jnp.take(tbl12_bf16, i, axis=0)), idx_n)
timeit("take (N,12) bf16, 8N idx", jax.jit(
    lambda i: jnp.take(tbl12_bf16, i, axis=0)), idx_nb)
timeit("take (N,12) f32, 8N idx", jax.jit(
    lambda i: jnp.take(tbl12_f32, i, axis=0)), idx_nb)

# 1-wide take (3 separate channel tables)
tbl1 = tbl12_f32[:, 0].copy()
timeit("take (N,) f32 1-wide x3, N idx", jax.jit(
    lambda i: jnp.take(tbl1, i) + jnp.take(tbl1, i + 1) + jnp.take(tbl1, i + 2)
), idx_n)

# scatter-add N rows into (N,3)
timeit("scatter-add (N,3) <- N rows", jax.jit(
    lambda i, v: jnp.zeros((TBL, 3), jnp.float32).at[i].add(v)),
    idx_n, vals_n)

# sort: key-only, key+1 payload, key+4 payloads (N and 8N)
timeit("sort N keys", jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)),
       keys_n)
iota_n = jnp.arange(N, dtype=jnp.int32)


def sortp(k):
    return jax.lax.sort((k, iota_n), num_keys=1)


timeit("sort N keys + 1 payload", jax.jit(sortp), keys_n)


def sortp4(k):
    return jax.lax.sort((k, iota_n, iota_n, iota_n, iota_n), num_keys=1)


timeit("sort N keys + 4 payloads", jax.jit(sortp4), keys_n)
iota_nb = jnp.arange(NB, dtype=jnp.int32)
timeit("sort 8N keys + 1 payload", jax.jit(
    lambda k: jax.lax.sort((k, iota_nb), num_keys=1)), keys_nb)

# gather 16-row f32 state band by permutation (wavefront per-bounce cost)
state = jnp.asarray(rng.random((16, N), np.float32))
perm_n = jnp.asarray(rng.permutation(N).astype(np.int32))
timeit("take (16,N) f32 by perm axis=1", jax.jit(
    lambda p: jnp.take(state, p, axis=1)), perm_n)
stateT = jnp.asarray(np.ascontiguousarray(state.T))
timeit("take (N,16) f32 by perm axis=0", jax.jit(
    lambda p: jnp.take(stateT, p, axis=0)), perm_n)

# cumsum over 8N int32
timeit("cumsum 8N i32", jax.jit(lambda b: jnp.cumsum(b)), bits_nb)

# cond-skip: is XLA conditional actually dynamic?
big = jnp.asarray(rng.random((4096, 4096), np.float32))


def maybe_work(pred):
    return jax.lax.cond(pred, lambda: (big @ big).sum(), lambda: jnp.float32(0))


timeit("cond(False) skipping 4096^3 matmul", jax.jit(maybe_work),
       jnp.array(False))
timeit("cond(True)  running  4096^3 matmul", jax.jit(maybe_work),
       jnp.array(True))

# dynamic while_loop trip count: 8 chunks of 256k-row gather, stop after k
def chunked_gather(k):
    def body(c):
        i, acc = c
        rows = jax.lax.dynamic_slice(idx_nb, (i * N,), (N,))
        g = jnp.take(tbl12_bf16, rows, axis=0).astype(jnp.float32).sum()
        return (i + 1, acc + g)

    return jax.lax.while_loop(lambda c: c[0] < k, body,
                              (jnp.int32(0), jnp.float32(0)))


timeit("while_loop gather 1/8 chunks", jax.jit(chunked_gather), jnp.int32(1))
timeit("while_loop gather 8/8 chunks", jax.jit(chunked_gather), jnp.int32(8))
