"""Microbenchmark TPU gather strategies for texture/sky fetch.

65536 random indices into an (N, C) table, timed per strategy.
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R = 65536
rng = np.random.default_rng(0)


def timeit(name, fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e6:10.1f} us", flush=True)
    return dt


for n in (8192, 524288):
    print(f"--- table N={n}, 65536 indices, 4 taps ---", flush=True)
    tbl3 = jnp.asarray(rng.random((n, 3), np.float32))
    tbl4 = jnp.pad(tbl3, ((0, 0), (0, 1)))
    tbl8 = jnp.pad(tbl3, ((0, 0), (0, 5)))
    tbl128 = jnp.pad(tbl3, ((0, 0), (0, 125)))
    tbl1 = [tbl3[:, c].copy() for c in range(3)]
    idx = jnp.asarray(rng.integers(0, n, (4, R)), np.int32)

    @jax.jit
    def take_rows3(idx, tbl=tbl3):
        return sum(jnp.take(tbl, idx[i], axis=0) for i in range(4))

    @jax.jit
    def take_rows4(idx, tbl=tbl4):
        return sum(jnp.take(tbl, idx[i], axis=0) for i in range(4))[:, :3]

    @jax.jit
    def take_rows8(idx, tbl=tbl8):
        return sum(jnp.take(tbl, idx[i], axis=0) for i in range(4))[:, :3]

    @jax.jit
    def take_rows128(idx, tbl=tbl128):
        return sum(jnp.take(tbl, idx[i], axis=0) for i in range(4))[:, :3]

    @jax.jit
    def take_1d(idx, tbls=tuple(tbl1)):
        outs = []
        for c in range(3):
            outs.append(sum(jnp.take(tbls[c], idx[i]) for i in range(4)))
        return jnp.stack(outs, -1)

    timeit("take (N,3) rows", take_rows3, idx)
    timeit("take (N,4) rows", take_rows4, idx)
    timeit("take (N,8) rows", take_rows8, idx)
    timeit("take (N,128) rows", take_rows128, idx)
    timeit("take 1-D x3 channels", take_1d, idx)

    if n <= 8192:
        @jax.jit
        def onehot_mm(idx, tbl=tbl3):
            acc = 0
            for i in range(4):
                oh = (idx[i][None, :] == jnp.arange(n)[:, None]
                      ).astype(jnp.bfloat16)
                acc = acc + jnp.dot(tbl.T.astype(jnp.bfloat16), oh,
                                    preferred_element_type=jnp.float32)
            return acc.T

        timeit("one-hot bf16 matmul", onehot_mm, idx)
