"""Pin the exact XLA-TPU gather formulations that keep the fast emitter.

Finding so far: take(param_table, param_idx) = 0.03ms; the same gather with
the table closed-over = 6.6ms.  Now test producer/consumer fusion effects:
reshape on the operand, index arithmetic, consumers, bf16, barriers, and the
repo's real sample_quads / sample_texture_array entry points.
All tables passed as jit ARGS.
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

def main():
    rng = np.random.default_rng(0)
    N = 262144
    ROWS = 1 << 22                                   # 4096^2 texels
    tbl = jnp.asarray(rng.random((ROWS, 12), np.float32))
    tbl_bf = tbl.astype(jnp.bfloat16)
    t4d = jnp.asarray(rng.random((1, 2048, 2048, 3), np.float32))  # 4D stack
    idx = jnp.asarray(rng.integers(0, ROWS, (N,)), np.int32)
    y0 = jnp.asarray(rng.integers(0, 2048, (N,)), np.int32)
    x0 = jnp.asarray(rng.integers(0, 2048, (N,)), np.int32)
    u = jnp.asarray(rng.random((N,), np.float32))
    v = jnp.asarray(rng.random((N,), np.float32))
    w1 = jnp.asarray(rng.random((N, 1), np.float32))
    jax.block_until_ready([tbl, tbl_bf, t4d, idx, y0, x0, u, v, w1])


    def timeit(name, fn, *args, reps=20):
        # PROTOCOL (round-4 correction): block_until_ready through the
        # axon tunnel can return while dispatches are still queued, which
        # made gathers look 100-1000x faster than reality in round 3
        # ("0.03 ms" taps).  A host transfer of one element at the end of
        # the timed region forces a full drain; reps amortize the RTT.
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:56s} {dt*1e3:9.3f} ms", flush=True)


    timeit("1 baseline take(param,param)",
           jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tbl, idx)

    timeit("2 reshape-4d operand",
           jax.jit(lambda t, i: jnp.take(t.reshape(-1, 3), i, axis=0)), t4d, idx)

    timeit("3 idx-math producer",
           jax.jit(lambda t, y, x: jnp.take(t, (y * 2048 + x) % ROWS, axis=0)),
           tbl, y0, x0)

    timeit("3b idx-math + barrier(idx)",
           jax.jit(lambda t, y, x: jnp.take(
               t, jax.lax.optimization_barrier((y * 2048 + x) % ROWS), axis=0)),
           tbl, y0, x0)

    timeit("4 consumer math",
           jax.jit(lambda t, i, w: jnp.take(t, i, axis=0) * w + 1.0),
           tbl, idx, w1)

    timeit("5 bf16 take + astype + lerp",
           jax.jit(lambda t, i, w: (lambda q: q[:, 0:3] * w + q[:, 3:6]
                                    * (1 - w))(jnp.take(t, i, axis=0)
                                               .astype(jnp.float32))),
           tbl_bf, idx, w1)

    from rtm_tpu.ops.shade import sample_quads, sample_texture_array

    timeit("6 sample_quads (repo path, f32 quads)",
           jax.jit(lambda t, uu, vv: sample_quads(t, 2048, 2048, uu, vv,
                                                  wrap="repeat")),
           tbl, u, v)

    sizes = jnp.asarray([[2048, 2048]], jnp.int32)
    tid = jnp.zeros((N,), jnp.int32)
    timeit("7 sample_texture_array (repo 4-tap path)",
           jax.jit(lambda t, s, uu, vv: sample_texture_array(t, s, tid, uu, vv)),
           t4d, sizes, u, v)

    # 8: two chained gathers (gather of gather output) — post-pass cumprod shape
    timeit("8 chained take",
           jax.jit(lambda t, i: jnp.take(t, jnp.take(i, i, axis=0) % ROWS,
                                         axis=0)),
           tbl, idx)

    print("# done", flush=True)


if __name__ == "__main__":
    main()
