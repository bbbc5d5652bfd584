"""Map the XLA TPU gather fast-path envelope: take cost vs table size,
row width, dtype, index count.  Hypothesis from pallas_gather_bench: gathers
from small (VMEM-resident?) tables run ~1000x faster than from large tables.
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
N_IDX = 262144


def timeit(name, fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:56s} {dt*1e3:9.3f} ms", flush=True)
    return dt


idx = jnp.asarray(rng.integers(0, 65536, (N_IDX,)), np.int32)  # reused, mod'd

take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))

for rows_log2 in (16, 18, 20, 22, 24):
    rows = 1 << rows_log2
    ii = jnp.asarray(rng.integers(0, rows, (N_IDX,)), np.int32)
    for width, dt_ in ((8, np.float32), (12, np.float32), (16, np.float32),
                       (12, jnp.bfloat16), (4, np.float32), (3, np.float32)):
        mb = rows * width * (2 if dt_ == jnp.bfloat16 else 4) / 1e6
        if mb > 900:
            continue
        tbl = jnp.asarray(rng.random((rows, width), np.float32)).astype(dt_)
        name = f"take rows=2^{rows_log2} w={width} {jnp.dtype(dt_).name} ({mb:.0f}MB)"
        timeit(name, take, tbl, ii)

print("# done", flush=True)
