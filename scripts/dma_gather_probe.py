"""Probe: per-row DMA gather from a big HBM table inside a Pallas kernel.

The texture post-pass is HBM-latency-bound: ~230k random 16B quad-table
rows per frame measured at ~150 ns/row through XLA's gather (35 ms of
the 512^2x8 frame; scripts/postpass_profile.py).  A TPU DMA engine can
have many small copies in flight, so a Pallas kernel that round-robins K
async row copies per ray should hide most of that latency.

This measures ns/row for the DMA-gather kernel at several slot depths vs
the XLA `jnp.take` baseline, on the production table shape (16.7M x 4
i32 = 256 MB, uniform random rows).

Usage: python scripts/dma_gather_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rtm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

ROWS = 16 * 1024 * 1024      # 256 MB table (scene-3 checkered quad table)
# Mosaic HBM memrefs are (1,128)-tiled: a 4-col slice is unsliceable, so
# the table is viewed as (ROWS/32, 128) i32 and the DMA fetches the whole
# 512B tile-row containing the target 16B quad; the 4 target lanes are
# extracted afterwards (XLA take_along_axis on the minor axis).
PACK = 32                    # quad rows per 128-lane tile row
TILE = 1024                  # rows gathered per grid step


STEP = 8 * TILE              # rows gathered per grid step (SMEM block
                             # (8, 1024) satisfies the (8,128) tiling rule)


def make_gather(n, k_slots):
    grid = n // STEP

    def kernel(idx_ref, table_ref, out_ref, sem):
        def row(j):
            # tile-row index of quad row idx: idx // PACK
            return idx_ref[0, j // TILE, j % TILE] // PACK

        def body(j, _):
            s = jax.lax.rem(j, k_slots)

            @pl.when(j >= k_slots)
            def _():
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(row(0), 1)],
                    out_ref.at[0, pl.ds(j - k_slots, 1)],
                    sem.at[s]).wait()

            pltpu.make_async_copy(
                table_ref.at[pl.ds(row(j), 1)],
                out_ref.at[0, pl.ds(j, 1)],
                sem.at[s]).start()
            return 0

        jax.lax.fori_loop(0, STEP, body, 0)

        def drain(j, _):
            s = jax.lax.rem(j, k_slots)
            pltpu.make_async_copy(
                table_ref.at[pl.ds(row(0), 1)],
                out_ref.at[0, pl.ds(j, 1)],
                sem.at[s]).wait()
            return 0

        jax.lax.fori_loop(STEP - k_slots, STEP, drain, 0)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 8, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, STEP, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, STEP, 128), jnp.int32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((k_slots,))],
    )


def main():
    rng = np.random.default_rng(5)
    n = 256 * 1024
    table = jnp.asarray(rng.integers(0, 2 ** 20, (ROWS, 4)), jnp.int32)
    table32 = table.reshape(ROWS // PACK, 128)
    idx = rng.integers(0, ROWS, (n,), dtype=np.int64)
    idx2 = jnp.asarray(idx.reshape(n // STEP, 8, TILE), jnp.int32)
    idx1 = jnp.asarray(idx, jnp.int32)
    results = []

    def timeit(name, f, *args, reps=5):
        out = f(*args)
        _ = np.asarray(out).ravel()[0]
        t0 = time.perf_counter()
        for _i in range(reps):
            out = f(*args)
        _ = np.asarray(out).ravel()[0]
        dt = (time.perf_counter() - t0) / reps
        row = {"variant": name, "ns_per_row": round(dt / n * 1e9, 1),
               "ms_for_230k": round(dt / n * 230e3 * 1e3, 2)}
        print(row, flush=True)
        results.append(row)
        return out

    base = timeit("xla take", jax.jit(lambda t, i: jnp.take(t, i, axis=0)),
                  table, idx1)

    @jax.jit
    def extract(rows32, idx):
        col = (idx % PACK)[:, None] * 4 + jnp.arange(4)[None, :]
        return jnp.take_along_axis(rows32, col, axis=1)

    for k in (2, 4, 8, 16):
        got = timeit(f"pallas dma k={k} (512B rows)",
                     jax.jit(make_gather(n, k)), idx2, table32)
        rows32 = jnp.asarray(got).reshape(n, 128)
        quads = timeit("  + minor-axis extract", extract, rows32, idx1)
        ok = bool(jnp.array_equal(jnp.asarray(quads), jnp.asarray(base)))
        results[-1]["correct"] = ok
        print(f"  correct vs xla: {ok}", flush=True)

    with open("DMA_GATHER_r04.json", "w") as f:
        json.dump({"table_rows": ROWS, "gathered": n, "rows": results}, f,
                  indent=1)
    print("wrote DMA_GATHER_r04.json")


if __name__ == "__main__":
    main()
