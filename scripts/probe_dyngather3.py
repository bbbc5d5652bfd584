"""Marginal cost per dynamic_gather via iteration-count slope (the axon
tunnel costs ~1ms per kernel call, so absolute times are useless; the
difference between a 2k-iter and an 18k-iter kernel isolates per-op cost).

Run: python scripts/probe_dyngather3.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def slope(make_body, name, shape=(8, 128), lo=2048, hi=18432, reps=40):
    def build(iters):
        def kernel(x_ref, i_ref, o_ref):
            x = x_ref[:, :]
            idx = i_ref[:, :]
            body = make_body(x, idx)
            o_ref[:, :] = jax.lax.fori_loop(0, iters, body,
                                            jnp.zeros_like(x))

        @jax.jit
        def run(x, i):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, i)
        return run

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    idx = jnp.asarray(rng.integers(0, shape[1], shape), jnp.int32)

    times = {}
    for iters in (lo, hi):
        run = build(iters)
        try:
            out = run(x, idx)
            _ = float(np.asarray(out).ravel()[0])
        except Exception as e:
            print(f"{name:40s} FAIL {str(e).splitlines()[0][:80]}",
                  flush=True)
            return
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(x, idx)
        _ = float(np.asarray(out).ravel()[0])
        times[iters] = (time.perf_counter() - t0) / reps
    per_iter = (times[hi] - times[lo]) / (hi - lo)
    print(f"{name:40s} {per_iter*1e9:8.2f} ns/iter "
          f"({times[lo]*1e3:.2f} / {times[hi]*1e3:.2f} ms)", flush=True)


def main():
    # 1 lane-gather per iter (plus the index add)
    slope(lambda x, i: (lambda j, a: a + jnp.take_along_axis(
        x, (i + j) & 127, axis=1)), "1x lane gather (8,128)")
    # 4 chained lane-gathers per iter
    def four(x, i):
        def body(j, a):
            g = jnp.take_along_axis(x, (i + j) & 127, axis=1)
            g = g + jnp.take_along_axis(x, (i + j + 1) & 127, axis=1)
            g = g + jnp.take_along_axis(x, (i + j + 2) & 127, axis=1)
            g = g + jnp.take_along_axis(x, (i + j + 3) & 127, axis=1)
            return a + g
        return body
    slope(four, "4x lane gather (8,128)")
    # 1 sublane-gather per iter
    slope(lambda x, i: (lambda j, a: a + jnp.take_along_axis(
        x, (i + j) & 7, axis=0)), "1x sublane gather (8,128)")
    # sublane gather at wide lanes
    slope(lambda x, i: (lambda j, a: a + jnp.take_along_axis(
        x, (i + j) & 7, axis=0)), "1x sublane gather (8,1024)",
        shape=(8, 1024))
    # baseline: same loop, gather replaced by a multiply
    slope(lambda x, i: (lambda j, a: a + x * (i + j).astype(jnp.float32)),
          "baseline mul (8,128)")
    # 8 fma chain baseline for VPU rate
    def fma8(x, i):
        def body(j, a):
            f = i.astype(jnp.float32)
            for _ in range(8):
                a = a * 1.0000001 + f
            return a
        return body
    slope(fma8, "8x fma chain (8,128)")


if __name__ == "__main__":
    main()
