"""Per-iteration cost of Mosaic loop machinery vs dynamic_gather content —
the trav kernel's tuning question: is ~350ns/iteration fixed overhead
(while cond scalar syncs, dynamic addressing) or gather throughput?

Variants (all (8,128) f32, ITERS while_loop iterations, measured by
differencing two iteration counts so tunnel dispatch overhead cancels):
  add1      1 vector add per iter (pure loop overhead)
  any1      1 add + jnp.any -> scalar in the cond path
  gather4   4 chained lane-gathers
  gather4i  4 independent lane-gathers
  gather16i 16 independent lane-gathers (the k-step's fetch shape)
  dynref4   4 reads of tab[j, k, c] with traced k (dynamic leading index)

Run: python scripts/probe_loop_cost.py
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


def bench(name, body_builder, lo=256, hi=2304, reps=30):
    def build(iters):
        def kernel(x_ref, i_ref, tab_ref, o_ref, acc_ref):
            x = x_ref[:, :]
            idx = i_ref[:, :]
            acc_ref[:, :] = x
            body = body_builder(x, idx, tab_ref, acc_ref)

            def w_body(k):
                body(k)
                return k + 1

            jax.lax.while_loop(lambda k: k < iters, w_body, 0)
            o_ref[:, :] = acc_ref[:, :]

        @jax.jit
        def run(x, i, tab):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
            )(x, i, tab)
        return run

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)
    tab = jnp.asarray(rng.standard_normal((4, 8, 8, 128)), jnp.float32)
    times = {}
    for iters in (lo, hi):
        run = build(iters)
        try:
            out = run(x, idx, tab)
            _ = float(np.asarray(out).ravel()[0])
        except Exception as e:
            print(f"{name:10s} FAIL {str(e).splitlines()[0][:90]}",
                  flush=True)
            return
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(x, idx, tab)
        _ = float(np.asarray(out).ravel()[0])
        times[iters] = (time.perf_counter() - t0) / reps
    per = (times[hi] - times[lo]) / (hi - lo)
    print(f"{name:10s} {per*1e9:8.1f} ns/iter", flush=True)


def main():
    def add1(x, idx, tab, acc):
        def body(k):
            acc[:, :] = acc[:, :] * 1.000001 + x
        return body
    bench("add1", add1)

    def gather4(x, idx, tab, acc):
        def body(k):
            g = jnp.take_along_axis(acc[:, :], idx, axis=1)
            g = jnp.take_along_axis(g, idx, axis=1)
            g = jnp.take_along_axis(g, idx, axis=1)
            g = jnp.take_along_axis(g, idx, axis=1)
            acc[:, :] = g + x
        return body
    bench("gather4", gather4)

    def gather4i(x, idx, tab, acc):
        def body(k):
            a = acc[:, :]
            g0 = jnp.take_along_axis(a, idx, axis=1)
            g1 = jnp.take_along_axis(a, (idx + 1) & 127, axis=1)
            g2 = jnp.take_along_axis(a, (idx + 2) & 127, axis=1)
            g3 = jnp.take_along_axis(a, (idx + 3) & 127, axis=1)
            acc[:, :] = (g0 + g1) + (g2 + g3)
        return body
    bench("gather4i", gather4i)

    def gather16i(x, idx, tab, acc):
        def body(k):
            a = acc[:, :]
            s = x
            for j in range(16):
                s = s + jnp.take_along_axis(a, (idx + j) & 127, axis=1)
            acc[:, :] = s * 0.01
        return body
    bench("gather16i", gather16i)

    def dynref4(x, idx, tab, acc):
        def body(k):
            kk = k & 3
            s = x
            for j in range(4):
                s = s + tab[kk, j]
            acc[:, :] = s * 0.25
        return body
    bench("dynref4", dynref4)

    def dyngather4(x, idx, tab, acc):
        def body(k):
            kk = k & 3
            s = x
            for j in range(4):
                s = s + jnp.take_along_axis(tab[kk, j + 2], idx, axis=1)
            acc[:, :] = s * 0.25
        return body
    bench("dyngather4", dyngather4)


if __name__ == "__main__":
    main()
