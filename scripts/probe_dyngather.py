"""Probe Mosaic's tpu.dynamic_gather (jnp.take_along_axis in-kernel):
which shapes/axes compile on this chip, are they correct, and how fast.

This is the hardware capability that decides whether per-ray (per-LANE)
BVH traversal is implementable: axis=0 gathers along sublanes per lane
(per-lane stack pops / small tables), axis=1 gathers along lanes per
sublane (per-lane fetch from a wide table).

Run: python scripts/probe_dyngather.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(axis, s, l, reps=200, iters=32):
    """gather x (s,l) by idx (s,l) along `axis`, `iters` times in-kernel."""
    def kernel(x_ref, idx_ref, o_ref):
        x = x_ref[:, :]
        idx = idx_ref[:, :]
        def body(i, acc):
            g = jnp.take_along_axis(x, (idx + i) % x.shape[axis], axis=axis)
            return acc + g
        o_ref[:, :] = jax.lax.fori_loop(0, iters, body, jnp.zeros_like(x))

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((s, l), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((s, l)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, (s, l)[axis], (s, l)), jnp.int32)
    name = f"axis={axis} ({s:5d},{l:5d})"
    try:
        out = np.asarray(run(x, idx))
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{name}  FAIL: {msg}", flush=True)
        return
    xn, idxn = np.asarray(x), np.asarray(idx)
    ref = np.zeros_like(xn)
    for i in range(iters):
        ref += np.take_along_axis(xn, (idxn + i) % xn.shape[axis], axis=axis)
    ok = np.allclose(out, ref, rtol=1e-5, atol=1e-5)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(x, idx)
    _ = float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / reps / iters
    per_elem = dt / (s * l) * 1e9
    print(f"{name}  ok={ok}  {dt*1e6:8.2f} us/gather  "
          f"{per_elem:6.3f} ns/elem", flush=True)


def main():
    for axis, s, l in [
        (0, 8, 512), (0, 64, 512), (0, 256, 512), (0, 2048, 512),
        (0, 32, 2048),
        (1, 8, 128), (1, 16, 512), (1, 16, 2048), (1, 8, 2048),
        (1, 40, 2048),
    ]:
        probe(axis, s, l)


if __name__ == "__main__":
    main()
