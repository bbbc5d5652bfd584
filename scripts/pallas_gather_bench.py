"""Decisive microbench: in-kernel tpu.dynamic_gather (via take_along_axis)
as the fast-gather primitive for texture fetch / wavefront permutes.

The lowering (jax 0.9 mosaic) supports 2D gathers where
operand.shape == indices.shape == out.shape, along dim 0 (per-column
sublane gather) or dim 1 (per-row lane gather).  We measure:
  1. correctness of both axes at (8192, 128) f32
  2. throughput: repeated gathers inside a fori_loop (amortizes dispatch)
  3. bf16 + int32 operand support
  4. a realistic "permute (N,C) rows" kernel at N=262144, C=4

Usage: python scripts/pallas_gather_bench.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)


def timeit(name, fn, *args, reps=20):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:48s} {dt*1e3:9.3f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return out, dt


# --- 1. correctness + reps throughput: dim0 gather (8192,128) ---------------
S, L = 8192, 128
tbl = jnp.asarray(rng.random((S, L), np.float32))
idx0 = jnp.asarray(rng.integers(0, S, (S, L)), np.int32)
idx1 = jnp.asarray(rng.integers(0, L, (S, L)), np.int32)


def make_kernel(axis, reps):
    def kernel(tbl_ref, idx_ref, out_ref):
        x = tbl_ref[:]
        i = idx_ref[:]
        def body(k, acc):
            g = jnp.take_along_axis(x + acc * 0.0, i, axis=axis)
            return acc + g
        out_ref[:] = jax.lax.fori_loop(
            0, reps, body, jnp.zeros_like(x)) / reps
    return kernel


def run(axis, reps, t, i):
    return pl.pallas_call(
        make_kernel(axis, reps),
        out_shape=jax.ShapeDtypeStruct(t.shape, t.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i)


try:
    out, dt = timeit("dim0 gather (8192,128) f32 x100-in-kernel",
                     jax.jit(lambda t, i: run(0, 100, t, i)), tbl, idx0)
    ref = np.take_along_axis(np.asarray(tbl), np.asarray(idx0), axis=0)
    err = np.abs(np.asarray(out) - ref).max()
    print(f"  dim0 correctness max err: {err}", flush=True)
    per = dt / 100
    print(f"  => per-gather {per*1e6:.1f} us, "
          f"{S*L/per/1e9:.2f} Gelem/s", flush=True)
except Exception as e:
    print("dim0 FAILED:", repr(e)[:500], flush=True)

try:
    out, dt = timeit("dim1 gather (8192,128) f32 x100-in-kernel",
                     jax.jit(lambda t, i: run(1, 100, t, i)), tbl, idx1)
    ref = np.take_along_axis(np.asarray(tbl), np.asarray(idx1), axis=1)
    err = np.abs(np.asarray(out) - ref).max()
    print(f"  dim1 correctness max err: {err}", flush=True)
except Exception as e:
    print("dim1 FAILED:", repr(e)[:500], flush=True)

# --- 2. bf16 operand --------------------------------------------------------
try:
    tb = tbl.astype(jnp.bfloat16)
    out, dt = timeit("dim0 gather (8192,128) bf16 x100",
                     jax.jit(lambda t, i: run(0, 100, t, i)), tb, idx0)
    ref = np.take_along_axis(np.asarray(tb).astype(np.float32),
                             np.asarray(idx0), axis=0)
    err = np.abs(np.asarray(out).astype(np.float32) - ref).max()
    print(f"  bf16 correctness max err: {err}", flush=True)
except Exception as e:
    print("bf16 FAILED:", repr(e)[:500], flush=True)

# --- 3. realistic permute kernel: out[q,:] = x[perm[q],:], N=262144 C=8 -----
N, C = 262144, 8
state = jnp.asarray(rng.random((N, C), np.float32))
perm = jnp.asarray(rng.permutation(N).astype(np.int32))


def permute_kernel(x_ref, p_ref, out_ref):
    i = jnp.broadcast_to(p_ref[:], (C, N)).T  # (N,C) same idx per column?
    # p_ref is (N,1) -> broadcast to (N,C)
    out_ref[:] = jnp.take_along_axis(x_ref[:], i, axis=0)


def permute(x, p):
    return pl.pallas_call(
        lambda x_ref, p_ref, out_ref: out_ref.__setitem__(
            slice(None),
            jnp.take_along_axis(
                x_ref[:],
                jnp.broadcast_to(p_ref[:].reshape(N, 1), (N, C)),
                axis=0)),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, p)


try:
    out, dt = timeit("pallas permute (262144,8) f32",
                     jax.jit(permute), state, perm)
    ref = np.asarray(state)[np.asarray(perm)]
    err = np.abs(np.asarray(out) - ref).max()
    print(f"  permute correctness max err: {err}", flush=True)
except Exception as e:
    print("permute FAILED:", repr(e)[:500], flush=True)

# --- 4. XLA reference points: take-by-perm + sort ---------------------------
timeit("XLA take (262144,8) by perm axis=0",
       jax.jit(lambda x, p: jnp.take(x, p, axis=0)), state, perm)
keys = jnp.asarray(rng.integers(0, 1 << 20, (N,)), np.int32)
iota = jnp.arange(N, dtype=jnp.int32)
timeit("XLA sort 262144 (key + slot payload)",
       jax.jit(lambda k: jax.lax.sort((k, iota), num_keys=1)), keys)

print("# done", flush=True)
