"""Megakernel sweep-strategy matrix on the headline config (TPU).

Pipelined timing protocol (bench.py): N dispatches queued, ONE host
readback closes the stream — per-frame sync through the axon tunnel costs
~180ms of RTT and would swamp the measurement.

Run: python scripts/sweep_matrix.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rtm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene  # noqa: E402
from rtm_tpu.ops.pallas.megakernel import render_megakernel  # noqa: E402


def bench(name, fn, reps=10):
    t0 = time.perf_counter()
    out = fn(jnp.uint32(1))
    _ = float(np.asarray(out).ravel()[0])
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(jnp.uint32(2 + i))
    _ = float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.2f} ms/frame  (compile {c:.0f}s)",
          flush=True)
    return dt


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    bounces = 8
    cfg = RenderConfig(width=res, height=res, max_bounces=bounces,
                       max_frames=1, draw_environment=True)
    cam = Camera().spec(res, res)
    s3 = build_tracer_scene(load_scene(3))

    cases = [
        ("static order, tile=512", dict(order="static", ray_tile=512)),
        ("near order,   tile=512", dict(order="near", ray_tile=512)),
        ("static order, tile=256", dict(order="static", ray_tile=256)),
        ("static order, tile=128", dict(order="static", ray_tile=128)),
        ("near order,   tile=128", dict(order="near", ray_tile=128)),
    ]
    for name, kw in cases:
        f = jax.jit(functools.partial(render_megakernel, cfg=cfg, **kw),
                    static_argnames=())
        bench(name, lambda fi, f=f: f(s3, cam, fi))


if __name__ == "__main__":
    main()
