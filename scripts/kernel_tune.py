"""Megakernel tuning sweep on the attached TPU: ray-tile width x SAH
treelet size, kernel-only (no post-pass) at the headline config.

Run: python scripts/kernel_tune.py [res]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("RTM_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["RTM_BENCH_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/tmp/rtm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene  # noqa: E402
from rtm_tpu.ops.pallas.megakernel import render_rays_megakernel  # noqa: E402


def timeit(name, fn, *args, reps=10):
    t0 = time.perf_counter()
    out = fn(jnp.uint32(1), *args)
    _ = float(np.asarray(out).ravel()[0])
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(jnp.uint32(2 + i), *args)
    jax.block_until_ready(out)
    _ = float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.2f} ms  (compile {c:.0f}s)", flush=True)
    return dt


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    bounces = int(os.environ.get("RTM_BENCH_BOUNCES", 8))
    cfg = RenderConfig(width=res, height=res, max_bounces=bounces,
                       max_frames=1, draw_environment=True)
    cam = Camera().spec(res, res)
    n = res * res

    host = load_scene(3)
    for max_tris in (128, 64, 32):
        scene = build_tracer_scene(host, cluster_max_tris=max_tris)
        n_cl = len(scene.cluster_slices)
        for tile in (512, 1024, 256):
            if max_tris != 128 and tile != 512:
                continue                       # sweep the two axes separately

            def run(fi, sc, _t=tile):
                return render_rays_megakernel(
                    sc, cam, fi, cfg, pixel_offset=jnp.int32(0), n_rays=n,
                    ray_tile=_t, skip_postpass=True)

            timeit(f"treelet<={max_tris:3d} ({n_cl:2d} cl) tile={tile}",
                   jax.jit(run), scene)


if __name__ == "__main__":
    main()
