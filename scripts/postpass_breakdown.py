"""Megakernel frame-time split: in-kernel time vs the XLA texture/sky
post-pass, on scene 3 (textured) and its stripped-texture twin.

Run: python scripts/postpass_breakdown.py [res]
"""
from __future__ import annotations

import dataclasses
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


def strip_textures(scene):
    mats = dataclasses.replace(
        scene.materials, texture_id=jnp.full_like(scene.materials.texture_id,
                                                  -1))
    return dataclasses.replace(scene, materials=mats, any_textured=False)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    bounces = int(os.environ.get("RTM_BENCH_BOUNCES", 8))
    cfg = RenderConfig(width=res, height=res, max_bounces=bounces,
                       max_frames=1, draw_environment=True)
    cam = Camera().spec(res, res)
    s3 = build_tracer_scene(load_scene(3))
    s3s = strip_textures(s3)
    n = res * res

    def run(fi, scene, skip):
        return render_rays_megakernel(
            scene, cam, fi, cfg, pixel_offset=jnp.int32(0), n_rays=n,
            skip_postpass=skip)

    f_full = jax.jit(functools.partial(run, skip=False))
    f_kern = jax.jit(functools.partial(run, skip=True))
    a = timeit("s3 textured  full (kernel+postpass)", f_full, s3)
    b = timeit("s3 textured  kernel only", f_kern, s3)
    c = timeit("s3 striptex  full", f_full, s3s)
    d = timeit("s3 striptex  kernel only", f_kern, s3s)
    print(f"# textured postpass {1e3*(a-b):.1f} ms | "
          f"textured-vs-striptex kernel delta {1e3*(b-d):.1f} ms | "
          f"striptex postpass {1e3*(c-d):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
