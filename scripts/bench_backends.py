"""Compare forward backends on the real device at the headline config.

Usage: python scripts/bench_backends.py [backend ...]
Defaults to megakernel + wavefront at the BASELINE.md headline
(scene 3, 512x512, 8 bounces, spp 1).  Prints one JSON line per backend.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("RTM_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["RTM_BENCH_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("RTM_JAX_CACHE", "/tmp/rtm_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def main() -> None:
    width = int(os.environ.get("RTM_BENCH_WIDTH", 512))
    height = int(os.environ.get("RTM_BENCH_HEIGHT", 512))
    bounces = int(os.environ.get("RTM_BENCH_BOUNCES", 8))
    spp = int(os.environ.get("RTM_BENCH_SPP", 1))
    scene_id = int(os.environ.get("RTM_BENCH_SCENE", 3))
    repeats = int(os.environ.get("RTM_BENCH_REPEATS", 20))
    backends = sys.argv[1:] or ["wavefront2", "megakernel"]

    from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
    from rtm_tpu.ops.trace_ref import render_dispatch

    cfg = RenderConfig(width=width, height=height, max_bounces=bounces,
                       max_frames=spp, draw_environment=True, accumulate=True)
    scene = build_tracer_scene(load_scene(scene_id))
    cam = Camera().spec(cfg.width, cfg.height)

    for backend in backends:
        # render_dispatch is itself @jax.jit (static cfg/backend, traced
        # scene/cam/frame_index), so each repeat hits the compiled
        # executable; re-wrapping in another jit whose lambda closes over
        # scene would bake the scene arrays into the HLO as constants
        # (25MB+ of texture tables -> remote-compile 413s).
        def dispatch(fi):
            return render_dispatch(scene, cam, fi, cfg, backend=backend)

        t0 = time.perf_counter()
        out = dispatch(jnp.uint32(1))
        _ = float(jnp.asarray(out).ravel()[0])
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        for i in range(repeats):
            out = dispatch(jnp.uint32(2 + i))
        jax.block_until_ready(out)
        mean = float(out.mean())
        dt = time.perf_counter() - t0

        rays = width * height * spp * bounces * repeats
        print(json.dumps({
            "backend": backend,
            "ms_per_frame": round(1e3 * dt / repeats, 3),
            "grays_per_s": round(rays / dt / 1e9, 4),
            "compile_s": round(compile_s, 1),
            "mean_radiance": round(mean, 6),
            "platform": jax.devices()[0].platform,
        }), flush=True)


if __name__ == "__main__":
    main()
