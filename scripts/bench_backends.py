"""Interleaved A/B backend comparison at the headline config.

Usage: python scripts/bench_backends.py [backend ...]
Defaults to mxu + megakernel + trav + wavefront2 at the BASELINE.md
headline (scene 3, 512x512, 8 bounces, spp 1).

Protocol (VERDICT r3 task 3): after compiling every backend, timed
blocks ALTERNATE between backends round-robin (A B C A B C ...) so slow
device-session drift hits all rows equally, with >=5 blocks per backend;
each row reports the MEDIAN block ms/frame plus min/max spread.  Writes
BENCH_BACKENDS_r04.json.
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
    repeats = int(os.environ.get("RTM_BENCH_REPEATS", 10))
    blocks = int(os.environ.get("RTM_BENCH_BLOCKS", 5))
    backends = sys.argv[1:] or ["mxu", "megakernel", "trav", "wavefront2"]

    from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
    from rtm_tpu.ops.trace_ref import render_dispatch

    cfg = RenderConfig(width=width, height=height, max_bounces=bounces,
                       max_frames=spp, draw_environment=True, accumulate=True)
    scene = build_tracer_scene(load_scene(scene_id))
    cam = Camera().spec(cfg.width, cfg.height)

    # render_dispatch is itself @jax.jit (static cfg/backend, traced
    # scene/cam/frame_index); re-wrapping in a jit that closes over scene
    # would bake the texture tables into the HLO (remote-compile 413s)
    def dispatch(backend, fi):
        return render_dispatch(scene, cam, fi, cfg, backend=backend)

    # phase 1: compile everything up front
    compile_s = {}
    mean_rad = {}
    for backend in backends:
        t0 = time.perf_counter()
        out = dispatch(backend, jnp.uint32(1))
        mean_rad[backend] = float(jnp.asarray(out).mean())
        compile_s[backend] = round(time.perf_counter() - t0, 1)
        print(f"# compiled {backend} in {compile_s[backend]}s "
              f"(mean radiance {mean_rad[backend]:.6f})", flush=True)

    # phase 1.5: one UNTIMED warmup block per backend, round-robin — the
    # first post-compile block can run 3x its steady-state (r4's mxu row
    # carried ms_max 207 from it); discarding it uniformly for every
    # backend keeps the spread honest (VERDICT r4 weak #3 / task 8b)
    fi = 2
    for backend in backends:
        for _ in range(max(2, repeats // 2)):
            out = dispatch(backend, jnp.uint32(fi))
            fi += 1
        jax.block_until_ready(out)
        _ = float(out.ravel()[0])

    # phase 2: interleaved timed blocks (round-robin)
    times = {b: [] for b in backends}
    for blk in range(blocks):
        for backend in backends:
            t0 = time.perf_counter()
            for _ in range(repeats):
                out = dispatch(backend, jnp.uint32(fi))
                fi += 1
            jax.block_until_ready(out)
            _ = float(out.ravel()[0])
            times[backend].append((time.perf_counter() - t0) / repeats * 1e3)

    rows = []
    rays = width * height * spp * bounces
    for backend in backends:
        ts = sorted(times[backend])
        med = ts[len(ts) // 2]
        row = {
            "backend": backend,
            "ms_per_frame": round(med, 3),
            "ms_min": round(ts[0], 3),
            "ms_max": round(ts[-1], 3),
            "grays_per_s": round(rays / med / 1e6, 4),
            "compile_s": compile_s[backend],
            "mean_radiance": round(mean_rad[backend], 6),
            "platform": jax.devices()[0].platform,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out_path = os.environ.get("RTM_BENCH_OUT", "BENCH_BACKENDS_r05.json")
    with open(out_path, "w") as f:
        json.dump({
            "config": f"scene {scene_id} (Cornell+dragon), {width}x{height},"
                      f" {bounces} bounces, spp {spp}, TPU v5e",
            "protocol": f"interleaved round-robin A/B, {blocks} blocks x "
                        f"{repeats} frames per backend, median + min/max "
                        "per row (VERDICT r3 task 3); one untimed "
                        "post-compile warmup block discarded uniformly "
                        "per backend (r4 weak #3)",
            "rows": rows,
        }, f, indent=1)
    print(f"# wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
