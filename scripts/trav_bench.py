"""Traversal-kernel bring-up bench: ms/frame + in-kernel step counters at
the headline config, vs the megakernel.

Run: python scripts/trav_bench.py [res] [bounces] [scene]
"""
from __future__ import annotations

import functools
import json
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
from rtm_tpu.ops.trace_ref import render_dispatch  # noqa: E402


def timeit(name, f, scene, reps=10):
    t0 = time.perf_counter()
    out = f(jnp.uint32(1), scene)
    _ = float(np.asarray(out).ravel()[0])
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(reps):
        out = f(jnp.uint32(2 + i), scene)
    jax.block_until_ready(out)
    _ = float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"variant": name, "ms_frame": round(dt * 1e3, 2),
                      "compile_s": round(comp, 1)}), flush=True)
    return dt


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    bounces = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sid = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cfg = RenderConfig(width=res, height=res, max_bounces=bounces,
                       max_frames=1, draw_environment=True)
    cam = Camera().spec(res, res)
    scene = build_tracer_scene(load_scene(sid))
    print(f"# meta={scene.trav_meta}", flush=True)

    @functools.partial(jax.jit, static_argnames=("backend",))
    def run(fi, scene, backend="trav"):
        return render_dispatch(scene, cam, fi, cfg, backend=backend)

    timeit("trav", functools.partial(run, backend="trav"), scene)

    # in-kernel step counters (one non-jit stats dispatch)
    from rtm_tpu.ops.pallas.trav_kernel import RAY_TILE, render_rays_trav

    @jax.jit
    def stats_run(fi, scene):
        _, (ns, ks) = render_rays_trav(
            scene, cam, fi, cfg, pixel_offset=jnp.int32(0),
            n_rays=res * res, with_stats=True, skip_postpass=True)
        return jnp.stack([ns, ks])

    st = np.asarray(stats_run(jnp.uint32(2), scene))
    n_tiles = (res * res) // RAY_TILE
    rays = res * res * bounces
    print(f"# node-phase iters/tile (all bounces+frames): "
          f"mean {st[0].mean():.1f} max {st[0].max():.0f}", flush=True)
    print(f"# leaf k-steps/tile: mean {st[1].mean():.1f} "
          f"max {st[1].max():.0f}  "
          f"(= {st[1].mean()/bounces:.1f}/bounce, "
          f"{st[1].sum()*RAY_TILE/rays:.1f} padded tri-tests/ray-bounce "
          f"IF all lanes live)", flush=True)

    timeit("megakernel", functools.partial(run, backend="megakernel"),
           scene)


if __name__ == "__main__":
    main()
