"""A/B the megakernel cluster-visit order (near vs static) and cull on/off
at the headline config, under a proper outer jit (the bench path), on the
real chip — resolves the round-2 near/static contradiction (VERDICT weak 2).

Run: python scripts/order_ab.py [res] [bounces]
Writes BENCH_BACKENDS-style JSON lines to stdout.
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
from rtm_tpu.ops.pallas.megakernel import render_megakernel  # noqa: E402


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
    cfg = RenderConfig(width=res, height=res, max_bounces=bounces,
                       max_frames=1, draw_environment=True)
    cam = Camera().spec(res, res)
    scene = build_tracer_scene(load_scene(3))

    # scene must be a jit ARG: closing over it bakes the texture tables
    # into the HLO as constants (see bench.py)
    @functools.partial(jax.jit, static_argnames=("order", "cull", "tile"))
    def run(fi, scene, order="near", cull=True, tile=512):
        return render_megakernel(scene, cam, fi, cfg, ray_tile=tile,
                                 cull=cull, order=order)

    for name, kw in [("near-512", dict(order="near")),
                     ("static-512", dict(order="static")),
                     ("nocull-512", dict(order="static", cull=False)),
                     ("near-1024", dict(order="near", tile=1024)),
                     ("near-256", dict(order="near", tile=256))]:
        timeit(name, functools.partial(run, **kw), scene)


if __name__ == "__main__":
    main()
