"""Megakernel internal split: time probe builds that disable one stage each
(skip_postpass=True throughout, so only in-kernel time is measured).

  full       production kernel
  noextract  one-hot MXU attribute fetch zeroed (sweep kept live)
  noshade    scatter replaced by mirror bounce (no RNG draws)
  nosweep    triangle sweep skipped (extraction still runs)
  dense      cull disabled (every cluster swept every bounce)

Run: python scripts/kernel_probe.py [res]
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
from rtm_tpu.ops.pallas.megakernel import render_rays_megakernel  # noqa: E402


def timeit(name, f, reps=10):
    out = f(jnp.uint32(1))
    _ = float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for i in range(reps):
        out = f(jnp.uint32(2 + i))
    _ = float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:14s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cfg = RenderConfig(width=res, height=res, max_bounces=8,
                       max_frames=1, draw_environment=True)
    cam = Camera().spec(res, res)
    scene = build_tracer_scene(load_scene(3))
    n = res * res

    def run(fi, probe, cull=True):
        return render_rays_megakernel(
            scene, cam, fi, cfg, pixel_offset=jnp.int32(0), n_rays=n,
            skip_postpass=True, order="static", probe=probe, cull=cull)

    t_full = timeit("full", jax.jit(functools.partial(run, probe="")))
    t_nex = timeit("noextract", jax.jit(functools.partial(run, probe="noextract")))
    t_nsh = timeit("noshade", jax.jit(functools.partial(run, probe="noshade")))
    t_nsw = timeit("nosweep", jax.jit(functools.partial(run, probe="nosweep")))
    t_dense = timeit("dense(nocull)", jax.jit(functools.partial(run, probe="", cull=False)))
    print(f"# extraction ~{1e3*(t_full-t_nex):.1f} ms | "
          f"shading ~{1e3*(t_full-t_nsh):.1f} ms | "
          f"sweep ~{1e3*(t_full-t_nsw):.1f} ms | "
          f"cull saves ~{1e3*(t_dense-t_full):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
