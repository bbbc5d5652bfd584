"""MXU kernel internal split: time probe builds that disable one stage
each (skip_postpass=True throughout, so only in-kernel time is measured).

  full          production kernel
  nocull        chunk cull disabled (every chunk matmul+swept every bounce)
  nomm          pair matmuls skipped (sweep reads stale scratch)
  nosweep       min-sweep reduced to one 8-row consume (matmul kept live)
  nogather      winner attribute gathers replaced by CONSTANTS — WARNING:
                lets the compiler constant-fold the downstream shading and
                overstates the stage ~3x; kept as the cautionary datum
  cheapgather   dataflow-preserving stub (results still depend on win +
                tables) — the honest gather-section attribution
  ghalf         5 of 8 lookups real (marginal-lookup-cost probe)
  gtree/gcull/gloop  gather-section restructures (all measured washes —
                MXU_SPLIT_r05.json)
  noscatter     scatter_step replaced by ray passthrough (no RNG)
  mirrorscatter dataflow-preserving scatter stub (mirror reflect)
  nosph         sphere SMEM loop skipped

Each variant rebuilds the kernel via RTM_MXU_PROBE; combine with '+'
("cheapgather+mirrorscatter").  Deltas vs `full` isolate the stage.
PROTOCOL: cross-process medians on the tunnel drift up to +-30%; compile
every variant you intend to compare in ONE process and interleave the
timed blocks (this script times variants sequentially — use it for quick
scans, quote only in-process interleaved numbers; MXU_SPLIT_r05.json).
Timing contract: drained host read inside the timed region (the round-4
honest-timing protocol).

Run on the TPU: python scripts/mxu_probe.py [res] [variant,variant,...]
"""
from __future__ import annotations

import importlib
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
from rtm_tpu.ops.pallas.mxu_kernel import render_rays_mxu  # noqa: E402

VARIANTS = ("full", "nocull", "nosweep", "nomm", "nogather", "noscatter",
            "nosph")


def timeit(name, f, reps=15, blocks=3):
    t0 = time.perf_counter()
    out = f(jnp.uint32(1))
    _ = float(np.asarray(out).ravel()[0])
    comp = time.perf_counter() - t0
    rates = []
    for _b in range(blocks):
        t0 = time.perf_counter()
        for i in range(reps):
            out = f(jnp.uint32(2 + i))
        jax.block_until_ready(out)
        _ = float(np.asarray(out).ravel()[0])
        rates.append((time.perf_counter() - t0) / reps)
    rates.sort()
    dt = rates[len(rates) // 2]
    print(f"{name:12s} {dt*1e3:9.2f} ms  (compile {comp:.0f}s)", flush=True)
    return dt * 1e3


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    bounces = int(os.environ.get("RTM_BENCH_BOUNCES", 8))
    cfg = RenderConfig(width=res, height=res, max_bounces=bounces,
                       max_frames=1, draw_environment=True)
    cam = Camera().spec(res, res)
    scene = build_tracer_scene(load_scene(3))
    n = res * res
    results = {}
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else VARIANTS
    for variant in only:
        # combined variants: "nogather+noscatter" disables both stages
        os.environ["RTM_MXU_PROBE"] = (
            "" if variant == "full" else variant.replace("+", ","))
        # the probe env is read at kernel BUILD time; a fresh jit wrapper
        # (new hash via the variant name) forces a rebuild
        fn = jax.jit(lambda fi, sc, _v=variant: render_rays_mxu(
            sc, cam, fi, cfg, pixel_offset=jnp.int32(0), n_rays=n,
            skip_postpass=True) + (0.0 * len(_v)))
        results[variant] = timeit(variant, lambda fi: fn(fi, scene))
    os.environ["RTM_MXU_PROBE"] = ""
    if "full" in results:
        full = results["full"]
        for k, v in results.items():
            if k != "full":
                print(f"  stage {k[2:]:10s} ~ {full - v:+7.2f} ms")


if __name__ == "__main__":
    main()
