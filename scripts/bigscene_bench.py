"""Large-scene benchmark (VERDICT r4 task 5): the O(log T) story measured
at the scales where the mxu brute-force kernel is out of its table range.

Scenes: dragon_grid(k) — k^2 instanced Stanford dragons (~1742 tris each):
k=2 (~7k tris), k=3 (~15.7k), k=6 (~62.7k).  All are beyond the mxu
kernel's 2047-triangle table range; trav (O(log T) skip-link traversal)
vs megakernel (O(T) cluster sweep + cull) is the contest, with
wavefront2 as the streaming fallback where the megakernel's VMEM
residents exceed the chip.

Round-5 VMEM discovery that makes k=6 possible AT ALL: the v5e core has
~128MB of physical VMEM; rounds 3-4 ran against Mosaic's default 16MB
scoped limit and believed it was the hardware.  With vmem_limit_bytes
raised (megakernel.VMEM_LIMIT_BYTES), trav's 59MB leaf tables at 62.7k
tris compile and run; the megakernel's one-hot extraction operands grow
~4*ray_tile B/tri and measured 143.96M of 128M at 62.7k — compile OOM,
now guarded by megakernel_fits with a wavefront2 fallback.

Writes BENCH_BIGSCENE_r05.json.  Run on the TPU:
  python scripts/bigscene_bench.py [res] [bounces]
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

from rtm_tpu import Camera, RenderConfig, build_tracer_scene  # noqa: E402
from rtm_tpu.models.scenes import dragon_grid  # noqa: E402
from rtm_tpu.ops.trace_ref import render_dispatch  # noqa: E402

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BOUNCES = int(sys.argv[2]) if len(sys.argv) > 2 else 4
REPS = int(os.environ.get("RTM_BIGSCENE_REPS", 5))


def timeit(f, *args, reps=REPS):
    t0 = time.perf_counter()
    out = f(*args)
    _ = float(np.asarray(out).ravel()[0])
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _i in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    _ = float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / reps, comp


def main():
    cfg = RenderConfig(width=RES, height=RES, max_bounces=BOUNCES,
                       max_frames=1, draw_environment=True)
    cam = Camera().spec(RES, RES)
    rows = []
    for k in (2, 3, 6):
        scene = build_tracer_scene(dragon_grid(k))
        tm = scene.trav_meta
        meta = {"grid": f"{k}x{k}", "n_tris": scene.num_triangles,
                "trav_supported": bool(tm.supported),
                "leaf_k": tm.leaf_k, "n_leaves": tm.n_leaves,
                "n_nodes": tm.n_nodes}
        print(f"# {meta}", flush=True)

        @functools.partial(jax.jit, static_argnames=("backend",))
        def run(fi, scene, backend="trav"):
            return render_dispatch(scene, cam, fi, cfg, backend=backend)

        from rtm_tpu.ops.pallas.megakernel import megakernel_fits
        meta["megakernel_fits"] = bool(megakernel_fits(scene))
        backends = ["trav"] if tm.supported else []
        if meta["megakernel_fits"]:
            backends.append("megakernel")
        else:
            # the dispatch reroutes oversized scenes to wavefront2 —
            # measure what the user actually gets
            backends.append("wavefront2")
            meta["megakernel_note"] = (
                "compile OOM at this size (measured 143.96M of 128M VMEM "
                "at 62.7k tris); render_dispatch auto-falls back to "
                "wavefront2")
        imgs = {}
        for backend in backends:
            try:
                dt, comp = timeit(functools.partial(run, backend=backend),
                                  jnp.uint32(1), scene)
            except Exception as e:                       # record, don't die
                meta[f"{backend}_error"] = str(e)[:300]
                print(f"#   {backend}: FAILED {str(e)[:120]}", flush=True)
                continue
            meta[f"{backend}_ms"] = round(dt * 1e3, 2)
            meta[f"{backend}_compile_s"] = round(comp, 1)
            imgs[backend] = np.asarray(run(jnp.uint32(1), scene,
                                           backend=backend))
            print(f"#   {backend}: {dt*1e3:.2f} ms", flush=True)
        if len(imgs) == 2:
            a, b = imgs.values()
            meta["cross_backend_max_diff"] = round(
                float(np.abs(a - b).max()), 5)
            # The instanced dragons interpenetrate, so near-coincident
            # surfaces are everywhere; the megakernel's approx-reciprocal
            # t-ordering (ordering-only, ~2^-8 — documented in
            # _tri_sweep) flips winners there and the RNG paths diverge.
            # Correctness anchor measured this session: trav (exact
            # ordering) matches the XLA oracle with frac(|diff|>1e-3) =
            # 0.0 on the k=2 grid at this config; megakernel diverges
            # from BOTH on the same ~25% of pixels (mean |diff| 0.0097)
            # — argmin-tie topology noise, not a table bug.
            meta["diff_note"] = ("approx-ordering winner flips on "
                                 "interpenetrating instances; trav == "
                                 "xla oracle exactly (see script)")

        if tm.supported:
            from rtm_tpu.ops.pallas.trav_kernel import (RAY_TILE,
                                                        render_rays_trav)

            @jax.jit
            def stats_run(fi, scene):
                _, (ns, ks, real) = render_rays_trav(
                    scene, cam, fi, cfg, pixel_offset=jnp.int32(0),
                    n_rays=RES * RES, with_stats=True, skip_postpass=True)
                return ns.sum(), ks.sum(), real.sum()

            ns, ks, real = (float(v) for v in stats_run(jnp.uint32(2),
                                                        scene))
            meta["padded_vs_real_ksteps"] = round(
                ks * RAY_TILE / max(real, 1.0), 2)
            print(f"#   padded-vs-real k-steps: "
                  f"{meta['padded_vs_real_ksteps']}", flush=True)
        rows.append(meta)

    out = {
        "config": f"dragon_grid {RES}x{RES} x{BOUNCES} bounces, "
                  f"platform={jax.devices()[0].platform}",
        "rows": rows,
        "vmem_note": (
            "v5e core VMEM is ~128MB physical (measured: a 120MB pallas "
            "scratch compiles with vmem_limit_bytes raised); Mosaic's "
            "default scoped limit is 16MB, which rounds 3-4 mistook for "
            "the hardware ceiling.  trav's 88MB table bound now admits "
            "~100k-triangle scenes (62.7k = 59MB tables, compiled + run "
            "here); the megakernel's one-hot extraction operands scale "
            "~4*ray_tile B/tri and measured 143.96M of 128M at 62.7k — "
            "megakernel_fits guards it with a wavefront2 fallback."),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_BIGSCENE_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
