"""Weak-scaling measurement: rays/s vs device count over the sharded
pixel-grid renderer (BASELINE.md protocol: >=90% efficiency target).

Weak scaling: each device always traces the same per-device pixel band
(BAND rows of a WIDTH-wide frame), so the global frame grows with the
mesh.  Efficiency(n) = rays_per_s(n) / (n * rays_per_s(1)).

On this machine the mesh is the virtual CPU fake-multichip (8 devices via
xla_force_host_platform_device_count — tests/conftest.py pattern); on a
real slice the same script measures chip scaling.  Emits a CSV
(devices,rays_per_s,efficiency) to stdout and --out.

Usage: python scripts/scaling.py [--out SCALING.csv] [--band 64]
       [--width 256] [--bounces 4] [--backend xla]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags
                               + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if os.environ.get("RTM_SCALING_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/rtm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene  # noqa: E402
from rtm_tpu.parallel.sharding import make_mesh, render_sharded  # noqa: E402


def count_collectives(hlo_text: str) -> dict:
    """Count cross-device collective ops in compiled HLO."""
    import re
    ops = ("all-reduce", "all-gather", "reduce-scatter",
           "collective-permute", "all-to-all")
    return {op: len(re.findall(rf"\b{op}(?:-start)?\(", hlo_text))
            for op in ops}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING.csv")
    ap.add_argument("--band", type=int, default=64,
                    help="pixel rows per device (weak-scaling unit)")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--scene", type=int, default=3)
    ap.add_argument("--backend", default="xla")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    n_avail = jax.device_count()
    n_cores = os.cpu_count() or 1
    counts = sorted(set(c for c in (1, 2, 4, 8, n_avail) if c <= n_avail))

    scene = build_tracer_scene(load_scene(args.scene))
    rows = []
    base = None
    fwd_collectives = None
    for n_dev in counts:
        cfg = RenderConfig(width=args.width, height=args.band * n_dev,
                           max_bounces=args.bounces, max_frames=1,
                           draw_environment=True)
        cam = Camera().spec(cfg.width, cfg.height)
        mesh = make_mesh(n_dev)

        def run(fi):
            return render_sharded(scene, cam, fi, cfg, mesh,
                                  backend=args.backend)

        if n_dev == counts[-1]:
            # architectural proof of linear weak scaling: the sharded
            # forward contains ZERO cross-device collectives — each chip
            # traces its band independently (scene replicated)
            lowered = render_sharded.lower(scene, cam, jnp.uint32(1), cfg,
                                           mesh, backend=args.backend)
            fwd_collectives = count_collectives(lowered.compile().as_text())

        out = run(jnp.uint32(1))
        _ = float(np.asarray(out).ravel()[0])       # sync through transfer
        t0 = time.perf_counter()
        for i in range(args.repeats):
            out = run(jnp.uint32(2 + i))
        jax.block_until_ready(out)
        _ = float(np.asarray(out).ravel()[0])
        dt = (time.perf_counter() - t0) / args.repeats

        rays = cfg.num_pixels * cfg.max_bounces * cfg.max_frames
        rps = rays / dt
        if base is None:
            base = rps
        eff = rps / (n_dev * base)
        # on a virtual mesh the n devices time-share the physical cores:
        # the throughput ceiling is min(n_dev, cores)/n_dev of ideal
        ceiling = min(n_dev, n_cores) / n_dev
        rows.append((n_dev, rps, eff, eff / ceiling))
        print(f"devices={n_dev}  rays/s={rps/1e6:10.2f}M  "
              f"efficiency={eff:6.1%}  vs-core-ceiling={eff/ceiling:6.1%}",
              flush=True)

    with open(args.out, "w") as f:
        f.write(f"# weak scaling, {args.width}x{args.band}/device, "
                f"scene {args.scene}, {args.bounces} bounces, "
                f"backend={args.backend}, platform="
                f"{jax.devices()[0].platform}, physical_cores={n_cores}\n")
        f.write("# virtual-mesh caveat: devices time-share the physical "
                "cores, so ideal efficiency is min(n,cores)/n; "
                "'eff_vs_ceiling' normalizes by that bound.\n")
        f.write(f"# forward collectives in {counts[-1]}-device HLO: "
                f"{fwd_collectives} (zero by design -> linear weak "
                f"scaling on real chips up to load imbalance)\n")
        f.write("devices,rays_per_s,efficiency,eff_vs_ceiling\n")
        for n_dev, rps, eff, effc in rows:
            f.write(f"{n_dev},{rps:.0f},{eff:.4f},{effc:.4f}\n")
    print(f"wrote {args.out}")
    print(f"forward collectives at {counts[-1]} devices: {fwd_collectives}")
    worst = min(e for _, _, _, e in rows)
    print(f"worst ceiling-normalized efficiency: {worst:.1%} "
          f"({'PASS' if worst >= 0.9 else 'BELOW'} 90% target)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
