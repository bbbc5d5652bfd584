"""Speed-of-light ledger for the headline frame (VERDICT r4 task 3): the
quantified artifact behind any ceiling claim.

Measures, on hardware, the three coarse phases of the production mxu
forward (kernel, compact post-pass, whole frame) and the grad path, then
does the bytes/FLOPs/taps arithmetic against v5e peaks per phase:

  * bf16 MXU peak        197 TFLOP/s   (v5e, one chip)
  * HBM bandwidth        819 GB/s
  * gather engine        ~10 ns/issued row (measured r4/r5, order-blind —
                         the texel-locality experiment in POSTPASS_r05
                         measured sorted vs random rows a wash)

Writes ROOFLINE_r05.json with the per-phase ledger, the implied best-case
Grays/s under (a) this architecture, (b) zero post-pass, (c) x8 chips —
README's ceiling paragraph cites this file instead of prose arithmetic.

Run on the TPU: python scripts/roofline.py
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
jax.config.update("jax_compilation_cache_dir", "/tmp/rtm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene  # noqa: E402
import rtm_tpu.ops.pallas.megakernel as M  # noqa: E402
import rtm_tpu.ops.pallas.mxu_kernel as MX  # noqa: E402
from rtm_tpu.ops.pallas.mxu_kernel import KS, Q, RAY_TILE, render_rays_mxu  # noqa: E402

RES, BOUNCES = 512, 8
PEAK_BF16 = 197e12           # v5e MXU, FLOP/s
PEAK_HBM = 819e9             # v5e, B/s
GATHER_NS = 10.0             # measured sustained ns per issued gather row


def timeit(f, *args, reps=20, blocks=3):
    out = f(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    rates = []
    for _b in range(blocks):
        t0 = time.perf_counter()
        for _i in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        rates.append((time.perf_counter() - t0) / reps)
    rates.sort()
    return rates[len(rates) // 2] * 1e3          # median ms


def main():
    cfg = RenderConfig(width=RES, height=RES, max_bounces=BOUNCES,
                       max_frames=1, draw_environment=True)
    cam = Camera().spec(RES, RES)
    scene = build_tracer_scene(load_scene(3))
    n = RES * RES
    mm = scene.mxu_meta
    rays = n * BOUNCES

    # ---- measured phase walls (scene as a jit ARG — closing over it
    # bakes the 268MB texture tables into the HLO: HTTP 413) -------------
    full_j = jax.jit(lambda fi, sc: render_rays_mxu(
        sc, cam, fi, cfg, pixel_offset=jnp.int32(0), n_rays=n))
    kern_j = jax.jit(lambda fi, sc: render_rays_mxu(
        sc, cam, fi, cfg, pixel_offset=jnp.int32(0), n_rays=n,
        skip_postpass=True))
    ms_full = timeit(full_j, jnp.uint32(1), scene)
    ms_kernel = timeit(kern_j, jnp.uint32(1), scene)
    ms_postpass = ms_full - ms_kernel

    # ---- record statistics (tap counts) ---------------------------------
    outs = {}
    orig = MX.mega_postpass

    def capture(color, miss, rec, scene_, cfg_, n_):
        outs["rec"], outs["miss"] = rec, miss
        return orig(color, miss, rec, scene_, cfg_, n_)

    MX.mega_postpass = capture
    try:
        # eager (unjitted) call: the capture needs concrete arrays
        _ = np.asarray(render_rays_mxu(
            scene, cam, jnp.uint32(1), cfg, pixel_offset=jnp.int32(0),
            n_rays=n))
    finally:
        MX.mega_postpass = orig
    rec = np.asarray(outs["rec"])
    texid = rec[6::8, :n]
    s_abs = np.abs(rec[0::8, :n]) + np.abs(rec[1::8, :n]) + np.abs(
        rec[2::8, :n])
    n_sig = int(((texid > -0.5) | (s_abs > 0)).sum())
    n_tex = int((texid > -0.5).sum())
    n_slots = int(texid.size)

    # ---- kernel arithmetic ----------------------------------------------
    # pair-test matmuls (upper bound: cull off — the committed census
    # measured secondary bounces still need ~65-70% of chunks)
    n_tiles = n // RAY_TILE
    mm_flops_nocull = (mm.nc * (Q * 128) * KS * RAY_TILE * 2
                       * n_tiles * BOUNCES)
    cull_keep = 0.7                        # census (MXU_PREFILTER_r04)
    mm_flops = mm_flops_nocull * cull_keep
    mm_floor_ms = mm_flops / PEAK_BF16 * 1e3
    # min-sweep: ~14 VPU ops per pair over (Q rows folded): element count
    sweep_elems = mm.nc * 128 * RAY_TILE * n_tiles * BOUNCES * cull_keep
    # VPU peak: (8x128) lanes x 4 vector subunits x ~0.94 GHz ~ 3.85e12
    # f32 elementwise ops/s — consistent with the r4 measured ~10ms
    # sweep share at these element counts
    sweep_ops = sweep_elems * 14
    sweep_floor_ms = sweep_ops / 3.85e12 * 1e3
    kernel_floor_ms = max(mm_floor_ms + sweep_floor_ms, 0.0)

    # ---- post-pass arithmetic -------------------------------------------
    # compact form (POSTPASS_r05.json): top_k/sort over B*N keys + 3
    # compact/row gathers + texel taps + sky taps
    pp_taps = (n_sig            # compact record rows
               + n_tex          # texel taps (textured compact slots)
               + n               # end-of-segment gather
               + n)              # sky taps
    pp_gather_floor_ms = pp_taps * GATHER_NS * 1e-6
    # the 2^21-key single-operand sort measured 13.7ms standalone, ~3.4ms
    # fused in-context; bytes moved are trivial — it is compare-bound.
    pp_sort_ms_measured = 3.4
    pp_floor_ms = pp_gather_floor_ms + pp_sort_ms_measured

    # ---- implied ceilings ------------------------------------------------
    grays = lambda ms: rays / (ms * 1e-3) / 1e9
    ledger = {
        "config": f"scene3 {RES}x{RES} x{BOUNCES} bounces, 1 v5e chip",
        "peaks": {"bf16_flops": PEAK_BF16, "hbm_Bps": PEAK_HBM,
                  "gather_ns_per_row": GATHER_NS},
        "measured_ms": {
            "frame": round(ms_full, 2),
            "kernel(tracing)": round(ms_kernel, 2),
            "postpass": round(ms_postpass, 2),
            "note": ("phase split via the render_rays entry (one jit per "
                     "phase variant); the HEADLINE number of record is "
                     "bench.py's render_dispatch protocol (BENCH_r05 "
                     "driver artifact) — session drift between tunnel "
                     "runs is a few ms, the SPLIT is what this ledger "
                     "pins"),
        },
        "kernel_ledger": {
            "pair_matmul_flops": mm_flops,
            "pair_matmul_floor_ms_at_peak": round(mm_floor_ms, 2),
            "min_sweep_vector_ops": sweep_ops,
            "min_sweep_floor_ms": round(sweep_floor_ms, 2),
            "kernel_floor_ms": round(kernel_floor_ms, 2),
            "kernel_efficiency_vs_floor": round(
                kernel_floor_ms / ms_kernel, 3),
            "note": ("chunk cull keeps ~70% of chunks live (census); "
                     "<3% of pair FLOPs are algorithmically necessary "
                     "(53 of 1856 tests/ray, MXU_PREFILTER_r04) — the "
                     "MXU trades wasted FLOPs for zero per-pair gathers, "
                     "which is the winning trade at this scene size. "
                     "Restructure A/Bs (ROOFLINE note r5): full-slab "
                     "min-chain 40.5 vs 39.9ms, double-buffered "
                     "matmul/sweep overlap 45.1 vs 39.9ms — both washes; "
                     "the pl.when cull regions serialize MXU/VPU."),
        },
        "postpass_ledger": {
            "slots": n_slots, "significant": n_sig, "textured_taps": n_tex,
            "gather_rows_total": pp_taps,
            "gather_floor_ms": round(pp_gather_floor_ms, 2),
            "sort_ms_measured": pp_sort_ms_measured,
            "postpass_floor_ms": round(pp_floor_ms, 2),
            "postpass_efficiency_vs_floor": round(
                pp_floor_ms / max(ms_postpass, 1e-6), 3),
            "note": ("the dense r4 form paid one gather row per slot "
                     "(2.1M); compaction taps only real records. "
                     "Texel-locality-sorted taps measured a WASH vs "
                     "ray-order (POSTPASS_r05.json): the gather engine "
                     "is issue-rate-bound, so FEWER rows is the only "
                     "lever; the residual floor is "
                     "gather-issue-bound."),
        },
        "implied_grays_per_s": {
            "measured": round(grays(ms_full), 4),
            "this_architecture_floor": round(
                grays(kernel_floor_ms + pp_floor_ms), 4),
            "zero_postpass": round(grays(ms_kernel), 4),
            "zero_postpass_floor": round(grays(kernel_floor_ms), 4),
            "x8_chips_measured": round(8 * grays(ms_full), 4),
            "north_star": 2.0,
            "verdict": (
                "the 2 Grays/s bar is NOT reachable inside this "
                "architecture on one chip: even at the architecture "
                "floor (matmul+sweep at peak, gather-issue-bound "
                "post-pass) the frame is bounded well under the bar, "
                "because (1) the brute-force pair test burns ~35x the "
                "algorithmically necessary FLOPs to avoid gathers, and "
                "(2) exact-parity 4096^2 texturing costs ~1 gather row "
                "per significant record at a fixed ~10 ns issue rate. "
                "Closing the remaining gap requires either a gather "
                "engine with higher issue rate (hardware), mipmapped/"
                "compressed textures (breaks reference parity), or "
                "multi-chip scaling (DP measured 94.9-98.9% at n=2: "
                "8 chips put the measured frame at the x8 row)."),
        },
    }

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROOFLINE_r05.json")
    with open(path, "w") as f:
        json.dump(ledger, f, indent=1)
    print(json.dumps(ledger["measured_ms"]))
    print(json.dumps(ledger["implied_grays_per_s"]))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
