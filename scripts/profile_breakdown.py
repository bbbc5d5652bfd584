"""Round-2 perf triage: where do the 297 ms/frame actually go?

Times individually-jitted pieces of the megakernel + wavefront pipelines at
the headline config (scene 3, 512x512, 8 bounces, spp 1):

  * megakernel scene3 (textured)  — the round-1 headline
  * megakernel scene4 (untextured)— isolates deferred-texture records+post
  * megakernel cull on/off        — value of the tile-uniform cluster cull
  * kernel-only (no post-pass)    — pallas_call without XLA reconstruction
  * wavefront sort-only           — per-bounce sort + 23-row permute cost
  * bounce-kernel-only            — one wavefront bounce over the frame

Prints one JSON line per measurement.
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
from functools import partial  # noqa: E402


def timeit(name, fn, *args, repeats=10, **meta):
    out = fn(jnp.uint32(1), *args)
    jax.block_until_ready(out)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for i in range(repeats):
        out = fn(jnp.uint32(2 + i), *args)
    jax.block_until_ready(out)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / repeats
    rec = {"name": name, "ms": round(1e3 * dt, 2), **meta}
    print(json.dumps(rec), flush=True)
    return dt


def main():
    from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
    from rtm_tpu.ops.pallas import megakernel as mk
    from rtm_tpu.ops.pallas import wavefront as wf

    W = H = int(os.environ.get("RTM_BENCH_SIZE", 512))
    B = int(os.environ.get("RTM_BENCH_BOUNCES", 8))
    cfg = RenderConfig(width=W, height=H, max_bounces=B, max_frames=1,
                       draw_environment=True, accumulate=True)

    s3 = build_tracer_scene(load_scene(3))
    s4 = build_tracer_scene(load_scene(4))
    cam = Camera().spec(W, H)

    # --- full megakernel, scene 3 / 4, cull on/off -------------------------
    @partial(jax.jit, static_argnames=("cull",))
    def mega(fi, scene, cull=True):
        return mk.render_megakernel(scene, cam, fi, cfg, cull=cull)

    t_s3 = timeit("mega_s3_cull", lambda fi: mega(fi, s3), repeats=10)
    timeit("mega_s4_cull", lambda fi: mega(fi, s4), repeats=10)
    # NB: cull=False OOMs scoped VMEM at compile (the fully-unrolled straight
    # line keeps 72MB of vectors live); the conds double as live-range cuts.

    # --- kernel only (pallas_call outputs, no XLA post-pass) ---------------
    def kernel_only(fi, scene):
        # replicate render_rays_megakernel up to the pallas_call
        import numpy as np
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        n = W * H
        r = mk.DEFAULT_RAY_TILE
        n_pad = -(-n // r) * r
        pack = mk.build_mega_pack(scene)
        camf = mk._pack_camera(cam)
        fidx = jnp.asarray(fi, jnp.uint32).reshape(1, 1)
        pix0 = jnp.zeros((1, 1), jnp.int32)
        const = lambda i: (0, 0)
        in_specs = [pl.BlockSpec((1, 64), const, memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM)]
        inputs = [camf, fidx, pix0]
        tp = pack.n_clusters * mk.CLUSTER
        in_specs += [
            pl.BlockSpec((tp, 16), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((mk.NUM_ATTRS, tp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((pack.n_clusters, 8), const,
                         memory_space=pltpu.SMEM)]
        inputs += [pack.tri_feats, pack.tri_attrs, pack.boxes]
        textured = scene.any_textured
        out_shape = [jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
                     jax.ShapeDtypeStruct((8, n_pad), jnp.float32)]
        out_specs = [pl.BlockSpec((8, r), lambda i: (0, i),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((8, r), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)]
        if textured:
            out_shape.append(jax.ShapeDtypeStruct((8 * B, n_pad), jnp.float32))
            out_specs.append(pl.BlockSpec((8 * B, r), lambda i: (0, i),
                                          memory_space=pltpu.VMEM))
        kernel = mk._make_kernel(ray_tile=r, n_clusters=pack.n_clusters,
                                 n_sph=0, max_bounces=B, max_frames=1,
                                 textured=textured, cull=True, width=W,
                                 height=H, early_exit=False)
        outs = pl.pallas_call(kernel, grid=(n_pad // r,), in_specs=in_specs,
                              out_specs=tuple(out_specs),
                              out_shape=tuple(out_shape))(*inputs)
        return outs[0]

    timeit("kernel_only_s3", jax.jit(lambda fi: kernel_only(fi, s3)),
           repeats=10)
    timeit("kernel_only_s4", jax.jit(lambda fi: kernel_only(fi, s4)),
           repeats=10)

    # --- wavefront: sort cost only ------------------------------------------
    def sort_only(fi):
        lo, hi = wf._scene_bounds(s3)
        n_pad = W * H
        state = jax.random.normal(jax.random.PRNGKey(0),
                                  (wf.STATE_ROWS, n_pad), jnp.float32)
        state = state.at[wf._R_ALIVE, :].set(1.0)
        color = jnp.zeros((3, n_pad), jnp.float32)
        ptex = jnp.ones((3, n_pad), jnp.float32)
        pix = jax.lax.iota(jnp.int32, n_pad)
        acc = jnp.float32(fi)
        for b in range(B - 1):          # wavefront sorts bounces 1..B-1
            perm = wf._sort_perm(state, lo, hi)
            state = jnp.take(state, perm, axis=1)
            color = jnp.take(color, perm, axis=1)
            ptex = jnp.take(ptex, perm, axis=1)
            pix = jnp.take(pix, perm)
            state = state + 1e-6        # defeat CSE across iterations
        return state[0, 0] + color[0, 0] + ptex[0, 0] + pix[0] + acc

    timeit("wavefront_sort_only_7x", jax.jit(sort_only), repeats=10)

    # --- wavefront: full ----------------------------------------------------
    @jax.jit
    def wave(fi):
        return wf.render_wavefront(s3, cam, fi, cfg)

    timeit("wavefront_s3", wave, repeats=5)

    # --- wavefront bounce kernel only: 8 bounces, no sort, no shading pass --
    def bounce_only(fi, scene):
        pack = mk.build_mega_pack(scene)
        n_pad = W * H
        state = jnp.zeros((wf.STATE_ROWS, n_pad), jnp.float32)
        state = state.at[0:3, :].set(0.1)
        state = state.at[3, :].set(0.3)
        state = state.at[4, :].set(0.6)
        state = state.at[5, :].set(0.9)
        state = state.at[wf._R_ALIVE, :].set(1.0)
        state = state.at[wf._R_SEED, :].set(
            jax.lax.bitcast_convert_type(
                jnp.full((n_pad,), fi, jnp.uint32), jnp.float32))
        acc = jnp.float32(0)
        for b in range(B):
            state, rec = wf._bounce_call(pack, state, b, ray_tile=512,
                                         cull=True, interpret=False)
            acc = acc + rec[0, 0]
        return state, acc

    timeit("bounce_kernels_only_8x_s3",
           jax.jit(lambda fi: bounce_only(fi, s3)), repeats=5)

    print("# done", file=sys.stderr)


if __name__ == "__main__":
    main()
