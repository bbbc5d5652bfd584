"""Isolate the remaining megakernel frame-time after the quad-gather fix:
kernel+records vs texture post-pass vs sky pass on scene 3 (textured) and
scene 4 (untextured twin).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/rtm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
from rtm_tpu.ops.pallas import megakernel as mk

W = H = 512
B = 8
cfg = RenderConfig(width=W, height=H, max_bounces=B, max_frames=1,
                   draw_environment=True, accumulate=True)
cam = Camera().spec(W, H)
s3 = build_tracer_scene(load_scene(3))
s4 = build_tracer_scene(load_scene(4))


def timeit(name, fn, *args, reps=10):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(jnp.uint32(1), *args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(jnp.uint32(2 + i), *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.2f} ms  (compile {c:.0f}s)", flush=True)


import functools


@functools.partial(jax.jit, static_argnames=("scene_tag",))
def full(fi, scene, scene_tag=None):
    return mk.render_megakernel(scene, cam, fi, cfg)


# kernel only: run render_rays but truncate before the post-pass by
# monkey-free approach — call pallas directly via the module internals
@jax.jit
def kernel_only_s3(fi, scene):
    import numpy as np
    pack = mk.build_mega_pack(scene)
    # reuse the driver up to the pallas_call by calling with a stub that
    # sums raw outputs: emulate by calling render_rays_megakernel's pieces
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n = W * H
    r = mk.DEFAULT_RAY_TILE
    camf = mk._pack_camera(cam)
    fidx = jnp.asarray(fi, jnp.uint32).reshape(1, 1)
    pix0 = jnp.int32(0).reshape(1, 1)
    const = lambda i: (0, 0)
    in_specs = [pl.BlockSpec((1, 64), const, memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM)]
    inputs = [camf, fidx, pix0]
    tp = pack.n_clusters * mk.CLUSTER
    in_specs += [pl.BlockSpec((tp, 16), const, memory_space=pltpu.VMEM),
                 pl.BlockSpec((mk.NUM_ATTRS, tp), const,
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((pack.n_clusters, 8), const,
                              memory_space=pltpu.SMEM)]
    inputs += [pack.tri_feats, pack.tri_attrs, pack.boxes]
    textured = scene.any_textured
    out_shape = [jax.ShapeDtypeStruct((8, n), jnp.float32),
                 jax.ShapeDtypeStruct((8, n), jnp.float32)]
    out_specs = [pl.BlockSpec((8, r), lambda i: (0, i),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((8, r), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    if textured:
        out_shape.append(jax.ShapeDtypeStruct((8 * B, n), jnp.float32))
        out_specs.append(pl.BlockSpec((8 * B, r), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
    kernel = mk._make_kernel(ray_tile=r, n_clusters=pack.n_clusters,
                             n_sph=pack.n_spheres_padded, max_bounces=B,
                             max_frames=1, textured=textured, cull=True,
                             width=W, height=H, early_exit=False)
    outs = pl.pallas_call(
        kernel, grid=(n // r,), in_specs=in_specs,
        out_specs=tuple(out_specs), out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*inputs)
    return sum(o[0, ::97].sum() for o in outs)


timeit("mega_s3_full", full, s3, "s3")
timeit("mega_s4_full", full, s4, "s4")
timeit("mega_s3_kernel_only", kernel_only_s3, s3)
timeit("mega_s4_kernel_only", kernel_only_s3, s4)
print("# done", flush=True)
