"""Perf triage matrix for the megakernel on the attached TPU.

Times several configs to locate the bottleneck:
  A  scene 1 (8 spheres, no tris, no textures)
  B  scene 3 (Cornell+dragon, textured)  cull on
  C  scene 3, textures stripped (no deferred post-pass)
  D  scene 3, cull off
  E  scene 3 stripped, 2 bounces (bounce scaling)
  F  scene 3 stripped, ray_tile 2048

Run: python scripts/perf_matrix.py [res]
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rtm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
from rtm_tpu.ops.pallas.megakernel import render_megakernel


def strip_textures(scene):
    mats = scene.materials
    mats = dataclasses.replace(
        mats, texture_id=jnp.full_like(mats.texture_id, -1))
    return dataclasses.replace(scene, materials=mats, any_textured=False)


def run(name, scene, cfg, repeats=10, **kw):
    fn = jax.jit(lambda fi: render_megakernel(scene, CAM, fi, cfg, **kw))
    t0 = time.perf_counter()
    out = fn(jnp.uint32(1))
    _ = float(jnp.asarray(out).ravel()[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(repeats):
        out = fn(jnp.uint32(2 + i))
    jax.block_until_ready(out)
    _ = float(out.ravel()[0])
    dt = (time.perf_counter() - t0) / repeats
    rays = cfg.width * cfg.height * cfg.max_frames * cfg.max_bounces
    print(f"{name:34s} compile {tc:7.1f}s   {dt*1e3:8.2f} ms/frame   "
          f"{rays/dt/1e9:.4f} Grays/s", flush=True)
    return dt


res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
CFG = RenderConfig(width=res, height=res, max_bounces=8, max_frames=1,
                   draw_environment=True, accumulate=True)
CAM = Camera().spec(CFG.width, CFG.height)

s1 = build_tracer_scene(load_scene(1))
s3 = build_tracer_scene(load_scene(3))
s3s = strip_textures(s3)

print(f"device={jax.devices()[0].device_kind} res={res} bounces=8",
      flush=True)
run("A scene1 spheres", s1, CFG)
run("C scene3 striptex cull", s3s, CFG)
run("D scene3 striptex nocull", s3s, CFG, cull=False)
run("E scene3 striptex 2bounce", s3s, CFG.replace(max_bounces=2))
run("F scene3 striptex tile2048", s3s, CFG, ray_tile=2048)
run("B scene3 textured cull", s3, CFG)
