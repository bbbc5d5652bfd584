"""Profile one megakernel frame on TPU; print per-op durations from the
jax profiler trace (kernel vs XLA post-pass split)."""
from __future__ import annotations

import glob
import gzip
import json
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

scene_id = int(sys.argv[1]) if len(sys.argv) > 1 else 1
res = int(sys.argv[2]) if len(sys.argv) > 2 else 256

cfg = RenderConfig(width=res, height=res, max_bounces=8, max_frames=1,
                   draw_environment=True, accumulate=True)
cam = Camera().spec(cfg.width, cfg.height)
scene = build_tracer_scene(load_scene(scene_id))

fn = jax.jit(lambda fi: render_megakernel(scene, cam, fi, cfg))
out = fn(jnp.uint32(1))
_ = float(jnp.asarray(out).ravel()[0])

tdir = "/tmp/rtm_trace"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    for i in range(5):
        out = fn(jnp.uint32(2 + i))
    jax.block_until_ready(out)
    _ = float(out.ravel()[0])

# parse the trace proto-json
files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
ev_dur = {}
for f in files:
    with gzip.open(f, "rt") as fh:
        trace = json.load(fh)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            pidname = ev.get("pid")
            name = ev.get("name", "?")
            ev_dur.setdefault(name, [0, 0])
            ev_dur[name][0] += ev["dur"]
            ev_dur[name][1] += 1
top = sorted(ev_dur.items(), key=lambda kv: -kv[1][0])[:40]
for name, (dur, cnt) in top:
    print(f"{dur/1e3:10.3f} ms  x{cnt:4d}  {name[:110]}")
