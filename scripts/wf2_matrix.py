"""Breakdown matrix for the sorted-wavefront renderer on the attached TPU.

Times the full frame under different static knobs plus isolated stages, to
locate where bounce time goes (kernel sweep vs sort+permute vs XLA shading).

Run: python scripts/wf2_matrix.py [res]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("RTM_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["RTM_BENCH_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/tmp/rtm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene  # noqa: E402
from rtm_tpu.ops.pallas.megakernel import build_mega_pack  # noqa: E402
from rtm_tpu.ops.pallas.sweep_kernel import sweep_call  # noqa: E402
from rtm_tpu.ops.wavefront2 import (_scene_bounds, _sort_perm,  # noqa: E402
                                    render_wavefront2)


def time_fn(name, fn, *args, repeats=10):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / repeats
    print(f"{name:44s} compile {tc:6.1f}s   {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    bounces = int(os.environ.get("RTM_BENCH_BOUNCES", 8))
    cfg = RenderConfig(width=res, height=res, max_bounces=bounces,
                       max_frames=1, draw_environment=True)
    scene = build_tracer_scene(load_scene(3))
    cam = Camera().spec(res, res)
    n = res * res

    # full-frame variants
    variants = ((1, True, "wf2 sort_from=1 cull"),
                (99, True, "wf2 no-sort cull"),
                (99, False, "wf2 no-sort no-cull"),
                (2, True, "wf2 sort_from=2 cull"))
    if os.environ.get("RTM_WF2_STAGES_ONLY"):
        variants = ()
    for sf, cull, label in variants:
        fn = jax.jit(functools.partial(
            lambda sc, cm, fi, _sf, _cu: render_wavefront2(
                sc, cm, fi, cfg, sort_from=_sf, cull=_cu),
            _sf=sf, _cu=cull))
        time_fn(f"{label} ({bounces}b)", fn, scene, cam, jnp.uint32(2))

    # isolated: sweep kernel x bounces on camera-coherent rays
    pack = build_mega_pack(scene)
    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (n, 3), jnp.float32, -1.0, 1.0)
    d = o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    st = jnp.concatenate([o.T, d.T, jnp.ones((1, n), jnp.float32),
                          jnp.zeros((1, n), jnp.float32)], axis=0)

    def sweeps(feats, boxes, s):
        # rebuild the pack around traced arrays; the static cluster layout
        # stays a closure constant (pack itself is a pytree whose tuple
        # fields would otherwise become traced leaves)
        pk = pack._replace(tri_feats=feats, boxes=boxes)
        outs = []
        for b in range(bounces):
            outs.append(sweep_call(pk, s + jnp.float32(b) * 0.0)[1])
        return jnp.stack(outs)

    time_fn(f"sweep kernel x{bounces} (random rays)",
            jax.jit(sweeps), pack.tri_feats, pack.boxes, st)

    # isolated: sort + full-state permute x bounces
    lo, hi = _scene_bounds(scene)
    state = {
        "o": o, "d": d, "sd": jnp.zeros((n,), jnp.uint32),
        "color": jnp.zeros((n, 3)), "contrib": jnp.ones((n, 3)),
        "alive": jnp.ones((n,), bool), "pix": jnp.arange(n, dtype=jnp.int32),
    }

    def sorts(s, lo, hi):
        for b in range(bounces):
            perm = _sort_perm(s["o"], s["d"], s["alive"], lo, hi)
            s = jax.tree.map(
                lambda x: jnp.take(x, perm, axis=0), s)
            s["o"] = s["o"] + 1e-7          # defeat CSE across iterations
        return s

    time_fn(f"sort+permute x{bounces}", jax.jit(sorts), state, lo, hi)

    # isolated: the XLA shading half x bounces (fixed fake hit indices)
    from rtm_tpu.ops.trace_ref import (_triangle_t_from_idx, bounce_payload,
                                       shade_bounce)

    def shading(sc, o, d):
        sd = jnp.zeros((n,), jnp.uint32)
        color = jnp.zeros((n, 3))
        contrib = jnp.ones((n, 3))
        alive = jnp.ones((n,), bool)
        i_real = (jnp.arange(n, dtype=jnp.int32) % sc.num_triangles)
        for b in range(bounces):
            t_t = _triangle_t_from_idx(sc, o, d, i_real)
            p = bounce_payload(sc, None, o, d, 0, tri_hit=(t_t, i_real))
            o, d, sd, color, contrib, alive = shade_bounce(
                sc, cfg, jnp.float32(1.0), o, d, sd, color, contrib,
                alive, p)
        return color

    time_fn(f"XLA shading x{bounces}", jax.jit(shading), scene, o, d)

    # isolated: payload only (gathers) and scatter-back
    def payloads(sc, o, d):
        i_real = (jnp.arange(n, dtype=jnp.int32) % sc.num_triangles)
        acc = jnp.zeros((n,))
        for b in range(bounces):
            t_t = _triangle_t_from_idx(sc, o, d, i_real)
            p = bounce_payload(sc, None, o, d, 0, tri_hit=(t_t, i_real))
            acc = acc + p["u"] + p["t"] + p["normal"][:, 0]
            o = o + 1e-7
        return acc

    time_fn(f"payload gathers x{bounces}", jax.jit(payloads), scene, o, d)

    def scatter_back(c):
        pix = jnp.arange(n, dtype=jnp.int32)[::-1]
        out = jnp.zeros((n, 3))
        for _ in range(bounces):
            out = out.at[pix].add(c)
            c = c + 1e-7
        return out

    time_fn(f"scatter .at[pix].add x{bounces}", jax.jit(scatter_back),
            jnp.ones((n, 3)))


if __name__ == "__main__":
    main()
