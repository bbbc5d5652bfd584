"""Profiling / roofline helpers (SURVEY §5.1 parity).

The reference instruments frames with RT::Timer and surfaces FPS / GPU-time
in the UI (Core/Time.h:12-30, RayTracing.cpp:71-79).  TPU equivalents:
`jax.profiler` traces for op-level analysis, and a static roofline estimate
of the megakernel pass from first principles (pair counts x op costs vs the
VPU/MXU/HBM ceilings) — the speed-of-light analysis BASELINE.md asks for.
"""
from __future__ import annotations

import contextlib
import time

import numpy as np

from ..config import RenderConfig


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rtm_trace"):
    """jax.profiler trace context; view with tensorboard/xprof."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 10, warmup: int = 1):
    """Wall-clock a jitted fn with a single host transfer at the end (over
    a tunneled device, per-call block_until_ready lies — SURVEY §5.1)."""
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / iters


def megakernel_roofline(cfg: RenderConfig, num_triangles: int,
                        num_spheres: int = 0,
                        vpu_ops_per_sec: float = 0.96e12,
                        clock_ghz: float = 0.94) -> dict:
    """Static speed-of-light estimate for one forward dispatch.

    The fused kernel is VPU-bound: ~35 vector ops per (ray, triangle) pair
    in the cluster sweep (measured by instruction count; HBM traffic is
    negligible — the scene lives in VMEM and rays never leave registers).
    Returns expected ms/frame and the implied Grays/s ceiling.
    """
    n_rays = cfg.num_pixels * cfg.max_frames
    t_pad = max(1, -(-num_triangles // 128)) * 128
    pairs = n_rays * cfg.max_bounces * (t_pad + ((num_spheres + 7) // 8) * 8)
    ops_per_pair = 35.0
    seconds = pairs * ops_per_pair / vpu_ops_per_sec
    rays = cfg.num_pixels * cfg.max_frames * cfg.max_bounces
    return {
        "pairs": int(pairs),
        "vpu_seconds": seconds,
        "expected_ms_per_frame": seconds * 1e3,
        "ceiling_grays_per_sec": rays / seconds / 1e9,
        "note": "VPU-bound dense sweep; pair-reduction (wavefront sort + "
                "per-ray clustering) is the lever, see README roadmap",
    }
